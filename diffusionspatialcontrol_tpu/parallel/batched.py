"""Batched multi-prompt x multi-seed generation over a device mesh.

BASELINE config 4: N prompts x M seeds with shared region maps, sharded on
the image-batch axis over ICI (SURVEY.md §2.3 TPU mapping). Per-seed results
are identical regardless of mesh shape because every sample's randomness
derives only from its own seed (samplers/brownian.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Union

import jax
import numpy as np

from ..config import GenerationConfig
from .mesh import data_parallel_mesh, replicate, shard_batch


def _shard_extras(mesh, extras):
    """Shard a DenoiseExtras' batched arrays over the mesh's data axis and
    replicate the (unbatched) ControlNet weight trees."""
    def sb(x):
        return None if x is None else shard_batch(mesh, x)

    return dataclasses.replace(
        extras,
        controlnet_params=(
            None if extras.controlnet_params is None
            else [replicate(mesh, p) for p in extras.controlnet_params]
        ),
        controlnet_images=(
            None if extras.controlnet_images is None
            else [sb(i) for i in extras.controlnet_images]
        ),
        t2i_residuals=(
            None if extras.t2i_residuals is None
            else tuple(sb(f) for f in extras.t2i_residuals)
        ),
        ip_tokens=(
            None if extras.ip_tokens is None
            else tuple(sb(t) for t in extras.ip_tokens)
        ),
        ip_masks=(
            None if extras.ip_masks is None
            else tuple(sb(m) for m in extras.ip_masks)
        ),
    )


def generate_grid(
    pipe,
    prompts: Sequence[str],
    seeds: Sequence[int],
    gen: GenerationConfig,
    negative_prompt: Union[str, Sequence[str]] = "",
    region_states: Optional[Sequence[Optional[dict]]] = None,
    mesh=None,
    decode: bool = True,
    encoding_mode: str = "short",
    extras=None,
    init_images=None,
    strength: float = 0.8,
):
    """Generate len(prompts) * len(seeds) images: prompt-major order.

    Each prompt is encoded once and tiled across its seeds; the flattened
    batch (with its CFG pair inside the program) is sharded over the mesh's
    "data" axis. ``negative_prompt`` may be a per-prompt list.
    ``extras`` (DenoiseExtras) must already be batched to the full
    prompts x seeds fan-out CFG-doubled (api.inference builds it with
    unit_fan = P*M); its arrays are sharded alongside the contexts.

    ``init_images``: optional per-prompt init images (P, H, W, 3) in
    [-1, 1] — the batched img2img path (reference: batched image-to-image,
    model_k_diffusion.py:543). Each (prompt, seed) sample's init latents
    are VAE-encoded under ITS OWN seed, so every sample is bitwise
    identical to the equivalent single img2img run (the per-sample PRNG
    contract), regardless of grid shape or mesh.
    Returns (P*M, H, W, 3) images (or latents)."""
    n_p, n_s = len(prompts), len(seeds)
    negs = (
        list(negative_prompt)
        if isinstance(negative_prompt, (list, tuple))
        else [negative_prompt] * n_p
    )
    if len(negs) != n_p:
        raise ValueError(
            f"{len(negs)} negative prompts for {n_p} prompts"
        )
    context, ids = pipe.encode_prompt(
        list(prompts), negs, clip_skip=gen.clip_skip,
        mode=encoding_mode, num_images_per_prompt=n_s,
    )
    do_cfg = gen.guidance_scale > 1.0
    if not do_cfg:
        # no CFG pair: cond half only (matches api.inference)
        context = context[context.shape[0] // 2:]
    region_biases = None
    if region_states and any(region_states):
        region_biases = pipe.encode_region(
            list(region_states), ids, height=gen.height, width=gen.width,
            num_images_per_prompt=n_s, do_cfg=do_cfg,
        )

    all_seeds = [int(s) for p in range(n_p) for s in seeds]

    init_latents = None
    if init_images is not None:
        if len(init_images) != n_p:
            raise ValueError(
                f"{len(init_images)} init images for {n_p} prompts"
            )
        init_latents = jax.numpy.concatenate(
            [
                pipe.encode_image(init_images[p][None], seed=int(s))
                for p in range(n_p)
                for s in seeds
            ],
            axis=0,
        )

    if mesh == "auto":
        n_dev = len(jax.devices())
        mesh = (
            data_parallel_mesh() if n_dev > 1 and (n_p * n_s) % n_dev == 0
            else None
        )
    if mesh is not None:
        pipe_params = replicate(mesh, pipe.params)
        pipe.params = pipe_params
        context = shard_batch(mesh, context)
        if region_biases is not None:
            region_biases = tuple(
                shard_batch(mesh, b) for b in region_biases
            )
        if extras is not None:
            extras = _shard_extras(mesh, extras)
        if init_latents is not None:
            init_latents = shard_batch(mesh, init_latents)

    if init_latents is not None:
        return pipe.img2img(
            context, init_latents, gen, strength=strength, seed=all_seeds,
            region_biases=region_biases, decode=decode, extras=extras,
        )
    return pipe.txt2img(
        context, gen, seed=all_seeds, region_biases=region_biases,
        decode=decode, extras=extras,
    )

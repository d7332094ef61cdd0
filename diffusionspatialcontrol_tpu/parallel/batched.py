"""Batched multi-prompt x multi-seed generation over a device mesh.

BASELINE config 4: N prompts x M seeds with shared region maps, sharded on
the image-batch axis over ICI (SURVEY.md §2.3 TPU mapping). Per-seed results
are identical regardless of mesh shape because every sample's randomness
derives only from its own seed (samplers/brownian.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

from ..config import GenerationConfig
from .mesh import data_parallel_mesh, replicate, shard_batch


def generate_grid(
    pipe,
    prompts: Sequence[str],
    seeds: Sequence[int],
    gen: GenerationConfig,
    negative_prompt: str = "",
    region_states: Optional[Sequence[Optional[dict]]] = None,
    mesh=None,
    decode: bool = True,
    encoding_mode: str = "short",
):
    """Generate len(prompts) * len(seeds) images: prompt-major order.

    Each prompt is encoded once and tiled across its seeds; the flattened
    batch (with its CFG pair inside the program) is sharded over the mesh's
    "data" axis. Returns (P*M, H, W, 3) images (or latents)."""
    n_p, n_s = len(prompts), len(seeds)
    context, ids = pipe.encode_prompt(
        list(prompts), [negative_prompt] * n_p, clip_skip=gen.clip_skip,
        mode=encoding_mode, num_images_per_prompt=n_s,
    )
    region_biases = None
    if region_states and any(region_states):
        region_biases = pipe.encode_region(
            list(region_states), ids, height=gen.height, width=gen.width,
            num_images_per_prompt=n_s,
        )

    all_seeds = [int(s) for p in range(n_p) for s in seeds]

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

    return pipe.txt2img(
        context, gen, seed=all_seeds, region_biases=region_biases,
        decode=decode,
    )

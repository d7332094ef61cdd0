"""DAAM-style cross-attention heatmap extraction (BASELINE config 5).

The reference visualizes token attribution with the external DAAM package
(README.md:44-48); here it is a built-in capability: given the latent
trajectory of a generation (any solver, via ``return_history=True``), re-run
the UNet at selected steps with heatmap collection on and accumulate
per-token spatial attention mass across all 16 cross-attention layers,
upsampled to the latent grid.

This post-hoc replay design keeps the sampling hot loop free of introspection
cost and works uniformly across all samplers.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models.unet import RegionState, UNetCond, unet_apply
from ..pipeline.pipeline import _sigma_to_t
from ..samplers import schedules


def heatmaps_for_state(
    params,
    model_cfg: ModelConfig,
    x: jnp.ndarray,  # (B, h, w, 4) sigma-space latents at this step
    sigma: float,
    context: jnp.ndarray,  # (B, S, D) cond-half context
    region_biases: Optional[Tuple[jnp.ndarray, ...]] = None,
) -> jnp.ndarray:
    """(B, h, w, S) attention mass for one denoising state, summed over
    heads and layers, bilinearly upsampled to the latent grid."""
    b, h, w, _ = x.shape
    table = schedules.ddpm_sigma_table(model_cfg)
    log_table = jnp.asarray(np.log(table), jnp.float32)
    sig = jnp.asarray(sigma, jnp.float32)
    c_in = 1.0 / jnp.sqrt(sig**2 + 1.0)
    t = _sigma_to_t(sig, log_table)
    t_b = jnp.full((b,), t, jnp.float32)

    region = None
    if region_biases is not None:
        region = RegionState(region_biases, sig)
    cond = UNetCond(context=context, region=region)
    _, maps = unet_apply(
        params["unet"], model_cfg.unet, (x * c_in).astype(context.dtype),
        t_b, cond, collect_heatmaps=True,
    )

    s_len = maps[0][1].shape[-1]
    acc = jnp.zeros((b, h, w, s_len), jnp.float32)
    for level, m in maps:
        hh, ww = h // 2**level, w // 2**level
        m = m.reshape(b, hh, ww, s_len)
        m = jax.image.resize(m, (b, h, w, s_len), "bilinear")
        acc = acc + m
    return acc


def heatmaps_for_trajectory(
    params,
    model_cfg: ModelConfig,
    history: jnp.ndarray,  # (n_steps, B, h, w, 4) from return_history=True
    sigmas: Sequence[float],  # per-step sigmas (len n_steps, schedule[:-1])
    context: jnp.ndarray,
    region_biases=None,
    step_stride: int = 1,
    normalize: bool = True,
) -> jnp.ndarray:
    """Accumulate heatmaps across a generation. ``history[i]`` is the latent
    *after* step i; the model state at step i+1 is (history[i],
    sigmas[i+1]), and the initial state is handled by the caller passing the
    full trajectory. Returns (B, h, w, S)."""
    n = history.shape[0]
    acc = None
    for i in range(0, n - 1, step_stride):
        hm = heatmaps_for_state(
            params, model_cfg, history[i], float(sigmas[i + 1]), context,
            region_biases,
        )
        acc = hm if acc is None else acc + hm
    if acc is None:
        raise ValueError("empty trajectory")
    if normalize:
        mx = acc.max(axis=(1, 2), keepdims=True)
        acc = acc / jnp.maximum(mx, 1e-8)
    return acc


def token_heatmap(heatmaps: jnp.ndarray, token_positions: Sequence[int]):
    """Extract and merge the heatmap for a phrase occupying the given token
    positions. Returns (B, h, w)."""
    sel = heatmaps[..., list(token_positions)]
    return sel.sum(-1)


def attention_mass_in_mask(heatmaps: jnp.ndarray,
                           token_positions: Sequence[int],
                           mask_latent: jnp.ndarray) -> jnp.ndarray:
    """Fraction of a phrase's cross-attention mass falling inside its
    region mask. ``heatmaps``: (B, h, w, S) UNNORMALIZED accumulation;
    ``mask_latent``: (h, w) in [0, 1]. Returns (B,)."""
    tok = token_heatmap(heatmaps, token_positions)  # (B, h, w)
    m = mask_latent.astype(jnp.float32)[None]
    inside = (tok * m).sum(axis=(1, 2))
    total = tok.sum(axis=(1, 2))
    return inside / jnp.maximum(total, 1e-12)


def region_compliance(
    pipe,
    gen,
    prompt: str,
    neg_prompt: str,
    state: Optional[dict],
    seed=0,
    encoding_mode: str = "short",
    step_stride: int = 1,
):
    """Per-phrase attention-mass-inside-mask for one generation.

    Quantifies the spatial-control effect the reference evaluates by human
    inspection (reference README.md:68-75): generate with (or, when
    ``state`` phrases carry weight 0 / ``state`` applied as measurement
    only, without) region control, replay the trajectory through DAAM, and
    report for each phrase the fraction of its cross-attention mass inside
    its mask. Higher weight S must pull mass into the mask — the
    monotonicity that makes this a machine-checkable stand-in for the
    reference's side-by-side figures.

    ``state``: {phrase: {mask, weight, mask_outsides}}; the masks define
    WHERE compliance is measured, the weights define the control strength
    (weight 0 for all phrases measures the uncontrolled baseline).
    Returns {phrase: float} for batch item 0.
    """
    from ..ops.region_map import phrase_token_counts

    ctx, ids = pipe.encode_prompt([prompt], [neg_prompt],
                                  clip_skip=gen.clip_skip,
                                  mode=encoding_mode)
    any_weight = state and any(
        float(v.get("weight", 0.0)) != 0.0 for v in state.values())
    biases = None
    if any_weight:
        biases = pipe.encode_region([state], ids, height=gen.height,
                                    width=gen.width, do_cfg=True)
    _, hist = pipe.txt2img(ctx, gen, seed=seed, decode=False,
                           return_history=True, region_biases=biases)
    sigmas, _ = pipe._schedule(gen)
    half = ctx.shape[0] // 2
    cond_ctx = ctx[half:]
    cond_biases = None
    if biases is not None:
        cond_biases = tuple(b[b.shape[0] // 2:] for b in biases)
    maps = heatmaps_for_trajectory(
        pipe.params, pipe.model_cfg, hist, sigmas, cond_ctx, cond_biases,
        step_stride=step_stride, normalize=False,
    )
    h, w = gen.latent_height, gen.latent_width
    out = {}
    for phrase, spec in (state or {}).items():
        p_ids = pipe.tokenizer.encode(phrase, add_special_tokens=False)
        counts = phrase_token_counts(ids[0], [p_ids])[0]
        positions = [i for i, c in enumerate(counts) if c > 0]
        if not positions:
            out[phrase] = float("nan")
            continue
        mask = jnp.asarray(np.asarray(spec["mask"], np.float32))
        mask_lat = jax.image.resize(mask, (h, w), "bilinear")
        mask_lat = (mask_lat >= 0.5).astype(jnp.float32)
        frac = attention_mass_in_mask(maps, positions, mask_lat)
        out[phrase] = float(frac[0])
    return out

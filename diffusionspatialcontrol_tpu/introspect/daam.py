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

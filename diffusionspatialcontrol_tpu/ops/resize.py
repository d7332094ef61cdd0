"""Latent upscaling for hires fix.

Mirrors the reference's upscale-mode table (source/app.py:2117-2127:
Latent (bilinear) / (bilinear antialiased) / (bicubic) / (bicubic
antialiased) / (nearest) / (nearest-exact) via F.interpolate) using
jax.image.resize, which runs inside jit on device."""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MODES = {
    "bilinear": "bilinear",
    "bicubic": "cubic",
    "nearest": "nearest",
    "nearest-exact": "nearest",
}

UPSCALE_MODES = [
    "Latent (bilinear)",
    "Latent (bilinear antialiased)",
    "Latent (bicubic)",
    "Latent (bicubic antialiased)",
    "Latent (nearest)",
    "Latent (nearest-exact)",
]


def parse_upscale_mode(name: str):
    """UI name -> (mode, antialias)."""
    n = name.lower()
    antialias = "antialiased" in n
    for key in ("bicubic", "bilinear", "nearest-exact", "nearest"):
        if key in n:
            return key, antialias
    return "bilinear", False


def resize_latents(latents: jnp.ndarray, new_h: int, new_w: int,
                   mode: str = "bilinear",
                   antialias: bool = False) -> jnp.ndarray:
    b, h, w, c = latents.shape
    method = _MODES.get(mode, "bilinear")
    return jax.image.resize(
        latents, (b, new_h, new_w, c), method=method, antialias=antialias
    )

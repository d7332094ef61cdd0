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


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int,
                                  out_w: int) -> jnp.ndarray:
    """Bilinear resize with torch ``align_corners=True`` semantics on NHWC
    tensors — output grid i maps to input coordinate i*(H_in-1)/(H_out-1).
    jax.image.resize only implements half-pixel (align_corners=False)
    sampling, but several ported decoders (MLSD BlockTypeA, the DPT/ZoeDepth
    fusion pyramid and bin attractors) upsample with corner alignment."""
    import numpy as np

    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x

    def axis_weights(n_in, n_out):
        if n_out == 1 or n_in == 1:
            lo = np.zeros(n_out, np.int32)
            return lo, lo, np.zeros(n_out, np.float32)
        coord = np.arange(n_out) * (n_in - 1) / (n_out - 1)
        lo = np.floor(coord).astype(np.int32)
        hi = np.minimum(lo + 1, n_in - 1)
        frac = (coord - lo).astype(np.float32)
        return lo, hi, frac

    ylo, yhi, yf = axis_weights(h, out_h)
    xlo, xhi, xf = axis_weights(w, out_w)
    xf32 = x.astype(jnp.float32)
    xw = xf[None, None, :, None]
    top = xf32[:, ylo][:, :, xlo] * (1 - xw) + xf32[:, ylo][:, :, xhi] * xw
    bot = xf32[:, yhi][:, :, xlo] * (1 - xw) + xf32[:, yhi][:, :, xhi] * xw
    yw = yf[None, :, None, None]
    return (top * (1 - yw) + bot * yw).astype(x.dtype)

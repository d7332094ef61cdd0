"""Lineart (anime) detector — Anime2Sketch pix2pix UnetGenerator.

The reference's "Lineart (anime)" control preprocessor runs
controlnet_aux's LineartAnimeDetector (reference: source/app.py:726-728):
a UnetGenerator(3, 1, num_downs=8, ngf=64) with affine-free InstanceNorm
(so the norms carry no weights), LeakyReLU(0.2) downs, ConvTranspose(k4,
s2, p1) ups, tanh output, and nested skip concats. Converter consumes the
netG.pth layout (nested ``model.model...`` Sequential indices); the whole
generator is verified against a torch replica with the exact module layout
(tests/test_preprocess.py).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

NGF = 64
NUM_DOWNS = 8


def _channels() -> List[tuple]:
    """(outer_nc, inner_nc, input_nc) per block, outermost first."""
    chans = [(1, NGF, 3), (NGF, NGF * 2, None), (NGF * 2, NGF * 4, None),
             (NGF * 4, NGF * 8, None)]
    chans += [(NGF * 8, NGF * 8, None)] * (NUM_DOWNS - 5)  # intermediates
    chans += [(NGF * 8, NGF * 8, None)]  # innermost
    return chans


def _conv_s2(pa, x):
    """k4 s2 p1 zero-padded conv."""
    return jax.lax.conv_general_dilated(
        x, pa["kernel"].astype(x.dtype), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + pa["bias"].astype(x.dtype)


def _convt_s2(pa, x):
    """torch ConvTranspose2d(k4, s2, p1): lhs-dilated conv, pads (2, 2),
    kernel stored pre-flipped/transposed HWIO (see convert)."""
    return jax.lax.conv_general_dilated(
        x, pa["kernel"].astype(x.dtype), (1, 1), [(2, 2), (2, 2)],
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + pa["bias"].astype(x.dtype)


def _inorm(x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = xf.var(axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _cinit(key, kh, i, o, dtype):
    return {
        "kernel": (jax.random.normal(key, (kh, kh, i, o), jnp.float32)
                   / np.sqrt(kh * kh * i)).astype(dtype),
        "bias": jnp.zeros((o,), dtype),
    }


def lineart_anime_init(key, dtype=jnp.float32) -> Dict[str, Any]:
    blocks = []
    for outer, inner, inp in _channels():
        inp = inp if inp is not None else outer
        k1, k2, key = jax.random.split(key, 3)
        is_inner = len(blocks) == NUM_DOWNS - 1
        up_in = inner if is_inner else inner * 2
        blocks.append({
            "down": _cinit(k1, 4, inp, inner, dtype),
            # up kernel stored HWIO with I=up_in (pre-flipped layout)
            "up": _cinit(k2, 4, up_in, outer, dtype),
        })
    return {"blocks": blocks}


def _run_block(blocks, i, x):
    """Recursive UnetSkipConnectionBlock.forward."""
    b = blocks[i]
    outermost = i == 0
    innermost = i == len(blocks) - 1
    h = x
    if not outermost:
        h = jax.nn.leaky_relu(h, 0.2)
    h = _conv_s2(b["down"], h)
    if not outermost and not innermost:
        h = _inorm(h)
        h = _run_block(blocks, i + 1, h)
    elif outermost:
        h = _run_block(blocks, i + 1, h)
    h = jax.nn.relu(h)
    h = _convt_s2(b["up"], h)
    if outermost:
        return jnp.tanh(h)
    h = _inorm(h)
    return jnp.concatenate([x, h], axis=-1)  # skip concat


def lineart_anime_apply(params, pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels (B, H, W, 3) in [-1, 1], H/W multiples of 256. Returns the
    tanh line map (B, H, W, 1) in [-1, 1]."""
    return _run_block(params["blocks"], 0, pixels.astype(jnp.float32))


def convert_lineart_anime(sd, dtype=jnp.float32) -> Dict[str, Any]:
    """``sd``: convert.hf.StateDict over Anime2Sketch netG.pth ('module.'
    prefixes stripped by the caller or absent). pix2pix nests blocks as
    model.model.1.model.3... — Sequential indices: outermost
    [downconv, submodule, uprelu, upconv, tanh] -> down at model.0, sub at
    model.1, up at model.3; mid blocks [downrelu, downconv, downnorm, sub,
    uprelu, upconv, upnorm] -> down at 1, sub at 3, up at 5; innermost
    [downrelu, downconv, uprelu, upconv, upnorm] -> down at 1, up at 3."""

    def conv_p(prefix, transpose):
        w = sd.get(f"{prefix}.weight")
        b = sd.get(f"{prefix}.bias")
        if transpose:
            w = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)  # (kh,kw,in,out)
        else:
            w = w.transpose(2, 3, 1, 0)
        return {"kernel": jnp.asarray(np.ascontiguousarray(w), dtype),
                "bias": jnp.asarray(b, dtype)}

    blocks = []
    prefix = "model"
    for i in range(NUM_DOWNS):
        outermost = i == 0
        innermost = i == NUM_DOWNS - 1
        if outermost:
            down_idx, sub_idx, up_idx = 0, 1, 3
        elif innermost:
            down_idx, sub_idx, up_idx = 1, None, 3
        else:
            down_idx, sub_idx, up_idx = 1, 3, 5
        blocks.append({
            "down": conv_p(f"{prefix}.{down_idx}", False),
            "up": conv_p(f"{prefix}.{up_idx}", True),
        })
        if sub_idx is not None:
            prefix = f"{prefix}.{sub_idx}.model"
    return {"blocks": blocks}


def detect_lineart_anime(params, image: np.ndarray) -> np.ndarray:
    """RGB image -> (H, W, 3) [0, 1] anime line control image (white lines
    on black after inversion, the layout the anime-lineart ControlNet
    consumes)."""
    img = np.asarray(image)
    if img.dtype == np.uint8 or img.max() > 1.0:
        img = img.astype(np.float32) / 255.0
    h, w = img.shape[:2]
    # the detector rounds the working resolution to 256-multiples
    th = max(((h + 128) // 256) * 256, 256)
    tw = max(((w + 128) // 256) * 256, 256)
    small = np.asarray(jax.image.resize(
        jnp.asarray(img, jnp.float32), (th, tw, 3), "bilinear"
    ))
    out = np.asarray(jax.jit(lineart_anime_apply)(
        params, jnp.asarray(small * 2.0 - 1.0)[None]
    ))[0, :, :, 0]
    line = (out + 1.0) * 0.5  # tanh -> [0, 1], dark lines
    line = np.asarray(jax.image.resize(jnp.asarray(line), (h, w),
                                       "bilinear"))
    return np.stack([1.0 - line] * 3, -1).astype(np.float32)

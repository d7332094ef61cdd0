"""Lineart detector (informative-drawings Generator).

The reference's "Lineart" control preprocessor runs controlnet_aux's
LineartDetector (reference: source/app.py:729-733), the
informative-drawings ``Generator(3, 1, 3)``: reflection-padded 7x7 stem,
two stride-2 downsamples, 3 residual blocks, two ConvTranspose upsamples,
7x7 head + sigmoid — all with affine-free InstanceNorm. Both the 'default'
(sk_model.pth) and 'coarse' (sk_model2.pth) weights share this layout.

The ConvTranspose math is verified against torch.nn.functional
.conv_transpose2d (tests/test_preprocess.py).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

# down channels 64 -> 128 -> 256, n_residual = 3 for the shipped models
_STEM = 64
_N_RES = 3


def _reflect_pad(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


def _conv(pa, x, stride=1):
    return jax.lax.conv_general_dilated(
        x, pa["kernel"].astype(x.dtype), (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + pa["bias"].astype(x.dtype)


def _instance_norm(x, eps=1e-5):
    """nn.InstanceNorm2d default: per-sample, per-channel, no affine."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = xf.var(axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def conv_transpose_s2(pa, x):
    """torch ConvTranspose2d(k=3, stride=2, padding=1, output_padding=1):
    insert zeros between inputs (lhs_dilation=2), pad (1, 2), and convolve
    with the spatially-flipped kernel. torch weight (in, out, kh, kw) is
    stored here already transposed+flipped as HWIO (see convert_lineart)."""
    return jax.lax.conv_general_dilated(
        x, pa["kernel"].astype(x.dtype), (1, 1),
        [(1, 2), (1, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + pa["bias"].astype(x.dtype)


def _conv_init(key, kh, i, o, dtype):
    return {
        "kernel": (jax.random.normal(key, (kh, kh, i, o), jnp.float32)
                   / np.sqrt(kh * kh * i)).astype(dtype),
        "bias": jnp.zeros((o,), dtype),
    }


def lineart_init(key, dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 32))
    c = _STEM
    params: Dict[str, Any] = {
        "stem": _conv_init(next(keys), 7, 3, c, dtype),
        "down": [
            _conv_init(next(keys), 3, c, 2 * c, dtype),
            _conv_init(next(keys), 3, 2 * c, 4 * c, dtype),
        ],
        "res": [
            {
                "conv1": _conv_init(next(keys), 3, 4 * c, 4 * c, dtype),
                "conv2": _conv_init(next(keys), 3, 4 * c, 4 * c, dtype),
            }
            for _ in range(_N_RES)
        ],
        "up": [
            _conv_init(next(keys), 3, 4 * c, 2 * c, dtype),
            _conv_init(next(keys), 3, 2 * c, c, dtype),
        ],
        "head": _conv_init(next(keys), 7, c, 1, dtype),
    }
    return params


def lineart_apply(params, pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels (B, H, W, 3) RGB in [0, 1], H/W multiples of 4. Returns the
    sigmoid line map (B, H, W, 1)."""
    x = pixels.astype(jnp.float32)
    h = _conv(params["stem"], _reflect_pad(x, 3))
    h = jax.nn.relu(_instance_norm(h))
    for dp in params["down"]:
        # the downsampling convs use plain zero padding (nn.Conv2d
        # padding=1), unlike the reflection-padded stem/res/head convs
        h = _conv(dp, jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0))),
                  stride=2)
        h = jax.nn.relu(_instance_norm(h))
    for rp in params["res"]:
        r = _conv(rp["conv1"], _reflect_pad(h, 1))
        r = jax.nn.relu(_instance_norm(r))
        r = _conv(rp["conv2"], _reflect_pad(r, 1))
        r = _instance_norm(r)
        h = h + r
    for up in params["up"]:
        h = conv_transpose_s2(up, h)
        h = jax.nn.relu(_instance_norm(h))
    out = _conv(params["head"], _reflect_pad(h, 3))
    return jax.nn.sigmoid(out)


def convert_lineart(sd, dtype=jnp.float32) -> Dict[str, Any]:
    """``sd``: convert.hf.StateDict over sk_model.pth / sk_model2.pth
    (informative-drawings Generator Sequential indices: model0.1 stem,
    model1.{0,3} downs, model2.{i}.conv_block.{1,5} residuals,
    model3.{0,3} ups (ConvTranspose), model4.1 head)."""

    def _c(name):
        return {
            "kernel": jnp.asarray(
                sd.get(f"{name}.weight").transpose(2, 3, 1, 0), dtype),
            "bias": jnp.asarray(sd.get(f"{name}.bias"), dtype),
        }

    def _ct(name):
        # torch ConvTranspose weight (in, out, kh, kw) -> flip spatial,
        # swap to HWIO with I=in (the lhs-dilated conv contracts over in)
        w = sd.get(f"{name}.weight")[:, :, ::-1, ::-1]
        return {
            "kernel": jnp.asarray(w.transpose(2, 3, 0, 1), dtype),
            "bias": jnp.asarray(sd.get(f"{name}.bias"), dtype),
        }

    return {
        "stem": _c("model0.1"),
        "down": [_c("model1.0"), _c("model1.3")],
        "res": [
            {
                "conv1": _c(f"model2.{i}.conv_block.1"),
                "conv2": _c(f"model2.{i}.conv_block.5"),
            }
            for i in range(_N_RES)
        ],
        "up": [_ct("model3.0"), _ct("model3.3")],
        "head": _c("model4.1"),
    }


def detect_lineart(params, image: np.ndarray,
                   invert_output: bool = True) -> np.ndarray:
    """RGB image -> (H, W, 3) [0, 1] line control image. The detector emits
    dark-on-light lines; ``invert_output`` gives the white-on-black map the
    Lineart ControlNet consumes (controlnet_aux returns 255 - map)."""
    img = np.asarray(image)
    if img.dtype == np.uint8 or img.max() > 1.0:
        img = img.astype(np.float32) / 255.0
    img = img.astype(np.float32)
    h, w = img.shape[:2]
    ph, pw = (-h) % 4, (-w) % 4
    padded = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
    line = np.asarray(
        jax.jit(lineart_apply)(params, jnp.asarray(padded)[None])
    )[0, :h, :w, 0]
    if invert_output:
        line = 1.0 - line
    return np.stack([line] * 3, -1)

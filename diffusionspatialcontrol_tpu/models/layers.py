"""Functional NN layers: init fns build pytree params, apply fns are pure.

All convolutions use NHWC layout (TPU-native). Normalization statistics are
computed in float32 regardless of the activation dtype; matmuls request float32
accumulation on the MXU via ``preferred_element_type``.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from jax import lax


def _split(key, n):
    return jax.random.split(key, n)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------


def linear_init(key, in_features: int, out_features: int, bias: bool = True,
                dtype=jnp.bfloat16):
    kw, _ = _split(key, 2)
    bound = 1.0 / math.sqrt(in_features)
    p = {
        "kernel": jax.random.uniform(
            kw, (in_features, out_features), jnp.float32, -bound, bound
        ).astype(dtype)
    }
    if bias:
        p["bias"] = jnp.zeros((out_features,), dtype)
    return p


def linear(p, x):
    y = jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Conv2D (NHWC, HWIO kernel)
# ---------------------------------------------------------------------------


def conv_init(key, in_channels: int, out_channels: int, kernel_size: int = 3,
              dtype=jnp.bfloat16, zero: bool = False):
    kw, _ = _split(key, 2)
    fan_in = in_channels * kernel_size * kernel_size
    bound = 1.0 / math.sqrt(fan_in)
    if zero:
        kernel = jnp.zeros(
            (kernel_size, kernel_size, in_channels, out_channels), dtype
        )
    else:
        kernel = jax.random.uniform(
            kw,
            (kernel_size, kernel_size, in_channels, out_channels),
            jnp.float32,
            -bound,
            bound,
        ).astype(dtype)
    return {"kernel": kernel, "bias": jnp.zeros((out_channels,), dtype)}


def conv2d(p, x, stride: int = 1, padding="SAME", preferred=jnp.float32):
    """NHWC conv. ``preferred`` sets the requested output/accumulation
    element type (MXU accumulation is fp32 internally either way; None =
    keep the input dtype, which skips the fp32 epilogue round-trip — the
    ``conv_impl="xla_bf16"`` A/B variant, benchmarks/ab_conv_dtype.py)."""
    pref = x.dtype if preferred is None else preferred
    y = lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pref,
    )
    y = y + p["bias"].astype(pref)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def norm_init(num_channels: int, dtype=jnp.bfloat16):
    return {
        "scale": jnp.ones((num_channels,), dtype),
        "bias": jnp.zeros((num_channels,), dtype),
    }


def group_norm(p, x, num_groups: int = 32, eps: float = 1e-5):
    """GroupNorm over the channel (last) axis of NHWC / NLC tensors.

    Entirely in float32 (the reference relies on torch GroupNorm which also
    accumulates in fp32 under autocast). Measured: applying the
    normalization in bf16 with fp32 stats is ~7% SLOWER end-to-end — XLA
    fuses the uniform-fp32 chain into neighboring ops better than the
    mixed-dtype variant — so keep this fp32 throughout."""
    orig_dtype = x.dtype
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    shape = x.shape[:-1] + (num_groups, c // num_groups)
    xg = xf.reshape(shape)
    # Reduce over all non-batch spatial dims and the intra-group channel dim.
    axes = tuple(range(1, len(shape) - 2)) + (len(shape) - 1,)
    mean = xg.mean(axes, keepdims=True)
    var = xg.var(axes, keepdims=True)
    xg = (xg - mean) * lax.rsqrt(var + eps)
    xf = xg.reshape(x.shape)
    out = xf * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def layer_norm(p, x, eps: float = 1e-5):
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    out = (xf - mean) * lax.rsqrt(var + eps)
    out = out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def silu(x):
    return jax.nn.silu(x)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


ACTIVATIONS = {"quick_gelu": quick_gelu, "gelu": gelu, "silu": silu}


# ---------------------------------------------------------------------------
# Timestep (sinusoidal) embedding
# ---------------------------------------------------------------------------


def timestep_embedding(t, dim: int, flip_sin_to_cos: bool = True,
                       freq_shift: float = 0.0, max_period: float = 10000.0):
    """Sinusoidal embedding of (possibly fractional) timesteps.

    Matches diffusers ``get_timestep_embedding`` semantics used by the vendored
    UNet (reference: source/modules/u_net_condition_modify.py:1040 forward via
    Timesteps module): half sin / half cos, optional flip."""
    t = jnp.asarray(t, jnp.float32)
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - freq_shift)
    )
    args = t[..., None] * freqs
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin], -1) if flip_sin_to_cos else jnp.concatenate(
        [sin, cos], -1
    )
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb

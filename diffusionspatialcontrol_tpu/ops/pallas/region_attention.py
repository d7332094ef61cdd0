"""Pallas fused region-biased cross-attention kernel.

Computes softmax(scale*QK^T + region*(sigma*std))V in one pass over VMEM
tiles — logits never touch HBM. The global std of the logits tensor comes
from the closed-form Gram reduction (ops.attention.logits_std_gram), so no
second pass over QK^T is needed either; the reference instead materializes
the full logits tensor to take ``.std()``
(source/modules/attention_modify.py:90-95 — its measured ~9% overhead,
README.md:65).

Grid: (B*H, L/BLOCK_L). Cross-attention S (77*chunks <= ~308) and D
(<= 160) both fit VMEM after padding to lane multiples; the bias row block
is indexed by batch (b = program // H), which broadcasts the region bias
over heads exactly like the reference's repeat_interleave
(attention_modify.py:96-99).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..attention import logits_std_gram, logits_std_gram_nlhd

try:  # pltpu only exists on TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _MEMSPACE = dict(memory_space=pltpu.VMEM)
except Exception:  # pragma: no cover - CPU fallback (interpret mode)
    pltpu = None
    _MEMSPACE = {}


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (BL, Dp)
    k = k_ref[0].astype(jnp.float32)  # (Sp, Dp)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale + bias_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0].astype(jnp.float32)
    out = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = (out / denom).astype(out_ref.dtype)


def region_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     region_state: jnp.ndarray, sigma: jnp.ndarray,
                     weight_scale: float = 1.0,
                     interpret: bool | None = None,
                     axis_name: str | None = None) -> jnp.ndarray:
    """Drop-in replacement for ops.attention.region_attention.

    q: (B, H, L, D); k, v: (B, H, S, D); region_state: (B, L, S)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, l, d = q.shape
    s_len = k.shape[2]
    scale = d**-0.5

    if axis_name is None:
        std = logits_std_gram(q, k, scale)
    else:
        from ..attention import logits_std_gram_nlhd

        std = logits_std_gram_nlhd(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), scale,
            axis_name=axis_name,
        )
    w = region_state.astype(jnp.float32) * (
        jnp.float32(weight_scale) * sigma.astype(jnp.float32) * std
    )

    block_l = min(512, _round_up(l, 128))
    d_pad = _round_up(d, 128)
    s_pad = _round_up(s_len, 128)
    l_pad = _round_up(l, block_l)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, l_pad - l), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, s_pad - s_len), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - s_len), (0, d_pad - d)))
    # padded key columns get -1e9 bias so softmax ignores them
    wp = jnp.pad(w, ((0, 0), (0, l_pad - l), (0, 0)))
    wp = jnp.pad(wp, ((0, 0), (0, 0), (0, s_pad - s_len)),
                 constant_values=-1e9)

    qp = qp.reshape(b * h, l_pad, d_pad)
    kp = kp.reshape(b * h, s_pad, d_pad)
    vp = vp.reshape(b * h, s_pad, d_pad)

    grid = (b * h, l_pad // block_l)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, l_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_l, d_pad), lambda i, j: (i, j, 0),
                         **_MEMSPACE),
            pl.BlockSpec((1, s_pad, d_pad), lambda i, j: (i, 0, 0),
                         **_MEMSPACE),
            pl.BlockSpec((1, s_pad, d_pad), lambda i, j: (i, 0, 0),
                         **_MEMSPACE),
            pl.BlockSpec((1, block_l, s_pad), lambda i, j: (i // h, j, 0),
                         **_MEMSPACE),
        ],
        out_specs=pl.BlockSpec((1, block_l, d_pad), lambda i, j: (i, j, 0),
                               **_MEMSPACE),
        interpret=interpret,
    )(qp, kp, vp, wp)

    return out.reshape(b, h, l_pad, d_pad)[:, :, :l, :d]


def region_attention_nlhd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          region_state: jnp.ndarray, sigma: jnp.ndarray,
                          weight_scale: float = 1.0,
                          interpret: bool | None = None,
                          axis_name: str | None = None) -> jnp.ndarray:
    """BTNH entry point (see flash_attention_nlhd on why this transposes
    rather than head-slicing with a 4D BlockSpec). ``axis_name``: psum the
    global-std moments inside shard_map."""
    out = region_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), region_state, sigma,
        weight_scale=weight_scale, interpret=interpret,
        axis_name=axis_name,
    )
    return out.transpose(0, 2, 1, 3)

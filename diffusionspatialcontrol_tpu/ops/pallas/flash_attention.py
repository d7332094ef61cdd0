"""Pallas self-attention kernel (no bias), SD latent scale.

At SD resolutions the whole K/V (L <= ~9216 at 768^2) fits VMEM, so the
kernel computes each query tile's full logits row block in VMEM with a
single-pass softmax — simpler than online flash accumulation and equally
HBM-optimal here (logits never leave VMEM). Replaces the reference's
xformers / torch-SDPA fused kernels (attention_modify.py:177-184, 483).

For very large L (>16k), fall back to jax.nn.dot_product_attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _MEMSPACE = dict(memory_space=pltpu.VMEM)
except Exception:  # pragma: no cover
    pltpu = None
    _MEMSPACE = {}


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float, s_valid: int):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    s_pad = k.shape[0]
    if s_valid < s_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < s_valid, s, -1e9)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0].astype(jnp.float32)
    out = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = (out / denom).astype(out_ref.dtype)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    interpret: bool | None = None) -> jnp.ndarray:
    """q: (B, H, L, D); k, v: (B, H, S, D) -> (B, H, L, D)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, l, d = q.shape
    s_len = k.shape[2]
    scale = d**-0.5
    d_pad = _round_up(d, 128)
    s_pad = _round_up(s_len, 128)

    # Fit the per-program working set (fp32 logits tile + bf16 K/V + q/out)
    # in a conservative VMEM budget; shrink the query tile as S grows.
    vmem_budget = 12 * 2**20
    kv_bytes = 2 * s_pad * d_pad * 2
    block_l = 512
    while block_l > 128:
        logits_bytes = block_l * s_pad * 4
        io_bytes = block_l * d_pad * 8
        if kv_bytes + logits_bytes + io_bytes <= vmem_budget:
            break
        block_l //= 2
    if kv_bytes + block_l * s_pad * 4 + block_l * d_pad * 8 > vmem_budget:
        # K/V alone too large for single-pass: fall back to XLA's fused path
        out = jax.nn.dot_product_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
        )
        return out.transpose(0, 2, 1, 3)
    block_l = min(block_l, _round_up(l, 128))
    l_pad = _round_up(l, block_l)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, l_pad - l), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, s_pad - s_len), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - s_len), (0, d_pad - d)))
    qp = qp.reshape(b * h, l_pad, d_pad)
    kp = kp.reshape(b * h, s_pad, d_pad)
    vp = vp.reshape(b * h, s_pad, d_pad)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, s_valid=s_len),
        out_shape=jax.ShapeDtypeStruct((b * h, l_pad, d_pad), q.dtype),
        grid=(b * h, l_pad // block_l),
        in_specs=[
            pl.BlockSpec((1, block_l, d_pad), lambda i, j: (i, j, 0),
                         **_MEMSPACE),
            pl.BlockSpec((1, s_pad, d_pad), lambda i, j: (i, 0, 0),
                         **_MEMSPACE),
            pl.BlockSpec((1, s_pad, d_pad), lambda i, j: (i, 0, 0),
                         **_MEMSPACE),
        ],
        out_specs=pl.BlockSpec((1, block_l, d_pad), lambda i, j: (i, j, 0),
                               **_MEMSPACE),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, l_pad, d_pad)[:, :, :l, :d]

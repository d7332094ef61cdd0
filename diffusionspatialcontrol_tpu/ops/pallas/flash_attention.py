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


def _stream_kernel(q_ref, k_ref, v_ref, out_ref, m_ref, l_ref, acc_ref, *,
                   scale: float, s_valid: int, block_s: int):
    """Online-softmax flash attention: grid (BH, L/bl, S/bs); running
    max/denominator/accumulator in VMEM scratch persist across the
    innermost (KV) grid dimension."""
    j = pl.program_id(2)
    n_j = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_s
    s = jnp.where(col < s_valid, s, -1e30)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0].astype(jnp.float32)
    pv = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = m_new

    @pl.when(j == n_j - 1)
    def _():
        out_ref[0] = (acc_ref[:] / l_ref[:]).astype(out_ref.dtype)


_LOG2E = 1.4426950408889634


def _kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float, s_valid: int,
            qk_bf16: bool = False, pv_bf16: bool = False,
            use_exp2: bool = False):
    """``qk_bf16``: feed the QK^T dot its native bf16 operands (fp32
    accumulation via preferred_element_type — bf16 products are exact, so
    this only changes accumulation order) instead of pre-casting to fp32,
    which forces the MXU's slow fp32 path. ``pv_bf16``: round the softmax
    probabilities to bf16 for the P·V dot (the standard flash-kernel
    choice; ~8e-3 relative rounding on p). ``use_exp2``: fold the
    softmax's exp into exp2 (what the VPU implements natively)."""
    q = q_ref[0]
    k = k_ref[0]
    if not qk_bf16:
        q = q.astype(jnp.float32)
        k = k.astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    s_pad = k.shape[0]
    if s_valid < s_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < s_valid, s, -1e9)
    m = jnp.max(s, axis=-1, keepdims=True)
    if use_exp2:
        p = jnp.exp2((s - m) * _LOG2E)
    else:
        p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    if pv_bf16:
        pd = p.astype(jnp.bfloat16)
        v = v_ref[0]
    else:
        pd = p
        v = v_ref[0].astype(jnp.float32)
    out = jax.lax.dot_general(
        pd, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = (out / denom).astype(out_ref.dtype)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    interpret: bool | None = None,
                    block_l: int | None = None,
                    vmem_budget: int | None = None,
                    qk_bf16: bool = False,
                    pv_bf16: bool = False,
                    use_exp2: bool = False) -> jnp.ndarray:
    """q: (B, H, L, D); k, v: (B, H, S, D) -> (B, H, L, D).

    ``block_l`` / ``vmem_budget`` override the query-tile heuristic (used
    by benchmarks/tune_flash.py sweeps); production callers leave them
    unset."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, l, d = q.shape
    s_len = k.shape[2]
    scale = d**-0.5
    d_pad = _round_up(d, 128)
    s_pad = _round_up(s_len, 128)

    # Fit the per-program working set (fp32 logits tile + bf16 K/V + q/out)
    # in a conservative VMEM budget; shrink the query tile as S grows.
    if vmem_budget is None:
        vmem_budget = 12 * 2**20
    kv_bytes = 2 * s_pad * d_pad * 2
    if block_l is None:
        block_l = 512
        while block_l > 128:
            logits_bytes = block_l * s_pad * 4
            io_bytes = block_l * d_pad * 8
            if kv_bytes + logits_bytes + io_bytes <= vmem_budget:
                break
            block_l //= 2
    if kv_bytes + block_l * s_pad * 4 + block_l * d_pad * 8 > vmem_budget:
        # K/V too large for the single-pass kernel: stream KV chunks with
        # an online softmax (flash proper) — the only path that works at
        # e.g. 1920x1088 latents (L = 32640, full logits would be 68 GB).
        return _flash_streaming(q, k, v, scale, d_pad, interpret)
    block_l = min(block_l, _round_up(l, 128))
    l_pad = _round_up(l, block_l)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, l_pad - l), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, s_pad - s_len), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - s_len), (0, d_pad - d)))
    qp = qp.reshape(b * h, l_pad, d_pad)
    kp = kp.reshape(b * h, s_pad, d_pad)
    vp = vp.reshape(b * h, s_pad, d_pad)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, s_valid=s_len,
                          qk_bf16=qk_bf16, pv_bf16=pv_bf16,
                          use_exp2=use_exp2),
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


def _flash_streaming(q, k, v, scale, d_pad, interpret,
                     block_l: int = 512, block_s: int = 1024):
    # block_l=512 from the round-5 tune sweep at the 1920x1088 level-0
    # shape (L=32640): 4071 ms vs 4399 (bl=256), 5105 (bl=128), 6469
    # (bs=2048), 4763 (bs=512) for the 20-iter scan — benchmarks/
    # tune_flash.py, /tmp/tune_flash_r5.log (PERF.md round 5).
    b, h, l, d = q.shape
    s_len = k.shape[2]
    l_pad = _round_up(l, block_l)
    s_pad = _round_up(s_len, block_s)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, l_pad - l), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, s_pad - s_len), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - s_len), (0, d_pad - d)))
    qp = qp.reshape(b * h, l_pad, d_pad)
    kp = kp.reshape(b * h, s_pad, d_pad)
    vp = vp.reshape(b * h, s_pad, d_pad)

    scratch = [
        pltpu.VMEM((block_l, 1), jnp.float32),
        pltpu.VMEM((block_l, 1), jnp.float32),
        pltpu.VMEM((block_l, d_pad), jnp.float32),
    ] if pltpu is not None else [
        # interpret mode accepts plain shapes via pltpu-less fallback
        jax.ShapeDtypeStruct((block_l, 1), jnp.float32),
        jax.ShapeDtypeStruct((block_l, 1), jnp.float32),
        jax.ShapeDtypeStruct((block_l, d_pad), jnp.float32),
    ]

    out = pl.pallas_call(
        functools.partial(_stream_kernel, scale=scale, s_valid=s_len,
                          block_s=block_s),
        out_shape=jax.ShapeDtypeStruct((b * h, l_pad, d_pad), q.dtype),
        grid=(b * h, l_pad // block_l, s_pad // block_s),
        in_specs=[
            pl.BlockSpec((1, block_l, d_pad), lambda i, li, j: (i, li, 0),
                         **_MEMSPACE),
            pl.BlockSpec((1, block_s, d_pad), lambda i, li, j: (i, j, 0),
                         **_MEMSPACE),
            pl.BlockSpec((1, block_s, d_pad), lambda i, li, j: (i, j, 0),
                         **_MEMSPACE),
        ],
        out_specs=pl.BlockSpec((1, block_l, d_pad),
                               lambda i, li, j: (i, li, 0), **_MEMSPACE),
        scratch_shapes=scratch,
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, l_pad, d_pad)[:, :, :l, :d]


def flash_attention_nlhd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         interpret: bool | None = None,
                         **variant) -> jnp.ndarray:
    """BTNH ((B, L, H, D)) entry point. Mosaic requires the last two block
    dims to be (8k, 128k)-aligned or full, so a head-slicing 4D BlockSpec
    on BTNH arrays is not lowerable; transpose to BHLD here and reuse the
    validated 3D kernel (one transpose per operand — the same count the
    BHLD layout paid at the head-split). ``variant``: qk_bf16 / pv_bf16 /
    use_exp2 kernel options (see ``_kernel``)."""
    out = flash_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), interpret=interpret, **variant,
    )
    return out.transpose(0, 2, 1, 3)

"""Fused affine+SiLU+3x3-conv Pallas kernel for the UNet resnet hot path.

The reference runs each resnet block as separate cuDNN/torch kernels
(GroupNorm -> SiLU -> Conv2d -> +temb -> GroupNorm -> SiLU -> Conv2d -> +skip,
reference: source/modules/u_net_condition_modify.py resnet blocks via
diffusers ResnetBlock2D). On TPU the conv FLOPs are MXU work but the
elementwise chain around them is HBM-bandwidth work that XLA cannot fuse
*into* a convolution op — profiling shows ~17.6 ms/step of conv+GN+SiLU
fusions vs 5.1 ms of attention kernels at 512^2 (PERF.md).

This kernel performs, in ONE pass over HBM:

    out = conv3x3(silu(x * scale + bias)) + conv_bias [+ channel_bias] [+ skip]

where ``scale``/``bias`` are the *folded* GroupNorm affine per (batch,
channel) — the group statistics are a cheap XLA reduction done by the caller
(`fold_group_norm`), so the normalized and activated tensors never hit HBM.

Layout strategy (TPU-first):

  * the input is zero-padded spatially and flattened to rows of the padded
    grid: (B, M, C_in) with M = (H+2)*(W+2). A 3x3 tap at offset (dy, dx)
    is then a pure ROW SHIFT by dy*(W+2)+dx in this space.
  * grid = (B, C_out tiles, C_in chunks) with the contraction chunks
    innermost: an fp32 accumulator in VMEM scratch persists across the
    C_in chunks (same pattern as the streaming flash kernel), so
    arbitrarily wide inputs (up-block concats reach C_in=2560) stream
    through a bounded working set.
  * per chunk, the kernel recomputes the folded-GN affine + SiLU on its
    C_in slice (VPU work, never materialized), then for each of the 9 taps
    computes P = act @ K[tap] on the MXU and accumulates
    ``pltpu.roll(P, M - offset)`` — a native sublane rotation. Rolled-in
    wraparound rows land only in padding rows (y >= H), which the caller
    slices away, so no accumulator masking is needed.
  * activations of the zero padding are forced back to zero inside the
    kernel (silu(0*scale+bias) != 0) with an iota-derived border mask.
  * C_in and C_out are padded to lane multiples in XLA (zero weights/scale
    make the padding inert); the padded reshape fuses into the pad.

VMEM-fit of (M, tile) blocks is checked statically; callers fall back to
the XLA path (`conv2d` on materialized activations) when even the smallest
tiling would not fit (very large latents) or off-TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover - import guard mirrors flash_attention.py
    from jax.experimental.pallas import tpu as pltpu

    _MEMSPACE = dict(memory_space=pltpu.VMEM)
except Exception:  # pragma: no cover
    pltpu = None
    _MEMSPACE = {}


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def fold_group_norm(p, x, num_groups: int = 32, eps: float = 1e-5):
    """Fold GroupNorm statistics + affine into per-(batch, channel) scale and
    bias, so ``x * scale + bias == group_norm(p, x)`` exactly (same fp32
    math as layers.group_norm). Returns (scale, bias), each (B, C) fp32."""
    b = x.shape[0]
    c = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean = xf.mean(axis=(1, 3))  # (B, G)
    var = xf.var(axis=(1, 3))
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, c // num_groups, axis=1)
    rstd_c = jnp.repeat(rstd, c // num_groups, axis=1)
    gamma = p["scale"].astype(jnp.float32)[None]
    beta = p["bias"].astype(jnp.float32)[None]
    scale = gamma * rstd_c
    bias = beta - mean_c * scale
    return scale, bias


def _roll_up(p, off):
    """Shift rows up by ``off`` (row r reads r+off), wraparound into the
    discarded padding rows only."""
    if not off:
        return p
    if pltpu is not None:
        return pltpu.roll(p, p.shape[0] - off, 0)
    return jnp.roll(p, -off, 0)


def _kernel(x_ref, scale_ref, bias_ref, w_ref, cb_ref, xb_ref, skip_ref,
            out_ref, acc_ref, *, offsets, h: int, w: int,
            has_xb: bool, has_skip: bool):
    wp2 = w + 2
    k_idx = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _():
        if has_skip:
            acc_ref[:] = skip_ref[0].astype(jnp.float32)
        else:
            acc_ref[:] = jnp.zeros_like(acc_ref)

    xv = x_ref[0].astype(jnp.float32)  # (M_pad, c_in_t)
    m = xv.shape[0]
    act = xv * scale_ref[0] + bias_ref[0]
    act = act * jax.nn.sigmoid(act)  # SiLU in fp32
    # Zero the one-pixel border: rows y in {0, H+1}+ or cols x in {0, W+1}.
    r = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    y = r // wp2
    xcol = r - y * wp2
    interior = ((y >= 1) & (y <= h) & (xcol >= 1) & (xcol <= w))
    act = jnp.where(interior, act, 0.0).astype(x_ref.dtype)

    acc = jnp.zeros_like(acc_ref)
    for tap, off in enumerate(offsets):
        p = jax.lax.dot_general(
            act, w_ref[tap], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + _roll_up(p, off)
    acc_ref[:] += acc

    @pl.when(k_idx == n_k - 1)
    def _():
        res = acc_ref[:] + cb_ref[0]
        if has_xb:
            res = res + xb_ref[0]
        out_ref[0] = res.astype(out_ref.dtype)


def _kernel_rows(xa_ref, xb_ref_blk, scale_ref, bias_ref, w_ref, cb_ref,
                 xb_ref, skip_ref, out_ref, acc_ref, *, offsets, h: int,
                 w: int, m_t: int, halo: int, has_xb: bool, has_skip: bool):
    """Row-tiled variant for large latents: grid (B, rows, C_out, C_in).
    Each program sees its own M_t-row block plus the NEXT block (same
    array, shifted index map) and activates M_t + halo rows — the ~halo/M_t
    duplicated work buys expressible overlap (Pallas blocks cannot
    overlap). Border masking uses the global row index; nominal halo
    indices past the end of the real grid mask to zero, so the clamped
    last-block duplicate contributes nothing."""
    wp2 = w + 2
    r_idx = pl.program_id(1)
    k_idx = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(k_idx == 0)
    def _():
        if has_skip:
            acc_ref[:] = skip_ref[0].astype(jnp.float32)
        else:
            acc_ref[:] = jnp.zeros_like(acc_ref)

    xv = jnp.concatenate([xa_ref[0], xb_ref_blk[0]], axis=0)[: m_t + halo]
    xv = xv.astype(jnp.float32)
    act = xv * scale_ref[0] + bias_ref[0]
    act = act * jax.nn.sigmoid(act)
    r = (jax.lax.broadcasted_iota(jnp.int32, (m_t + halo, 1), 0)
         + r_idx * m_t)
    y = r // wp2
    xcol = r - y * wp2
    interior = ((y >= 1) & (y <= h) & (xcol >= 1) & (xcol <= w))
    act = jnp.where(interior, act, 0.0).astype(xa_ref.dtype)

    acc = jnp.zeros_like(acc_ref)
    for tap, off in enumerate(offsets):
        p = jax.lax.dot_general(
            act, w_ref[tap], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + _roll_up(p, off)[:m_t]
    acc_ref[:] += acc

    @pl.when(k_idx == n_k - 1)
    def _():
        res = acc_ref[:] + cb_ref[0]
        if has_xb:
            res = res + xb_ref[0]
        out_ref[0] = res.astype(out_ref.dtype)


def _vmem_bytes(m: int, c_in_t: int, c_out_t: int, itemsize: int,
                has_skip: bool) -> int:
    x_b = 2 * m * c_in_t * itemsize  # double-buffered input chunk
    act_b = m * c_in_t * 4  # fp32 affine/SiLU temp (cast reuses p's slot)
    p_b = m * c_out_t * 4
    acc_b = m * c_out_t * 4
    w_b = 2 * 9 * c_in_t * c_out_t * itemsize
    out_b = m * c_out_t * itemsize  # written once, on the last chunk
    sk_b = m * c_out_t * itemsize if has_skip else 0
    return x_b + act_b + p_b + acc_b + w_b + out_b + sk_b


def _pick_tiles(m: int, c_in_pad: int, c_out_pad: int, itemsize: int,
                has_skip: bool, budget: int = 13 * 2**20):
    """Largest (c_in_t, c_out_t) lane-multiple tile pair that fits VMEM,
    preferring wider contraction chunks (fewer roll/accumulate passes)."""
    for c_in_t in (512, 384, 256, 128):
        if c_in_pad % c_in_t:
            continue
        for c_out_t in (512, 384, 256, 128):
            if c_out_pad % c_out_t:
                continue
            if _vmem_bytes(m, c_in_t, c_out_t, itemsize, has_skip) <= budget:
                return c_in_t, c_out_t
    return None


def _vmem_bytes_rows(m_t: int, halo: int, c_in_t: int, c_out_t: int,
                     itemsize: int, has_skip: bool) -> int:
    x_b = 4 * m_t * c_in_t * itemsize  # two block inputs, double-buffered
    act_b = (m_t + halo) * c_in_t * 4
    p_b = (m_t + halo) * c_out_t * 4
    acc_b = m_t * c_out_t * 4
    w_b = 2 * 9 * c_in_t * c_out_t * itemsize
    out_b = m_t * c_out_t * itemsize
    sk_b = m_t * c_out_t * itemsize if has_skip else 0
    return x_b + act_b + p_b + acc_b + w_b + out_b + sk_b


def _pick_row_tiles(halo: int, c_in_pad: int, c_out_pad: int, itemsize: int,
                    has_skip: bool, budget: int = 13 * 2**20):
    for m_t in (4096, 3072, 2048, 1536, 1024, 512):
        if m_t < halo:
            continue
        for c_in_t in (256, 128):
            if c_in_pad % c_in_t:
                continue
            for c_out_t in (256, 128):
                if c_out_pad % c_out_t:
                    continue
                if _vmem_bytes_rows(m_t, halo, c_in_t, c_out_t, itemsize,
                                    has_skip) <= budget:
                    return m_t, c_in_t, c_out_t
    return None


def gn_silu_conv3x3(
    x: jnp.ndarray,  # (B, H, W, C_in)
    scale: jnp.ndarray,  # (B, C_in) fp32 folded GN scale
    bias: jnp.ndarray,  # (B, C_in) fp32 folded GN bias
    kernel: jnp.ndarray,  # (3, 3, C_in, C_out) HWIO
    conv_bias: jnp.ndarray,  # (C_out,)
    channel_bias: Optional[jnp.ndarray] = None,  # (B, C_out), e.g. temb
    skip: Optional[jnp.ndarray] = None,  # (B, H, W, C_out) added to output
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """One-HBM-pass resnet branch op; see module docstring. Returns
    (B, H, W, C_out) in x.dtype. Raises ValueError when the working set
    does not fit VMEM (caller falls back to the XLA path)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c_in = x.shape
    c_out = kernel.shape[-1]
    wp2 = w + 2
    m = (h + 2) * wp2
    m_pad = _round_up(m, 8)
    c_in_pad = _round_up(c_in, 128)
    c_out_pad = _round_up(c_out, 128)
    itemsize = jnp.dtype(x.dtype).itemsize

    has_skip_ = skip is not None
    halo = _round_up(2 * wp2 + 2, 8)
    tiles = _pick_tiles(m_pad, c_in_pad, c_out_pad, itemsize, has_skip_)
    row_tiles = None
    if tiles is None:
        row_tiles = _pick_row_tiles(halo, c_in_pad, c_out_pad, itemsize,
                                    has_skip_)
        if row_tiles is None:
            raise ValueError(
                f"gn_silu_conv3x3 working set too large for VMEM "
                f"(M={m_pad}, C_in={c_in}, C_out={c_out})"
            )
        m_t = row_tiles[0]
        m_pad = _round_up(m, m_t)
        c_in_t, c_out_t = row_tiles[1], row_tiles[2]
    else:
        c_in_t, c_out_t = tiles

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, c_in_pad - c_in)))
    xp = xp.reshape(b, m, c_in_pad)
    if m_pad != m:
        xp = jnp.pad(xp, ((0, 0), (0, m_pad - m), (0, 0)))
    kf = kernel.reshape(9, c_in, c_out)
    kf = jnp.pad(kf, ((0, 0), (0, c_in_pad - c_in), (0, c_out_pad - c_out)))
    # (B, 1, C_in_pad): Mosaic requires 2nd-to-last block dims to be 8k or
    # the full array dim, so per-batch channel vectors travel as 3D.
    scale_p = jnp.pad(scale.astype(jnp.float32),
                      ((0, 0), (0, c_in_pad - c_in)))[:, None, :]
    bias_p = jnp.pad(bias.astype(jnp.float32),
                     ((0, 0), (0, c_in_pad - c_in)))[:, None, :]
    cb = jnp.pad(conv_bias.astype(jnp.float32), (0, c_out_pad - c_out))
    cb = jnp.broadcast_to(cb[None, None], (1, 1, c_out_pad))
    offsets = tuple(dy * wp2 + dx for dy in range(3) for dx in range(3))

    has_xb = channel_bias is not None
    if has_xb:
        xb = jnp.pad(channel_bias.astype(jnp.float32),
                     ((0, 0), (0, c_out_pad - c_out)))[:, None, :]
    else:
        xb = jnp.zeros((b, 1, c_out_pad), jnp.float32)
    has_skip = skip is not None
    if has_skip:
        # skip[y, x] must land at flat padded index y*(W+2)+x (the output's
        # coordinate system), so pad on the trailing edges only.
        skp = jnp.pad(skip, ((0, 0), (0, 2), (0, 2), (0, c_out_pad - c_out)))
        skp = skp.reshape(b, m, c_out_pad)
        if m_pad != m:
            skp = jnp.pad(skp, ((0, 0), (0, m_pad - m), (0, 0)))
        sk_spec = pl.BlockSpec((1, m_pad, c_out_t), lambda i, j, k: (i, 0, j),
                               **_MEMSPACE)
    else:
        skp = jnp.zeros((b, 8, 128), x.dtype)
        sk_spec = pl.BlockSpec((1, 8, 128), lambda i, j, k: (i, 0, 0),
                               **_MEMSPACE)

    if row_tiles is None:
        grid = (b, c_out_pad // c_out_t, c_in_pad // c_in_t)
        scratch = (
            [pltpu.VMEM((m_pad, c_out_t), jnp.float32)]
            if pltpu is not None
            else [jax.ShapeDtypeStruct((m_pad, c_out_t), jnp.float32)]
        )

        out = pl.pallas_call(
            functools.partial(
                _kernel, offsets=offsets, h=h, w=w,
                has_xb=has_xb, has_skip=has_skip,
            ),
            out_shape=jax.ShapeDtypeStruct((b, m_pad, c_out_pad), x.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, m_pad, c_in_t), lambda i, j, k: (i, 0, k),
                             **_MEMSPACE),
                pl.BlockSpec((1, 1, c_in_t), lambda i, j, k: (i, 0, k),
                             **_MEMSPACE),
                pl.BlockSpec((1, 1, c_in_t), lambda i, j, k: (i, 0, k),
                             **_MEMSPACE),
                pl.BlockSpec((9, c_in_t, c_out_t), lambda i, j, k: (0, k, j),
                             **_MEMSPACE),
                pl.BlockSpec((1, 1, c_out_t), lambda i, j, k: (0, 0, j),
                             **_MEMSPACE),
                pl.BlockSpec((1, 1, c_out_t), lambda i, j, k: (i, 0, j),
                             **_MEMSPACE),
                sk_spec,
            ],
            out_specs=pl.BlockSpec((1, m_pad, c_out_t),
                                   lambda i, j, k: (i, 0, j), **_MEMSPACE),
            scratch_shapes=scratch,
            interpret=interpret,
        )(xp, scale_p, bias_p, kf, cb, xb, skp)
    else:
        n_rows = m_pad // m_t
        grid = (b, n_rows, c_out_pad // c_out_t, c_in_pad // c_in_t)
        scratch = (
            [pltpu.VMEM((m_t, c_out_t), jnp.float32)]
            if pltpu is not None
            else [jax.ShapeDtypeStruct((m_t, c_out_t), jnp.float32)]
        )
        if has_skip:
            sk_spec = pl.BlockSpec((1, m_t, c_out_t),
                                   lambda i, r, j, k: (i, r, j), **_MEMSPACE)
        else:
            sk_spec = pl.BlockSpec((1, 8, 128),
                                   lambda i, r, j, k: (i, 0, 0), **_MEMSPACE)
        last = n_rows - 1

        out = pl.pallas_call(
            functools.partial(
                _kernel_rows, offsets=offsets, h=h, w=w, m_t=m_t, halo=halo,
                has_xb=has_xb, has_skip=has_skip,
            ),
            out_shape=jax.ShapeDtypeStruct((b, m_pad, c_out_pad), x.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, m_t, c_in_t),
                             lambda i, r, j, k: (i, r, k), **_MEMSPACE),
                # the next row block (clamped): expressible overlap for the
                # halo rows; nominal indices past the grid mask to zero
                pl.BlockSpec(
                    (1, m_t, c_in_t),
                    lambda i, r, j, k: (i, jnp.minimum(r + 1, last), k),
                    **_MEMSPACE),
                pl.BlockSpec((1, 1, c_in_t), lambda i, r, j, k: (i, 0, k),
                             **_MEMSPACE),
                pl.BlockSpec((1, 1, c_in_t), lambda i, r, j, k: (i, 0, k),
                             **_MEMSPACE),
                pl.BlockSpec((9, c_in_t, c_out_t),
                             lambda i, r, j, k: (0, k, j), **_MEMSPACE),
                pl.BlockSpec((1, 1, c_out_t), lambda i, r, j, k: (0, 0, j),
                             **_MEMSPACE),
                pl.BlockSpec((1, 1, c_out_t), lambda i, r, j, k: (i, 0, j),
                             **_MEMSPACE),
                sk_spec,
            ],
            out_specs=pl.BlockSpec((1, m_t, c_out_t),
                                   lambda i, r, j, k: (i, r, j), **_MEMSPACE),
            scratch_shapes=scratch,
            interpret=interpret,
        )(xp, xp, scale_p, bias_p, kf, cb, xb, skp)

    out = out[:, :m].reshape(b, h + 2, wp2, c_out_pad)
    return out[:, :h, :w, :c_out]


# ---------------------------------------------------------------------------
# v2: shift-free implicit GEMM
# ---------------------------------------------------------------------------
#
# The v1 kernel above accumulates 9 tap matmuls, each followed by a
# ``pltpu.roll`` of the fp32 (M, C_out_t) product — ~9 sublane rotations of
# the *output* per contraction chunk. The recorded A/B (PERF.md round 3)
# shows that shuffle traffic losing ~1.6x to XLA's conv emitter at the
# 512^2 hot shapes. v2 removes every roll:
#
#   * the padded row stride is rounded UP to a sublane multiple
#     (wp2 = round_up(W+2, 8)), so a vertical tap offset dy*wp2 is an
#     8-aligned STATIC row slice — free addressing, no rotation;
#   * the three horizontal taps are folded into the contraction: a patch
#     matrix Q[i] = concat(act[i], act[i+1], act[i+2]) is built once with
#     two bf16 sublane-shifted copies of the *input* (half the bytes of one
#     fp32 output roll), then the conv is exactly THREE MXU dots
#         acc = sum_dy  Q[dy*wp2 : dy*wp2 + M_t] @ Kcat[dy]
#     with Kcat[dy] = concat_dx kernel[dy, dx]  of shape (3*C_in_t, C_out_t)
#     — a 3x deeper K dimension than v1's per-tap dots;
#   * the grid row-tiles M unconditionally (halo rows recomputed, ~2*wp2/M_t
#     duplicated work), giving Mosaic several programs per batch item to
#     double-buffer HBM loads against, where v1's single-slab path ran one
#     program per (batch, C_out tile) with nothing to overlap.
#
# Semantics and VMEM-guard behavior are identical to gn_silu_conv3x3.


def _kernel_v2(xa_ref, xb_blk_ref, scale_ref, bias_ref, w_ref, cb_ref,
               xb_ref, skip_ref, out_ref, acc_ref, *, wp2: int, h: int,
               w: int, m_t: int, has_xb: bool, has_skip: bool):
    r_idx = pl.program_id(1)
    k_idx = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(k_idx == 0)
    def _():
        if has_skip:
            acc_ref[:] = skip_ref[0].astype(jnp.float32)
        else:
            acc_ref[:] = jnp.zeros_like(acc_ref)

    rows = m_t + 2 * wp2 + 2  # taps reach dy*wp2 + dx <= 2*wp2 + 2 ahead
    xv = jnp.concatenate([xa_ref[0], xb_blk_ref[0]], axis=0)[:rows]
    xv = xv.astype(jnp.float32)
    act = xv * scale_ref[0] + bias_ref[0]
    act = act * jax.nn.sigmoid(act)  # SiLU in fp32
    # Zero everything outside the true interior: the one-pixel top/bottom
    # border, the left border column, and the right padding columns
    # (W+1..wp2-1) that widen the row stride to a sublane multiple.
    g = (jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) + r_idx * m_t)
    y = g // wp2
    xcol = g - y * wp2
    interior = (y >= 1) & (y <= h) & (xcol >= 1) & (xcol <= w)
    act = jnp.where(interior, act, 0.0)  # fp32: Mosaic rotate is 32-bit-only

    from jax.experimental.pallas import tpu as pltpu

    rq = m_t + 2 * wp2
    dt = xa_ref.dtype
    # act[d:rq+d] as explicit sublane rotations: a plain shifted slice
    # carries a non-zero sublane offset in its Mosaic layout, and
    # tpu.concatenate on the LANE dim rejects operands whose sublane
    # offsets differ ("offset mismatch on non-concat dimension").
    # pltpu.roll re-materializes each copy at offset 0 (on the fp32 value —
    # "Rotate with non-32-bit data" is unimplemented); the wrapped-around
    # tail rows land past rq and are sliced away. Casts to the compute
    # dtype happen per copy, after the roll.
    # Mosaic-workaround variants, selectable for TPU compile probes
    # (benchmarks/probe_v2_kernel.py). "cast" is the default formulation;
    # "barrier" pins each rolled+cast copy behind an optimization_barrier
    # so the cast cannot fold back into a lazy offset layout; "split"
    # avoids the lane concatenate entirely — one MXU dot per (dy, dx) tap
    # on each rolled copy (9 dots of K=C_in_t instead of 3 of K=3*C_in_t).
    import os as _os

    variant = _os.environ.get("CONV_V2_VARIANT", "dxroll")
    if variant == "dxroll":
        # No input shifts at all: the vertical taps are 8-aligned sublane
        # SLICES of the offset-0 bf16 activation buffer (wp2 is a sublane
        # multiple, so no relayout), and the two horizontal taps become
        # fp32 rotations of the (m_t+2, C_out_t) PRODUCT — the one rotate
        # Mosaic does support (32-bit), and only 2 of them per contraction
        # chunk vs v1's 9. t_kx[j] = sum_ky act[j + ky*wp2] @ W[ky, kx];
        # out[p] = sum_kx t_kx[p + kx].
        actb = act.astype(dt)
        c_in_t = act.shape[-1]
        rq2 = m_t + 2
        acc = None
        for kx in range(3):
            t = None
            for ky in range(3):
                p = jax.lax.dot_general(
                    actb[ky * wp2: ky * wp2 + rq2],
                    w_ref[0, ky, kx * c_in_t:(kx + 1) * c_in_t],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                t = p if t is None else t + p
            t = _roll_up(t, kx)[:m_t]
            acc = t if acc is None else acc + t
    elif variant == "split":
        copies = [act[:rq]] + [
            pltpu.roll(act, rows - d, 0)[:rq] for d in (1, 2)
        ]
        c_in_t = act.shape[-1]
        acc = None
        for dx, cp in enumerate(copies):
            cpb = cp.astype(dt)
            for dy in range(3):
                p = jax.lax.dot_general(
                    cpb[dy * wp2: dy * wp2 + m_t],
                    w_ref[0, dy, dx * c_in_t:(dx + 1) * c_in_t],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = p if acc is None else acc + p
    else:
        shifts = [act[:rq].astype(dt)] + [
            pltpu.roll(act, rows - d, 0)[:rq].astype(dt) for d in (1, 2)
        ]
        if variant == "barrier":
            shifts = list(jax.lax.optimization_barrier(tuple(shifts)))
        q = jnp.concatenate(shifts, axis=1)
        acc = None
        for dy in range(3):
            p = jax.lax.dot_general(
                q[dy * wp2: dy * wp2 + m_t], w_ref[0, dy],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = p if acc is None else acc + p
    acc_ref[:] += acc

    @pl.when(k_idx == n_k - 1)
    def _():
        res = acc_ref[:] + cb_ref[0]
        if has_xb:
            res = res + xb_ref[0]
        out_ref[0] = res.astype(out_ref.dtype)


def _vmem_bytes_v2(m_t: int, wp2: int, c_in_t: int, c_out_t: int,
                   itemsize: int, has_skip: bool) -> int:
    rows = m_t + 2 * wp2 + 2
    x_b = 4 * m_t * c_in_t * itemsize  # two block views, double-buffered
    act_b = rows * c_in_t * 4  # fp32 affine/SiLU temp
    q_b = (m_t + 2 * wp2) * 3 * c_in_t * itemsize
    p_b = m_t * c_out_t * 4
    acc_b = m_t * c_out_t * 4
    w_b = 2 * 9 * c_in_t * c_out_t * itemsize
    out_b = m_t * c_out_t * itemsize
    sk_b = m_t * c_out_t * itemsize if has_skip else 0
    return x_b + act_b + q_b + p_b + acc_b + w_b + out_b + sk_b


def _pick_tiles_v2(m: int, wp2: int, c_in_pad: int, c_out_pad: int,
                   itemsize: int, has_skip: bool,
                   block_rows: Optional[int] = None,
                   budget: int = 12 * 2**20):
    """(m_t, c_out_t, c_in_t) search for the v2 grid. Row-block sizes are
    derived from the actual row count — m_t = round_up(ceil(m / n), 8) for
    ascending block counts n — so small latent levels (8x8 -> m=160) are
    not padded out to a fixed power of two. Blocks must still cover the
    2*wp2+2 tap halo out of the next block (m_t >= 2*wp2+2). First fit
    wins: fewest blocks (least halo recompute), then widest contraction
    chunk, then widest output tile."""
    if block_rows:
        m_opts = [block_rows] if (block_rows % 8 == 0
                                  and block_rows >= 2 * wp2 + 2) else []
    else:
        m_opts = []
        n = 1
        while True:
            m_t = _round_up(-(-m // n), 8)
            if m_t < max(2 * wp2 + 2, 128):
                break
            if not m_opts or m_t < m_opts[-1]:
                m_opts.append(m_t)
            n += 1
    for m_t in m_opts:
        for c_in_t in (512, 384, 256, 128):
            if c_in_pad % c_in_t:
                continue
            for c_out_t in (512, 384, 256, 128):
                if c_out_pad % c_out_t:
                    continue
                if _vmem_bytes_v2(m_t, wp2, c_in_t, c_out_t, itemsize,
                                  has_skip) <= budget:
                    return m_t, c_in_t, c_out_t
    return None


def gn_silu_conv3x3_v2(
    x: jnp.ndarray,  # (B, H, W, C_in)
    scale: jnp.ndarray,  # (B, C_in) fp32 folded GN scale
    bias: jnp.ndarray,  # (B, C_in) fp32 folded GN bias
    kernel: jnp.ndarray,  # (3, 3, C_in, C_out) HWIO
    conv_bias: jnp.ndarray,  # (C_out,)
    channel_bias: Optional[jnp.ndarray] = None,  # (B, C_out), e.g. temb
    skip: Optional[jnp.ndarray] = None,  # (B, H, W, C_out)
    block_rows: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Shift-free implicit-GEMM variant of :func:`gn_silu_conv3x3` (same
    contract; see the v2 block comment above). Raises ValueError when no
    tiling fits VMEM (caller falls back to the XLA path)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c_in = x.shape
    c_out = kernel.shape[-1]
    wp2 = _round_up(w + 2, 8)  # row stride: 8-aligned vertical tap offsets
    m = (h + 2) * wp2
    c_in_pad = _round_up(c_in, 128)
    c_out_pad = _round_up(c_out, 128)
    itemsize = jnp.dtype(x.dtype).itemsize

    has_skip = skip is not None
    has_xb = channel_bias is not None
    tiles = _pick_tiles_v2(m, wp2, c_in_pad, c_out_pad, itemsize, has_skip,
                           block_rows)
    if tiles is None:
        raise ValueError(
            f"gn_silu_conv3x3_v2 working set too large for VMEM "
            f"(wp2={wp2}, C_in={c_in}, C_out={c_out})"
        )
    m_t, c_in_t, c_out_t = tiles
    m_pad = _round_up(m, m_t)
    n_rows = m_pad // m_t
    n_k = c_in_pad // c_in_t

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp2 - w - 1),
                     (0, c_in_pad - c_in)))
    xp = xp.reshape(b, m, c_in_pad)
    if m_pad != m:
        xp = jnp.pad(xp, ((0, 0), (0, m_pad - m), (0, 0)))
    # Kcat[k, dy] = concat_dx kernel[dy, dx, chunk_k, :]: rows match Q's
    # [dx=0 | dx=1 | dx=2] channel-block layout.
    kf = jnp.pad(kernel, ((0, 0), (0, 0), (0, c_in_pad - c_in),
                          (0, c_out_pad - c_out)))
    kf = kf.reshape(3, 3, n_k, c_in_t, c_out_pad)
    kf = kf.transpose(2, 0, 1, 3, 4).reshape(n_k, 3, 3 * c_in_t, c_out_pad)
    scale_p = jnp.pad(scale.astype(jnp.float32),
                      ((0, 0), (0, c_in_pad - c_in)))[:, None, :]
    bias_p = jnp.pad(bias.astype(jnp.float32),
                     ((0, 0), (0, c_in_pad - c_in)))[:, None, :]
    cb = jnp.pad(conv_bias.astype(jnp.float32), (0, c_out_pad - c_out))
    cb = jnp.broadcast_to(cb[None, None], (1, 1, c_out_pad))
    if has_xb:
        xb = jnp.pad(channel_bias.astype(jnp.float32),
                     ((0, 0), (0, c_out_pad - c_out)))[:, None, :]
    else:
        xb = jnp.zeros((b, 1, c_out_pad), jnp.float32)
    if has_skip:
        # skip[y, x] must land at flat index y*wp2 + x (the output's
        # coordinate system): trailing-edge pads only.
        skp = jnp.pad(skip, ((0, 0), (0, 2), (0, wp2 - w),
                             (0, c_out_pad - c_out)))
        skp = skp.reshape(b, m, c_out_pad)
        if m_pad != m:
            skp = jnp.pad(skp, ((0, 0), (0, m_pad - m), (0, 0)))
        sk_spec = pl.BlockSpec((1, m_t, c_out_t),
                               lambda i, r, j, k: (i, r, j), **_MEMSPACE)
    else:
        skp = jnp.zeros((b, 8, 128), x.dtype)
        sk_spec = pl.BlockSpec((1, 8, 128), lambda i, r, j, k: (i, 0, 0),
                               **_MEMSPACE)

    last = n_rows - 1
    grid = (b, n_rows, c_out_pad // c_out_t, n_k)
    scratch = (
        [pltpu.VMEM((m_t, c_out_t), jnp.float32)]
        if pltpu is not None
        else [jax.ShapeDtypeStruct((m_t, c_out_t), jnp.float32)]
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel_v2, wp2=wp2, h=h, w=w, m_t=m_t,
            has_xb=has_xb, has_skip=has_skip,
        ),
        out_shape=jax.ShapeDtypeStruct((b, m_pad, c_out_pad), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, m_t, c_in_t),
                         lambda i, r, j, k: (i, r, k), **_MEMSPACE),
            # next row block (clamped at the end): halo source
            pl.BlockSpec(
                (1, m_t, c_in_t),
                lambda i, r, j, k: (i, jnp.minimum(r + 1, last), k),
                **_MEMSPACE),
            pl.BlockSpec((1, 1, c_in_t), lambda i, r, j, k: (i, 0, k),
                         **_MEMSPACE),
            pl.BlockSpec((1, 1, c_in_t), lambda i, r, j, k: (i, 0, k),
                         **_MEMSPACE),
            pl.BlockSpec((1, 3, 3 * c_in_t, c_out_t),
                         lambda i, r, j, k: (k, 0, 0, j), **_MEMSPACE),
            pl.BlockSpec((1, 1, c_out_t), lambda i, r, j, k: (0, 0, j),
                         **_MEMSPACE),
            pl.BlockSpec((1, 1, c_out_t), lambda i, r, j, k: (i, 0, j),
                         **_MEMSPACE),
            sk_spec,
        ],
        out_specs=pl.BlockSpec((1, m_t, c_out_t),
                               lambda i, r, j, k: (i, r, j), **_MEMSPACE),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * m_pad * 9 * c_in_pad * c_out_pad,
            bytes_accessed=(xp.size * itemsize + kf.size * itemsize
                            + b * m_pad * c_out_pad * itemsize),
            transcendentals=b * m_pad * c_in_pad,
        ),
        interpret=interpret,
    )(xp, xp, scale_p, bias_p, kf, cb, xb, skp)

    out = out[:, :m].reshape(b, h + 2, wp2, c_out_pad)
    return out[:, :h, :w, :c_out]

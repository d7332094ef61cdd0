"""Block-size tuning sweep for the Pallas self-attention kernels.

The production heuristic (flash_attention) shrinks the query tile until
the fp32 logits row block + K/V fit a 12 MB VMEM budget — at 768² level-0
shapes (L = 9216) that lands on block_l = 128. This sweep measures whether
larger tiles (bigger MXU M-dim, fewer grid steps) pay at the shapes behind
the 768² batch-4 target, and tunes the streaming kernel's (block_l,
block_s) at the 1920×1088 shape (L = 32640).

20-iter scans amortize the ~30 ms per-call relay overhead; only
same-sitting ratios are meaningful (CLAUDE.md). Usage:
    python benchmarks/tune_flash.py [single|stream|both]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np

from diffusionspatialcontrol_tpu.ops.pallas.flash_attention import (
    _flash_streaming, flash_attention)

ITERS = int(os.environ.get("TUNE_ITERS", "20"))


def timed(fn, x, n=5):
    np.asarray(fn(x))  # compile + warm
    ts = []
    for i in range(n):
        xi = x * (1.0 + 1e-5 * (i + 1))  # relay caches identical values
        t0 = time.perf_counter()
        np.asarray(fn(xi))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def make_scan(attn_fn, k, v):
    @jax.jit
    def run(q):
        def body(cur, i):
            o = attn_fn(cur, k, v)
            return (o * (1.0 / (1.0 + 1e-6 * i))).astype(cur.dtype), None
        out, _ = jax.lax.scan(body, q, jnp.arange(float(ITERS)))
        return out
    return run


def sweep_single():
    # (label, B*cfg, H, L, D) — level-0 self-attention shapes
    shapes = [
        ("512^2 b1 (L=4096)", 2, 8, 4096, 40),
        ("512^2 b4 (L=4096)", 8, 8, 4096, 40),
        ("768^2 b4 (L=9216)", 8, 8, 9216, 40),
    ]
    for label, b, h, l, d in shapes:
        kq = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq[0], (b, h, l, d)).astype(jnp.bfloat16)
        k = jax.random.normal(kq[1], (b, h, l, d)).astype(jnp.bfloat16)
        v = jax.random.normal(kq[2], (b, h, l, d)).astype(jnp.bfloat16)
        flops = ITERS * b * h * 2 * 2 * l * l * d  # QK^T + PV
        # v5e VMEM is ~128 MB; the production heuristic's 12 MB budget is
        # deliberately conservative — probe much larger query tiles too
        # (fewer grid steps, bigger MXU M-dim per dot).
        for bl, budget in [(None, None), (128, None), (256, 15 * 2**20),
                           (512, 15 * 2**20), (1024, 48 * 2**20),
                           (2048, 96 * 2**20), (4096, 120 * 2**20)]:
            fn = make_scan(
                functools.partial(flash_attention, block_l=bl,
                                  vmem_budget=budget), k, v)
            name = "heuristic" if bl is None else f"block_l={bl}"
            try:
                p50 = timed(fn, q)
            except Exception as e:
                print(f"{label:22s} {name:12s}: FAILED "
                      f"({type(e).__name__}: {str(e)[:90]})", flush=True)
                continue
            print(f"{label:22s} {name:12s}: p50 {p50*1e3:8.1f} ms "
                  f"({flops/p50/1e12:5.1f} TF/s)", flush=True)


def sweep_stream():
    b, h, l, d = 2, 8, 32640, 40  # 1920x1088 level-0
    kq = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(kq[0], (b, h, l, d)).astype(jnp.bfloat16)
    k = jax.random.normal(kq[1], (b, h, l, d)).astype(jnp.bfloat16)
    v = jax.random.normal(kq[2], (b, h, l, d)).astype(jnp.bfloat16)
    flops = ITERS * b * h * 2 * 2 * l * l * d
    scale = d**-0.5
    for bl, bs in [(256, 1024), (128, 1024), (256, 2048), (512, 1024),
                   (256, 512)]:
        fn = make_scan(
            functools.partial(_flash_streaming, scale=scale, d_pad=128,
                              interpret=False, block_l=bl, block_s=bs),
            k, v)
        try:
            p50 = timed(fn, q)
        except Exception as e:
            print(f"stream 1920x1088 bl={bl} bs={bs}: FAILED "
                  f"({type(e).__name__}: {str(e)[:90]})", flush=True)
            continue
        print(f"stream 1920x1088 bl={bl:4d} bs={bs:5d}: p50 "
              f"{p50*1e3:8.1f} ms ({flops/p50/1e12:5.1f} TF/s)", flush=True)


def sweep_dtypes():
    """MXU dtype / exp variants of the single-pass kernel (round 5): the
    original kernel pre-cast q/k/v to fp32, forcing fp32 MXU dots."""
    shapes = [
        ("512^2 b1 (L=4096)", 2, 8, 4096, 40),
        ("512^2 b4 (L=4096)", 8, 8, 4096, 40),
        ("768^2 b4 (L=9216)", 8, 8, 9216, 40),
    ]
    variants = [
        ("f32 dots (orig)", {}),
        ("qk_bf16        ", {"qk_bf16": True}),
        ("qk+pv_bf16     ", {"qk_bf16": True, "pv_bf16": True}),
        ("qk+pv+exp2     ", {"qk_bf16": True, "pv_bf16": True,
                             "use_exp2": True}),
        ("exp2 only      ", {"use_exp2": True}),
    ]
    for label, b, h, l, d in shapes:
        kq = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq[0], (b, h, l, d)).astype(jnp.bfloat16)
        k = jax.random.normal(kq[1], (b, h, l, d)).astype(jnp.bfloat16)
        v = jax.random.normal(kq[2], (b, h, l, d)).astype(jnp.bfloat16)
        flops = ITERS * b * h * 2 * 2 * l * l * d
        for name, kw in variants:
            fn = make_scan(functools.partial(flash_attention, **kw), k, v)
            try:
                p50 = timed(fn, q)
            except Exception as e:
                print(f"{label:22s} {name}: FAILED "
                      f"({type(e).__name__}: {str(e)[:90]})", flush=True)
                continue
            print(f"{label:22s} {name}: p50 {p50*1e3:8.1f} ms "
                  f"({flops/p50/1e12:5.1f} TF/s)", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    print("backend:", jax.default_backend(), flush=True)
    if mode in ("single", "both"):
        sweep_single()
    if mode == "dtypes":
        sweep_dtypes()
    if mode in ("stream", "both"):
        sweep_stream()

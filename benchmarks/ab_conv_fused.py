"""A/B benchmark: fused GN+SiLU+conv3x3 Pallas kernel vs the XLA chain.

Times a 20-iteration scan of a level-0 (64x64x320, B=2) resnet branch pair
— the hot shape of the 512^2 UNet — for both paths, plus a full denoise-step
A/B (conv_impl pallas vs xla, attention pallas in both).

Usage: python benchmarks/ab_conv_fused.py [level0|step]   (TPU; background).
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

from diffusionspatialcontrol_tpu.models.layers import (
    conv2d, conv_init, group_norm, silu,
)
from diffusionspatialcontrol_tpu.ops.pallas.conv_fused import (
    fold_group_norm, gn_silu_conv3x3, gn_silu_conv3x3_v2,
)

ITERS = 20


def bench_level0():
    b, h, w, c = 2, 64, 64, 320
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c)).astype(
        jnp.bfloat16)
    gn = {"scale": jnp.ones((c,), jnp.bfloat16),
          "bias": jnp.zeros((c,), jnp.bfloat16)}
    cv = conv_init(jax.random.PRNGKey(3), c, c, 3, jnp.bfloat16)
    temb = jax.random.normal(jax.random.PRNGKey(4), (b, c), jnp.float32)
    skip = jax.random.normal(jax.random.PRNGKey(5), (b, h, w, c)).astype(
        jnp.bfloat16)

    def make_loop_fused(op, **kw):
        @jax.jit
        def loop_fused(x):
            def body(cur, i):
                s, bi = fold_group_norm(gn, cur, 32)
                hh = op(cur, s, bi, cv["kernel"], cv["bias"],
                        channel_bias=temb, **kw)
                s2, b2 = fold_group_norm(gn, hh, 32)
                o = op(hh, s2, b2, cv["kernel"], cv["bias"],
                       skip=skip, **kw)
                return (o * (1.0 / (1.0 + 1e-6 * i))).astype(cur.dtype), None
            out, _ = jax.lax.scan(body, x, jnp.arange(float(ITERS)))
            return out
        return loop_fused

    @jax.jit
    def loop_ref(x):
        def body(cur, i):
            hh = conv2d(cv, silu(group_norm(gn, cur, 32)))
            hh = hh + temb[:, None, None, :].astype(jnp.bfloat16)
            o = conv2d(cv, silu(group_norm(gn, hh, 32))) + skip
            return (o * (1.0 / (1.0 + 1e-6 * i))).astype(cur.dtype), None
        out, _ = jax.lax.scan(body, x, jnp.arange(float(ITERS)))
        return out

    flops = ITERS * 2 * 2 * b * h * w * c * c * 9  # 2 convs, 2 flops/MAC
    variants = [
        ("xla   ", loop_ref),
        ("fused ", make_loop_fused(gn_silu_conv3x3)),
        ("v2    ", make_loop_fused(gn_silu_conv3x3_v2)),
    ]
    for br in (512, 1224, 2448):  # v2 row-block sweep (m=4752 at 64^2)
        variants.append((f"v2_{br:<4}", make_loop_fused(
            functools.partial(gn_silu_conv3x3_v2, block_rows=br))))
    for name, fn in variants:
        try:
            np.asarray(fn(x))  # compile + run
        except Exception as e:  # per-variant: a Mosaic reject must not
            print(f"{name} level0: COMPILE FAILED "  # kill the sweep
                  f"({type(e).__name__}: {str(e)[:120]})", flush=True)
            continue
        ts = []
        for i in range(5):
            xi = x * (1.0 + 1e-5 * (i + 1))  # relay caches identical values
            t0 = time.perf_counter()
            np.asarray(fn(xi))
            ts.append(time.perf_counter() - t0)
        p50 = sorted(ts)[len(ts) // 2]
        print(f"{name} level0 2-conv x{ITERS}: p50 {p50*1e3:8.2f} ms  "
              f"({flops/p50/1e12:5.1f} TF/s incl ~30ms call overhead)",
              flush=True)


def bench_step():
    from diffusionspatialcontrol_tpu.config import ModelConfig
    from diffusionspatialcontrol_tpu.models import factory
    from diffusionspatialcontrol_tpu.pipeline.pipeline import make_denoise_fn
    from diffusionspatialcontrol_tpu.samplers import schedules

    cfg = ModelConfig()
    params = factory.init_pipeline_params(
        jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    table = schedules.ddpm_sigma_table(cfg)
    log_table = jnp.asarray(np.log(table), jnp.float32)
    context = jax.random.normal(jax.random.PRNGKey(3), (2, 77, 768)).astype(
        jnp.bfloat16)
    biases = tuple(
        jnp.full((2, (64 // 2**i) ** 2, 77), 0.1, jnp.float32)
        for i in range(4))

    def make_loop(conv_impl):
        @jax.jit
        def run(x0):
            denoise = make_denoise_fn(
                params, cfg, context, biases, log_table, 7.5,
                attn_impl="pallas", conv_impl=conv_impl,
                sigma_steps=np.linspace(14.6, 0.03, ITERS),
            )

            def body(x, sigma):
                return (denoise(x, sigma) * 0.98).astype(x.dtype), None

            out, _ = jax.lax.scan(
                body, x0, jnp.asarray(np.linspace(14.6, 0.03, ITERS),
                                      jnp.float32))
            return out
        return run

    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 4),
                           jnp.float32)
    for impl in ["xla", "pallas2", "pallas"]:
        fn = make_loop(impl)
        np.asarray(fn(x0))
        ts = []
        for i in range(5):
            xi = x0 * (1.0 + 1e-5 * (i + 1))
            t0 = time.perf_counter()
            np.asarray(fn(xi))
            ts.append(time.perf_counter() - t0)
        p50 = sorted(ts)[len(ts) // 2]
        print(f"conv_impl={impl}: {ITERS}-step denoise scan p50 "
              f"{p50*1e3:8.1f} ms ({p50/ITERS*1e3:6.2f} ms/step)", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "level0"
    if mode in ("level0", "all"):
        bench_level0()
    if mode in ("step", "all"):
        bench_step()

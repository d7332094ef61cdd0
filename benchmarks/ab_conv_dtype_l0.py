"""Small-program A/B: resnet XLA conv chain, fp32 vs bf16 conv output type.

20-iteration scan of a resnet branch pair at the UNet hot shapes (level-0
64x64x320 B=2, level-1 32x32x640 B=2) and a VAE-decoder top shape
(256x256x128 B=1): preferred_element_type=f32 (default epilogue) vs the
compute dtype ("xla_bf16"). Small programs compile in ~10-120 s even when
the relay's degraded mode kills big ones — use this for direction, the
full-pipeline ab_conv_dtype.py for the decision.

Usage: python benchmarks/ab_conv_dtype_l0.py  (TPU; run in background).
"""

from __future__ import annotations

import json
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

ITERS = 20


def bench_shape(b, h, w, c, groups=32):
    x0 = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c)).astype(
        jnp.bfloat16)
    gn = {"scale": jnp.ones((c,), jnp.bfloat16),
          "bias": jnp.zeros((c,), jnp.bfloat16)}
    cv = conv_init(jax.random.PRNGKey(3), c, c, 3, jnp.bfloat16)
    temb = jax.random.normal(jax.random.PRNGKey(4), (b, c), jnp.float32)
    skip = jax.random.normal(jax.random.PRNGKey(5), (b, h, w, c)).astype(
        jnp.bfloat16)

    def make_loop(pref):
        @jax.jit
        def loop(x):
            def body(cur, i):
                hh = conv2d(cv, silu(group_norm(gn, cur, groups)),
                            preferred=pref)
                hh = hh + temb[:, None, None, :].astype(jnp.bfloat16)
                o = conv2d(cv, silu(group_norm(gn, hh, groups)),
                           preferred=pref) + skip
                return (o * (1.0 / (1.0 + 1e-6 * i))).astype(cur.dtype), None
            out, _ = jax.lax.scan(body, x, jnp.arange(float(ITERS)))
            return out
        return loop

    flops = ITERS * 2 * 2 * b * h * w * c * c * 9
    out = {}
    for name, pref in (("f32", jnp.float32), ("bf16", None)):
        fn = make_loop(pref)
        np.asarray(fn(x0))  # compile + warm
        ts = []
        for i in range(7):
            xs = x0 * (1.0 + 1e-3 * (i + 1))  # defeat relay value-caching
            t0 = time.perf_counter()
            np.asarray(fn(xs))
            ts.append(time.perf_counter() - t0)
        p50 = float(np.percentile(ts, 50))
        out[name] = {"ms": round(p50 * 1e3, 2),
                     "tflops": round(flops / p50 / 1e12, 1)}
        print(json.dumps({f"{b}x{h}x{w}x{c}": out}), flush=True)
    return out


def main():
    for (b, h, w, c) in ((2, 64, 64, 320), (2, 32, 32, 640),
                         (1, 256, 256, 128)):
        bench_shape(b, h, w, c)


if __name__ == "__main__":
    main()

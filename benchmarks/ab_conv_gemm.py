"""A/B: XLA conv emitter vs explicit-GEMM reformulations of the 3x3 conv.

The per-step profile (PERF.md) puts ~17.6 ms/step in conv/GN/FF fusions at
~29% MFU — the conv emitter's tiling at UNet shapes is the suspect. Two
pure-XLA reformulations keep the FLOPs identical but hit the MXU as plain
dots, which XLA tiles with its (tuned) GEMM path instead:

  * shift9 — SAME-pad once, then 9 contiguous slices of the padded tensor,
    each reshaped to (B*H*W, C_in) and dotted with the matching kernel tap
    (C_in, C_out); accumulate in fp32. No patch matrix is materialized.
  * im2col — concatenate the 9 slices into (B*H*W, 9*C_in) and do ONE dot
    with the (9*C_in, C_out) reshaped kernel. Bigger K, one MXU call, but
    materializes a 9x input-size patch matrix in HBM.

Both are numerics-checked against lax.conv (fp32) in tests and here on
first run. Timing: 20-iteration lax.scan over a resnet conv pair
(conv -> SiLU -> conv) at the two UNet hot shapes, p50 of 5 scans,
same-sitting ratios only (relay drift dominates across sittings).

Usage: python benchmarks/ab_conv_gemm.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from diffusionspatialcontrol_tpu.models.layers import conv2d, conv_init


def conv3x3_shift9(p, x, preferred=jnp.float32):
    """3x3 SAME conv as 9 shifted (B*H*W, C_in) x (C_in, C_out) dots."""
    b, h, w, cin = x.shape
    k = p["kernel"].astype(x.dtype)  # (3, 3, cin, cout)
    cout = k.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b * h * w, cout), preferred)
    for dy in range(3):
        for dx in range(3):
            sl = jax.lax.slice(
                xp, (0, dy, dx, 0), (b, dy + h, dx + w, cin)
            ).reshape(b * h * w, cin)
            acc = acc + jnp.dot(
                sl, k[dy, dx], preferred_element_type=preferred
            )
    y = acc + p["bias"].astype(preferred)
    return y.reshape(b, h, w, cout).astype(x.dtype)


def conv3x3_im2col(p, x, preferred=jnp.float32):
    """3x3 SAME conv as one (B*H*W, 9*C_in) x (9*C_in, C_out) dot."""
    b, h, w, cin = x.shape
    k = p["kernel"].astype(x.dtype)  # (3, 3, cin, cout)
    cout = k.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [
        jax.lax.slice(xp, (0, dy, dx, 0), (b, dy + h, dx + w, cin))
        for dy in range(3)
        for dx in range(3)
    ]
    patches = jnp.concatenate(taps, axis=-1).reshape(b * h * w, 9 * cin)
    y = jnp.dot(
        patches, k.reshape(9 * cin, cout), preferred_element_type=preferred
    )
    y = y + p["bias"].astype(preferred)
    return y.reshape(b, h, w, cout).astype(x.dtype)


VARIANTS = {
    "xla": lambda p, x: conv2d(p, x),
    "shift9": conv3x3_shift9,
    "im2col": conv3x3_im2col,
}


def resnet_pair_scan(conv_fn, p1, p2, x0, iters=20):
    def body(x, _):
        h = jax.nn.silu(conv_fn(p1, x))
        h = conv_fn(p2, h)
        return (x + h) / jnp.asarray(1.4142, x.dtype), None

    y, _ = jax.lax.scan(body, x0, None, length=iters)
    return y


def main():
    shapes = [
        ("l0_64x64x320_b2", (2, 64, 64, 320)),
        ("l1_32x32x640_b2", (2, 32, 32, 640)),
    ]
    key = jax.random.PRNGKey(0)

    # numerics check (fp32, small shape)
    kp, kx = jax.random.split(key)
    p = conv_init(kp, 16, 16, 3, jnp.float32)
    x = jax.random.normal(kx, (1, 8, 8, 16), jnp.float32)
    ref = np.asarray(conv2d(p, x))
    for name in ("shift9", "im2col"):
        got = np.asarray(VARIANTS[name](p, x))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    print("numerics OK", file=sys.stderr, flush=True)

    for sname, shape in shapes:
        c = shape[-1]
        kp1, kp2, kx = jax.random.split(jax.random.PRNGKey(hash(sname) % 2**31), 3)
        p1 = conv_init(kp1, c, c, 3, jnp.bfloat16)
        p2 = conv_init(kp2, c, c, 3, jnp.bfloat16)
        fns = {}
        for name, conv_fn in VARIANTS.items():
            fns[name] = jax.jit(
                lambda x0, f=conv_fn: resnet_pair_scan(f, p1, p2, x0)
            )
            x0 = jax.random.normal(kx, shape, jnp.bfloat16)
            np.asarray(fns[name](x0))  # warm
            print(f"warmed {sname}/{name}", file=sys.stderr, flush=True)
        times = {n: [] for n in VARIANTS}
        for i in range(5):
            for name in VARIANTS:
                x0 = jax.random.normal(
                    jax.random.fold_in(kx, 17 * i + len(name)), shape,
                    jnp.bfloat16)
                t0 = time.perf_counter()
                np.asarray(fns[name](x0))
                times[name].append(time.perf_counter() - t0)
        for name, ts in times.items():
            print(json.dumps({
                "shape": sname, "variant": name,
                "p50_ms": round(1e3 * float(np.percentile(ts, 50)), 1),
                "min_ms": round(1e3 * float(np.min(ts)), 1),
            }))


if __name__ == "__main__":
    main()

"""TPU compile/numerics probe for the v2 fused conv kernel (background).

Round-3 Mosaic blockers: lane-dim tpu.concatenate offset mismatch (fixed by
pltpu.roll re-materialization) and "Rotate with non-32-bit data" (fixed by
rolling the fp32 value and casting per copy). This probe answers: does the
v2 kernel now compile on the real TPU, is it numerically right there, and
how does it time vs the XLA chain at the hot shape?
"""
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
    fold_group_norm, gn_silu_conv3x3_v2,
)

print("backend:", jax.default_backend(), flush=True)
b, h, w, c = 2, 64, 64, 320
dt = jnp.bfloat16
x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c)).astype(dt)
gn = {"scale": jnp.ones((c,), dt), "bias": jnp.zeros((c,), dt)}
cv = conv_init(jax.random.PRNGKey(3), c, c, 3, dt)
s, bi = fold_group_norm(gn, x, 32)

ref = np.asarray(
    conv2d(cv, silu(group_norm(gn, x, num_groups=32))).astype(jnp.float32))

variants = (sys.argv[1].split(",") if len(sys.argv) > 1
            else ["cast", "barrier", "split"])
ok = {}
for variant in variants:
    os.environ["CONV_V2_VARIANT"] = variant

    @jax.jit
    def fn(x, s, bi):
        return gn_silu_conv3x3_v2(x, s, bi, cv["kernel"], cv["bias"])

    t0 = time.perf_counter()
    try:
        out = np.asarray(fn(x, s, bi))
    except Exception as e:
        msg = str(e)
        for needle in ("Rotate", "offset mismatch", "Unsupported",
                       "not implemented", "Unimplemented"):
            j = msg.find(needle)
            if j >= 0:
                msg = msg[j:j + 300]
                break
        else:
            msg = msg[:300]
        print(f"[{variant}] COMPILE FAILED: {type(e).__name__}: {msg}",
              flush=True)
        continue
    print(f"[{variant}] compile+run: {time.perf_counter()-t0:.1f}s",
          flush=True)
    err = np.abs(out.astype(np.float32) - ref)
    print(f"[{variant}] max abs err vs XLA chain: {err.max():.4f} "
          f"(ref scale {np.abs(ref).max():.2f})", flush=True)
    ts = []
    for i in range(6):
        xi = (x.astype(jnp.float32) * (1.0 + 1e-5 * (i + 1))).astype(dt)
        si, bii = fold_group_norm(gn, xi, 32)
        t0 = time.perf_counter()
        np.asarray(fn(xi, si, bii))
        ts.append(time.perf_counter() - t0)
    p50 = sorted(ts)[len(ts) // 2] * 1e3
    ok[variant] = p50
    print(f"[{variant}] steady p50: {p50:.1f} ms", flush=True)

ref_fn = jax.jit(lambda x: conv2d(cv, silu(group_norm(gn, x, num_groups=32))))
np.asarray(ref_fn(x))
ts = []
for i in range(6):
    xi = (x.astype(jnp.float32) * (1.0 + 2e-5 * (i + 1))).astype(dt)
    t0 = time.perf_counter()
    np.asarray(ref_fn(xi))
    ts.append(time.perf_counter() - t0)
print(f"xla chain steady p50: {sorted(ts)[len(ts)//2]*1e3:.1f} ms", flush=True)

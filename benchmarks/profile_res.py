"""Op-level TPU profile of the sampling step at an arbitrary
resolution/batch (generalizes profile_step.py, which is pinned to
512^2 B=1).

Usage: python benchmarks/profile_res.py [H W BATCH [STEPS]]
  e.g.  python benchmarks/profile_res.py 768 768 4
(TPU; run in background — remote compile can take minutes.)

Prints a JSON summary (per-step ms, category percentages) and the top-25
device ops, aggregated from the Chrome trace the axon backend exports.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np

from diffusionspatialcontrol_tpu.config import ModelConfig
from diffusionspatialcontrol_tpu.models import factory
from diffusionspatialcontrol_tpu.pipeline.pipeline import make_denoise_fn
from diffusionspatialcontrol_tpu.samplers import schedules


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    trace_dir = f"/tmp/jaxtrace_{h}x{w}b{batch}"

    cfg = ModelConfig()
    params = factory.init_pipeline_params(
        jax.random.PRNGKey(0), cfg, jnp.bfloat16
    )
    table = schedules.ddpm_sigma_table(cfg)
    log_table = jnp.asarray(np.log(table), jnp.float32)
    lh, lw = h // 8, w // 8
    biases = tuple(
        jnp.ones((2 * batch, (lh // 2**i) * (lw // 2**i), 77), jnp.float32)
        * 0.1
        for i in range(4)
    )
    context = jax.random.normal(
        jax.random.PRNGKey(3), (2 * batch, 77, 768)
    ).astype(jnp.bfloat16)

    @jax.jit
    def run(x0):
        denoise = make_denoise_fn(
            params, cfg, context, biases, log_table, 7.5,
            attn_impl="pallas",
        )

        def body(x, sigma):
            return denoise(x, sigma) * 0.98, None

        x, _ = jax.lax.scan(body, x0, jnp.linspace(14.6, 0.03, steps))
        return x

    x0 = jax.random.normal(jax.random.PRNGKey(7), (batch, lh, lw, 4))
    t0 = time.perf_counter()
    np.asarray(run(x0))  # compile + warm
    print("compile+first:", round(time.perf_counter() - t0, 1), flush=True)
    with jax.profiler.trace(trace_dir):
        np.asarray(run(jax.random.normal(jax.random.PRNGKey(8),
                                         (batch, lh, lw, 4))))
        time.sleep(0.5)

    traces = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"
    ))
    assert traces, f"no trace produced under {trace_dir}"
    with gzip.open(traces[-1]) as f:
        data = json.load(f)
    events = data["traceEvents"]
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    tpu_pids = {p for p, n in pids.items()
                if "TPU" in n or "/device" in n.lower()}

    per_op = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            per_op[e.get("name", "?")] += e.get("dur", 0.0)

    def category(name: str) -> str:
        n = name.lower()
        if "conv" in n:
            return "conv"
        if "region_attention" in n or "flash" in n or "custom-call" in n:
            return "attention-kernel"
        if n.startswith("fusion") or "fusion" in n:
            return "fusion(elementwise/GN/etc)"
        if "dot" in n or "gemm" in n:
            return "matmul"
        if "copy" in n or "transpose" in n or "reshape" in n:
            return "copy/layout"
        if "all-reduce" in n or "all-gather" in n:
            return "collective"
        return "other"

    cats = defaultdict(float)
    for name, dur in per_op.items():
        cats[category(name)] += dur
    total = sum(per_op.values())
    print(json.dumps({
        "shape": f"{h}x{w} batch={batch}",
        "total_device_us": total,
        "per_step_ms": round(total / steps / 1e3, 2),
        "per_step_per_image_ms": round(total / steps / batch / 1e3, 2),
        "categories_pct": {
            k: round(100 * v / total, 1)
            for k, v in sorted(cats.items(), key=lambda kv: -kv[1])
        },
    }))
    print("top 25 ops:")
    for name, dur in sorted(per_op.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {dur/1e3:9.2f} ms  {100*dur/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()

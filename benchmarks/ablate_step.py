"""Ablation timing of the denoise step on the real TPU.

Answers "where do the 22.7 ms/step go" without trace parsing: times a
25-iteration scan of the full CFG denoise step, then re-times it with
individual cost centers stubbed out (GroupNorm stats, GN+SiLU chains,
attention blocks, FF blocks). The deltas bound each center's contribution.

Usage: python benchmarks/ablate_step.py  (TPU; several compiles, run in
background). Measurement discipline per CLAUDE.md: vary inputs per run,
sync via np.asarray.
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

from diffusionspatialcontrol_tpu.config import ModelConfig
from diffusionspatialcontrol_tpu.models import factory, unet as unet_mod
from diffusionspatialcontrol_tpu.models import layers as layers_mod
from diffusionspatialcontrol_tpu.pipeline.pipeline import make_denoise_fn
from diffusionspatialcontrol_tpu.samplers import schedules

STEPS = int(os.environ.get("ABL_STEPS", "25"))
H = int(os.environ.get("ABL_H", "512"))
W = int(os.environ.get("ABL_W", "512"))
B = int(os.environ.get("ABL_B", "1"))
LH, LW = H // 8, W // 8


def build_step(cfg, params, log_table, biases):
    context = jax.random.normal(jax.random.PRNGKey(3), (2 * B, 77, 768)
                                ).astype(jnp.bfloat16)

    @jax.jit
    def run(x0):
        denoise = make_denoise_fn(
            params, cfg, context, biases, log_table, 7.5,
            attn_impl="pallas",
            sigma_steps=np.linspace(14.6, 0.03, STEPS),
        )

        def body(x, sigma):
            return denoise(x, sigma) * 0.98, None

        sigmas = jnp.linspace(14.6, 0.03, STEPS)
        x, _ = jax.lax.scan(body, x0, sigmas)
        return x

    return run


def timeit(run, n=4):
    ts = []
    for i in range(n):
        x0 = jax.random.normal(jax.random.PRNGKey(100 + i),
                               (B, LH, LW, 4))
        t0 = time.perf_counter()
        out = run(x0)
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts[1:]))


def main():
    cfg = ModelConfig()
    params = factory.init_pipeline_params(
        jax.random.PRNGKey(0), cfg, jnp.bfloat16
    )
    table = schedules.ddpm_sigma_table(cfg)
    log_table = jnp.asarray(np.log(table), jnp.float32)
    biases = tuple(
        jnp.ones((2 * B, (LH // 2**i) * (LW // 2**i), 77), jnp.float32)
        * 0.1
        for i in range(4)
    )

    real_gn = layers_mod.group_norm
    real_unet_gn = unet_mod.group_norm
    real_tf = unet_mod._transformer_apply
    real_ff = unet_mod._geglu_ff

    results = {}

    logf = open("/tmp/ablate_results.log", "a")

    def measure(tag):
        run = build_step(cfg, params, log_table, biases)
        results[tag] = timeit(run)
        print(tag, results[tag], flush=True)
        logf.write(f"{tag} {results[tag]}\n")
        logf.flush()

    measure("full")

    # GN without stats (scale/bias only): removes the reduction pass
    def gn_nostats(p, x, num_groups=32, eps=1e-5):
        xf = x.astype(jnp.float32)
        out = xf * p["scale"].astype(jnp.float32) + p["bias"].astype(
            jnp.float32)
        return out.astype(x.dtype)

    unet_mod.group_norm = gn_nostats
    measure("gn_stats_removed")
    unet_mod.group_norm = real_unet_gn

    # whole transformer blocks (self+cross attention + FF + projections)
    def tf_identity(p, cfg_, x, cond, level, heads, attn_impl, heatmaps,
                    axis_name=None):
        return x

    unet_mod._transformer_apply = tf_identity
    measure("attention_blocks_removed")
    unet_mod._transformer_apply = real_tf

    # FF (GEGLU) only
    def ff_identity(p, x):
        return x

    unet_mod._geglu_ff = ff_identity
    measure("ff_removed")
    unet_mod._geglu_ff = real_ff

    per_step = {k: v / STEPS * 1e3 for k, v in results.items()}
    print(json.dumps({"total_s": results, "per_step_ms": per_step,
                      "deltas_ms": {
                          k: (results["full"] - v) / STEPS * 1e3
                          for k, v in results.items() if k != "full"
                      }}))


if __name__ == "__main__":
    main()

"""Whole-pipeline A/B of flash-attention kernel variants.

Runs the full bench.py configuration (SD1.5 512^2, 25-step DPM++ 2M
Karras, CFG 7.5, 2-phrase region control) for each attn_impl given on the
command line (default: the round-5 variant ladder), INTERLEAVED so relay
drift cancels. Variants: "pallas" (validated default), "pallas+exp2"
(softmax via exp2), "pallas+exp2+qkbf16" (+native-bf16 QK^T operands),
"pallas+exp2+qkbf16+pvbf16" (+bf16 probabilities for P·V).

Usage: nohup python benchmarks/ab_attn_pipeline.py > /tmp/ab_attn.log &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np

from diffusionspatialcontrol_tpu.config import GenerationConfig, ModelConfig
from diffusionspatialcontrol_tpu.models import factory
from diffusionspatialcontrol_tpu.pipeline.pipeline import StableDiffusionTPU
from diffusionspatialcontrol_tpu.text.tokenizer import load_tokenizer

N_PER_ARM = 7


def main():
    # env overrides: AB_H/AB_W/AB_BATCH/AB_RUNS (768 b4 serving shape etc.)
    height = int(os.environ.get("AB_H", "512"))
    width = int(os.environ.get("AB_W", "512"))
    batch = int(os.environ.get("AB_BATCH", "1"))
    n_runs = int(os.environ.get("AB_RUNS", str(N_PER_ARM)))
    impls = sys.argv[1:] or [
        "pallas", "pallas+exp2", "pallas+exp2+qkbf16",
        "pallas+exp2+qkbf16+pvbf16",
    ]
    cfg = ModelConfig()
    params = factory.init_pipeline_params(
        jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    tok = load_tokenizer()
    gen = GenerationConfig(height=height, width=width,
                           num_inference_steps=25,
                           guidance_scale=7.5, sampler="dpmpp_2m",
                           schedule="karras")
    pipes = {
        impl: StableDiffusionTPU(cfg, params, tokenizer=tok,
                                 attn_impl=impl, conv_impl="xla")
        for impl in impls
    }

    prompt = "a red cat sitting on a wooden bench, a blue bird flying"
    neg = "bad quality, low quality, jpeg artifact, cropped"
    p0 = pipes[impls[0]]
    ctx, ids = p0.encode_prompt([prompt] * batch, [neg] * batch,
                                clip_skip=2)
    h, w = height, width
    m1 = np.zeros((h, w), np.float32)
    m1[:, : w // 2] = 1.0
    m2 = np.zeros((h, w), np.float32)
    m2[: h // 3, w // 2:] = 1.0
    state = {
        "red cat": {"mask": m1, "weight": 0.8, "mask_outsides": 0.2},
        "blue bird": {"mask": m2, "weight": 0.7, "mask_outsides": 0.1},
    }
    biases = p0.encode_region([state] * batch, ids, height=h, width=w,
                              do_cfg=True)
    seeds = (lambda s0: [s0 + j for j in range(batch)]
             if batch > 1 else s0)

    ref_img = None
    for impl in list(pipes):
        t0 = time.perf_counter()
        try:
            out = np.asarray(pipes[impl].txt2img(
                ctx, gen, seed=seeds(0), region_biases=biases,
                uint8_output=True))
        except Exception as e:
            print(f"{impl}: COMPILE FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            pipes.pop(impl)
            continue
        if ref_img is None:
            ref_img = out.astype(np.int64)
        else:
            d = np.abs(out.astype(np.int64) - ref_img)
            print(f"{impl}: u8 delta vs {impls[0]}: max {d.max()} "
                  f"mean {d.mean():.4f}", flush=True)
        print(f"{impl}: compiled+first-run in "
              f"{time.perf_counter() - t0:.1f} s", flush=True)

    times = {impl: [] for impl in pipes}
    for i in range(n_runs):
        for impl, pipe in pipes.items():
            t0 = time.perf_counter()
            out = pipe.txt2img(ctx, gen, seed=seeds(7000 + i * batch),
                               region_biases=biases, uint8_output=True)
            np.asarray(out)
            dt = time.perf_counter() - t0
            times[impl].append(dt)
            print(f"run {i} {impl}: {dt:.4f} s", flush=True)

    for impl, ts in times.items():
        print(f"RESULT {impl}: p50 {float(np.percentile(ts, 50)):.4f} s  "
              f"(min {min(ts):.4f}, max {max(ts):.4f}, n={len(ts)})",
              flush=True)


if __name__ == "__main__":
    main()

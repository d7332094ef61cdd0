"""A/B: resnet conv output element type fp32 (default) vs bf16.

conv_impl="xla" requests preferred_element_type=f32 on every resnet conv
(bias add + cast epilogue in fp32); "xla_bf16" keeps the compute dtype
(MXU accumulation is fp32 internally either way — the difference is one
rounding before the fp32-stats GroupNorm, matching the reference's fp16
autocast behavior, and potentially less HBM traffic if XLA materializes
the fp32 epilogue).

Times the full headline pipeline (512², 25-step DPM++ 2M Karras, CFG 7.5,
2-phrase region map) for both variants, plus max|Δ| on the uint8 outputs.

Usage: python benchmarks/ab_conv_dtype.py  (TPU; run in background,
quiet queue — don't overlap with other TPU timing jobs).
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

from diffusionspatialcontrol_tpu.config import GenerationConfig, ModelConfig
from diffusionspatialcontrol_tpu.models import factory
from diffusionspatialcontrol_tpu.pipeline.pipeline import StableDiffusionTPU
from diffusionspatialcontrol_tpu.text.tokenizer import load_tokenizer


def timed_runs(fn, n=5):
    ts = []
    for i in range(n):  # seeds vary: the relay caches identical executions
        t0 = time.perf_counter()
        out = fn(4000 + i)
        np.asarray(out)  # real host sync (block_until_ready is advisory)
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50))


def main():
    cfg = ModelConfig()
    params = factory.init_pipeline_params(
        jax.random.PRNGKey(0), cfg, jnp.bfloat16
    )
    tok = load_tokenizer()
    gen = GenerationConfig(height=512, width=512, num_inference_steps=25,
                           guidance_scale=7.5, sampler="dpmpp_2m",
                           schedule="karras")
    prompt = "a red cat sitting on a wooden bench, a blue bird flying"
    neg = "bad quality, low quality, jpeg artifact, cropped"
    h = w = 512
    m1 = np.zeros((h, w), np.float32)
    m1[:, : w // 2] = 1.0
    m2 = np.zeros((h, w), np.float32)
    m2[: h // 3, w // 2:] = 1.0
    state = {
        "red cat": {"mask": m1, "weight": 0.8, "mask_outsides": 0.2},
        "blue bird": {"mask": m2, "weight": 0.7, "mask_outsides": 0.1},
    }

    rows = {}
    outs = {}
    for impl in ("xla", "xla_bf16"):
        pipe = StableDiffusionTPU(cfg, params, tokenizer=tok,
                                  attn_impl="pallas", conv_impl=impl)
        ctx, ids = pipe.encode_prompt([prompt], [neg], clip_skip=2)
        biases = pipe.encode_region([state], ids, height=h, width=w,
                                    do_cfg=True)
        outs[impl] = np.asarray(pipe.txt2img(
            ctx, gen, seed=0, region_biases=biases, uint8_output=True))
        t = timed_runs(
            lambda s: pipe.txt2img(ctx, gen, seed=s, region_biases=biases,
                                   uint8_output=True))
        rows[f"{impl}_s"] = round(t, 4)
        print(json.dumps(rows), flush=True)
    d = np.abs(outs["xla"].astype(np.int32) -
               outs["xla_bf16"].astype(np.int32))
    rows["max_abs_u8_delta"] = int(d.max())
    rows["mean_abs_u8_delta"] = round(float(d.mean()), 4)
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()

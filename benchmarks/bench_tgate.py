"""TGATE turbo-mode benchmark: 512², 25-step DPM++ 2M Karras, CFG 7.5.

Times txt2img_tgate at gate_frac 0.4 / 0.5 / 0.6 against plain txt2img.
Past the gate the cross-attention outputs are frozen and the uncond half
is dropped, so the tail's UNet work roughly halves; the one extra
collect forward at the gate costs ~1 CFG step. Opt-in mode — NOT the
headline number (bench.py keeps full reference semantics).

Usage: python benchmarks/bench_tgate.py  (TPU; run in background, quiet
queue — don't overlap with other TPU timing jobs).
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
        out = fn(2000 + i)
        np.asarray(out)  # real host sync (block_until_ready is advisory)
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50))


def main():
    cfg = ModelConfig()
    params = factory.init_pipeline_params(
        jax.random.PRNGKey(0), cfg, jnp.bfloat16
    )
    pipe = StableDiffusionTPU(cfg, params, tokenizer=load_tokenizer())
    gen = GenerationConfig(height=512, width=512, num_inference_steps=25,
                           guidance_scale=7.5, sampler="dpmpp_2m",
                           schedule="karras")
    prompt = "a red cat sitting on a wooden bench, a blue bird flying"
    neg = "bad quality, low quality, jpeg artifact, cropped"
    ctx, ids = pipe.encode_prompt([prompt], [neg], clip_skip=2)
    m1 = np.zeros((512, 512), np.float32)
    m1[:, :256] = 1.0
    state = {"red cat": {"mask": m1, "weight": 0.8, "mask_outsides": 0.2}}
    biases = pipe.encode_region([state], ids, height=512, width=512)

    rows = {}
    plain = np.asarray(pipe.txt2img(ctx, gen, seed=0, region_biases=biases,
                                    uint8_output=True))
    rows["plain_s"] = round(timed_runs(
        lambda s: pipe.txt2img(ctx, gen, seed=s, region_biases=biases,
                               uint8_output=True)), 4)
    print(json.dumps(rows), flush=True)
    for gate in (0.4, 0.5, 0.6):
        out = np.asarray(pipe.txt2img_tgate(
            ctx, gen, gate_frac=gate, seed=0, region_biases=biases,
            uint8_output=True))
        d = np.abs(out.astype(np.int32) - plain.astype(np.int32))
        rows[f"tgate{gate}_s"] = round(timed_runs(
            lambda s: pipe.txt2img_tgate(ctx, gen, gate_frac=gate, seed=s,
                                         region_biases=biases,
                                         uint8_output=True)), 4)
        rows[f"tgate{gate}_mean_u8_delta"] = round(float(d.mean()), 3)
        print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()

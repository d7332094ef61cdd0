"""Largest-resolution config: 1920x1088 spatial run (reference demos this
size; the materialized-logits attention path would need ~68 GB so it
exercises the streaming flash kernel). Prints compile time + 3 timed runs.

Usage: python benchmarks/bench_large.py  (TPU; run in background).
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

cfg = ModelConfig()
params = factory.init_pipeline_params(jax.random.PRNGKey(0), cfg,
                                      jnp.bfloat16)
pipe = StableDiffusionTPU(cfg, params, tokenizer=load_tokenizer(),
                          attn_impl="pallas", conv_impl="xla")
h, w = 1088, 1920
gen = GenerationConfig(height=h, width=w, num_inference_steps=25,
                       guidance_scale=7.5, sampler="dpmpp_2m",
                       schedule="karras")
prompt = "a red cat sitting on a wooden bench, a blue bird flying"
neg = "bad quality, low quality"
ctx, ids = pipe.encode_prompt([prompt], [neg], clip_skip=2)
m1 = np.zeros((h, w), np.float32)
m1[:, : w // 2] = 1.0
state = {"red cat": {"mask": m1, "weight": 0.8, "mask_outsides": 0.2}}
biases = pipe.encode_region([state], ids, height=h, width=w, do_cfg=True)

t0 = time.perf_counter()
np.asarray(pipe.txt2img(ctx, gen, seed=0, region_biases=biases,
                        uint8_output=True))
print("compile+first:", round(time.perf_counter() - t0, 1), flush=True)
ts = []
for i in range(3):
    t0 = time.perf_counter()
    np.asarray(pipe.txt2img(ctx, gen, seed=2000 + i, region_biases=biases,
                            uint8_output=True))
    ts.append(time.perf_counter() - t0)
    print("run", i, round(ts[-1], 2), flush=True)
print("p50_1920x1088_spatial:", round(float(np.percentile(ts, 50)), 2))

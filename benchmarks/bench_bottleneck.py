"""Bottleneck-sampling turbo-mode benchmark: 512², 25-step, CFG 7.5.

Times txt2img_bottleneck (resolution scheduling: the middle of the solver
schedule runs at low_scale of the latent size, denoised-estimate re-noising
at the boundaries) at low_scale 0.5/0.75 with the headline 2-phrase region
map, against plain txt2img. Uses dpmpp_2m Karras — each phase restarts the
multistep carry, so the solver is the headline one. Opt-in mode — NOT the
headline number (bench.py keeps full-resolution reference semantics).

Usage: python benchmarks/bench_bottleneck.py  (TPU; run in background,
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
        out = fn(3000 + i)
        np.asarray(out)  # real host sync (block_until_ready is advisory)
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50))


def main():
    cfg = ModelConfig()
    params = factory.init_pipeline_params(
        jax.random.PRNGKey(0), cfg, jnp.bfloat16
    )
    tok = load_tokenizer()
    pipe = StableDiffusionTPU(cfg, params, tokenizer=tok,
                              attn_impl="pallas", conv_impl="xla")
    gen = GenerationConfig(height=512, width=512, num_inference_steps=25,
                           guidance_scale=7.5, sampler="dpmpp_2m",
                           schedule="karras")

    prompt = "a red cat sitting on a wooden bench, a blue bird flying"
    neg = "bad quality, low quality, jpeg artifact, cropped"
    ctx, ids = pipe.encode_prompt([prompt], [neg], clip_skip=2)
    h = w = 512
    m1 = np.zeros((h, w), np.float32)
    m1[:, : w // 2] = 1.0
    m2 = np.zeros((h, w), np.float32)
    m2[: h // 3, w // 2:] = 1.0
    state = {
        "red cat": {"mask": m1, "weight": 0.8, "mask_outsides": 0.2},
        "blue bird": {"mask": m2, "weight": 0.7, "mask_outsides": 0.1},
    }
    rs = ([state], ids, 1)
    biases = pipe.encode_region([state], ids, height=h, width=w, do_cfg=True)

    np.asarray(pipe.txt2img(ctx, gen, seed=0, region_biases=biases,
                            uint8_output=True))
    plain = timed_runs(
        lambda s: pipe.txt2img(ctx, gen, seed=s, region_biases=biases,
                               uint8_output=True))
    rows = {"plain_txt2img_s": round(plain, 4)}
    print(json.dumps(rows), flush=True)
    for low in (0.5, 0.75):
        np.asarray(pipe.txt2img_bottleneck(
            ctx, gen, low_scale=low, seed=0, region_state=rs,
            uint8_output=True))
        t = timed_runs(
            lambda s, v=low: pipe.txt2img_bottleneck(
                ctx, gen, low_scale=v, seed=s, region_state=rs,
                uint8_output=True))
        key = str(low).replace(".", "")
        rows[f"bottleneck_{key}_s"] = round(t, 4)
        rows[f"bottleneck_{key}_speedup"] = round(plain / t, 3)
        print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()

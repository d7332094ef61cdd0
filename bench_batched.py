"""Secondary benchmarks: 768x768 batched generation (BASELINE config 4
shape) and the largest demonstrated resolution. Not run by the driver;
results recorded in README/BENCH notes."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from diffusionspatialcontrol_tpu.config import GenerationConfig, ModelConfig
from diffusionspatialcontrol_tpu.models import factory
from diffusionspatialcontrol_tpu.pipeline.pipeline import StableDiffusionTPU
from diffusionspatialcontrol_tpu.text.tokenizer import load_tokenizer


def timed(fn, n=3):
    np.asarray(fn(0))
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(1000 + i))
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50))


def main():
    cfg = ModelConfig()
    params = factory.init_pipeline_params(
        jax.random.PRNGKey(0), cfg, jnp.bfloat16
    )
    pipe = StableDiffusionTPU(cfg, params, tokenizer=load_tokenizer())

    results = {}

    # serving sweet spot: batched 512x512 (PERF.md secondary config)
    gen512 = GenerationConfig(height=512, width=512, num_inference_steps=25)
    ctx512, _ = pipe.encode_prompt(
        ["a red cat on a bench"] * 4,
        ["bad quality, low quality, jpeg artifact, cropped"] * 4,
        clip_skip=2,
    )
    t = timed(lambda s: pipe.txt2img(ctx512, gen512,
                                     seed=[s, s + 1, s + 2, s + 3],
                                     uint8_output=True))
    results["batch4_512_sec_per_image"] = round(t / 4, 4)
    results["batch4_512_images_per_min_chip"] = round(240.0 / t, 2)

    # config 4: batched 768x768, 4 images per program (8 prompts x 4 seeds
    # = 8 sequential programs of batch 4 on one chip)
    gen768 = GenerationConfig(height=768, width=768, num_inference_steps=25)
    ctx, _ = pipe.encode_prompt(
        ["a red cat on a bench"] * 4,
        ["bad quality, low quality, jpeg artifact, cropped"] * 4,
        clip_skip=2,
    )
    t = timed(lambda s: pipe.txt2img(ctx, gen768,
                                     seed=[s, s + 1, s + 2, s + 3]))
    results["batch4_768_sec_per_image"] = round(t / 4, 4)
    results["batch4_768_images_per_min_chip"] = round(240.0 / t, 2)

    # largest demonstrated resolution (reference README.md:87)
    gen_big = GenerationConfig(height=1088, width=1920,
                               num_inference_steps=25)
    ctx1, _ = pipe.encode_prompt(["a panoramic landscape"], ["bad quality"],
                                 clip_skip=2)
    t = timed(lambda s: pipe.txt2img(ctx1, gen_big, seed=s), n=2)
    results["single_1920x1088_sec_per_image"] = round(t, 4)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

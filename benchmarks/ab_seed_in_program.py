"""Same-sitting A/B: in-program seeded init vs eager init.

The txt2img default (`seed_in_program=True`) derives PRNG keys and draws
the initial latents + solver noise inside the compiled sampling program,
removing the separate eager dispatches of the round-2 path (each eager op
on the axon backend is a relay round trip). This script measures whether
that actually pays at the whole-pipeline level: both programs are warmed,
then timed runs are interleaved A/B/A/B so relay drift hits both equally.

Usage: python benchmarks/ab_seed_in_program.py [n_pairs]
Writes one JSON line per arm.
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

from diffusionspatialcontrol_tpu.config import GenerationConfig, ModelConfig
from diffusionspatialcontrol_tpu.models import factory
from diffusionspatialcontrol_tpu.pipeline.pipeline import StableDiffusionTPU
from diffusionspatialcontrol_tpu.text.tokenizer import load_tokenizer


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    cfg = ModelConfig()
    params = factory.init_pipeline_params(
        jax.random.PRNGKey(0), cfg, jnp.bfloat16
    )
    tok = load_tokenizer()
    pipes = {
        "in_program": StableDiffusionTPU(cfg, params, tokenizer=tok,
                                         attn_impl="pallas", conv_impl="xla",
                                         seed_in_program=True),
        "eager": StableDiffusionTPU(cfg, params, tokenizer=tok,
                                    attn_impl="pallas", conv_impl="xla",
                                    seed_in_program=False),
    }
    gen = GenerationConfig(height=512, width=512, num_inference_steps=25,
                           guidance_scale=7.5, sampler="dpmpp_2m",
                           schedule="karras")
    ctx, _ = pipes["eager"].encode_prompt(
        ["a red cat sitting on a wooden bench"], ["bad quality"],
        clip_skip=2)

    for name, pipe in pipes.items():
        np.asarray(pipe.txt2img(ctx, gen, seed=0, uint8_output=True))
        print(f"warmed {name}", file=sys.stderr, flush=True)

    times = {k: [] for k in pipes}
    for i in range(n_pairs):
        for name, pipe in pipes.items():
            t0 = time.perf_counter()
            out = pipe.txt2img(ctx, gen, seed=2000 + 10 * i + len(name),
                               uint8_output=True)
            np.asarray(out)
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(json.dumps({
            "arm": name,
            "p50_s": round(float(np.percentile(ts, 50)), 4),
            "min_s": round(float(np.min(ts)), 4),
            "n": len(ts),
        }))


if __name__ == "__main__":
    main()

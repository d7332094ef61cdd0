"""End-to-end demo: region-controlled generation + DAAM heatmaps.

Runs on whatever accelerator JAX finds (TPU or CPU). With no checkpoint
argument it uses random-init SD1.5-topology weights — outputs are noise
textures, but every stage (A1111 prompt weighting, region rasterization,
fused region attention, DPM++ 2M Karras, VAE decode, DAAM extraction,
native PNG encode) runs exactly as in production.

    python examples/spatial_control_demo.py [--ckpt /path/to/diffusers/dir]
                                            [--size 256] [--steps 8]

Outputs under examples/out/: image.png, region_overlay.png, daam_cat.png.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="diffusers checkpoint dir (optional)")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    from diffusionspatialcontrol_tpu.config import (
        DEFAULT_NEGATIVE_PROMPT,
        GenerationConfig,
        ModelConfig,
    )
    from diffusionspatialcontrol_tpu.introspect import daam
    from diffusionspatialcontrol_tpu.models import factory
    from diffusionspatialcontrol_tpu.pipeline.pipeline import (
        StableDiffusionTPU,
    )
    from diffusionspatialcontrol_tpu.runtime import native
    from diffusionspatialcontrol_tpu.text.tokenizer import load_tokenizer
    from diffusionspatialcontrol_tpu.utils import region_ui

    cfg = ModelConfig()
    if args.ckpt:
        from diffusionspatialcontrol_tpu.convert.hf import (
            load_pipeline_params,
        )

        params = load_pipeline_params(args.ckpt, cfg, jnp.bfloat16)
        tokenizer = load_tokenizer(os.path.join(args.ckpt, "tokenizer"))
    else:
        print("no checkpoint given: random-init weights (noise outputs)")
        params = factory.init_pipeline_params(
            jax.random.PRNGKey(0), cfg, jnp.bfloat16
        )
        tokenizer = load_tokenizer()

    pipe = StableDiffusionTPU(cfg, params, tokenizer=tokenizer)
    gen = GenerationConfig(height=args.size, width=args.size,
                           num_inference_steps=args.steps)

    prompt = "a (red cat:1.2) sitting on a bench, a blue bird in the sky"
    context, ids = pipe.encode_prompt(
        [prompt], [DEFAULT_NEGATIVE_PROMPT], clip_skip=2, mode="a1111"
    )

    h = w = args.size
    cat_mask = np.zeros((h, w), np.float32)
    cat_mask[h // 3:, : w // 2] = 1.0
    bird_mask = np.zeros((h, w), np.float32)
    bird_mask[: h // 3, w // 2:] = 1.0
    state = region_ui.build_region_state(
        ["red cat", "blue bird"], [cat_mask, bird_mask],
        weights=[0.8, 0.7], mask_outsides=[0.2, 0.1],
    )
    biases = pipe.encode_region([state], ids, height=h, width=w)

    final, history = pipe.txt2img(
        context, gen, seed=args.seed, region_biases=biases, decode=False,
        return_history=True,
    )
    image = pipe.decode_latents(final)
    u8 = pipe.to_uint8(image)

    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "image.png"), "wb") as f:
        f.write(native.encode_png(u8[0]))

    overlay = region_ui.create_mixed_img(state, w, h)
    with open(os.path.join(out_dir, "region_overlay.png"), "wb") as f:
        f.write(native.encode_png(overlay[..., :3]))

    sigmas, _ = pipe._schedule(gen)
    heat = daam.heatmaps_for_trajectory(
        pipe.params, cfg, history, sigmas, context[1:], biases and tuple(
            b[1:] for b in biases
        ),
    )
    # "red cat" tokens sit right after BOS in the cond ids
    cat_ids = tokenizer.encode("red cat", add_special_tokens=False)
    positions = [i for i, t in enumerate(ids[0]) if t in cat_ids]
    cat_map = np.asarray(daam.token_heatmap(heat, positions or [1]))[0]
    cat_img = (255 * (cat_map - cat_map.min())
               / max(float(np.ptp(cat_map)), 1e-8)).astype(np.uint8)
    cat_rgb = np.stack([cat_img, np.zeros_like(cat_img),
                        255 - cat_img], -1)
    with open(os.path.join(out_dir, "daam_cat.png"), "wb") as f:
        f.write(native.encode_png(cat_rgb))

    print(f"wrote {out_dir}/image.png, region_overlay.png, daam_cat.png")


if __name__ == "__main__":
    main()

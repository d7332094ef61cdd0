"""End-to-end demo: ControlNet-conditioned generation with hires fix.

Shows the round-3 surface: a control image is preprocessed (Canny), drives
a ControlNet unit through the base pass, and is re-prepared at the target
resolution for the hires pass (reference: model_k_diffusion.py:1206-1212);
latent previews span both passes.

With no checkpoint argument everything is random-init (outputs are noise
textures, but every stage runs exactly as in production).

    python examples/controlnet_hires_demo.py [--ckpt /path/to/diffusers/dir]
                                             [--size 64] [--steps 3]

Outputs under examples/out/: controlnet_hires.png + preview_XX.png.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    from diffusionspatialcontrol_tpu.app.api import (
        ControlNetUnit,
        ModelManager,
        inference,
    )
    from diffusionspatialcontrol_tpu.runtime import native

    manager = ModelManager(dtype=jnp.float32 if args.ckpt is None
                           else jnp.bfloat16)
    if args.ckpt:
        manager.register("model", args.ckpt)
    else:
        from tests.test_pipeline import TINY

        manager.register_random("model", TINY)

    # a synthetic "photo": bright square on dark background -> Canny edges
    s = args.size
    control = np.zeros((s, s, 3), np.float32)
    control[s // 4: 3 * s // 4, s // 4: 3 * s // 4] = 1.0

    result = inference(
        manager,
        prompt="a glowing cube on a table, studio lighting",
        model="model",
        sampler="DPM++ 2M Karras",
        steps=args.steps,
        width=s,
        height=s,
        seed=7,
        encoding_mode="short",
        controlnet_units=[
            ControlNetUnit(model="Canny", image=control, scale=0.8,
                           preprocessor="Canny")
        ],
        hires_scale=2.0,
        hires_strength=0.6,
        latent_preview=True,
        dtype=jnp.float32 if args.ckpt is None else jnp.bfloat16,
    )

    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    img = result["images"][0]
    with open(os.path.join(out_dir, "controlnet_hires.png"), "wb") as f:
        f.write(native.encode_png(img))
    for i, gallery in enumerate(result["previews"]):
        with open(os.path.join(out_dir, f"preview_{i:02d}.png"), "wb") as f:
            f.write(native.encode_png(gallery[0]))
    print(f"final image {img.shape} + {len(result['previews'])} previews "
          f"({result['previews'][0].shape[1:3]} -> "
          f"{result['previews'][-1].shape[1:3]}) -> {out_dir}")
    print("timings:", result["timings"])


if __name__ == "__main__":
    main()

"""Reference quantitative-evaluation protocol runner.

Reproduces the reference's evaluation setup (reference README.md
"Quantitative Evaluation": fixed negative prompt "bad quality, low
quality, jpeg artifact, cropped", clip-skip 2, CFG 7.5, 512x512,
DPM++ 2M Karras 25 steps, shared seeds) and its per-seed artifact layout
(Figure/source/quantitative_evaluation/Test_case N/{ours/<seed>.png,
Region map.png}): for each seed it renders the region-controlled image
into ``ours/`` and the vanilla (no region map) image into ``vanilla/``,
plus a copy of the region map.

The reference attaches prompt + S weights as text on its region-map
images, so the machine-readable spec lives in a JSON file here:

    {
      "prompt": "a red cat and a blue bird in a park",
      "region_map": "Region map.png",          # color region map, or
      "masks": ["cat_mask.png", ...],           # per-phrase grayscale maps
      "phrases": [
        {"phrase": "red cat", "weight": 0.8, "mask_outsides": 0.0},
        {"phrase": "blue bird", "weight": 0.7}
      ],
      "negative_prompt": null,                  # default: protocol's fixed
      "seeds": [1, 2, 42, 56, 6789],            # default: reference seeds
      "steps": 25, "cfg_scale": 7.5, "size": 512, "clip_skip": 2
    }

With ``region_map``, phrases are matched to color clusters in
largest-area-first order (the reference UI's color-clustering flow,
app.py:1461-1486). Usage:

    python benchmarks/eval_protocol.py --spec case.json --out results/ \
        [--model NAME=DIR | --random-model demo:tiny] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

#: The protocol constants (reference README.md "Quantitative Evaluation"
#: + the per-seed artifact filenames under quantitative_evaluation/).
NEGATIVE_PROMPT = "bad quality, low quality, jpeg artifact, cropped"
SEEDS = (1, 2, 42, 56, 6789)
SAMPLER = "DPM++ 2M Karras"
STEPS = 25
CFG_SCALE = 7.5
CLIP_SKIP = 2
SIZE = 512


def load_spec(path: str) -> dict:
    with open(path) as f:
        spec = json.load(f)
    if "prompt" not in spec or "phrases" not in spec:
        raise SystemExit("spec needs at least 'prompt' and 'phrases'")
    return spec


def build_state(spec: dict, spec_dir: str, size: int):
    """spec -> region_state dict {phrase: {mask, weight, mask_outsides}}."""
    import numpy as np
    from PIL import Image

    from diffusionspatialcontrol_tpu.utils.region_ui import (
        build_region_state,
        extract_color_masks,
        mask_from_grayscale_map,
    )

    phrases = [p["phrase"] for p in spec["phrases"]]
    weights = [float(p.get("weight", 1.0)) for p in spec["phrases"]]
    outsides = [float(p.get("mask_outsides", 0.0))
                for p in spec["phrases"]]

    def _load(rel):
        img = Image.open(os.path.join(spec_dir, rel))
        if img.size != (size, size):
            img = img.resize((size, size), Image.NEAREST)
        return np.asarray(img)

    if spec.get("region_map"):
        arr = _load(spec["region_map"])
        masks = extract_color_masks(arr[..., :3])
        # largest-area-first, matched to the phrase list in order
        masks = sorted(masks, key=lambda m: -float(m.mean()))
        if len(masks) < len(phrases):
            raise SystemExit(
                f"region map has {len(masks)} color regions for "
                f"{len(phrases)} phrases"
            )
        masks = masks[: len(phrases)]
    elif spec.get("masks"):
        if len(spec["masks"]) != len(phrases):
            raise SystemExit("one mask file per phrase required")
        masks = []
        for rel in spec["masks"]:
            g = _load(rel)
            if g.ndim == 3:
                g = g[..., :3].mean(-1)
            masks.append(mask_from_grayscale_map(g.astype(np.uint8)))
    else:
        raise SystemExit("spec needs 'region_map' or 'masks'")
    return build_region_state(phrases, masks, weights=weights,
                              mask_outsides=outsides)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--spec", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--model", metavar="NAME=DIR",
                   help="diffusers-layout checkpoint (e.g. QuinceMix v2.0 "
                   "for the reference protocol)")
    p.add_argument("--random-model", metavar="NAME[:FAMILY[:SEED]]",
                   help="random-init stand-in (offline smoke runs)")
    p.add_argument("--platform", choices=["tpu", "cpu"])
    p.add_argument("--vanilla", action="store_true", default=True,
                   help="also render without the region map (default on; "
                   "the reference compares both)")
    p.add_argument("--no-vanilla", dest="vanilla", action="store_false")
    p.add_argument("--compliance", action="store_true", default=True,
                   help="also report per-phrase attention-mass-inside-mask "
                   "via DAAM replay (default on; turns the reference's "
                   "human side-by-side eval into a number)")
    p.add_argument("--no-compliance", dest="compliance",
                   action="store_false")
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import jax.numpy as jnp

    from diffusionspatialcontrol_tpu.app.api import ModelManager, inference
    from diffusionspatialcontrol_tpu.config import MODEL_FAMILIES
    from diffusionspatialcontrol_tpu.runtime import native

    manager = ModelManager()
    if args.model:
        name, path = args.model.split("=", 1)
        manager.register(name, path)
    elif args.random_model:
        parts = args.random_model.split(":")
        name = parts[0]
        family = parts[1] if len(parts) > 1 else "sd15"
        manager.register_random(
            name, MODEL_FAMILIES[family](),
            seed=int(parts[2]) if len(parts) > 2 else 0,
        )
    else:
        raise SystemExit("pass --model NAME=DIR or --random-model NAME")

    spec = load_spec(args.spec)
    size = int(spec.get("size", SIZE))
    state = build_state(spec, os.path.dirname(os.path.abspath(args.spec)),
                        size)
    seeds = [int(s) for s in spec.get("seeds", SEEDS)]

    os.makedirs(os.path.join(args.out, "ours"), exist_ok=True)
    if args.vanilla:
        os.makedirs(os.path.join(args.out, "vanilla"), exist_ok=True)
    # persist the region map alongside, like the reference's layout
    overlay = np.zeros((size, size, 3), np.float32)
    rng = np.random.RandomState(3)
    for phrase, s in state.items():
        overlay += s["mask"][..., None] * rng.rand(3)
    with open(os.path.join(args.out, "Region map.png"), "wb") as f:
        f.write(native.encode_png(
            (np.clip(overlay, 0, 1) * 255).astype(np.uint8)
        ))

    kwargs = dict(
        prompt=spec["prompt"],
        neg_prompt=spec.get("negative_prompt") or NEGATIVE_PROMPT,
        model=name,
        sampler=spec.get("sampler", SAMPLER),
        steps=int(spec.get("steps", STEPS)),
        cfg_scale=float(spec.get("cfg_scale", CFG_SCALE)),
        clip_skip=int(spec.get("clip_skip", CLIP_SKIP)),
        width=size, height=size,
    )
    if spec.get("encoding_mode"):
        kwargs["encoding_mode"] = spec["encoding_mode"]
    if args.random_model and "tiny" in (args.random_model or ""):
        kwargs["dtype"] = jnp.float32

    compliance_fn = None
    if args.compliance:
        from diffusionspatialcontrol_tpu import registry
        from diffusionspatialcontrol_tpu.config import GenerationConfig
        from diffusionspatialcontrol_tpu.introspect.daam import (
            region_compliance,
        )
        from diffusionspatialcontrol_tpu.pipeline.pipeline import (
            StableDiffusionTPU,
        )

        mcfg, params, tok = manager.get(name)
        pipe = StableDiffusionTPU(mcfg, params, tokenizer=tok)
        sampler_spec = registry.resolve_sampler(kwargs["sampler"])
        gen = GenerationConfig(
            height=size, width=size,
            num_inference_steps=kwargs["steps"],
            guidance_scale=kwargs["cfg_scale"],
            sampler=sampler_spec.solver, schedule=sampler_spec.schedule,
            clip_skip=kwargs["clip_skip"],
            dtype=kwargs.get("dtype", jnp.bfloat16),
        )

        def compliance_fn(st, seed):
            return region_compliance(
                pipe, gen, kwargs["prompt"], kwargs["neg_prompt"], st,
                seed=seed,
                encoding_mode=kwargs.get("encoding_mode", "short"),
            )

        # weight-0 copy of the state: measures the uncontrolled baseline
        # attention in the same masks
        state0 = {
            k: dict(v, weight=0.0) for k, v in state.items()
        }

    results = {}
    for seed in seeds:
        out = inference(manager, seed=seed, region_state=state, **kwargs)
        img = np.asarray(out["images"][0])
        with open(os.path.join(args.out, "ours", f"{seed}.png"),
                  "wb") as f:
            f.write(native.encode_png(img))
        results[seed] = {"ours": json.loads(out["timings"])["total_s"]}
        if args.vanilla:
            out_v = inference(manager, seed=seed, **kwargs)
            with open(os.path.join(args.out, "vanilla", f"{seed}.png"),
                      "wb") as f:
                f.write(native.encode_png(np.asarray(out_v["images"][0])))
            results[seed]["vanilla"] = json.loads(
                out_v["timings"])["total_s"]
        if compliance_fn is not None:
            results[seed]["compliance"] = compliance_fn(state, seed)
            results[seed]["compliance_vanilla"] = compliance_fn(state0,
                                                               seed)
        print(f"seed {seed}: {results[seed]}", flush=True)
    with open(os.path.join(args.out, "timings.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}: {len(seeds)} seeds x "
          f"{'ours+vanilla' if args.vanilla else 'ours'}")


if __name__ == "__main__":
    main()

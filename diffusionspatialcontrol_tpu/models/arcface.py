"""ArcFace iResNet face-recognition embedder (insightface-compatible).

The reference extracts FaceID identity embeddings with insightface's
``buffalo_l`` FaceAnalysis (reference: source/app.py:800-825 ->
``normed_embedding``), whose recognition model is an ArcFace iResNet-50
(the ``w600k_r50`` weights, distributed in PyTorch form as the
``arcface_torch`` ``backbone.pth`` layout). This is the TPU-native
equivalent satisfying the 512-d contract documented in
``ops/face_embed.py``:

  * iResNet: 3x3 stem (stride 1) + PReLU, four pre-activation IBasicBlock
    stages (bn1 -> conv1 -> bn2 -> PReLU -> conv2(stride) -> bn3, 1x1
    downsample shortcut), final BN, flatten, 512-d fc, BatchNorm1d
    "features" head;
  * inference BatchNorm is converted to per-channel (scale, bias) affines
    (running stats folded at conversion);
  * input: (112, 112) RGB face crop, normalized (x - 127.5) / 127.5;
    output: L2-normalized (512,) float32 (``normed_embedding``).

Face *detection/alignment* (the buffalo_l SCRFD detector) is out of scope:
like the reference's UI, the caller supplies the face crop.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@dataclasses.dataclass(frozen=True)
class ArcFaceConfig:
    layers: Tuple[int, int, int, int] = (3, 4, 14, 3)  # iResNet-50
    widths: Tuple[int, int, int, int] = (64, 128, 256, 512)
    stem_channels: int = 64
    embed_dim: int = 512
    input_size: int = 112

    @property
    def final_spatial(self) -> int:
        return self.input_size // 16  # four stride-2 stages


#: small preset for random-init tests (same structure, fast on CPU)
ARCFACE_TINY = ArcFaceConfig(
    layers=(1, 1, 2, 1), widths=(8, 12, 16, 24), stem_channels=8,
    embed_dim=32, input_size=32,
)


def _affine(p, x):
    """Inference BatchNorm as a per-channel affine over the last axis."""
    y = x.astype(jnp.float32) * p["scale"].astype(jnp.float32) + p[
        "bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _conv(p, x, stride=1):
    k = p["kernel"]
    pad = (k.shape[0] - 1) // 2
    y = lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y.astype(x.dtype)


def _prelu(p, x):
    a = p["alpha"].astype(x.dtype)
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def _affine_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _conv_init(key, in_c, out_c, k, dtype):
    fan = in_c * k * k
    return {"kernel": (
        jax.random.normal(key, (k, k, in_c, out_c), jnp.float32)
        / math.sqrt(fan)).astype(dtype)}


def arcface_init(key, cfg: ArcFaceConfig = ArcFaceConfig(),
                 dtype=jnp.float32) -> Dict[str, Any]:
    n = sum(cfg.layers)
    ks = iter(jax.random.split(key, 3 * n + 8))
    params: Dict[str, Any] = {
        "conv1": _conv_init(next(ks), 3, cfg.stem_channels, 3, dtype),
        "bn1": _affine_init(cfg.stem_channels, dtype),
        "prelu": {"alpha": jnp.full((cfg.stem_channels,), 0.25, dtype)},
    }
    in_c = cfg.stem_channels
    stages: List[List[Dict[str, Any]]] = []
    for w, reps in zip(cfg.widths, cfg.layers):
        blocks = []
        for i in range(reps):
            blk = {
                "bn1": _affine_init(in_c, dtype),
                "conv1": _conv_init(next(ks), in_c, w, 3, dtype),
                "bn2": _affine_init(w, dtype),
                "prelu": {"alpha": jnp.full((w,), 0.25, dtype)},
                "conv2": _conv_init(next(ks), w, w, 3, dtype),
                "bn3": _affine_init(w, dtype),
            }
            if i == 0:  # stride-2 + (possible) channel change shortcut
                blk["down"] = {
                    "conv": _conv_init(next(ks), in_c, w, 1, dtype),
                    "bn": _affine_init(w, dtype),
                }
            blocks.append(blk)
            in_c = w
        stages.append(blocks)
    params["stages"] = stages
    params["bn2"] = _affine_init(in_c, dtype)
    fc_in = in_c * cfg.final_spatial ** 2
    params["fc"] = {
        "kernel": (jax.random.normal(next(ks), (fc_in, cfg.embed_dim),
                                     jnp.float32)
                   / math.sqrt(fc_in)).astype(dtype),
        "bias": jnp.zeros((cfg.embed_dim,), dtype),
    }
    params["features"] = _affine_init(cfg.embed_dim, dtype)
    return params


# ---------------------------------------------------------------------------
# Converter (arcface_torch ``backbone.pth`` layout)
# ---------------------------------------------------------------------------


def _bn_affine(sd, key, dtype, eps=1e-5):
    gamma = np.asarray(sd.get(f"{key}.weight"), np.float32)
    beta = np.asarray(sd.get(f"{key}.bias"), np.float32)
    mean = np.asarray(sd.get(f"{key}.running_mean"), np.float32)
    var = np.asarray(sd.get(f"{key}.running_var"), np.float32)
    scale = gamma / np.sqrt(var + eps)
    return {"scale": jnp.asarray(scale, dtype),
            "bias": jnp.asarray(beta - scale * mean, dtype)}


def _conv_w(sd, key, dtype):
    w = np.asarray(sd.get(f"{key}.weight"), np.float32)
    return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0), dtype)}


def convert_arcface(sd, cfg: ArcFaceConfig = ArcFaceConfig(),
                    dtype=jnp.float32) -> Dict[str, Any]:
    """``sd``: convert.hf.StateDict over an arcface_torch iResNet
    ``backbone.pth`` (keys conv1/bn1/prelu/layer1..4/bn2/fc/features)."""
    params: Dict[str, Any] = {
        "conv1": _conv_w(sd, "conv1", dtype),
        "bn1": _bn_affine(sd, "bn1", dtype),
        "prelu": {"alpha": jnp.asarray(
            np.asarray(sd.get("prelu.weight"), np.float32), dtype)},
    }
    stages: List[List[Dict[str, Any]]] = []
    for li, reps in enumerate(cfg.layers, 1):
        blocks = []
        for i in range(reps):
            b = f"layer{li}.{i}"
            blk = {
                "bn1": _bn_affine(sd, f"{b}.bn1", dtype),
                "conv1": _conv_w(sd, f"{b}.conv1", dtype),
                "bn2": _bn_affine(sd, f"{b}.bn2", dtype),
                "prelu": {"alpha": jnp.asarray(np.asarray(
                    sd.get(f"{b}.prelu.weight"), np.float32), dtype)},
                "conv2": _conv_w(sd, f"{b}.conv2", dtype),
                "bn3": _bn_affine(sd, f"{b}.bn3", dtype),
            }
            if f"{b}.downsample.0.weight" in sd.tensors:
                blk["down"] = {
                    "conv": _conv_w(sd, f"{b}.downsample.0", dtype),
                    "bn": _bn_affine(sd, f"{b}.downsample.1", dtype),
                }
            blocks.append(blk)
        stages.append(blocks)
    params["stages"] = stages
    params["bn2"] = _bn_affine(sd, "bn2", dtype)
    # torch fc flattens NCHW (c-major); ours flattens NHWC -> permute
    s = cfg.final_spatial
    c = cfg.widths[-1]
    w = np.asarray(sd.get("fc.weight"), np.float32)  # (E, c*s*s)
    w = w.reshape(cfg.embed_dim, c, s, s).transpose(0, 2, 3, 1)
    params["fc"] = {
        "kernel": jnp.asarray(
            w.reshape(cfg.embed_dim, s * s * c).T, dtype),
        "bias": jnp.asarray(np.asarray(sd.get("fc.bias"), np.float32),
                            dtype),
    }
    params["features"] = _bn_affine(sd, "features", dtype)
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _block_apply(blk, x, stride):
    h = _affine(blk["bn1"], x)
    h = _conv(blk["conv1"], h)
    h = _prelu(blk["prelu"], _affine(blk["bn2"], h))
    h = _conv(blk["conv2"], h, stride=stride)
    h = _affine(blk["bn3"], h)
    if "down" in blk:
        x = _affine(blk["down"]["bn"],
                    _conv(blk["down"]["conv"], x, stride=stride))
    return h + x


def arcface_apply(params, cfg: ArcFaceConfig, pixels) -> jnp.ndarray:
    """pixels: (B, S, S, 3) in [-1, 1] (S = cfg.input_size). Returns raw
    (B, embed_dim) float32 embeddings (normalize for ``normed_embedding``)."""
    x = _conv(params["conv1"], pixels)
    x = _prelu(params["prelu"], _affine(params["bn1"], x))
    for blocks in params["stages"]:
        for i, blk in enumerate(blocks):
            x = _block_apply(blk, x, 2 if i == 0 else 1)
    x = _affine(params["bn2"], x)
    b = x.shape[0]
    flat = x.reshape(b, -1)
    emb = jnp.dot(flat, params["fc"]["kernel"].astype(flat.dtype),
                  preferred_element_type=jnp.float32)
    emb = emb + params["fc"]["bias"].astype(jnp.float32)
    return _affine(params["features"], emb).astype(jnp.float32)


def make_arcface_embedder(params, cfg: ArcFaceConfig = ArcFaceConfig()):
    """Returns ``embed(image) -> (embed_dim,) float32 L2-normalized`` —
    the insightface ``normed_embedding`` contract of ops/face_embed.py.
    The crop is resized to the model's input size and normalized
    (x - 127.5) / 127.5 as insightface's ArcFaceONNX does."""
    apply = jax.jit(lambda p, x: arcface_apply(p, cfg, x))

    def embed(image: np.ndarray) -> np.ndarray:
        img = np.asarray(image)
        if img.dtype != np.uint8 and img.max() <= 1.0:
            img = img * 255.0
        img = img.astype(np.float32)
        if img.ndim != 3 or img.shape[-1] != 3:
            raise ValueError(
                f"expected (H, W, 3) face crop, got {img.shape}")
        s = cfg.input_size
        if img.shape[:2] != (s, s):
            img = np.asarray(jax.image.resize(jnp.asarray(img), (s, s, 3),
                                              "bilinear"))
        x = (img - 127.5) / 127.5
        emb = np.asarray(apply(params, jnp.asarray(x)[None])[0], np.float32)
        n = float(np.linalg.norm(emb))
        return emb / max(n, 1e-12)

    return embed

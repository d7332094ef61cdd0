"""UperNet (ConvNeXt backbone) semantic segmentation.

The reference's "Semantic Segmentation" control preprocessor runs
transformers' UperNetForSemanticSegmentation over 9 openmmlab checkpoints
(reference: source/modules/preprocessing_segmentation.py:8-46). This is the
TPU-native equivalent for the ConvNeXt-backbone family: a functional JAX
ConvNeXt backbone + UperNet (PSP + FPN) head, with a converter consuming
the transformers weight layout; numerics validated against the torch
implementation on random-init tiny configs (tests/test_preprocess.py).

Swin-backbone variants are not implemented; the ConvNeXt five cover the
reference's default ("Convnet tiny" is its UI default).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import conv2d, layer_norm

ADE20K_NUM_LABELS = 150


@dataclasses.dataclass(frozen=True)
class UperNetConfig:
    """Defaults = openmmlab/upernet-convnext-tiny."""

    hidden_sizes: Tuple[int, ...] = (96, 192, 384, 768)  # ConvNeXt stages
    depths: Tuple[int, ...] = (3, 3, 9, 3)
    head_channels: int = 512  # UperNet hidden_size
    pool_scales: Tuple[int, ...] = (1, 2, 3, 6)
    num_labels: int = ADE20K_NUM_LABELS
    layer_norm_eps: float = 1e-6


# ---------------------------------------------------------------------------
# ConvNeXt backbone (eval semantics: drop-path = identity)
# ---------------------------------------------------------------------------


def _dwconv7(p, x):
    """Depthwise 7x7 conv, NHWC."""
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),  # (7, 7, 1, C)
        (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + p["bias"].astype(x.dtype)


def _convnext_block(p, x, eps):
    h = _dwconv7(p["dwconv"], x)
    h = layer_norm(p["layernorm"], h, eps=eps)
    h = jnp.dot(h, p["pwconv1"]["kernel"]) + p["pwconv1"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    h = jnp.dot(h, p["pwconv2"]["kernel"]) + p["pwconv2"]["bias"]
    if "layer_scale" in p:
        h = h * p["layer_scale"]
    return x + h


def convnext_backbone_apply(params, cfg: UperNetConfig, pixels: jnp.ndarray
                            ) -> List[jnp.ndarray]:
    """pixels (B, H, W, 3) normalized -> 4 feature maps at strides
    4/8/16/32, each passed through the backbone's per-stage LayerNorm
    (ConvNextBackbone.hidden_states_norms)."""
    eps = cfg.layer_norm_eps
    h = conv2d(params["patch_embeddings"], pixels.astype(jnp.float32),
               stride=4, padding="VALID")
    h = layer_norm(params["embeddings_norm"], h, eps=eps)
    feats = []
    for s, stage in enumerate(params["stages"]):
        if s > 0:
            h = layer_norm(stage["downsample_norm"], h, eps=eps)
            h = conv2d(stage["downsample_conv"], h, stride=2,
                       padding="VALID")
        for block in stage["blocks"]:
            h = _convnext_block(block, h, eps)
        feats.append(layer_norm(params["out_norms"][s], h, eps=eps))
    return feats


# ---------------------------------------------------------------------------
# UperNet head (PSP + FPN); BN in eval mode (running stats)
# ---------------------------------------------------------------------------


def _conv_bn_relu(p, x, padding="VALID"):
    h = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        p["kernel"].astype(jnp.float32),
        (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    scale = p["bn_scale"] / jnp.sqrt(p["bn_var"] + 1e-5)
    h = h * scale + (p["bn_bias"] - p["bn_mean"] * scale)
    return jax.nn.relu(h)


def _adaptive_avg_pool(x, s: int):
    """torch AdaptiveAvgPool2d(s): bin i = [floor(i*H/s), ceil((i+1)*H/s))."""
    b, h, w, c = x.shape
    rows = []
    for i in range(s):
        y0, y1 = (i * h) // s, -(-((i + 1) * h) // s)
        cols = []
        for j in range(s):
            x0, x1 = (j * w) // s, -(-((j + 1) * w) // s)
            cols.append(x[:, y0:y1, x0:x1].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, s, s, C)


def _resize_bilinear(x, oh, ow):
    """torch F.interpolate(bilinear, align_corners=False) for up- AND
    down-scaling. jax.image.resize antialiases when downscaling (torch
    does not), so sample explicitly at half-pixel centers."""
    from .dpt import _bilinear_gather

    h, w = x.shape[1:3]
    ys = jnp.clip((jnp.arange(oh) + 0.5) * (h / oh) - 0.5, 0.0, h - 1.0)
    xs = jnp.clip((jnp.arange(ow) + 0.5) * (w / ow) - 0.5, 0.0, w - 1.0)
    return _bilinear_gather(x, ys, xs)


def upernet_head_apply(params, cfg: UperNetConfig,
                       feats: List[jnp.ndarray]) -> jnp.ndarray:
    """4 backbone features -> (B, H/4, W/4, num_labels) logits."""
    # PSP on the deepest feature
    top = feats[-1].astype(jnp.float32)
    h, w = top.shape[1:3]
    psp_outs = [top]
    for blk, s in zip(params["psp_blocks"], cfg.pool_scales):
        pooled = _adaptive_avg_pool(top, s)
        pooled = _conv_bn_relu(blk, pooled)
        psp_outs.append(_resize_bilinear(pooled, h, w))
    psp = _conv_bn_relu(params["bottleneck"],
                        jnp.concatenate(psp_outs, axis=-1),
                        padding=[(1, 1), (1, 1)])

    laterals = [
        _conv_bn_relu(params["lateral_convs"][i], feats[i].astype(
            jnp.float32))
        for i in range(len(feats) - 1)
    ] + [psp]
    for i in range(len(laterals) - 1, 0, -1):
        ph, pw = laterals[i - 1].shape[1:3]
        laterals[i - 1] = laterals[i - 1] + _resize_bilinear(
            laterals[i], ph, pw
        )
    fpn_outs = [
        _conv_bn_relu(params["fpn_convs"][i], laterals[i],
                      padding=[(1, 1), (1, 1)])
        for i in range(len(laterals) - 1)
    ] + [laterals[-1]]
    oh, ow = fpn_outs[0].shape[1:3]
    fpn_outs = [fpn_outs[0]] + [
        _resize_bilinear(f, oh, ow) for f in fpn_outs[1:]
    ]
    out = _conv_bn_relu(params["fpn_bottleneck"],
                        jnp.concatenate(fpn_outs, axis=-1),
                        padding=[(1, 1), (1, 1)])
    logits = conv2d(params["classifier"], out, padding="VALID")
    return logits


def upernet_apply(params, cfg: UperNetConfig, pixels: jnp.ndarray
                  ) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H, W, num_labels) logits (bilinear-upsampled,
    align_corners=False — UperNetForSemanticSegmentation.forward)."""
    feats = convnext_backbone_apply(params["backbone"], cfg, pixels)
    logits = upernet_head_apply(params["head"], cfg, feats)
    return _resize_bilinear(logits, pixels.shape[1], pixels.shape[2])


# ---------------------------------------------------------------------------
# Init / conversion
# ---------------------------------------------------------------------------


def upernet_init(key, cfg: UperNetConfig, dtype=jnp.float32
                 ) -> Dict[str, Any]:
    def _c(k, kh, kw, i, o, bias=True):
        p = {"kernel": jax.random.normal(k, (kh, kw, i, o), jnp.float32)
             .astype(dtype) * (1.0 / np.sqrt(kh * kw * i))}
        if bias:
            p["bias"] = jnp.zeros((o,), dtype)
        return p

    def _ln(c):
        return {"scale": jnp.ones((c,), dtype),
                "bias": jnp.zeros((c,), dtype)}

    def _lin(k, i, o):
        return {"kernel": jax.random.normal(k, (i, o), jnp.float32)
                .astype(dtype) * (1.0 / np.sqrt(i)),
                "bias": jnp.zeros((o,), dtype)}

    def _cbr(k, kh, i, o):
        return {
            "kernel": jax.random.normal(k, (kh, kh, i, o), jnp.float32)
            .astype(dtype) * (1.0 / np.sqrt(kh * kh * i)),
            "bn_scale": jnp.ones((o,), jnp.float32),
            "bn_bias": jnp.zeros((o,), jnp.float32),
            "bn_mean": jnp.zeros((o,), jnp.float32),
            "bn_var": jnp.ones((o,), jnp.float32),
        }

    keys = iter(jax.random.split(key, 256))
    hs = cfg.hidden_sizes
    backbone: Dict[str, Any] = {
        "patch_embeddings": _c(next(keys), 4, 4, 3, hs[0]),
        "embeddings_norm": _ln(hs[0]),
        "stages": [],
        "out_norms": [_ln(c) for c in hs],
    }
    for s, (c, depth) in enumerate(zip(hs, cfg.depths)):
        stage: Dict[str, Any] = {"blocks": []}
        if s > 0:
            stage["downsample_norm"] = _ln(hs[s - 1])
            stage["downsample_conv"] = _c(next(keys), 2, 2, hs[s - 1], c)
        for _ in range(depth):
            k1, k2, k3 = jax.random.split(next(keys), 3)
            stage["blocks"].append({
                "dwconv": {"kernel": jax.random.normal(
                    k1, (7, 7, 1, c), jnp.float32).astype(dtype) * 0.02,
                    "bias": jnp.zeros((c,), dtype)},
                "layernorm": _ln(c),
                "pwconv1": _lin(k2, c, 4 * c),
                "pwconv2": _lin(k3, 4 * c, c),
                "layer_scale": jnp.full((c,), 1e-6, dtype),
            })
        backbone["stages"].append(stage)

    ch = cfg.head_channels
    head = {
        "psp_blocks": [_cbr(next(keys), 1, hs[-1], ch)
                       for _ in cfg.pool_scales],
        "bottleneck": _cbr(next(keys), 3,
                           hs[-1] + len(cfg.pool_scales) * ch, ch),
        "lateral_convs": [_cbr(next(keys), 1, c, ch) for c in hs[:-1]],
        "fpn_convs": [_cbr(next(keys), 3, ch, ch) for _ in hs[:-1]],
        "fpn_bottleneck": _cbr(next(keys), 3, len(hs) * ch, ch),
        "classifier": _c(next(keys), 1, 1, ch, cfg.num_labels),
    }
    return {"backbone": backbone, "head": head}


def convert_upernet(sd, cfg: UperNetConfig, dtype=jnp.float32
                    ) -> Dict[str, Any]:
    """``sd``: convert.hf.StateDict over an
    UperNetForSemanticSegmentation (ConvNeXt backbone) checkpoint."""
    from ..convert.hf import _conv, _linear, _norm

    def _cbr(pre):
        return {
            "kernel": jnp.asarray(
                sd.get(f"{pre}.conv.weight").transpose(2, 3, 1, 0), dtype
            ),
            "bn_scale": jnp.asarray(sd.get(f"{pre}.batch_norm.weight"),
                                    jnp.float32),
            "bn_bias": jnp.asarray(sd.get(f"{pre}.batch_norm.bias"),
                                   jnp.float32),
            "bn_mean": jnp.asarray(
                sd.get(f"{pre}.batch_norm.running_mean"), jnp.float32),
            "bn_var": jnp.asarray(
                sd.get(f"{pre}.batch_norm.running_var"), jnp.float32),
        }

    bb = "backbone"
    backbone: Dict[str, Any] = {
        "patch_embeddings": _conv(
            sd, f"{bb}.embeddings.patch_embeddings", dtype
        ),
        "embeddings_norm": _norm(sd, f"{bb}.embeddings.layernorm", dtype),
        "stages": [],
        "out_norms": [
            _norm(sd, f"{bb}.hidden_states_norms.stage{s + 1}", dtype)
            for s in range(len(cfg.hidden_sizes))
        ],
    }
    for s in range(len(cfg.hidden_sizes)):
        pre = f"{bb}.encoder.stages.{s}"
        stage: Dict[str, Any] = {"blocks": []}
        if s > 0:
            stage["downsample_norm"] = _norm(
                sd, f"{pre}.downsampling_layer.0", dtype
            )
            stage["downsample_conv"] = _conv(
                sd, f"{pre}.downsampling_layer.1", dtype
            )
        for i in range(cfg.depths[s]):
            bp = f"{pre}.layers.{i}"
            block = {
                "dwconv": {
                    # torch depthwise (C, 1, 7, 7) -> HWIO (7, 7, 1, C)
                    "kernel": jnp.asarray(
                        sd.get(f"{bp}.dwconv.weight").transpose(2, 3, 1, 0),
                        dtype,
                    ),
                    "bias": jnp.asarray(sd.get(f"{bp}.dwconv.bias"), dtype),
                },
                "layernorm": _norm(sd, f"{bp}.layernorm", dtype),
                "pwconv1": _linear(sd, f"{bp}.pwconv1", dtype),
                "pwconv2": _linear(sd, f"{bp}.pwconv2", dtype),
            }
            if f"{bp}.layer_scale_parameter" in sd.tensors:
                block["layer_scale"] = jnp.asarray(
                    sd.get(f"{bp}.layer_scale_parameter"), dtype
                )
            stage["blocks"].append(block)
        backbone["stages"].append(stage)

    dh = "decode_head"
    head = {
        "psp_blocks": [
            _cbr(f"{dh}.psp_modules.{i}.1")
            for i in range(len(cfg.pool_scales))
        ],
        "bottleneck": _cbr(f"{dh}.bottleneck"),
        "lateral_convs": [
            _cbr(f"{dh}.lateral_convs.{i}")
            for i in range(len(cfg.hidden_sizes) - 1)
        ],
        "fpn_convs": [
            _cbr(f"{dh}.fpn_convs.{i}")
            for i in range(len(cfg.hidden_sizes) - 1)
        ],
        "fpn_bottleneck": _cbr(f"{dh}.fpn_bottleneck"),
        "classifier": _conv(sd, f"{dh}.classifier", dtype),
    }
    return {"backbone": backbone, "head": head}


def segmentation_to_control_image(seg: np.ndarray,
                                  seed: int = 0) -> np.ndarray:
    """Label map (H, W) int -> random-color region image (H, W, 3) in
    [0, 1] (reference: preprocessing_segmentation.py:34-46 draws a random
    color per present label; we key the palette on a fixed seed + label id
    so outputs are deterministic)."""
    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, (ADE20K_NUM_LABELS + 1, 3))
    out = palette[np.asarray(seg, np.int32) % (ADE20K_NUM_LABELS + 1)]
    return out.astype(np.float32) / 255.0

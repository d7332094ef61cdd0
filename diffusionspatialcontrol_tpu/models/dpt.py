"""DPT (dense prediction transformer) depth estimation — MiDaS 3.0 family.

The reference's Depth control preprocessor runs controlnet_aux's MiDaS
detector (reference: source/app.py:92-101, 654-757). This is the TPU-native
equivalent: a functional JAX DPT (plain-ViT backbone, e.g. Intel/dpt-large)
whose converter consumes the transformers ``DPTForDepthEstimation`` weight
layout; numerics are validated against the torch implementation on
random-init tiny configs (tests/test_preprocess.py).

Architecture (mirrors transformers modeling_dpt.py for is_hybrid=False):
  pixels -> patch conv + cls + pos-emb -> L pre-LN ViT layers; features
  are the raw hidden states after ``backbone_out_indices`` layers (the
  final encoder layernorm is NOT applied to them); each feature is
  reassembled (readout-project cls, 1x1 channel projection, x4/x2/x1/x0.5
  resize), projected to the fusion width, fused coarse-to-fine with
  pre-activation residual units + 2x upsampling, and decoded by the
  3-conv depth head.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import conv2d, conv_init, layer_norm, linear, linear_init, norm_init


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    """Defaults = Intel/dpt-large (MiDaS 3.0)."""

    image_size: int = 384
    patch_size: int = 16
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    backbone_out_indices: Tuple[int, ...] = (5, 11, 17, 23)
    neck_hidden_sizes: Tuple[int, ...] = (256, 512, 1024, 1024)
    reassemble_factors: Tuple[float, ...] = (4.0, 2.0, 1.0, 0.5)
    fusion_hidden_size: int = 256
    layer_norm_eps: float = 1e-12


def dpt_init(key, cfg: DPTConfig, dtype=jnp.float32) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.num_layers + 32)
    ki = iter(keys)
    d = cfg.hidden_size
    grid = cfg.image_size // cfg.patch_size
    params: Dict[str, Any] = {
        "cls_token": jnp.zeros((d,), dtype),
        "position_embeddings": jax.random.normal(
            next(ki), (grid * grid + 1, d), jnp.float32
        ).astype(dtype) * 0.02,
        "patch_embedding": conv_init(next(ki), 3, d, cfg.patch_size, dtype),
        "layers": [],
    }
    for _ in range(cfg.num_layers):
        k = jax.random.split(next(ki), 6)
        params["layers"].append({
            "layernorm_before": norm_init(d, dtype),
            "query": linear_init(k[0], d, d, dtype=dtype),
            "key": linear_init(k[1], d, d, dtype=dtype),
            "value": linear_init(k[2], d, d, dtype=dtype),
            "out": linear_init(k[3], d, d, dtype=dtype),
            "layernorm_after": norm_init(d, dtype),
            "fc1": linear_init(k[4], d, cfg.intermediate_size, dtype=dtype),
            "fc2": linear_init(k[5], cfg.intermediate_size, d, dtype=dtype),
        })
    # neck: per-stage readout projection + reassemble + fusion
    stages = []
    f = cfg.fusion_hidden_size
    for i, (c, factor) in enumerate(
        zip(cfg.neck_hidden_sizes, cfg.reassemble_factors)
    ):
        k = jax.random.split(next(ki), 5)
        stage = {
            "readout": linear_init(k[0], 2 * d, d, dtype=dtype),
            "projection": conv_init(k[1], d, c, 1, dtype),
            "neck_conv": {
                "kernel": conv_init(k[2], c, f, 3, dtype)["kernel"]
            },  # bias=False
            "fusion": {
                "projection": conv_init(k[3], f, f, 1, dtype),
                "res1": _residual_init(jax.random.split(k[4], 2)[0], f,
                                       dtype),
                "res2": _residual_init(jax.random.split(k[4], 2)[1], f,
                                       dtype),
            },
        }
        if factor > 1:
            # ConvTranspose k=s=factor: torch layout (in, out, kh, kw) kept
            stage["resize_up"] = {
                "kernel": jax.random.normal(
                    jax.random.fold_in(k[1], 7),
                    (c, c, int(factor), int(factor)), jnp.float32
                ).astype(dtype) * 0.02,
                "bias": jnp.zeros((c,), dtype),
            }
        elif factor < 1:
            stage["resize_down"] = conv_init(
                jax.random.fold_in(k[1], 8), c, c, 3, dtype
            )
        stages.append(stage)
    params["stages"] = stages
    params["head"] = {
        "conv1": conv_init(next(ki), f, f // 2, 3, dtype),
        "conv2": conv_init(next(ki), f // 2, 32, 3, dtype),
        "conv3": conv_init(next(ki), 32, 1, 1, dtype),
    }
    return params


def _residual_init(key, f, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv_init(k1, f, f, 3, dtype),
        "conv2": conv_init(k2, f, f, 3, dtype),
    }


def _residual_apply(p, x):
    """Pre-activation residual conv unit (DPTPreActResidualLayer)."""
    h = jax.nn.relu(x)
    h = conv2d(p["conv1"], h)
    h = jax.nn.relu(h)
    h = conv2d(p["conv2"], h)
    return x + h


def _upsample2x(x, align_corners=True):
    b, h, w, c = x.shape
    if align_corners:
        # torch bilinear align_corners=True: endpoints map to endpoints
        ys = jnp.linspace(0.0, h - 1.0, 2 * h)
        xs = jnp.linspace(0.0, w - 1.0, 2 * w)
        return _bilinear_gather(x, ys, xs)
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), "bilinear")


def _bilinear_gather(x, ys, xs):
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, x.shape[1] - 1)
    y1 = jnp.clip(y0 + 1, 0, x.shape[1] - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, x.shape[2] - 1)
    x1 = jnp.clip(x0 + 1, 0, x.shape[2] - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    c = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx)


def _resize_bilinear_torch(x, oh, ow):
    """torch F.interpolate(mode=bilinear, align_corners=False) equivalent
    (half-pixel centers) — jax.image.resize('bilinear') matches this."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, oh, ow, c), "bilinear")


def _conv_transpose_eq(p, x, factor: int):
    """ConvTranspose2d with kernel_size == stride == factor: each input
    pixel expands to an independent factor x factor block (exact, no
    overlap). torch weight layout (in, out, kh, kw)."""
    w = p["kernel"].astype(jnp.float32)  # (in, out, f, f)
    y = jnp.einsum("bhwc,cofg->bhfwgo", x.astype(jnp.float32), w)
    b, hh, f1, ww, f2, o = y.shape
    y = y.reshape(b, hh * f1, ww * f2, o)
    return y + p["bias"].astype(jnp.float32)


def dpt_apply(params, cfg: DPTConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels: (B, H, W, 3), ImageNet-ish normalized (the MiDaS processor
    scales to [0,1] then (x-0.5)/0.5). Returns predicted inverse depth
    (B, H', W') with H' = H // patch * 4 * ... (2x the fused resolution)."""
    ph = pixels.shape[1] // cfg.patch_size
    pw = pixels.shape[2] // cfg.patch_size
    d = cfg.hidden_size

    h = conv2d(params["patch_embedding"], pixels.astype(jnp.float32),
               stride=cfg.patch_size, padding="VALID")
    b = h.shape[0]
    tokens = h.reshape(b, ph * pw, d)
    cls = jnp.broadcast_to(params["cls_token"][None, None], (b, 1, d))
    tokens = jnp.concatenate([cls.astype(tokens.dtype), tokens], axis=1)

    pos = params["position_embeddings"].astype(jnp.float32)
    grid = int(round((pos.shape[0] - 1) ** 0.5))
    if (ph, pw) != (grid, grid):
        pos_grid = pos[1:].reshape(grid, grid, d)[None]
        pos_grid = jax.image.resize(pos_grid, (1, ph, pw, d), "bilinear")
        pos = jnp.concatenate([pos[:1], pos_grid.reshape(ph * pw, d)])
    tokens = tokens + pos[None].astype(tokens.dtype)

    wanted = set(cfg.backbone_out_indices)
    feats: List[jnp.ndarray] = []
    x = tokens
    for i, layer in enumerate(params["layers"]):
        hn = layer_norm(layer["layernorm_before"], x,
                        eps=cfg.layer_norm_eps)
        q = linear(layer["query"], hn)
        k = linear(layer["key"], hn)
        v = linear(layer["value"], hn)

        def split(t):
            return t.reshape(b, t.shape[1], cfg.num_heads, -1)

        att = jax.nn.dot_product_attention(split(q), split(k), split(v))
        att = att.reshape(q.shape)
        x = x + linear(layer["out"], att)
        hn = layer_norm(layer["layernorm_after"], x, eps=cfg.layer_norm_eps)
        x = x + linear(layer["fc2"],
                       jax.nn.gelu(linear(layer["fc1"], hn),
                                   approximate=False))
        if i in wanted:
            feats.append(x)

    # reassemble + neck convs
    necked = []
    for stage, feat in zip(params["stages"], feats):
        cls_tok, toks = feat[:, 0], feat[:, 1:]
        fm = toks.reshape(b, ph, pw, d)
        readout = jnp.broadcast_to(cls_tok[:, None, None], fm.shape)
        fm = jax.nn.gelu(
            linear(stage["readout"],
                   jnp.concatenate([fm, readout], axis=-1)),
            approximate=False,
        )
        fm = conv2d(stage["projection"], fm, padding="VALID")
        if "resize_up" in stage:
            factor = stage["resize_up"]["kernel"].shape[-1]
            fm = _conv_transpose_eq(stage["resize_up"], fm, factor)
        elif "resize_down" in stage:
            # torch conv 3x3 stride-2 pad-1: symmetric pad, then VALID
            # (XLA "SAME" would pad (0, 1) — different sample positions)
            fm = jnp.pad(fm, ((0, 0), (1, 1), (1, 1), (0, 0)))
            fm = conv2d(stage["resize_down"], fm, stride=2,
                        padding="VALID")
        fm = jax.lax.conv_general_dilated(
            fm.astype(jnp.float32),
            stage["neck_conv"]["kernel"].astype(jnp.float32),
            (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        necked.append(fm)

    # fusion, coarse -> fine
    fused = None
    for stage, feat in zip(reversed(params["stages"]), reversed(necked)):
        fus = stage["fusion"]
        if fused is None:
            fused = feat
        else:
            res = feat
            if res.shape[1:3] != fused.shape[1:3]:
                res = _resize_bilinear_torch(res, fused.shape[1],
                                             fused.shape[2])
            fused = fused + _residual_apply(fus["res1"], res)
        fused = _residual_apply(fus["res2"], fused)
        fused = _upsample2x(fused, align_corners=True)
        fused = conv2d(fus["projection"], fused, padding="VALID")

    # head
    hd = params["head"]
    out = conv2d(hd["conv1"], fused)
    out = _upsample2x(out, align_corners=True)
    out = jax.nn.relu(conv2d(hd["conv2"], out))
    out = jax.nn.relu(conv2d(hd["conv3"], out, padding="VALID"))
    return out[..., 0]


# ---------------------------------------------------------------------------
# Conversion from transformers DPTForDepthEstimation
# ---------------------------------------------------------------------------


def convert_dpt(sd, cfg: DPTConfig, dtype=jnp.float32) -> Dict[str, Any]:
    """``sd``: convert.hf.StateDict over a DPTForDepthEstimation checkpoint
    (plain-ViT / is_hybrid=False layout, e.g. Intel/dpt-large)."""
    from ..convert.hf import _conv, _linear, _norm

    d = cfg.hidden_size
    params: Dict[str, Any] = {
        "cls_token": jnp.asarray(
            sd.get("dpt.embeddings.cls_token").reshape(d), dtype
        ),
        "position_embeddings": jnp.asarray(
            sd.get("dpt.embeddings.position_embeddings")[0], dtype
        ),
        "patch_embedding": _conv(
            sd, "dpt.embeddings.patch_embeddings.projection", dtype
        ),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        pre = f"dpt.encoder.layer.{i}"
        params["layers"].append({
            "layernorm_before": _norm(sd, f"{pre}.layernorm_before", dtype),
            "query": _linear(sd, f"{pre}.attention.attention.query", dtype),
            "key": _linear(sd, f"{pre}.attention.attention.key", dtype),
            "value": _linear(sd, f"{pre}.attention.attention.value", dtype),
            "out": _linear(sd, f"{pre}.attention.output.dense", dtype),
            "layernorm_after": _norm(sd, f"{pre}.layernorm_after", dtype),
            "fc1": _linear(sd, f"{pre}.intermediate.dense", dtype),
            "fc2": _linear(sd, f"{pre}.output.dense", dtype),
        })
    stages = []
    for i, factor in enumerate(cfg.reassemble_factors):
        pre = f"neck.reassemble_stage"
        stage = {
            "readout": _linear(sd, f"{pre}.readout_projects.{i}.0", dtype),
            "projection": _conv(sd, f"{pre}.layers.{i}.projection", dtype),
            "neck_conv": {
                "kernel": jnp.asarray(
                    sd.get(f"neck.convs.{i}.weight").transpose(2, 3, 1, 0),
                    dtype,
                )
            },
            "fusion": {
                "projection": _conv(
                    sd, f"neck.fusion_stage.layers.{i}.projection", dtype
                ),
                "res1": {
                    "conv1": _conv(sd, f"neck.fusion_stage.layers.{i}"
                                   ".residual_layer1.convolution1", dtype),
                    "conv2": _conv(sd, f"neck.fusion_stage.layers.{i}"
                                   ".residual_layer1.convolution2", dtype),
                },
                "res2": {
                    "conv1": _conv(sd, f"neck.fusion_stage.layers.{i}"
                                   ".residual_layer2.convolution1", dtype),
                    "conv2": _conv(sd, f"neck.fusion_stage.layers.{i}"
                                   ".residual_layer2.convolution2", dtype),
                },
            },
        }
        if factor > 1:
            # keep torch ConvTranspose layout (in, out, kh, kw)
            stage["resize_up"] = {
                "kernel": jnp.asarray(
                    sd.get(f"{pre}.layers.{i}.resize.weight"), dtype
                ),
                "bias": jnp.asarray(
                    sd.get(f"{pre}.layers.{i}.resize.bias"), dtype
                ),
            }
        elif factor < 1:
            stage["resize_down"] = _conv(sd, f"{pre}.layers.{i}.resize",
                                         dtype)
        stages.append(stage)
    params["stages"] = stages
    params["head"] = {
        "conv1": _conv(sd, "head.head.0", dtype),
        "conv2": _conv(sd, "head.head.2", dtype),
        "conv3": _conv(sd, "head.head.4", dtype),
    }
    return params


def depth_to_control_image(depth: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) inverse depth -> (B, H, W, 3) [0, 1] control image
    (per-image min-max normalization, the MiDaS detector convention)."""
    lo = depth.min(axis=(1, 2), keepdims=True)
    hi = depth.max(axis=(1, 2), keepdims=True)
    norm = (depth - lo) / jnp.maximum(hi - lo, 1e-8)
    return jnp.repeat(norm[..., None], 3, axis=-1)

"""ControlNet (functional JAX): UNet-down-path copy + zero-conv heads.

Capability parity with diffusers ``ControlNetModel`` as driven by the
reference (single + multi ControlNet, per-unit conditioning scale, guess
mode, guidance start/end windows — reference:
source/modules/model_k_diffusion.py:355-424, 733-767 and
source/modules/model_diffusers.py:418-824).

The trunk reuses the UNet building blocks; heads are zero-initialized 1x1
convs exactly like the original, so a freshly-initialized ControlNet is a
no-op (tested)."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ControlNetConfig, UNetConfig
from .layers import conv2d, conv_init, silu, timestep_embedding, linear, linear_init
from .unet import (
    UNetCond,
    _resnet_apply,
    _resnet_init,
    _temb_projections,
    _transformer_apply,
    _transformer_init,
)


def controlnet_init(key, unet_cfg: UNetConfig,
                    cn_cfg: ControlNetConfig = ControlNetConfig(),
                    dtype=jnp.bfloat16) -> Dict[str, Any]:
    keys = jax.random.split(key, 64)
    ki = iter(keys)
    temb_dim = unet_cfg.time_embed_dim
    b0 = unet_cfg.block_out_channels[0]

    params: Dict[str, Any] = {
        "conv_in": conv_init(next(ki), unet_cfg.in_channels, b0, 3, dtype),
        "time_embedding": {
            "linear_1": linear_init(next(ki), b0, temb_dim, dtype=dtype),
            "linear_2": linear_init(next(ki), temb_dim, temb_dim, dtype=dtype),
        },
    }

    # Conditioning embedding (image -> b0 feature map at latent res)
    ce_ch = cn_cfg.conditioning_embedding_out_channels
    ce: Dict[str, Any] = {
        "conv_in": conv_init(next(ki), cn_cfg.conditioning_channels, ce_ch[0],
                             3, dtype),
        "blocks": [],
        "conv_out": conv_init(next(ki), ce_ch[-1], b0, 3, dtype, zero=True),
    }
    for i in range(len(ce_ch) - 1):
        ce["blocks"].append(conv_init(next(ki), ce_ch[i], ce_ch[i], 3, dtype))
        ce["blocks"].append(
            conv_init(next(ki), ce_ch[i], ce_ch[i + 1], 3, dtype)
        )
    params["cond_embedding"] = ce

    # Down path (same topology as the UNet's)
    down = []
    zero_convs = [conv_init(next(ki), b0, b0, 1, dtype, zero=True)]
    in_c = b0
    for level, out_c in enumerate(unet_cfg.block_out_channels):
        block = {"resnets": [], "attentions": []}
        for j in range(unet_cfg.layers_per_block):
            block["resnets"].append(
                _resnet_init(next(ki), in_c if j == 0 else out_c, out_c,
                             temb_dim, dtype)
            )
            if unet_cfg.attn_levels[level]:
                block["attentions"].append(
                    _transformer_init(next(ki), unet_cfg, out_c,
                                      unet_cfg.heads_at(level), dtype)
                )
            zero_convs.append(conv_init(next(ki), out_c, out_c, 1, dtype,
                                        zero=True))
        if level < unet_cfg.num_levels - 1:
            block["downsample"] = conv_init(next(ki), out_c, out_c, 3, dtype)
            zero_convs.append(conv_init(next(ki), out_c, out_c, 1, dtype,
                                        zero=True))
        down.append(block)
        in_c = out_c
    params["down_blocks"] = down
    params["zero_convs"] = zero_convs

    mid_c = unet_cfg.block_out_channels[-1]
    params["mid_block"] = {
        "resnet1": _resnet_init(next(ki), mid_c, mid_c, temb_dim, dtype),
        "attention": _transformer_init(
            next(ki), unet_cfg, mid_c,
            unet_cfg.heads_at(unet_cfg.num_levels - 1), dtype
        ),
        "resnet2": _resnet_init(next(ki), mid_c, mid_c, temb_dim, dtype),
    }
    params["mid_zero_conv"] = conv_init(next(ki), mid_c, mid_c, 1, dtype,
                                        zero=True)
    return params


def controlnet_apply(
    params: Dict[str, Any],
    unet_cfg: UNetConfig,
    sample: jnp.ndarray,  # (B, h, w, 4) scaled latents (x * c_in)
    timesteps: jnp.ndarray,
    context: jnp.ndarray,  # (B, S, D)
    cond_image: jnp.ndarray,  # (B, 8h, 8w, 3) conditioning image in [0, 1]
    conditioning_scale: float | jnp.ndarray = 1.0,
    guess_mode: bool = False,
) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Returns (down_residuals (13 incl. conv_in), mid_residual) scaled.
    In guess mode residuals are ramped logspace(-1, 0) like diffusers."""
    groups, eps_ = unet_cfg.norm_num_groups, unet_cfg.norm_eps
    cond = UNetCond(context=context)

    temb = timestep_embedding(
        timesteps, unet_cfg.block_out_channels[0], unet_cfg.flip_sin_to_cos,
        unet_cfg.freq_shift,
    )
    temb = linear(params["time_embedding"]["linear_1"],
                  temb.astype(sample.dtype))
    temb = linear(params["time_embedding"]["linear_2"], silu(temb))

    # Conditioning embedding
    ce = params["cond_embedding"]
    c = silu(conv2d(ce["conv_in"], cond_image.astype(sample.dtype)))
    for i, blk in enumerate(ce["blocks"]):
        stride = 2 if i % 2 == 1 else 1
        c = silu(conv2d(blk, c, stride=stride))
    c = conv2d(ce["conv_out"], c)

    # Fused time projections (see unet._temb_projections), consumed in
    # traversal order: down resnets then the two mid resnets.
    res_order = [r for blk in params["down_blocks"] for r in blk["resnets"]]
    res_order += [params["mid_block"]["resnet1"],
                  params["mid_block"]["resnet2"]]
    t_it = iter(_temb_projections(res_order, temb))

    h = conv2d(params["conv_in"], sample) + c
    feats = [h]
    for level, block in enumerate(params["down_blocks"]):
        for j in range(len(block["resnets"])):
            h = _resnet_apply(block["resnets"][j], h, temb, groups, eps_,
                              t=next(t_it))
            if block["attentions"]:
                h = _transformer_apply(block["attentions"][j], unet_cfg, h,
                                       cond, level,
                                       unet_cfg.heads_at(level), "xla", None)
            feats.append(h)
        if "downsample" in block:
            h = conv2d(block["downsample"], h, stride=2)
            feats.append(h)

    mid = params["mid_block"]
    h = _resnet_apply(mid["resnet1"], h, temb, groups, eps_, t=next(t_it))
    h = _transformer_apply(mid["attention"], unet_cfg, h, cond,
                           unet_cfg.num_levels - 1,
                           unet_cfg.heads_at(unet_cfg.num_levels - 1), "xla",
                           None)
    h = _resnet_apply(mid["resnet2"], h, temb, groups, eps_, t=next(t_it))

    down_res = tuple(
        conv2d(zc, f, padding="VALID")
        for zc, f in zip(params["zero_convs"], feats)
    )
    mid_res = conv2d(params["mid_zero_conv"], h, padding="VALID")

    if guess_mode:
        scales = jnp.logspace(-1.0, 0.0, len(down_res) + 1)
        down_res = tuple(
            r * (s * conditioning_scale)
            for r, s in zip(down_res, scales[:-1])
        )
        mid_res = mid_res * (scales[-1] * conditioning_scale)
    else:
        down_res = tuple(r * conditioning_scale for r in down_res)
        mid_res = mid_res * conditioning_scale
    return down_res, mid_res

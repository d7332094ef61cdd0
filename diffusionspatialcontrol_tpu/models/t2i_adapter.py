"""T2I-Adapter trunk (TencentARC full_adapter, SD1.5 variant).

Produces the 4 per-level intrablock residual feature maps the UNet consumes
(reference glue: source/modules/t2i_adapter.py:83-118; injection points:
u_net_condition_modify.py:1216-1232). Multi-adapter = sum of per-adapter
outputs x per-adapter scale (diffusers MultiAdapter semantics used at
t2i_adapter.py:85-88)."""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import T2IAdapterConfig
from .layers import conv2d, conv_init


def _pixel_unshuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/f, W/f, C*f*f), channel-major like torch's
    PixelUnshuffle (blocks ordered (C, fh, fw) in the channel dim)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h/f, w/f, c, fh, fw
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


def _resblock_init(key, channels, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "block1": conv_init(k1, channels, channels, 3, dtype),
        "block2": conv_init(k2, channels, channels, 1, dtype),
    }


def _resblock_apply(p, x):
    h = jax.nn.relu(conv2d(p["block1"], x))
    h = conv2d(p["block2"], h, padding="VALID")
    return x + h


def t2i_adapter_init(key, cfg: T2IAdapterConfig = T2IAdapterConfig(),
                     dtype=jnp.bfloat16) -> Dict[str, Any]:
    keys = jax.random.split(key, 32)
    ki = iter(keys)
    in_ch = cfg.in_channels * cfg.downscale_factor**2
    blocks = []
    prev = in_ch
    for level, ch in enumerate(cfg.channels):
        block: Dict[str, Any] = {
            "in_conv": (
                conv_init(next(ki), prev, ch, 3, dtype)
                if prev != ch
                else None
            ),
            "resnets": [
                _resblock_init(next(ki), ch, dtype)
                for _ in range(cfg.num_res_blocks)
            ],
        }
        blocks.append(block)
        prev = ch
    return {"blocks": blocks}


def t2i_adapter_apply(params, cfg: T2IAdapterConfig,
                      image: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """image: (B, H, W, 3) in [0, 1]. Returns 4 feature maps at latent
    resolutions /1, /2, /4, /8."""
    x = _pixel_unshuffle(image, cfg.downscale_factor)
    feats: List[jnp.ndarray] = []
    for level, block in enumerate(params["blocks"]):
        if level > 0:
            # stride-2 avg pool between levels
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
        if block["in_conv"] is not None:
            x = conv2d(block["in_conv"], x)
        for r in block["resnets"]:
            x = _resblock_apply(r, x)
        feats.append(x)
    return tuple(feats)


def multi_adapter_apply(params_list: Sequence, cfg: T2IAdapterConfig,
                        images: Sequence[jnp.ndarray],
                        scales: Sequence[float]) -> Tuple[jnp.ndarray, ...]:
    outs = None
    for p, img, s in zip(params_list, images, scales):
        feats = t2i_adapter_apply(p, cfg, img)
        feats = tuple(f * s for f in feats)
        outs = feats if outs is None else tuple(
            a + b for a, b in zip(outs, feats)
        )
    return outs

"""CLIP vision tower (ViT) with projection — IP-Adapter image encoder.

Functional JAX equivalent of ``CLIPVisionModelWithProjection`` as registered
by the reference's IP-Adapter loader (source/modules/ip_adapter.py:197-226).
Default config is OpenCLIP ViT-H/14 (the h94/IP-Adapter image encoder);
``penultimate hidden states`` output feeds the plus/Resampler variants.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from .layers import conv2d, conv_init, layer_norm, linear, linear_init, norm_init


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_layers: int = 32
    num_heads: int = 16
    projection_dim: int = 1024
    layer_norm_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def clip_vision_init(key, cfg: CLIPVisionConfig,
                     dtype=jnp.bfloat16) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.num_layers + 5)
    d = cfg.hidden_size
    params: Dict[str, Any] = {
        "class_embedding": jax.random.normal(keys[0], (d,), jnp.float32)
        .astype(dtype) * 0.02,
        "patch_embedding": conv_init(keys[1], 3, d, cfg.patch_size, dtype),
        "position_embedding": jax.random.normal(
            keys[2], (cfg.num_patches + 1, d), jnp.float32
        ).astype(dtype) * 0.02,
        "pre_layrnorm": norm_init(d, dtype),
        "layers": [],
        "post_layernorm": norm_init(d, dtype),
        "visual_projection": linear_init(keys[3], d, cfg.projection_dim,
                                         bias=False, dtype=dtype),
    }
    # patch embedding has no bias in CLIP
    del params["patch_embedding"]["bias"]
    for i in range(cfg.num_layers):
        k = jax.random.split(keys[4 + i], 6)
        params["layers"].append(
            {
                "layer_norm1": norm_init(d, dtype),
                "q_proj": linear_init(k[0], d, d, dtype=dtype),
                "k_proj": linear_init(k[1], d, d, dtype=dtype),
                "v_proj": linear_init(k[2], d, d, dtype=dtype),
                "out_proj": linear_init(k[3], d, d, dtype=dtype),
                "layer_norm2": norm_init(d, dtype),
                "fc1": linear_init(k[4], d, cfg.intermediate_size,
                                   dtype=dtype),
                "fc2": linear_init(k[5], cfg.intermediate_size, d,
                                   dtype=dtype),
            }
        )
    return params


def _attn(p, x, heads):
    b, l, d = x.shape
    hd = d // heads

    def split(t):
        return t.reshape(b, l, heads, hd)

    q = split(linear(p["q_proj"], x))
    k = split(linear(p["k_proj"], x))
    v = split(linear(p["v_proj"], x))
    out = jax.nn.dot_product_attention(q, k, v)
    return linear(p["out_proj"], out.reshape(b, l, d))


def clip_vision_apply(
    params: Dict[str, Any],
    cfg: CLIPVisionConfig,
    images: jnp.ndarray,  # (B, H, W, 3), CLIP-normalized
    output_hidden_state: bool = False,
):
    """Returns projected image embeds (B, projection_dim); with
    ``output_hidden_state`` instead returns the penultimate hidden states
    (B, 1+P, hidden) used by the plus/Resampler IP-Adapters (diffusers
    encode_image hidden-states path, mirrored by
    model_k_diffusion.py:160-171)."""
    dtype = params["class_embedding"].dtype
    x = images.astype(dtype)
    patches = conv2d(
        {"kernel": params["patch_embedding"]["kernel"],
         "bias": jnp.zeros((cfg.hidden_size,), dtype)},
        x, stride=cfg.patch_size, padding="VALID",
    )
    b = x.shape[0]
    patches = patches.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(
        params["class_embedding"][None, None], (b, 1, cfg.hidden_size)
    )
    h = jnp.concatenate([cls, patches], axis=1)
    h = h + params["position_embedding"][None]
    h = layer_norm(params["pre_layrnorm"], h)

    n_run = cfg.num_layers - (1 if output_hidden_state else 0)
    for layer in params["layers"][:n_run]:
        h = h + _attn(layer, layer_norm(layer["layer_norm1"], h),
                      cfg.num_heads)
        hh = layer_norm(layer["layer_norm2"], h)
        h = h + linear(layer["fc2"],
                       jax.nn.gelu(linear(layer["fc1"], hh),
                                   approximate=True))
    if output_hidden_state:
        return h
    pooled = layer_norm(params["post_layernorm"], h[:, 0])
    return linear(params["visual_projection"], pooled)


CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_image(images: jnp.ndarray,
                     size: int = 224) -> jnp.ndarray:
    """CLIPImageProcessor equivalent (registered by the reference loader,
    ip_adapter.py:222-226): resize to size x size (bicubic) + CLIP
    normalization. images: (B, H, W, 3) in [0, 1] or uint8."""
    x = jnp.asarray(images)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    b = x.shape[0]
    x = jax.image.resize(x, (b, size, size, 3), "cubic")
    mean = jnp.asarray(CLIP_IMAGE_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_IMAGE_STD, jnp.float32)
    return (x - mean) / std

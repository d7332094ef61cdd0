"""AutoencoderKL (functional JAX, NHWC): encoder + decoder.

Capability parity with diffusers' AutoencoderKL as used by the reference for
latent decode (source/modules/model_k_diffusion.py:291-299) and img2img /
inpaint encode (model_k_diffusion.py:605-655). Decode path is the
post-sampling hot op; everything jits into one program.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import VAEConfig
from .layers import conv2d, conv_init, group_norm, linear, linear_init, norm_init, silu


def _resnet_init(key, in_c, out_c, dtype):
    k = jax.random.split(key, 3)
    p = {
        "norm1": norm_init(in_c, dtype),
        "conv1": conv_init(k[0], in_c, out_c, 3, dtype),
        "norm2": norm_init(out_c, dtype),
        "conv2": conv_init(k[1], out_c, out_c, 3, dtype),
    }
    if in_c != out_c:
        p["conv_shortcut"] = conv_init(k[2], in_c, out_c, 1, dtype)
    return p


def _resnet_apply(p, x, groups, conv_impl: str = "xla"):
    if conv_impl in ("pallas", "pallas2"):
        # Same fused one-HBM-pass branch as the UNet resnets (ops/pallas/
        # conv_fused.py; "pallas2" = shift-free implicit GEMM); the
        # decoder's large spatial maps (up to 512^2) take the row-tiled
        # kernel. Falls back per-resnet when the tile search fails.
        from ..ops.pallas.conv_fused import (
            fold_group_norm,
            gn_silu_conv3x3,
            gn_silu_conv3x3_v2,
        )

        fused = gn_silu_conv3x3_v2 if conv_impl == "pallas2" else \
            gn_silu_conv3x3
        try:
            s1, b1 = fold_group_norm(p["norm1"], x, groups, 1e-6)
            h = fused(x, s1, b1, p["conv1"]["kernel"].astype(
                x.dtype), p["conv1"]["bias"])
            s2, b2 = fold_group_norm(p["norm2"], h, groups, 1e-6)
            if "conv_shortcut" in p:
                sc = conv2d(p["conv_shortcut"], x, padding="VALID")
            else:
                sc = x
            return fused(h, s2, b2, p["conv2"]["kernel"].astype(
                h.dtype), p["conv2"]["bias"], skip=sc)
        except ValueError:
            pass
    # "xla_bf16": conv output in the compute dtype instead of fp32 (one
    # extra rounding before the fp32-stats GN; benchmarks/ab_conv_dtype).
    pref = None if conv_impl == "xla_bf16" else jnp.float32
    h = silu(group_norm(p["norm1"], x, groups, 1e-6))
    h = conv2d(p["conv1"], h, preferred=pref)
    h = silu(group_norm(p["norm2"], h, groups, 1e-6))
    h = conv2d(p["conv2"], h, preferred=pref)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding="VALID", preferred=pref)
    return x + h


def _attn_init(key, c, dtype):
    k = jax.random.split(key, 4)
    return {
        "group_norm": norm_init(c, dtype),
        "to_q": linear_init(k[0], c, c, dtype=dtype),
        "to_k": linear_init(k[1], c, c, dtype=dtype),
        "to_v": linear_init(k[2], c, c, dtype=dtype),
        "to_out": linear_init(k[3], c, c, dtype=dtype),
    }


def _attn_apply(p, x, groups):
    b, hh, ww, c = x.shape
    h = group_norm(p["group_norm"], x, groups, 1e-6).reshape(b, hh * ww, c)
    q = linear(p["to_q"], h)[:, :, None, :]  # single head, BTNH layout
    k = linear(p["to_k"], h)[:, :, None, :]
    v = linear(p["to_v"], h)[:, :, None, :]
    out = jax.nn.dot_product_attention(q, k, v)[:, :, 0, :]
    out = linear(p["to_out"], out).reshape(b, hh, ww, c)
    return x + out


def vae_init(key, cfg: VAEConfig, dtype=jnp.bfloat16) -> Dict[str, Any]:
    keys = jax.random.split(key, 40)
    ki = iter(keys)
    chans = cfg.block_out_channels

    # Encoder
    enc: Dict[str, Any] = {"conv_in": conv_init(next(ki), cfg.in_channels,
                                                chans[0], 3, dtype)}
    down = []
    in_c = chans[0]
    for lv, out_c in enumerate(chans):
        block = {"resnets": [
            _resnet_init(next(ki), in_c if j == 0 else out_c, out_c, dtype)
            for j in range(cfg.layers_per_block)
        ]}
        if lv < len(chans) - 1:
            block["downsample"] = conv_init(next(ki), out_c, out_c, 3, dtype)
        down.append(block)
        in_c = out_c
    enc["down_blocks"] = down
    c_last = chans[-1]
    enc["mid"] = {
        "resnet1": _resnet_init(next(ki), c_last, c_last, dtype),
        "attention": _attn_init(next(ki), c_last, dtype),
        "resnet2": _resnet_init(next(ki), c_last, c_last, dtype),
    }
    enc["conv_norm_out"] = norm_init(c_last, dtype)
    enc["conv_out"] = conv_init(next(ki), c_last, 2 * cfg.latent_channels, 3,
                                dtype)
    enc["quant_conv"] = conv_init(next(ki), 2 * cfg.latent_channels,
                                  2 * cfg.latent_channels, 1, dtype)

    # Decoder (may be wider/deeper than the encoder — asymmetric variant)
    dchans = cfg.decoder_block_out_channels or chans
    d_layers = cfg.decoder_layers_per_block or cfg.layers_per_block
    dc_last = dchans[-1]
    dec: Dict[str, Any] = {
        "post_quant_conv": conv_init(next(ki), cfg.latent_channels,
                                     cfg.latent_channels, 1, dtype),
        "conv_in": conv_init(next(ki), cfg.latent_channels, dc_last, 3,
                             dtype),
        "mid": {
            "resnet1": _resnet_init(next(ki), dc_last, dc_last, dtype),
            "attention": _attn_init(next(ki), dc_last, dtype),
            "resnet2": _resnet_init(next(ki), dc_last, dc_last, dtype),
        },
    }
    up = []
    rev = list(reversed(dchans))
    in_c = dc_last
    for lv, out_c in enumerate(rev):
        block = {"resnets": [
            _resnet_init(next(ki), in_c if j == 0 else out_c, out_c, dtype)
            for j in range(d_layers + 1)
        ]}
        if lv < len(rev) - 1:
            block["upsample"] = conv_init(next(ki), out_c, out_c, 3, dtype)
        up.append(block)
        in_c = out_c
    dec["up_blocks"] = up
    dec["conv_norm_out"] = norm_init(rev[-1], dtype)
    dec["conv_out"] = conv_init(next(ki), rev[-1], cfg.out_channels, 3,
                                dtype)
    if cfg.asymmetric:
        dec["condition_encoder"] = mask_condition_encoder_init(
            next(ki), cfg, dtype
        )

    return {"encoder": enc, "decoder": dec}


def _condition_layer_plan(cfg: VAEConfig):
    """(in_c, out_c, stride) per layer of the mask-condition encoder.

    The decoder blends a known-pixel feature into the sample before every
    up block and once at full resolution, so the encoder must emit (ch,
    scale) pairs matching the decoder's pre-block shapes: rev[-1]@1/1 and
    rev[-2]@1/1 via stride-1 convs, then one stride-2 conv per remaining
    scale (same 3x3/4x4 split as diffusers' MaskConditionEncoder)."""
    dchans = cfg.decoder_block_out_channels or cfg.block_out_channels
    rev = list(reversed(dchans))
    outs = [rev[-1], rev[-2]]  # full-res features (final blend + last block)
    strides = [1, 1]
    for i in range(len(rev) - 2, -1, -1):  # 1/2 ... 1/2^(n-1)
        outs.append(rev[max(i - 1, 0)] if i > 0 else rev[0])
        strides.append(2)
    # deepest feature channel must match the decoder's conv_in output
    outs[-1] = dchans[-1]
    plan = []
    in_c = cfg.in_channels + 1  # masked image + mask channel
    for out_c, st in zip(outs, strides):
        plan.append((in_c, out_c, st))
        in_c = out_c
    return plan


def mask_condition_encoder_init(key, cfg: VAEConfig, dtype=jnp.bfloat16):
    plan = _condition_layer_plan(cfg)
    keys = jax.random.split(key, len(plan))
    return {
        "layers": [
            conv_init(k, in_c, out_c, 3 if st == 1 else 4, dtype)
            for k, (in_c, out_c, st) in zip(keys, plan)
        ]
    }


def mask_condition_encoder_apply(p, cfg: VAEConfig, masked_image, mask):
    """Multi-scale known-pixel features keyed by (channels, H, W).

    ``masked_image``: (B, H, W, 3) with the regenerate region zeroed;
    ``mask``: (B, H, W, 1), 1 = regenerate. Features are recorded pre-ReLU
    after each conv and selected by shape during decode (the shape-keyed
    lookup diffusers' MaskConditionDecoder uses)."""
    x = jnp.concatenate(
        [masked_image.astype(mask.dtype), mask], axis=-1
    ).astype(p["layers"][0]["kernel"].dtype)
    feats = {}
    for layer in p["layers"]:
        stride = 2 if layer["kernel"].shape[0] == 4 else 1
        if stride == 2:
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            x = conv2d(layer, x, stride=2, padding="VALID")
        else:
            x = conv2d(layer, x)
        feats[(x.shape[-1], x.shape[1], x.shape[2])] = x
        x = jax.nn.relu(x)
    return feats


def vae_encode(params, cfg: VAEConfig, images: jnp.ndarray,
               rng: jnp.ndarray | None = None, sample_mode: str = "sample",
               conv_impl: str = "xla"):
    """images: (B, H, W, 3) in [-1, 1]. Returns latents (B, H/8, W/8, 4)
    scaled by ``scaling_factor``. ``sample_mode``: 'sample' draws from the
    posterior (reference: retrieve_latents, model_k_diffusion.py:52-58);
    'argmax' returns the mode."""
    enc = params["encoder"]
    g = cfg.norm_num_groups
    h = conv2d(enc["conv_in"], images)
    for block in enc["down_blocks"]:
        for r in block["resnets"]:
            h = _resnet_apply(r, h, g, conv_impl)
        if "downsample" in block:
            # diffusers pads asymmetrically (0,1,0,1) for stride-2 downsample.
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = conv2d(block["downsample"], h, stride=2, padding="VALID")
    h = _resnet_apply(enc["mid"]["resnet1"], h, g, conv_impl)
    h = _attn_apply(enc["mid"]["attention"], h, g)
    h = _resnet_apply(enc["mid"]["resnet2"], h, g, conv_impl)
    h = silu(group_norm(enc["conv_norm_out"], h, g, 1e-6))
    h = conv2d(enc["conv_out"], h)
    moments = conv2d(enc["quant_conv"], h, padding="VALID")
    mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    if sample_mode == "sample":
        if rng is None:
            raise ValueError("sample_mode='sample' requires an rng key")
        std = jnp.exp(0.5 * logvar)
        if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key) and rng.ndim == 1:
            # stacked per-sample keys: each sample's posterior draw depends
            # only on its own key (batch-composition invariance)
            eps = jax.vmap(
                lambda k: jax.random.normal(k, mean.shape[1:], jnp.float32)
            )(rng)
        else:
            eps = jax.random.normal(rng, mean.shape, jnp.float32)
        z = mean + std * eps
    else:
        z = mean
    return z * cfg.scaling_factor


def vae_decode(params, cfg: VAEConfig, latents: jnp.ndarray,
               cond_image: jnp.ndarray | None = None,
               cond_mask: jnp.ndarray | None = None,
               conv_impl: str = "xla") -> jnp.ndarray:
    """latents: (B, h, w, 4) *scaled*; returns images (B, 8h, 8w, 3) in
    [-1, 1] (fp32).

    Asymmetric (mask-conditioned) decode: with ``cfg.asymmetric`` and
    (``cond_image`` = init image with the regenerate region zeroed,
    ``cond_mask`` = (B, H, W, 1), 1 = regenerate), known-pixel features are
    blended into the sample at every decoder scale —
    ``sample = sample * m + feature * (1 - m)`` — the
    AsymmetricAutoencoderKL inpaint decode the reference consumes
    (model_diffusers.py:1516-1549)."""
    dec = params["decoder"]
    g = cfg.norm_num_groups
    z = (latents / cfg.scaling_factor).astype(
        dec["conv_in"]["kernel"].dtype
    )
    feats = None
    if cond_image is not None and cond_mask is not None:
        if "condition_encoder" not in dec:
            raise ValueError(
                "conditioned decode needs an asymmetric VAE "
                "(cfg.asymmetric=True)"
            )
        feats = mask_condition_encoder_apply(
            dec["condition_encoder"], cfg, cond_image, cond_mask
        )

    def blend(h):
        if feats is None:
            return h
        key = (h.shape[-1], h.shape[1], h.shape[2])
        if key not in feats:
            return h
        m = jax.image.resize(
            cond_mask.astype(jnp.float32),
            (h.shape[0], h.shape[1], h.shape[2], 1), "nearest",
        ).astype(h.dtype)
        return h * m + feats[key].astype(h.dtype) * (1.0 - m)

    h = conv2d(dec["post_quant_conv"], z, padding="VALID")
    h = conv2d(dec["conv_in"], h)
    h = _resnet_apply(dec["mid"]["resnet1"], h, g, conv_impl)
    h = _attn_apply(dec["mid"]["attention"], h, g)
    h = _resnet_apply(dec["mid"]["resnet2"], h, g, conv_impl)
    for block in dec["up_blocks"]:
        h = blend(h)
        for r in block["resnets"]:
            h = _resnet_apply(r, h, g, conv_impl)
        if "upsample" in block:
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
            h = conv2d(block["upsample"], h)
    h = blend(h)
    h = silu(group_norm(dec["conv_norm_out"], h, g, 1e-6))
    return conv2d(dec["conv_out"], h).astype(jnp.float32)

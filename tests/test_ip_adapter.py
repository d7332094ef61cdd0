"""IP-Adapter projection models, weight install, and pipeline wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionspatialcontrol_tpu.models import factory
from diffusionspatialcontrol_tpu.models import ip_adapter as ipa
from diffusionspatialcontrol_tpu.models.clip_vision import (
    CLIPVisionConfig,
    clip_vision_apply,
    clip_vision_init,
)
from diffusionspatialcontrol_tpu.pipeline.pipeline import StableDiffusionTPU
from diffusionspatialcontrol_tpu.text.tokenizer import HashTokenizer
from tests.test_pipeline import GEN, TINY

CROSS = TINY.unet.cross_attention_dim  # 64
EMBED = 32  # synthetic image-embed dim


def _linear_sd(rng, num_tokens=4):
    return {
        "proj.weight": rng.randn(num_tokens * CROSS, EMBED).astype(
            np.float32
        ),
        "proj.bias": np.zeros(num_tokens * CROSS, np.float32),
        "norm.weight": np.ones(CROSS, np.float32),
        "norm.bias": np.zeros(CROSS, np.float32),
    }


def _ip_sd(rng, unet_cfg):
    paths = ipa.cross_attn_paths(unet_cfg)
    sd = {}
    ch = {0: 32, 1: 64, 2: 128, 3: 128}
    for li, path in enumerate(paths):
        if path[0] == "down_blocks":
            hidden = ch[path[1]]
        elif path[0] == "up_blocks":
            hidden = ch[unet_cfg.num_levels - 1 - path[1]]
        else:
            hidden = 128
        sd[f"{2*li+1}.to_k_ip.weight"] = rng.randn(hidden, CROSS).astype(
            np.float32
        ) * 0.05
        sd[f"{2*li+1}.to_v_ip.weight"] = rng.randn(hidden, CROSS).astype(
            np.float32
        ) * 0.05
    return sd


def test_cross_attn_paths_count_and_order():
    paths = ipa.cross_attn_paths(TINY.unet)
    # SD topology: down 2*3 + up 3*3 + mid 1 = 16 cross-attn layers
    assert len(paths) == 16
    assert paths[0][0] == "down_blocks"
    assert paths[6][0] == "up_blocks"
    assert paths[-1][0] == "mid_block"


def test_variant_detection():
    rng = np.random.RandomState(0)
    assert ipa.detect_variant(_linear_sd(rng)) == "linear"
    assert ipa.detect_variant({"latents": 1, "proj_in.weight": 1}) == (
        "resampler"
    )
    assert ipa.detect_variant({"proj.0.weight": 1, "norm.weight": 1}) == (
        "mlp"
    )


def test_load_install_and_forward_changes_output():
    rng = np.random.RandomState(0)
    params = factory.init_pipeline_params(
        jax.random.PRNGKey(0), TINY, jnp.float32
    )
    pipe = StableDiffusionTPU(TINY, params, tokenizer=HashTokenizer())
    ctx, _ = pipe.encode_prompt(["a cat"], [""])
    base = pipe.txt2img(ctx, GEN, seed=0, decode=False)

    sd = {"image_proj": _linear_sd(rng), "ip_adapter": _ip_sd(rng,
                                                              TINY.unet)}
    adapters = ipa.load_ip_adapter(params["unet"], TINY.unet, [sd],
                                   dtype=jnp.float32)
    assert adapters[0].variant == "linear"
    assert adapters[0].num_tokens == 4

    embeds = jnp.asarray(rng.randn(1, EMBED), jnp.float32)
    extras = pipe.build_ip_extras(adapters, [embeds], scales=[1.0])
    assert extras.ip_tokens[0].shape == (2, 4, CROSS)
    out = pipe.txt2img(ctx, GEN, seed=0, decode=False, extras=extras)
    assert not np.allclose(np.asarray(base), np.asarray(out))

    # scale 0 -> identical to base
    extras0 = pipe.build_ip_extras(adapters, [embeds], scales=[0.0])
    out0 = pipe.txt2img(ctx, GEN, seed=0, decode=False, extras=extras0)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out0),
                               atol=1e-5)

    # per-adapter spatial mask gating runs
    mask = jnp.ones((1, 8, 8), jnp.float32)
    extras_m = pipe.build_ip_extras(adapters, [embeds], scales=[1.0],
                                    masks=[mask])
    out_m = pipe.txt2img(ctx, GEN, seed=0, decode=False, extras=extras_m)
    assert np.all(np.isfinite(np.asarray(out_m)))

    # unload restores the plain processor behavior
    ipa.uninstall_ip_adapter_weights(params["unet"], TINY.unet)
    out_un = pipe.txt2img(ctx, GEN, seed=0, decode=False)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out_un),
                               atol=1e-6)


def test_full_projection():
    rng = np.random.RandomState(1)
    sd = {
        "proj.0.weight": rng.randn(2 * EMBED, EMBED).astype(np.float32),
        "proj.0.bias": np.zeros(2 * EMBED, np.float32),
        "proj.2.weight": rng.randn(CROSS, 2 * EMBED).astype(np.float32),
        "proj.2.bias": np.zeros(CROSS, np.float32),
        "norm.weight": np.ones(CROSS, np.float32),
        "norm.bias": np.zeros(CROSS, np.float32),
    }
    variant, p, num_tokens = ipa.convert_image_proj(sd, jnp.float32)
    assert variant == "mlp" and num_tokens == 1
    out = ipa.full_projection_apply(p, jnp.ones((2, EMBED)), num_tokens)
    assert out.shape == (2, 1, CROSS)


def test_resampler_projection():
    rng = np.random.RandomState(2)
    dim, n_lat, depth = 64, 8, 2
    in_dim, out_dim = 48, CROSS
    sd = {
        "latents": rng.randn(1, n_lat, dim).astype(np.float32),
        "proj_in.weight": rng.randn(dim, in_dim).astype(np.float32),
        "proj_in.bias": np.zeros(dim, np.float32),
        "proj_out.weight": rng.randn(out_dim, dim).astype(np.float32),
        "proj_out.bias": np.zeros(out_dim, np.float32),
        "norm_out.weight": np.ones(out_dim, np.float32),
        "norm_out.bias": np.zeros(out_dim, np.float32),
    }
    for i in range(depth):
        pre = f"layers.{i}"
        sd[f"{pre}.0.norm1.weight"] = np.ones(dim, np.float32)
        sd[f"{pre}.0.norm1.bias"] = np.zeros(dim, np.float32)
        sd[f"{pre}.0.norm2.weight"] = np.ones(dim, np.float32)
        sd[f"{pre}.0.norm2.bias"] = np.zeros(dim, np.float32)
        sd[f"{pre}.0.to_q.weight"] = rng.randn(dim, dim).astype(np.float32)
        sd[f"{pre}.0.to_kv.weight"] = rng.randn(2 * dim, dim).astype(
            np.float32
        )
        sd[f"{pre}.0.to_out.weight"] = rng.randn(dim, dim).astype(
            np.float32
        )
        sd[f"{pre}.1.0.weight"] = np.ones(dim, np.float32)
        sd[f"{pre}.1.0.bias"] = np.zeros(dim, np.float32)
        sd[f"{pre}.1.1.weight"] = rng.randn(4 * dim, dim).astype(np.float32)
        sd[f"{pre}.1.1.bias"] = np.zeros(4 * dim, np.float32)
        sd[f"{pre}.1.3.weight"] = rng.randn(dim, 4 * dim).astype(np.float32)
        sd[f"{pre}.1.3.bias"] = np.zeros(dim, np.float32)
    variant, p, num_tokens = ipa.convert_image_proj(sd, jnp.float32)
    assert variant == "resampler" and num_tokens == n_lat
    hidden = jnp.asarray(rng.randn(2, 10, in_dim), jnp.float32)
    out = ipa.resampler_apply(p, hidden, heads=4)
    assert out.shape == (2, n_lat, CROSS)
    assert np.all(np.isfinite(np.asarray(out)))


def test_clip_vision_tower():
    cfg = CLIPVisionConfig(
        image_size=28, patch_size=14, hidden_size=32,
        intermediate_size=64, num_layers=2, num_heads=2, projection_dim=16,
    )
    params = clip_vision_init(jax.random.PRNGKey(0), cfg, jnp.float32)
    imgs = jnp.zeros((2, 28, 28, 3), jnp.float32)
    emb = clip_vision_apply(params, cfg, imgs)
    assert emb.shape == (2, 16)
    hidden = clip_vision_apply(params, cfg, imgs, output_hidden_state=True)
    assert hidden.shape == (2, 5, 32)

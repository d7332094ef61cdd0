"""Model architecture tests: shapes, determinism, conditioning plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionspatialcontrol_tpu.config import (
    ModelConfig,
    UNetConfig,
    sd21_config,
)
from diffusionspatialcontrol_tpu.models import factory
from diffusionspatialcontrol_tpu.models.clip import clip_apply, clip_init
from diffusionspatialcontrol_tpu.models.unet import (
    RegionState,
    UNetCond,
    unet_apply,
    unet_init,
)
from diffusionspatialcontrol_tpu.models.vae import vae_decode, vae_encode, vae_init


# A tiny UNet config for fast tests (same topology as SD1.5, narrower).
TINY_UNET = UNetConfig(
    block_out_channels=(32, 64, 128, 128),
    layers_per_block=2,
    cross_attention_dim=64,
    num_attention_heads=(2, 2, 2, 2),
    norm_num_groups=8,
)

TINY_MODEL = ModelConfig(
    name="tiny",
    unet=TINY_UNET,
)


@pytest.fixture(scope="module")
def unet_params():
    return unet_init(jax.random.PRNGKey(0), TINY_UNET, jnp.float32)


def test_unet_output_shape(unet_params):
    x = jnp.zeros((2, 32, 32, 4), jnp.float32)
    ctx = jnp.zeros((2, 77, 64), jnp.float32)
    t = jnp.array([10.0, 10.0])
    out = unet_apply(unet_params, TINY_UNET, x, t, UNetCond(context=ctx))
    assert out.shape == (2, 32, 32, 4)
    assert jnp.all(jnp.isfinite(out))


def test_unet_deterministic(unet_params):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 64))
    t = jnp.array([500.0])
    a = unet_apply(unet_params, TINY_UNET, x, t, UNetCond(context=ctx))
    b = unet_apply(unet_params, TINY_UNET, x, t, UNetCond(context=ctx))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unet_region_bias_changes_output(unet_params):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 64))
    t = jnp.array([500.0])
    base = unet_apply(unet_params, TINY_UNET, x, t, UNetCond(context=ctx))
    # biases at latent 16x16 -> levels L = 256, 64, 16, 4
    biases = tuple(
        jnp.ones((1, (16 // 2**i) ** 2, 77), jnp.float32) * 5.0
        for i in range(4)
    )
    region = RegionState(biases, jnp.asarray(2.0))
    out = unet_apply(
        unet_params, TINY_UNET, x, t, UNetCond(context=ctx, region=region)
    )
    assert not np.allclose(np.asarray(base), np.asarray(out))
    # uniform bias shifts logits uniformly -> softmax unchanged... verify
    # nonuniform bias instead
    biases2 = tuple(
        jnp.zeros((1, (16 // 2**i) ** 2, 77), jnp.float32)
        .at[:, :, :5]
        .set(10.0)
        for i in range(4)
    )
    out2 = unet_apply(
        unet_params, TINY_UNET, x, t,
        UNetCond(context=ctx, region=RegionState(biases2, jnp.asarray(2.0))),
    )
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_unet_heatmap_collection(unet_params):
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 77, 64))
    t = jnp.array([1.0])
    out, maps = unet_apply(
        unet_params, TINY_UNET, x, t, UNetCond(context=ctx),
        collect_heatmaps=True,
    )
    assert out.shape == (1, 16, 16, 4)
    # 16 cross-attn layers for SD topology (down 2*3, mid 1, up 3*3)
    assert len(maps) == 16
    levels = {lv for lv, _ in maps}
    assert levels == {0, 1, 2, 3}
    for lv, m in maps:
        assert m.shape == (1, (16 // 2**lv) ** 2, 77)


def test_clip_shapes_and_clip_skip():
    cfg = ModelConfig().clip
    import dataclasses

    small = dataclasses.replace(cfg, hidden_size=64, intermediate_size=128,
                                num_layers=4, num_heads=4, vocab_size=1000)
    params = clip_init(jax.random.PRNGKey(0), small, jnp.float32)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 1000, (2, 77)))
    h1 = clip_apply(params, small, ids, clip_skip=1)
    h2 = clip_apply(params, small, ids, clip_skip=2)
    assert h1.shape == h2.shape == (2, 77, 64)
    assert not np.allclose(np.asarray(h1), np.asarray(h2))


def test_clip_causal_mask():
    """Changing a later token must not affect earlier positions' encodings
    before the final layer norm... verified via clip_skip output of a 1-layer
    model where LN acts per-position."""
    import dataclasses

    cfg = dataclasses.replace(
        ModelConfig().clip, hidden_size=32, intermediate_size=64,
        num_layers=1, num_heads=2, vocab_size=100,
    )
    params = clip_init(jax.random.PRNGKey(0), cfg, jnp.float32)
    ids1 = jnp.asarray([[1, 2, 3, 4]])
    ids2 = jnp.asarray([[1, 2, 3, 99]])
    h1 = clip_apply(params, cfg, ids1)
    h2 = clip_apply(params, cfg, ids2)
    np.testing.assert_allclose(
        np.asarray(h1[0, :3]), np.asarray(h2[0, :3]), atol=1e-6
    )
    assert not np.allclose(np.asarray(h1[0, 3]), np.asarray(h2[0, 3]))


def test_vae_roundtrip_shapes():
    import dataclasses

    from diffusionspatialcontrol_tpu.config import VAEConfig

    cfg = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_num_groups=4)
    params = vae_init(jax.random.PRNGKey(0), cfg, jnp.float32)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    z = vae_encode(params, cfg, img, rng=jax.random.PRNGKey(2))
    assert z.shape == (1, 8, 8, 4)
    out = vae_decode(params, cfg, z)
    assert out.shape == (1, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_controlnet_residual_plumbing(unet_params):
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 77, 64))
    t = jnp.array([1.0])
    base = unet_apply(unet_params, TINY_UNET, x, t, UNetCond(context=ctx))
    # 12 down residuals matching the skip stack + mid
    shapes = [(1, 16, 16, 32)]
    ch = [32, 64, 128, 128]
    res = 16
    for lv in range(4):
        for _ in range(2):
            shapes.append((1, res, res, ch[lv]))
        if lv < 3:
            res //= 2
            shapes.append((1, res, res, ch[lv]))
    down = tuple(jnp.ones(s) * 0.1 for s in shapes)
    mid = jnp.ones((1, 2, 2, 128)) * 0.1
    out = unet_apply(
        unet_params, TINY_UNET, x, t,
        UNetCond(context=ctx, controlnet_down=down, controlnet_mid=mid),
    )
    assert not np.allclose(np.asarray(base), np.asarray(out))


def test_t2i_residual_plumbing(unet_params):
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 77, 64))
    t = jnp.array([1.0])
    base = unet_apply(unet_params, TINY_UNET, x, t, UNetCond(context=ctx))
    ch = [32, 64, 128, 128]
    res = [16, 8, 4, 2]
    t2i = tuple(jnp.ones((1, r, r, c)) * 0.1 for r, c in zip(res, ch))
    out = unet_apply(
        unet_params, TINY_UNET, x, t,
        UNetCond(context=ctx, t2i_residuals=t2i),
    )
    assert not np.allclose(np.asarray(base), np.asarray(out))


def test_sd15_param_count():
    """Full-size SD1.5 UNet must land at the known ~860M params."""
    params = unet_init(jax.random.PRNGKey(0), UNetConfig(), jnp.bfloat16)
    n = factory.param_count(params)
    assert 850e6 < n < 870e6, f"unexpected param count {n/1e6:.1f}M"


def test_sd21_unet_topology():
    """SD2.x: linear projections, per-level head counts, 1024 cross dim."""
    from diffusionspatialcontrol_tpu.config import sd21_config

    cfg = sd21_config()
    import dataclasses

    tiny21 = dataclasses.replace(
        cfg.unet,
        block_out_channels=(32, 64, 128, 128),
        cross_attention_dim=64,
        num_attention_heads=(2, 2, 4, 4),
        norm_num_groups=8,
        use_linear_projection=True,
    )
    params = unet_init(jax.random.PRNGKey(0), tiny21, jnp.float32)
    # linear proj_in has 2D kernel, conv proj would be 4D
    proj = params["down_blocks"][0]["attentions"][0]["proj_in"]["kernel"]
    assert proj.ndim == 2
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 77, 64))
    out = unet_apply(params, tiny21, x, jnp.array([1.0]),
                     UNetCond(context=ctx))
    assert out.shape == (1, 16, 16, 4)


def test_v_prediction_denoiser():
    """v-prediction wrapping (CompVisVDenoiser semantics,
    external_k_diffusion.py:142-182)."""
    import dataclasses

    from diffusionspatialcontrol_tpu.pipeline.pipeline import make_denoise_fn
    from diffusionspatialcontrol_tpu.samplers import schedules
    from tests.test_pipeline import TINY

    cfg_v = dataclasses.replace(TINY, prediction_type="v_prediction")
    params = {
        "unet": unet_init(jax.random.PRNGKey(0), TINY.unet, jnp.float32)
    }
    table = schedules.ddpm_sigma_table(cfg_v)
    log_table = jnp.asarray(np.log(table), jnp.float32)
    ctx = jnp.zeros((2, 77, 64))
    fn = make_denoise_fn(params, cfg_v, ctx, None, log_table,
                         guidance_scale=7.5, compute_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    sigma = jnp.asarray(5.0)
    out = fn(x, sigma)
    assert out.shape == x.shape
    # check against manual formula: D = v*c_out + x*c_skip
    c_in = 1.0 / jnp.sqrt(sigma**2 + 1)
    from diffusionspatialcontrol_tpu.models.unet import UNetCond, unet_apply
    from diffusionspatialcontrol_tpu.pipeline.pipeline import _sigma_to_t

    t = _sigma_to_t(sigma, log_table)
    x2 = jnp.concatenate([x, x]) * c_in
    v = unet_apply(params["unet"], TINY.unet, x2,
                   jnp.full((2,), t), UNetCond(context=ctx))
    c_skip = 1.0 / (sigma**2 + 1)
    c_out = -sigma / jnp.sqrt(sigma**2 + 1)
    den = v * c_out + jnp.concatenate([x, x]) * c_skip
    d_u, d_c = jnp.split(den, 2)
    want = d_u + 7.5 * (d_c - d_u)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_inpaint_9channel_unet():
    import dataclasses

    cfg9 = dataclasses.replace(TINY_UNET, in_channels=9)
    params = unet_init(jax.random.PRNGKey(0), cfg9, jnp.float32)
    x = jnp.zeros((1, 16, 16, 9))
    out = unet_apply(params, cfg9, x, jnp.array([1.0]),
                     UNetCond(context=jnp.zeros((1, 77, 64))))
    assert out.shape == (1, 16, 16, 4)


def test_freeu():
    from diffusionspatialcontrol_tpu.models.unet import FreeUParams

    params = unet_init(jax.random.PRNGKey(0), TINY_UNET, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 64))
    t = jnp.array([500.0])
    base = unet_apply(params, TINY_UNET, x, t, UNetCond(context=ctx))
    freeu = unet_apply(params, TINY_UNET, x, t, UNetCond(context=ctx),
                       freeu=FreeUParams())
    assert freeu.shape == base.shape
    assert not np.allclose(np.asarray(base), np.asarray(freeu))
    assert np.all(np.isfinite(np.asarray(freeu)))


def test_cfg_halves_alignment():
    """make_denoise_fn must mix the correct uncond/cond halves: check
    against per-sample manual computation with DISTINCT halves (guards the
    interleaved-CFG internal layout)."""
    from diffusionspatialcontrol_tpu.pipeline.pipeline import (
        _sigma_to_t,
        make_denoise_fn,
    )
    from diffusionspatialcontrol_tpu.samplers import schedules
    from tests.test_pipeline import TINY

    params = {
        "unet": unet_init(jax.random.PRNGKey(0), TINY.unet, jnp.float32)
    }
    table = schedules.ddpm_sigma_table(TINY)
    log_table = jnp.asarray(np.log(table), jnp.float32)
    b = 2
    ctx_u = jax.random.normal(jax.random.PRNGKey(1), (b, 77, 64))
    ctx_c = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 64))
    context = jnp.concatenate([ctx_u, ctx_c])
    fn = make_denoise_fn(params, TINY, context, None, log_table,
                         guidance_scale=3.0, compute_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (b, 16, 16, 4))
    sigma = jnp.asarray(4.0)
    got = fn(x, sigma)

    c_in = 1.0 / jnp.sqrt(sigma**2 + 1)
    t = _sigma_to_t(sigma, log_table)
    t_b = jnp.full((b,), t)
    eps_u = unet_apply(params["unet"], TINY.unet, x * c_in, t_b,
                       UNetCond(context=ctx_u))
    eps_c = unet_apply(params["unet"], TINY.unet, x * c_in, t_b,
                       UNetCond(context=ctx_c))
    d_u = x - eps_u * sigma
    d_c = x - eps_c * sigma
    want = d_u + 3.0 * (d_c - d_u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-5)

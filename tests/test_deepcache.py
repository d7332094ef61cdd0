"""DeepCache deep-branch feature reuse: split equivalence + pipeline mode.

Opt-in acceleration with no reference counterpart (the reference always
runs the full UNet every step — model_k_diffusion.py:729-783); these tests
pin the invariant that makes it safe to ship: a full (non-reuse) step is
numerically the plain UNet, and cache_interval=1 reproduces txt2img.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionspatialcontrol_tpu.config import (
    CLIPTextConfig,
    GenerationConfig,
    ModelConfig,
    UNetConfig,
    VAEConfig,
)
from diffusionspatialcontrol_tpu.models import factory
from diffusionspatialcontrol_tpu.models.unet import (
    UNetCond,
    deepcache_shape,
    unet_apply,
    unet_apply_deepcache,
    unet_init,
)
from diffusionspatialcontrol_tpu.pipeline.pipeline import (
    DenoiseExtras,
    StableDiffusionTPU,
)
from diffusionspatialcontrol_tpu.text.tokenizer import HashTokenizer

TINY_UNET = UNetConfig(
    block_out_channels=(32, 64, 128, 128),
    layers_per_block=2,
    cross_attention_dim=64,
    num_attention_heads=(2, 2, 2, 2),
    norm_num_groups=8,
)

TINY = ModelConfig(
    name="tiny",
    clip=CLIPTextConfig(vocab_size=49408, hidden_size=64,
                        intermediate_size=128, num_layers=2, num_heads=4),
    unet=dataclasses.replace(TINY_UNET, layers_per_block=1),
    vae=VAEConfig(block_out_channels=(16, 32, 32, 32), norm_num_groups=4),
)

GEN = GenerationConfig(height=64, width=64, num_inference_steps=6,
                       dtype=jnp.float32)


@pytest.fixture(scope="module")
def unet_params():
    return unet_init(jax.random.PRNGKey(0), TINY_UNET, jnp.float32)


@pytest.fixture(scope="module")
def pipe():
    params = factory.init_pipeline_params(
        jax.random.PRNGKey(0), TINY, jnp.float32
    )
    return StableDiffusionTPU(TINY, params, tokenizer=HashTokenizer())


def test_full_step_matches_plain_unet(unet_params):
    """use_cache=0 (deep branch recomputed) is exactly unet_apply."""
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 64))
    t = jnp.array([500.0, 500.0])
    ref = unet_apply(unet_params, TINY_UNET, x, t, UNetCond(context=ctx))
    cache0 = jnp.zeros(deepcache_shape(TINY_UNET, 2, 16, 16), jnp.float32)
    out, cache = unet_apply_deepcache(
        unet_params, TINY_UNET, x, t, UNetCond(context=ctx), cache0,
        jnp.float32(0.0),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    assert cache.shape == deepcache_shape(TINY_UNET, 2, 16, 16)
    assert not np.allclose(np.asarray(cache), 0.0)


def test_reuse_step_skips_deep_branch(unet_params):
    """use_cache=1 returns the cache untouched and the output depends on
    it (the shallow layers see the injected features)."""
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(4), (1, 77, 64))
    t = jnp.array([400.0])
    cache_a = jax.random.normal(
        jax.random.PRNGKey(5), deepcache_shape(TINY_UNET, 1, 16, 16))
    cache_b = cache_a + 1.0
    out_a, new_a = unet_apply_deepcache(
        unet_params, TINY_UNET, x, t, UNetCond(context=ctx), cache_a,
        jnp.float32(1.0),
    )
    out_b, _ = unet_apply_deepcache(
        unet_params, TINY_UNET, x, t, UNetCond(context=ctx), cache_b,
        jnp.float32(1.0),
    )
    np.testing.assert_array_equal(np.asarray(new_a), np.asarray(cache_a))
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_rejects_deep_branch_conditioning(unet_params):
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 77, 64))
    cache0 = jnp.zeros(deepcache_shape(TINY_UNET, 1, 16, 16))
    t2i = tuple(
        jnp.zeros((1, 16 // 2**i, 16 // 2**i, c))
        for i, c in enumerate(TINY_UNET.block_out_channels)
    )
    with pytest.raises(ValueError, match="deepcache"):
        unet_apply_deepcache(
            unet_params, TINY_UNET, x, jnp.array([1.0]),
            UNetCond(context=ctx, t2i_residuals=t2i), cache0,
            jnp.float32(0.0),
        )


@pytest.mark.parametrize("sampler", ["euler", "dpmpp_2m"])
def test_interval_one_matches_txt2img(pipe, sampler):
    """cache_interval=1 runs every step full — identical latents to the
    plain sampler (same seed stream, same recurrence). Compare against the
    eager-init txt2img program (seed_in_program=False): deepcache draws its
    init eagerly too, so the tight tolerance isolates the recurrence
    rather than in-program-init fusion rounding."""
    from diffusionspatialcontrol_tpu.pipeline.pipeline import (
        StableDiffusionTPU,
    )

    ctx, _ = pipe.encode_prompt(["a cat"], ["bad"])
    gen = dataclasses.replace(GEN, sampler=sampler)
    pipe_eager = StableDiffusionTPU(pipe.model_cfg, pipe.params,
                                    tokenizer=pipe.tokenizer,
                                    seed_in_program=False)
    ref = pipe_eager.txt2img(ctx, gen, seed=3, decode=False)
    out = pipe.txt2img_deepcache(ctx, gen, cache_interval=1, seed=3,
                                 decode=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_interval_three_close_to_full(pipe):
    """Reuse steps approximate the full run: the interval-3 latents stay
    within a loose relative error of the full-step latents and decode to
    finite images, while genuinely taking the reuse path (different from
    interval-1)."""
    ctx, _ = pipe.encode_prompt(["a cat on a bench"], ["bad"])
    full = np.asarray(
        pipe.txt2img_deepcache(ctx, GEN, cache_interval=1, seed=7,
                               decode=False))
    fast = np.asarray(
        pipe.txt2img_deepcache(ctx, GEN, cache_interval=3, seed=7,
                               decode=False))
    assert np.all(np.isfinite(fast))
    assert not np.array_equal(fast, full)
    rel = np.linalg.norm(fast - full) / np.linalg.norm(full)
    assert rel < 0.5, rel
    img = pipe.txt2img_deepcache(ctx, GEN, cache_interval=3, seed=7)
    assert img.shape == (1, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(img)))


def test_deepcache_with_region_control(pipe):
    ctx, ids = pipe.encode_prompt(["a red cat and a blue dog"], [""])
    mask = np.zeros((64, 64), np.float32)
    mask[:, :32] = 1.0
    state = {"red cat": {"mask": mask, "weight": 1.0, "mask_outsides": 0.3}}
    biases = pipe.encode_region([state], ids, height=64, width=64,
                                do_cfg=True)
    base = pipe.txt2img_deepcache(ctx, GEN, cache_interval=2, seed=3,
                                  decode=False)
    controlled = pipe.txt2img_deepcache(ctx, GEN, cache_interval=2, seed=3,
                                        region_biases=biases, decode=False)
    assert not np.allclose(np.asarray(base), np.asarray(controlled))


def test_deepcache_rejects_units_and_odd_solvers(pipe):
    ctx, _ = pipe.encode_prompt(["a cat"], [""])
    with pytest.raises(ValueError, match="deepcache supports"):
        pipe.txt2img_deepcache(
            ctx, dataclasses.replace(GEN, sampler="dpmpp_2m_sde"),
            seed=0)
    t2i = tuple(
        jnp.zeros((2, 8 // 2**i, 8 // 2**i, c))
        for i, c in enumerate(TINY.unet.block_out_channels)
    )
    ex = DenoiseExtras(t2i_residuals=t2i, t2i_active=(1.0,) * 6)
    with pytest.raises(ValueError, match="deepcache"):
        pipe.txt2img_deepcache(ctx, GEN, seed=0, extras=ex)

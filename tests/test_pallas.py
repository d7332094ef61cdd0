"""Pallas kernels vs jnp reference implementations (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionspatialcontrol_tpu.ops import attention as attn_ops
from diffusionspatialcontrol_tpu.ops.pallas.flash_attention import (
    flash_attention,
)
from diffusionspatialcontrol_tpu.ops.pallas.region_attention import (
    region_attention as pallas_region_attention,
)


def test_pallas_region_attention_matches_reference():
    rng = np.random.RandomState(0)
    B, H, L, S, D = 2, 4, 64, 77, 40
    q = rng.randn(B, H, L, D).astype(np.float32)
    k = rng.randn(B, H, S, D).astype(np.float32)
    v = rng.randn(B, H, S, D).astype(np.float32)
    region = rng.randn(B, L, S).astype(np.float32) * 0.5
    sigma = jnp.asarray(4.2)
    ref = attn_ops.region_attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(region),
        sigma,
    )
    got = pallas_region_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(region),
        sigma,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4,
                               atol=2e-5)


def test_pallas_region_attention_head_broadcast():
    """Bias must broadcast across heads (the reference's repeat_interleave)."""
    rng = np.random.RandomState(1)
    B, H, L, S, D = 1, 3, 16, 5, 8
    q = np.repeat(rng.randn(B, 1, L, D), H, axis=1).astype(np.float32)
    k = np.repeat(rng.randn(B, 1, S, D), H, axis=1).astype(np.float32)
    v = np.repeat(rng.randn(B, 1, S, D), H, axis=1).astype(np.float32)
    region = rng.randn(B, L, S).astype(np.float32)
    out = pallas_region_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(region),
        jnp.asarray(2.0),
    )
    # identical per head since q/k/v identical per head and bias broadcast
    for hh in range(1, H):
        np.testing.assert_allclose(
            np.asarray(out[:, 0]), np.asarray(out[:, hh]), atol=1e-6
        )


def test_pallas_flash_attention_matches_reference():
    rng = np.random.RandomState(2)
    B, H, L, D = 1, 2, 200, 40  # non-multiple-of-128 L and D
    q = rng.randn(B, H, L, D).astype(np.float32)
    ref = attn_ops.attention_reference(
        jnp.asarray(q), jnp.asarray(q), jnp.asarray(q)
    )
    got = flash_attention(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4,
                               atol=2e-5)


def test_unet_pallas_attn_impl_matches_xla():
    from diffusionspatialcontrol_tpu.models.unet import (
        RegionState,
        UNetCond,
        unet_apply,
    )
    from diffusionspatialcontrol_tpu.models.unet import unet_init
    from tests.test_pipeline import TINY

    params = unet_init(jax.random.PRNGKey(0), TINY.unet, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 64))
    t = jnp.array([500.0])
    biases = tuple(
        jax.random.normal(
            jax.random.PRNGKey(3 + i), (1, (16 // 2**i) ** 2, 77)
        ) * 0.3
        for i in range(4)
    )
    cond = UNetCond(context=ctx, region=RegionState(biases,
                                                    jnp.asarray(2.0)))
    a = unet_apply(params, TINY.unet, x, t, cond, attn_impl="xla")
    b = unet_apply(params, TINY.unet, x, t, cond, attn_impl="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                               atol=5e-4)


def test_streaming_flash_matches_reference():
    """Large-S path (online softmax over KV chunks) vs materialized ref."""
    from diffusionspatialcontrol_tpu.ops.pallas import flash_attention as fa

    rng = np.random.RandomState(5)
    B, H, L, D = 1, 2, 300, 24
    q = jnp.asarray(rng.randn(B, H, L, D), jnp.float32)
    ref = attn_ops.attention_reference(q, q, q)
    got = fa._flash_streaming(q, q, q, D**-0.5, 128, interpret=True,
                              block_l=128, block_s=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4,
                               atol=2e-5)


def test_nlhd_kernels_match_bhld():
    from diffusionspatialcontrol_tpu.ops.pallas.flash_attention import (
        flash_attention,
        flash_attention_nlhd,
    )
    from diffusionspatialcontrol_tpu.ops.pallas.region_attention import (
        region_attention as ra_bhld,
        region_attention_nlhd,
    )

    rng = np.random.RandomState(9)
    B, H, L, S, D = 2, 3, 64, 77, 40
    q = rng.randn(B, H, L, D).astype(np.float32)
    k = rng.randn(B, H, S, D).astype(np.float32)
    v = rng.randn(B, H, S, D).astype(np.float32)
    region = rng.randn(B, L, S).astype(np.float32) * 0.4
    sigma = jnp.asarray(3.0)

    a = ra_bhld(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                jnp.asarray(region), sigma)
    b = region_attention_nlhd(
        jnp.asarray(q).transpose(0, 2, 1, 3),
        jnp.asarray(k).transpose(0, 2, 1, 3),
        jnp.asarray(v).transpose(0, 2, 1, 3),
        jnp.asarray(region), sigma,
    ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    fa = flash_attention(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q))
    fb = flash_attention_nlhd(
        jnp.asarray(q).transpose(0, 2, 1, 3),
        jnp.asarray(q).transpose(0, 2, 1, 3),
        jnp.asarray(q).transpose(0, 2, 1, 3),
    ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=1e-5)


def _std_fp64_oracle(q, k, scale):
    """Unbiased std of scale * Q K^T in float64 numpy (host)."""
    qf = np.asarray(q, np.float64)  # (B, L, H, D)
    kf = np.asarray(k, np.float64)
    logits = np.einsum("blhd,bshd->bhls", qf, kf) * scale
    return logits.std(ddof=1)


@pytest.mark.parametrize("mean_shift", [0.0, 0.5])
def test_gram_std_small_shapes_vs_fp64(mean_shift):
    """Centered-Gram std vs fp64 oracle, incl. the mean>>std regime that
    breaks the raw E[s^2]-E[s]^2 form."""
    rng = np.random.default_rng(0)
    q = (rng.standard_normal((2, 64, 4, 16)) * 0.05 + mean_shift).astype(
        np.float32
    )
    k = (rng.standard_normal((2, 11, 4, 16)) * 0.05 + mean_shift).astype(
        np.float32
    )
    scale = 16**-0.5
    got = float(attn_ops.logits_std_gram_nlhd(
        jnp.asarray(q), jnp.asarray(k), scale
    ))
    want = _std_fp64_oracle(q, k, scale)
    assert abs(got - want) / want < 1e-4


def test_gram_std_largest_latent_shape_vs_fp64():
    """1920x1088 latents (L=32640, the largest shape the reference
    demonstrates): fp32 centered-Gram std must hold <1e-4 relative error
    against the fp64 oracle even with a strong common mean (the
    cancellation-prone regime for raw moment accumulation)."""
    rng = np.random.default_rng(1)
    L = (1920 // 8) * (1088 // 8)  # 32640
    q = (rng.standard_normal((1, L, 8, 40)) * 0.03 + 0.4).astype(np.float32)
    k = (rng.standard_normal((1, 77, 8, 40)) * 0.03 + 0.4).astype(np.float32)
    scale = 40**-0.5
    got = float(attn_ops.logits_std_gram_nlhd(
        jnp.asarray(q), jnp.asarray(k), scale
    ))
    want = _std_fp64_oracle(q, k, scale)
    assert abs(got - want) / want < 1e-4, (got, want)


def test_gram_std_bhld_matches_nlhd():
    rng = np.random.default_rng(2)
    q = rng.standard_normal((2, 32, 4, 16)).astype(np.float32)
    k = rng.standard_normal((2, 9, 4, 16)).astype(np.float32)
    scale = 0.25
    a = float(attn_ops.logits_std_gram(
        jnp.asarray(q.transpose(0, 2, 1, 3)), jnp.asarray(k.transpose(0, 2, 1, 3)), scale
    ))
    b = float(attn_ops.logits_std_gram_nlhd(jnp.asarray(q), jnp.asarray(k), scale))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_flash_variants_match_reference():
    """The MXU/VPU kernel variants (bf16 QK^T operands, bf16
    probabilities, exp2 softmax — attn_impl suffixes) must match the
    materialized reference within bf16-class tolerance; on TPU the full
    25-step pipeline outputs were bitwise identical (PERF.md round 5)."""
    rng = np.random.RandomState(7)
    B, H, L, D = 1, 2, 200, 40
    q = rng.randn(B, H, L, D).astype(np.float32)
    qb = jnp.asarray(q).astype(jnp.bfloat16)
    ref = attn_ops.attention_reference(
        qb.astype(jnp.float32), qb.astype(jnp.float32),
        qb.astype(jnp.float32))
    for kw in ({"qk_bf16": True}, {"pv_bf16": True}, {"use_exp2": True},
               {"qk_bf16": True, "pv_bf16": True, "use_exp2": True}):
        got = flash_attention(qb, qb, qb, **kw).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2, err_msg=str(kw))

"""Numerics tests for the fused GN+SiLU+conv3x3 Pallas kernel
(ops/pallas/conv_fused.py) against the materialized XLA reference path
(layers.group_norm -> silu -> conv2d), and for the resnet/unet integration
behind conv_impl="pallas"."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionspatialcontrol_tpu.models.layers import (
    conv2d,
    conv_init,
    group_norm,
    silu,
)
from diffusionspatialcontrol_tpu.ops.pallas.conv_fused import (
    fold_group_norm,
    gn_silu_conv3x3,
    gn_silu_conv3x3_v2,
)


def _setup(b=2, h=12, w=10, c_in=32, c_out=48, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    x = jax.random.normal(ks[0], (b, h, w, c_in), jnp.float32).astype(dtype)
    gn = {
        "scale": (jax.random.normal(ks[1], (c_in,)) * 0.1 + 1.0).astype(dtype),
        "bias": (jax.random.normal(ks[2], (c_in,)) * 0.1).astype(dtype),
    }
    cv = conv_init(ks[3], c_in, c_out, 3, dtype)
    temb = jax.random.normal(ks[4], (b, c_out), jnp.float32).astype(dtype)
    skip = jax.random.normal(ks[5], (b, h, w, c_out), jnp.float32).astype(
        dtype)
    return x, gn, cv, temb, skip


def test_fold_group_norm_matches_group_norm():
    x, gn, *_ = _setup()
    scale, bias = fold_group_norm(gn, x, num_groups=8)
    ref = group_norm(gn, x, num_groups=8)
    got = x * scale[:, None, None, :] + bias[:, None, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_conv_fp32_exact():
    x, gn, cv, temb, skip = _setup()
    ref = (conv2d(cv, silu(group_norm(gn, x, num_groups=8)))
           + temb[:, None, None, :] + skip)
    s, b = fold_group_norm(gn, x, num_groups=8)
    got = gn_silu_conv3x3(x, s, b, cv["kernel"], cv["bias"],
                          channel_bias=temb, skip=skip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_fused_conv_no_extras():
    x, gn, cv, _, _ = _setup(b=1, h=8, w=8, c_in=16, c_out=16)
    ref = conv2d(cv, silu(group_norm(gn, x, num_groups=4)))
    s, b = fold_group_norm(gn, x, num_groups=4)
    got = gn_silu_conv3x3(x, s, b, cv["kernel"], cv["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_fused_conv_bf16_tolerance():
    x, gn, cv, temb, skip = _setup(dtype=jnp.bfloat16)
    ref = (conv2d(cv, silu(group_norm(gn, x, num_groups=8)))
           + temb[:, None, None, :] + skip.astype(jnp.bfloat16))
    s, b = fold_group_norm(gn, x, num_groups=8)
    got = gn_silu_conv3x3(x, s, b, cv["kernel"], cv["bias"],
                          channel_bias=temb.astype(jnp.float32), skip=skip)
    r = np.asarray(ref, np.float32)
    g = np.asarray(got, np.float32)
    # bf16 rounding differences only (SiLU in fp32 vs bf16 in the ref path)
    assert np.max(np.abs(r - g)) / (np.max(np.abs(r)) + 1e-6) < 2e-2


def test_fused_conv_nonsquare_and_odd_dims():
    # W+2 not a sublane multiple; C not a lane multiple; M needs padding.
    x, gn, cv, temb, skip = _setup(b=1, h=7, w=13, c_in=24, c_out=40)
    ref = (conv2d(cv, silu(group_norm(gn, x, num_groups=4)))
           + temb[:, None, None, :] + skip)
    s, b = fold_group_norm(gn, x, num_groups=4)
    got = gn_silu_conv3x3(x, s, b, cv["kernel"], cv["bias"],
                          channel_bias=temb, skip=skip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_fused_conv_row_tiled_path():
    # 1920x1088-scale latent rows (M=33396) exceed the single-slab VMEM
    # budget and take the row-tiled kernel (overlapping halo blocks).
    x, gn, cv, temb, skip = _setup(b=1, h=136, w=240, c_in=16, c_out=16)
    ref = (conv2d(cv, silu(group_norm(gn, x, num_groups=4)))
           + temb[:, None, None, :] + skip)
    s, b = fold_group_norm(gn, x, num_groups=4)
    got = gn_silu_conv3x3(x, s, b, cv["kernel"], cv["bias"],
                          channel_bias=temb, skip=skip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_fused_conv_vmem_guard_raises():
    # absurd widths exceed even the row-tiled halo budget; callers fall
    # back to the XLA path.
    x = jnp.zeros((1, 4, 2560, 320), jnp.bfloat16)
    s = jnp.zeros((1, 320), jnp.float32)
    k = jnp.zeros((3, 3, 320, 320), jnp.bfloat16)
    with pytest.raises(ValueError):
        gn_silu_conv3x3(x, s, s, k, jnp.zeros((320,), jnp.bfloat16))


def test_fused_conv_v2_fp32_exact():
    x, gn, cv, temb, skip = _setup()
    ref = (conv2d(cv, silu(group_norm(gn, x, num_groups=8)))
           + temb[:, None, None, :] + skip)
    s, b = fold_group_norm(gn, x, num_groups=8)
    got = gn_silu_conv3x3_v2(x, s, b, cv["kernel"], cv["bias"],
                             channel_bias=temb, skip=skip, block_rows=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_fused_conv_v2_no_extras_single_block():
    # n_rows == 1: the clamped "next block" view re-reads the same block;
    # the interior mask must zero those bogus halo rows.
    x, gn, cv, _, _ = _setup(b=1, h=8, w=8, c_in=16, c_out=16)
    ref = conv2d(cv, silu(group_norm(gn, x, num_groups=4)))
    s, b = fold_group_norm(gn, x, num_groups=4)
    got = gn_silu_conv3x3_v2(x, s, b, cv["kernel"], cv["bias"],
                             block_rows=200)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_fused_conv_v2_nonsquare_odd_dims_multirow():
    # W+2 rounds up to a non-trivial stride (13+2 -> 16); several row
    # blocks with halo recompute; C not a lane multiple.
    x, gn, cv, temb, skip = _setup(b=1, h=17, w=13, c_in=24, c_out=40)
    ref = (conv2d(cv, silu(group_norm(gn, x, num_groups=4)))
           + temb[:, None, None, :] + skip)
    s, b = fold_group_norm(gn, x, num_groups=4)
    got = gn_silu_conv3x3_v2(x, s, b, cv["kernel"], cv["bias"],
                             channel_bias=temb, skip=skip, block_rows=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


@pytest.mark.parametrize("variant", ["cast", "barrier", "split", "dxroll"])
def test_fused_conv_v2_mosaic_workaround_variants(variant, monkeypatch):
    """The env-selected formulations (lane-concat patch matrix "cast",
    optimization-barrier'd copies, concat-free per-tap dots, and the
    shift-free "dxroll" default — 8-aligned dy slices + two fp32 output
    rotations) all compute the same conv."""
    monkeypatch.setenv("CONV_V2_VARIANT", variant)
    x, gn, cv, temb, skip = _setup(b=1, h=12, w=10, c_in=32, c_out=48)
    ref = (conv2d(cv, silu(group_norm(gn, x, num_groups=8)))
           + temb[:, None, None, :] + skip)
    s, b = fold_group_norm(gn, x, num_groups=8)
    got = gn_silu_conv3x3_v2(x, s, b, cv["kernel"], cv["bias"],
                             channel_bias=temb, skip=skip, block_rows=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_fused_conv_v2_cin_chunked():
    # C_in=640 pads to 640, which only the 128-wide chunk divides → 5
    # contraction chunks: exercises the cross-chunk accumulator
    # init/finalize.
    x, gn, cv, temb, _ = _setup(b=1, h=10, w=6, c_in=640, c_out=32)
    ref = (conv2d(cv, silu(group_norm(gn, x, num_groups=8)))
           + temb[:, None, None, :])
    s, b = fold_group_norm(gn, x, num_groups=8)
    got = gn_silu_conv3x3_v2(x, s, b, cv["kernel"], cv["bias"],
                             channel_bias=temb, block_rows=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_resnet_apply_pallas2_matches_xla():
    from diffusionspatialcontrol_tpu.models.unet import _resnet_apply, \
        _resnet_init

    p = _resnet_init(jax.random.PRNGKey(0), 32, 48, 64, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 32))
    temb = jax.random.normal(jax.random.PRNGKey(2), (2, 64))
    ref = _resnet_apply(p, x, temb, 8, 1e-5, conv_impl="xla")
    got = _resnet_apply(p, x, temb, 8, 1e-5, conv_impl="pallas2")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_resnet_apply_pallas_matches_xla():
    from diffusionspatialcontrol_tpu.models.unet import _resnet_apply, \
        _resnet_init

    p = _resnet_init(jax.random.PRNGKey(0), 32, 48, 64, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 32))
    temb = jax.random.normal(jax.random.PRNGKey(2), (2, 64))
    ref = _resnet_apply(p, x, temb, 8, 1e-5, conv_impl="xla")
    got = _resnet_apply(p, x, temb, 8, 1e-5, conv_impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_unet_conv_impl_pallas_matches_xla():
    from diffusionspatialcontrol_tpu.config import UNetConfig
    from diffusionspatialcontrol_tpu.models.unet import (
        UNetCond,
        unet_apply,
        unet_init,
    )

    cfg = UNetConfig(block_out_channels=(32, 64, 64, 64),
                     cross_attention_dim=64,
                     num_attention_heads=(4, 4, 4, 4), norm_num_groups=8)
    params = unet_init(jax.random.PRNGKey(0), cfg, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    t = jnp.asarray([500.0])
    cond = UNetCond(
        context=jax.random.normal(jax.random.PRNGKey(2), (1, 77, 64)))
    ref = unet_apply(params, cfg, x, t, cond, attn_impl="xla")
    got = unet_apply(params, cfg, x, t, cond, attn_impl="xla",
                     conv_impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4,
                               rtol=1e-3)


def test_vae_decode_conv_impl_pallas_matches_xla():
    from diffusionspatialcontrol_tpu.config import VAEConfig
    from diffusionspatialcontrol_tpu.models.vae import vae_decode, vae_init

    cfg = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_num_groups=8)
    params = vae_init(jax.random.PRNGKey(0), cfg, jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4)) * 0.2
    ref = vae_decode(params, cfg, z)
    got = vae_decode(params, cfg, z, conv_impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4,
                               rtol=1e-3)


def test_unet_conv_impl_xla_bf16_identical_in_fp32():
    """conv_impl="xla_bf16" only changes the conv output element type; in
    fp32 compute the requested type equals the default — bitwise equal."""
    from diffusionspatialcontrol_tpu.models.unet import (
        UNetConfig,
        UNetCond,
        unet_apply,
        unet_init,
    )

    cfg = UNetConfig(block_out_channels=(32, 64, 64, 64),
                     cross_attention_dim=64,
                     num_attention_heads=(4, 4, 4, 4), norm_num_groups=8)
    params = unet_init(jax.random.PRNGKey(0), cfg, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    t = jnp.asarray([500.0])
    cond = UNetCond(
        context=jax.random.normal(jax.random.PRNGKey(2), (1, 77, 64)))
    ref = unet_apply(params, cfg, x, t, cond, attn_impl="xla")
    got = unet_apply(params, cfg, x, t, cond, attn_impl="xla",
                     conv_impl="xla_bf16")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_unet_conv_impl_xla_bf16_close_in_bf16():
    """In bf16 compute the variant rounds each conv output once more than
    the fp32-epilogue default — outputs stay within bf16 tolerance."""
    from diffusionspatialcontrol_tpu.models.unet import (
        UNetConfig,
        UNetCond,
        unet_apply,
        unet_init,
    )

    cfg = UNetConfig(block_out_channels=(32, 64, 64, 64),
                     cross_attention_dim=64,
                     num_attention_heads=(4, 4, 4, 4), norm_num_groups=8)
    params = unet_init(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4), jnp.bfloat16)
    t = jnp.asarray([500.0])
    cond = UNetCond(context=jax.random.normal(
        jax.random.PRNGKey(2), (1, 77, 64), jnp.bfloat16))
    ref = unet_apply(params, cfg, x, t, cond, attn_impl="xla")
    got = unet_apply(params, cfg, x, t, cond, attn_impl="xla",
                     conv_impl="xla_bf16")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.05)

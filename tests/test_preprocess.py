"""Preprocessor + converter extension tests."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusionspatialcontrol_tpu.ops import preprocess as pp


def test_canny_detects_square_edge():
    img = np.zeros((64, 64), np.float32)
    img[16:48, 16:48] = 255.0
    edges = pp.canny(img)
    assert edges.shape == (64, 64, 3)
    # edge pixels near the square boundary, none deep inside/outside
    assert edges[16, 16:48, 0].sum() > 10
    assert edges[32, 30:34, 0].sum() == 0
    assert edges[2, 2, 0] == 0


def test_color_blocks():
    rng = np.random.RandomState(0)
    img = rng.rand(128, 128, 3).astype(np.float32)
    out = pp.color_blocks(img, block=64)
    assert out.shape == img.shape
    # constant within each 64x64 block
    assert np.allclose(out[:64, :64], out[0, 0])


def test_content_shuffle_preserves_palette():
    rng = np.random.RandomState(0)
    img = rng.rand(64, 64, 3).astype(np.float32)
    out = pp.content_shuffle(img, f=16, seed=1)
    assert out.shape == img.shape
    assert set(np.round(out.reshape(-1, 3)[:, 0], 5)).issubset(
        set(np.round(img.reshape(-1, 3)[:, 0], 5))
    )


def test_invert_and_grayscale():
    img = np.full((8, 8, 3), 255, np.uint8)
    assert pp.invert(img).max() == 0.0
    g = pp.grayscale3(np.zeros((8, 8, 3), np.uint8))
    assert g.shape == (8, 8, 3)


def test_controlnet_conversion_roundtrip():
    """Zero-init our controlnet, export to diffusers names via the test
    inverse helpers, reconvert and compare."""
    from diffusionspatialcontrol_tpu.convert import hf
    from diffusionspatialcontrol_tpu.models.controlnet import controlnet_init
    from tests.test_convert import (
        _inv_conv,
        _inv_linear,
        _inv_resnet,
        _inv_transformer,
    )
    from tests.test_pipeline import TINY

    params = controlnet_init(jax.random.PRNGKey(0), TINY.unet,
                             dtype=jnp.float32)
    dst = {}
    _inv_conv(dst, "conv_in", params["conv_in"])
    _inv_linear(dst, "time_embedding.linear_1",
                params["time_embedding"]["linear_1"])
    _inv_linear(dst, "time_embedding.linear_2",
                params["time_embedding"]["linear_2"])
    ce = params["cond_embedding"]
    _inv_conv(dst, "controlnet_cond_embedding.conv_in", ce["conv_in"])
    for i, b in enumerate(ce["blocks"]):
        _inv_conv(dst, f"controlnet_cond_embedding.blocks.{i}", b)
    _inv_conv(dst, "controlnet_cond_embedding.conv_out", ce["conv_out"])
    for i, block in enumerate(params["down_blocks"]):
        for j, r in enumerate(block["resnets"]):
            _inv_resnet(dst, f"down_blocks.{i}.resnets.{j}", r)
        for j, a in enumerate(block["attentions"]):
            _inv_transformer(dst, f"down_blocks.{i}.attentions.{j}", a,
                             False)
        if "downsample" in block:
            _inv_conv(dst, f"down_blocks.{i}.downsamplers.0.conv",
                      block["downsample"])
    _inv_resnet(dst, "mid_block.resnets.0", params["mid_block"]["resnet1"])
    _inv_transformer(dst, "mid_block.attentions.0",
                     params["mid_block"]["attention"], False)
    _inv_resnet(dst, "mid_block.resnets.1", params["mid_block"]["resnet2"])
    for i, zc in enumerate(params["zero_convs"]):
        _inv_conv(dst, f"controlnet_down_blocks.{i}", zc)
    _inv_conv(dst, "controlnet_mid_block", params["mid_zero_conv"])

    got = hf.convert_controlnet(hf.StateDict(dst), TINY.unet, jnp.float32)
    from tests.test_convert import _trees_equal

    _trees_equal(params, got)


def test_t2i_adapter_conversion():
    from diffusionspatialcontrol_tpu.config import T2IAdapterConfig
    from diffusionspatialcontrol_tpu.convert import hf
    from diffusionspatialcontrol_tpu.models.t2i_adapter import (
        t2i_adapter_apply,
        t2i_adapter_init,
    )
    from tests.test_convert import _inv_conv, _trees_equal

    cfg = T2IAdapterConfig(channels=(32, 64, 128, 128))
    params = t2i_adapter_init(jax.random.PRNGKey(0), cfg, jnp.float32)
    dst = {}
    for i, block in enumerate(params["blocks"]):
        if block["in_conv"] is not None:
            if i == 0:
                _inv_conv(dst, "adapter.conv_in", block["in_conv"])
            else:
                _inv_conv(dst, f"adapter.body.{i}.in_conv",
                          block["in_conv"])
        for j, r in enumerate(block["resnets"]):
            _inv_conv(dst, f"adapter.body.{i}.resnets.{j}.block1",
                      r["block1"])
            _inv_conv(dst, f"adapter.body.{i}.resnets.{j}.block2",
                      r["block2"])
    got = hf.convert_t2i_adapter(hf.StateDict(dst), jnp.float32)
    _trees_equal(params, got)
    feats = t2i_adapter_apply(got, cfg, jnp.zeros((1, 64, 64, 3)))
    assert feats[0].shape == (1, 8, 8, 32)

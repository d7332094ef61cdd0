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


# ---------------------------------------------------------------------------
# DPT depth (model-based preprocessor)
# ---------------------------------------------------------------------------


def test_dpt_matches_transformers_torch():
    """Our JAX DPT vs transformers' torch DPTForDepthEstimation on a tiny
    random-init config: identical weights (via the converter) must give the
    same predicted depth."""
    import torch
    from transformers import DPTConfig as HFDPTConfig
    from transformers import DPTForDepthEstimation

    from diffusionspatialcontrol_tpu.convert import hf
    from diffusionspatialcontrol_tpu.models.dpt import (
        DPTConfig,
        convert_dpt,
        dpt_apply,
    )

    hf_cfg = HFDPTConfig(
        image_size=64, patch_size=16, num_channels=3, hidden_size=32,
        num_hidden_layers=4, num_attention_heads=2, intermediate_size=64,
        is_hybrid=False, backbone_out_indices=[0, 1, 2, 3],
        neck_hidden_sizes=[16, 24, 32, 32],
        reassemble_factors=[4, 2, 1, 0.5],
        fusion_hidden_size=16, readout_type="project",
        add_projection=False, attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = DPTForDepthEstimation(hf_cfg).eval()
    with torch.no_grad():
        # random-init head ReLUs would zero the depth map, making the
        # comparison vacuous; bias the head so outputs are O(1)
        model.head.head[2].bias += 0.5
        model.head.head[4].bias += 0.5
    sd = hf.StateDict(
        {k: v.numpy() for k, v in model.state_dict().items()}
    )
    cfg = DPTConfig(
        image_size=64, patch_size=16, hidden_size=32, num_layers=4,
        num_heads=2, intermediate_size=64,
        backbone_out_indices=(0, 1, 2, 3),
        neck_hidden_sizes=(16, 24, 32, 32), fusion_hidden_size=16,
    )
    params = convert_dpt(sd, cfg, jnp.float32)

    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = model(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).predicted_depth.numpy()
    got = np.asarray(dpt_apply(params, cfg, jnp.asarray(x)))
    assert got.shape == want.shape
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got / scale, want / scale, atol=3e-5)


def test_dpt_variable_input_size_and_control_image():
    from diffusionspatialcontrol_tpu.models.dpt import (
        DPTConfig,
        depth_to_control_image,
        dpt_apply,
        dpt_init,
    )

    cfg = DPTConfig(
        image_size=64, patch_size=16, hidden_size=32, num_layers=4,
        num_heads=2, intermediate_size=64,
        backbone_out_indices=(0, 1, 2, 3),
        neck_hidden_sizes=(16, 24, 32, 32), fusion_hidden_size=16,
    )
    params = dpt_init(jax.random.PRNGKey(0), cfg, jnp.float32)
    # non-square, different from cfg.image_size: pos-emb interpolation path
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 96, 64, 3))
    depth = dpt_apply(params, cfg, x)
    assert depth.shape == (1, 96, 64)
    ctrl = depth_to_control_image(depth)
    assert ctrl.shape == (1, 96, 64, 3)
    v = np.asarray(ctrl)
    assert v.min() >= 0.0 and v.max() <= 1.0


# ---------------------------------------------------------------------------
# Openpose body (model-based preprocessor)
# ---------------------------------------------------------------------------


def test_openpose_body_shapes_and_converter():
    from diffusionspatialcontrol_tpu.convert import hf
    from diffusionspatialcontrol_tpu.models import openpose as op

    params = op.openpose_body_init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))
    paf, heat = op.openpose_body_apply(params, x)
    assert paf.shape == (1, 8, 8, 38)
    assert heat.shape == (1, 8, 8, 19)

    # converter roundtrip from the pytorch-openpose key layout
    sd = {}
    for block, spec in op._block_specs().items():
        for layer in spec:
            if len(layer) == 1:
                continue
            name = layer[0]
            k = np.asarray(params[block][name]["kernel"], np.float32)
            sd[f"{block}.{name}.weight"] = k.transpose(3, 2, 0, 1)
            sd[f"{block}.{name}.bias"] = np.asarray(
                params[block][name]["bias"], np.float32
            )
    got = op.convert_openpose_body(hf.StateDict(sd))
    paf2, heat2 = op.openpose_body_apply(got, x)
    np.testing.assert_array_equal(np.asarray(paf), np.asarray(paf2))
    # total conv count = VGG-CPM 12 + 2*(5 + 5*7) = 92
    assert len(sd) == 2 * 92


def test_openpose_grouping_on_synthetic_maps():
    """Peak finding + PAF pairing + subset assembly + drawing on synthetic
    heatmaps/PAFs: two joints connected by a clean limb field must yield
    one 2-part... (we paint a minimal 4-part person so the >=4-part subset
    filter keeps it)."""
    from diffusionspatialcontrol_tpu.models import openpose as op

    h = w = 96
    heat = np.zeros((h, w, 19), np.float32)
    paf = np.zeros((h, w, 38), np.float32)

    # parts: 1(neck)=idx1, 2(Rsho)=idx2, 3(Relb)=idx3, 4(Rwri)=idx4
    pts = {1: (48, 20), 2: (30, 40), 3: (30, 64), 4: (30, 84)}
    yy, xx = np.mgrid[0:h, 0:w]
    for part, (x0, y0) in pts.items():
        heat[:, :, part] = np.exp(
            -((xx - x0) ** 2 + (yy - y0) ** 2) / (2 * 4.0**2)
        )
    # limbs: [2,3] (neck->Rsho, paf 31-19=12,13), [3,4] (Rsho->Relb,
    # 33-19=14,15), [4,5] (Relb->Rwri, 35-19=16,17)
    for limb_k, (a, b) in ((0, (1, 2)), (2, (2, 3)), (3, (3, 4))):
        ax, ay = pts[a]
        bx, by = pts[b]
        vec = np.array([bx - ax, by - ay], np.float64)
        vec = vec / np.sqrt((vec**2).sum())
        on_limb = (
            np.abs((xx - ax) * vec[1] - (yy - ay) * vec[0]) < 6
        ) & (((xx - ax) * vec[0] + (yy - ay) * vec[1]) > -4) & (
            ((xx - bx) * vec[0] + (yy - by) * vec[1]) < 4
        )
        ch = op.MAP_IDX[limb_k][0] - 19
        paf[:, :, ch][on_limb] = vec[0]
        paf[:, :, ch + 1][on_limb] = vec[1]

    peaks = op.find_peaks(heat)
    assert sum(len(p) for p in peaks) == 4
    conns, special = op.pair_limbs(paf, peaks, orig_h=h)
    subset, candidate = op.assemble_subsets(peaks, conns, special)
    assert len(subset) == 1
    assert subset[0][-1] == 4  # all four parts joined into one person
    canvas = op.draw_bodypose(h, w, candidate, subset)
    assert canvas.shape == (h, w, 3)
    assert canvas.max() > 0.3  # something was drawn
    # skeleton pixels concentrate around the painted limbs
    assert canvas[:, :, :].sum() < 0.2 * h * w * 3


def test_openpose_detector_end_to_end_random_weights():
    from diffusionspatialcontrol_tpu.models import openpose as op

    params = op.openpose_body_init(jax.random.PRNGKey(0))
    img = (np.random.RandomState(0).rand(80, 64, 3) * 255).astype(np.uint8)
    out = op.detect_pose(params, img, detect_resolution=64)
    assert out.shape == (80, 64, 3)
    assert out.dtype == np.float32
    assert np.all((out >= 0) & (out <= 1))


def test_manager_preprocessor_registry():
    import jax.numpy as jnp

    from diffusionspatialcontrol_tpu.app.api import ModelManager

    m = ModelManager(dtype=jnp.float32)
    img = (np.random.RandomState(1).rand(64, 64, 3) * 255).astype(np.uint8)
    canny = m.get_preprocessor("Canny")(img)
    assert canny.shape == (64, 64, 3)
    depth = m.get_preprocessor("Depth")(img)
    assert depth.shape == (64, 64, 3)
    assert np.all((depth >= 0) & (depth <= 1))
    pose_fn = m.get_preprocessor("Openpose")
    assert m.get_preprocessor("Openpose") is pose_fn  # cached
    import pytest as _pytest

    # every model-based name now has a native detector
    from diffusionspatialcontrol_tpu.ops.preprocess import (
        MODEL_BASED_PREPROCESSORS,
        NATIVE_MODEL_PREPROCESSORS,
    )

    assert set(MODEL_BASED_PREPROCESSORS) <= set(NATIVE_MODEL_PREPROCESSORS)
    normal = m.get_preprocessor("Normal Map")(img)
    assert normal.shape == (64, 64, 3)
    assert np.all((normal >= 0) & (normal <= 1))
    with _pytest.raises(KeyError):
        m.get_preprocessor("Nonsense")


# ---------------------------------------------------------------------------
# UperNet semantic segmentation (model-based preprocessor)
# ---------------------------------------------------------------------------


def test_upernet_matches_transformers_torch():
    """JAX UperNet+ConvNeXt vs transformers torch on a tiny random-init
    config with randomized BN running stats."""
    import torch
    from transformers import ConvNextConfig
    from transformers import UperNetConfig as HFUperNetConfig
    from transformers import UperNetForSemanticSegmentation

    from diffusionspatialcontrol_tpu.convert import hf
    from diffusionspatialcontrol_tpu.models.upernet import (
        UperNetConfig,
        convert_upernet,
        upernet_apply,
    )

    bb = ConvNextConfig(
        hidden_sizes=[16, 24, 32, 40], depths=[1, 1, 2, 1],
        out_features=["stage1", "stage2", "stage3", "stage4"],
    )
    hf_cfg = HFUperNetConfig(
        backbone_config=bb, hidden_size=24, pool_scales=[1, 2, 3, 6],
        num_labels=10, use_auxiliary_head=True, auxiliary_in_channels=32,
    )
    torch.manual_seed(0)
    model = UperNetForSemanticSegmentation(hf_cfg).eval()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    sd = hf.StateDict(
        {k: v.numpy() for k, v in model.state_dict().items()}
    )
    cfg = UperNetConfig(hidden_sizes=(16, 24, 32, 40), depths=(1, 1, 2, 1),
                        head_channels=24, num_labels=10)
    params = convert_upernet(sd, cfg, jnp.float32)

    x = np.random.RandomState(0).randn(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        want = model(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).logits.numpy().transpose(0, 2, 3, 1)
    got = np.asarray(upernet_apply(params, cfg, jnp.asarray(x)))
    assert got.shape == want.shape
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got / scale, want / scale, atol=5e-5)


def test_segmentation_preprocessor_end_to_end():
    from diffusionspatialcontrol_tpu.app.api import ModelManager

    m = ModelManager(dtype=jnp.float32)
    img = (np.random.RandomState(2).rand(70, 50, 3) * 255).astype(np.uint8)
    out = m.get_preprocessor("Semantic Segmentation")(img)
    assert out.shape == (70, 50, 3)
    assert np.all((out >= 0) & (out <= 1))
    # deterministic
    out2 = m.get_preprocessor("Semantic Segmentation")(img)
    np.testing.assert_array_equal(out, out2)


# ---------------------------------------------------------------------------
# HED soft edge (model-based preprocessor)
# ---------------------------------------------------------------------------


def test_hed_shapes_converter_and_detector():
    from diffusionspatialcontrol_tpu.convert import hf
    from diffusionspatialcontrol_tpu.models import hed as H

    params = H.hed_init(jax.random.PRNGKey(0))
    outs = H.hed_apply(params, jnp.zeros((1, 64, 96, 3)))
    assert [o.shape for o in outs] == [
        (1, 64, 96, 1), (1, 32, 48, 1), (1, 16, 24, 1), (1, 8, 12, 1),
        (1, 4, 6, 1),
    ]

    # converter roundtrip from the ControlNetHED.pth key layout
    sd = {"norm": np.asarray(params["norm"], np.float32).reshape(1, 3, 1, 1)}
    for b in range(1, 6):
        bp = params[f"block{b}"]
        for i, conv in enumerate(bp["convs"]):
            sd[f"block{b}.convs.{i}.weight"] = np.asarray(
                conv["kernel"], np.float32).transpose(3, 2, 0, 1)
            sd[f"block{b}.convs.{i}.bias"] = np.asarray(conv["bias"],
                                                        np.float32)
        sd[f"block{b}.projection.weight"] = np.asarray(
            bp["projection"]["kernel"], np.float32).transpose(3, 2, 0, 1)
        sd[f"block{b}.projection.bias"] = np.asarray(
            bp["projection"]["bias"], np.float32)
    got = H.convert_hed(hf.StateDict(sd))
    outs2 = H.hed_apply(got, jnp.zeros((1, 64, 96, 3)))
    for a, b_ in zip(outs, outs2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    img = (np.random.RandomState(0).rand(50, 70, 3) * 255).astype(np.uint8)
    soft = H.detect_edges(params, img)
    assert soft.shape == (50, 70, 3)
    assert np.all((soft >= 0) & (soft <= 1))
    scrib = H.detect_edges(params, img, scribble=True)
    assert set(np.unique(scrib)).issubset({0.0, 1.0})


def test_softedge_and_ip2p_via_manager():
    from diffusionspatialcontrol_tpu.app.api import ModelManager

    m = ModelManager(dtype=jnp.float32)
    img = (np.random.RandomState(3).rand(48, 48, 3) * 255).astype(np.uint8)
    soft = m.get_preprocessor("Soft Edge")(img)
    assert soft.shape == (48, 48, 3)
    ident = m.get_preprocessor("Instruct Pix2Pix")(img)
    np.testing.assert_allclose(ident, img.astype(np.float32) / 255.0)


# ---------------------------------------------------------------------------
# Lineart generator (model-based preprocessor)
# ---------------------------------------------------------------------------


def test_conv_transpose_s2_matches_torch():
    """Our lhs-dilated conv == torch ConvTranspose2d(k3, s2, p1, op1)."""
    import torch
    import torch.nn.functional as F

    from diffusionspatialcontrol_tpu.models.lineart import conv_transpose_s2

    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 7, 4).astype(np.float32)
    w = rng.randn(4, 3, 3, 3).astype(np.float32)  # (in, out, kh, kw)
    b = rng.randn(3).astype(np.float32)
    want = F.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        torch.from_numpy(b), stride=2, padding=1, output_padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    kernel = jnp.asarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))
    got = np.asarray(conv_transpose_s2(
        {"kernel": kernel, "bias": jnp.asarray(b)}, jnp.asarray(x)
    ))
    assert got.shape == want.shape == (2, 10, 14, 3)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lineart_generator_matches_torch_replica():
    """End-to-end vs a torch replica of the informative-drawings Generator
    built with the exact module layout (Sequential indices = the weight-key
    layout our converter consumes)."""
    import torch
    import torch.nn as nn

    from diffusionspatialcontrol_tpu.convert import hf
    from diffusionspatialcontrol_tpu.models import lineart as L

    class ResBlock(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv_block = nn.Sequential(
                nn.ReflectionPad2d(1), nn.Conv2d(c, c, 3),
                nn.InstanceNorm2d(c), nn.ReLU(inplace=True),
                nn.ReflectionPad2d(1), nn.Conv2d(c, c, 3),
                nn.InstanceNorm2d(c),
            )

        def forward(self, x):
            return x + self.conv_block(x)

    class Generator(nn.Module):
        def __init__(self):
            super().__init__()
            self.model0 = nn.Sequential(
                nn.ReflectionPad2d(3), nn.Conv2d(3, 64, 7),
                nn.InstanceNorm2d(64), nn.ReLU(inplace=True))
            self.model1 = nn.Sequential(
                nn.Conv2d(64, 128, 3, stride=2, padding=1),
                nn.InstanceNorm2d(128), nn.ReLU(inplace=True),
                nn.Conv2d(128, 256, 3, stride=2, padding=1),
                nn.InstanceNorm2d(256), nn.ReLU(inplace=True))
            self.model2 = nn.Sequential(*[ResBlock(256) for _ in range(3)])
            self.model3 = nn.Sequential(
                nn.ConvTranspose2d(256, 128, 3, stride=2, padding=1,
                                   output_padding=1),
                nn.InstanceNorm2d(128), nn.ReLU(inplace=True),
                nn.ConvTranspose2d(128, 64, 3, stride=2, padding=1,
                                   output_padding=1),
                nn.InstanceNorm2d(64), nn.ReLU(inplace=True))
            self.model4 = nn.Sequential(
                nn.ReflectionPad2d(3), nn.Conv2d(64, 1, 7), nn.Sigmoid())

        def forward(self, x):
            return self.model4(self.model3(self.model2(self.model1(
                self.model0(x)))))

    torch.manual_seed(0)
    model = Generator().eval()
    sd = hf.StateDict({k: v.numpy() for k, v in model.state_dict().items()})
    params = L.convert_lineart(sd)

    x = np.random.RandomState(1).rand(1, 32, 48, 3).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x.transpose(0, 3, 1, 2))
                     ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(L.lineart_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)

    img = (np.random.RandomState(2).rand(30, 46, 3) * 255).astype(np.uint8)
    out = L.detect_lineart(params, img)
    assert out.shape == (30, 46, 3)
    assert np.all((out >= 0) & (out <= 1))


def test_lineart_anime_matches_torch_replica():
    """UnetGenerator(3, 1, 8, 64) vs a torch replica with the exact pix2pix
    module nesting (= the netG.pth weight layout)."""
    import functools

    import torch
    import torch.nn as nn

    from diffusionspatialcontrol_tpu.convert import hf
    from diffusionspatialcontrol_tpu.models import lineart_anime as LA

    norm = functools.partial(nn.InstanceNorm2d, affine=False,
                             track_running_stats=False)

    class Block(nn.Module):
        def __init__(self, outer, inner, input_nc=None, submodule=None,
                     outermost=False, innermost=False):
            super().__init__()
            self.outermost = outermost
            input_nc = input_nc or outer
            downconv = nn.Conv2d(input_nc, inner, 4, 2, 1)
            downrelu = nn.LeakyReLU(0.2, True)
            uprelu = nn.ReLU(True)
            if outermost:
                upconv = nn.ConvTranspose2d(inner * 2, outer, 4, 2, 1)
                model = [downconv, submodule, uprelu, upconv, nn.Tanh()]
            elif innermost:
                upconv = nn.ConvTranspose2d(inner, outer, 4, 2, 1)
                model = [downrelu, downconv, uprelu, upconv, norm(outer)]
            else:
                upconv = nn.ConvTranspose2d(inner * 2, outer, 4, 2, 1)
                model = [downrelu, downconv, norm(inner), submodule,
                         uprelu, upconv, norm(outer)]
            self.model = nn.Sequential(*model)

        def forward(self, x):
            if self.outermost:
                return self.model(x)
            return torch.cat([x, self.model(x)], 1)

    ngf = 64
    blk = Block(ngf * 8, ngf * 8, innermost=True)
    for _ in range(3):
        blk = Block(ngf * 8, ngf * 8, submodule=blk)
    blk = Block(ngf * 4, ngf * 8, submodule=blk)
    blk = Block(ngf * 2, ngf * 4, submodule=blk)
    blk = Block(ngf, ngf * 2, submodule=blk)
    net = Block(1, ngf, input_nc=3, submodule=blk, outermost=True)

    torch.manual_seed(0)
    for m in net.modules():
        if isinstance(m, (nn.Conv2d, nn.ConvTranspose2d)):
            nn.init.normal_(m.weight, 0.0, 0.02)
    net = net.eval()
    sd = hf.StateDict({k: v.numpy() for k, v in net.state_dict().items()})
    params = LA.convert_lineart_anime(sd)

    x = np.random.RandomState(1).rand(1, 256, 256, 3).astype(np.float32)
    x = x * 2 - 1
    with torch.no_grad():
        want = net(torch.from_numpy(x.transpose(0, 3, 1, 2))
                   ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(LA.lineart_anime_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=3e-5)

    img = (np.random.RandomState(2).rand(100, 80, 3) * 255).astype(
        np.uint8
    )
    out = LA.detect_lineart_anime(params, img)
    assert out.shape == (100, 80, 3)
    assert np.all((out >= 0) & (out <= 1))


# ---------------------------------------------------------------------------
# MLSD (model-based preprocessor)
# ---------------------------------------------------------------------------


def test_mlsd_matches_torch_replica():
    """MobileV2_MLSD_Large vs a torch replica with the exact module layout
    (attribute/Sequential indices = the mlsd_large_512_fp32.pth key layout
    convert_mlsd consumes), including folded BatchNorm running stats,
    depthwise strides, dilation-5 head and align_corners upsampling."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from diffusionspatialcontrol_tpu.convert import hf
    from diffusionspatialcontrol_tpu.models import mlsd as M

    class ConvBNReLU(nn.Sequential):
        def __init__(self, inp, oup, k=3, stride=1, groups=1):
            super().__init__(
                nn.Conv2d(inp, oup, k, stride, (k - 1) // 2, groups=groups,
                          bias=False),
                nn.BatchNorm2d(oup), nn.ReLU6(inplace=True))

    class InvertedResidual(nn.Module):
        def __init__(self, inp, oup, stride, expand_ratio):
            super().__init__()
            hidden = int(round(inp * expand_ratio))
            self.use_res = stride == 1 and inp == oup
            layers = []
            if expand_ratio != 1:
                layers.append(ConvBNReLU(inp, hidden, k=1))
            layers.extend([
                ConvBNReLU(hidden, hidden, stride=stride, groups=hidden),
                nn.Conv2d(hidden, oup, 1, 1, 0, bias=False),
                nn.BatchNorm2d(oup)])
            self.conv = nn.Sequential(*layers)

        def forward(self, x):
            return x + self.conv(x) if self.use_res else self.conv(x)

    class Backbone(nn.Module):
        def __init__(self):
            super().__init__()
            feats = [ConvBNReLU(4, 32, stride=2)]
            inp = 32
            for t, c, n, s in M._IR_SETTING:
                for i in range(n):
                    feats.append(InvertedResidual(
                        inp, c, s if i == 0 else 1, t))
                    inp = c
            self.features = nn.Sequential(*feats)

        def forward(self, x):
            taps = []
            for i, f in enumerate(self.features):
                x = f(x)
                if i in M._FPN:
                    taps.append(x)
            return taps

    class BlockTypeA(nn.Module):
        def __init__(self, in_c1, in_c2, out_c1, out_c2, upscale=True):
            super().__init__()
            self.conv1 = nn.Sequential(nn.Conv2d(in_c2, out_c2, 1),
                                       nn.BatchNorm2d(out_c2),
                                       nn.ReLU(inplace=True))
            self.conv2 = nn.Sequential(nn.Conv2d(in_c1, out_c1, 1),
                                       nn.BatchNorm2d(out_c1),
                                       nn.ReLU(inplace=True))
            self.upscale = upscale

        def forward(self, a, b):
            b = self.conv1(b)
            a = self.conv2(a)
            if self.upscale:
                b = F.interpolate(b, scale_factor=2.0, mode="bilinear",
                                  align_corners=True)
            return torch.cat((a, b), dim=1)

    class BlockTypeB(nn.Module):
        def __init__(self, in_c, out_c):
            super().__init__()
            self.conv1 = nn.Sequential(nn.Conv2d(in_c, in_c, 3, padding=1),
                                       nn.BatchNorm2d(in_c),
                                       nn.ReLU(inplace=True))
            self.conv2 = nn.Sequential(nn.Conv2d(in_c, out_c, 3, padding=1),
                                       nn.BatchNorm2d(out_c))

        def forward(self, x):
            return self.conv2(self.conv1(x) + x)

    class BlockTypeC(nn.Module):
        def __init__(self, in_c, out_c):
            super().__init__()
            self.conv1 = nn.Sequential(
                nn.Conv2d(in_c, in_c, 3, padding=5, dilation=5),
                nn.BatchNorm2d(in_c), nn.ReLU(inplace=True))
            self.conv2 = nn.Sequential(nn.Conv2d(in_c, in_c, 3, padding=1),
                                       nn.BatchNorm2d(in_c),
                                       nn.ReLU(inplace=True))
            self.conv3 = nn.Conv2d(in_c, out_c, 1)

        def forward(self, x):
            return self.conv3(self.conv2(self.conv1(x)))

    class MLSDLarge(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = Backbone()
            self.block15 = BlockTypeA(64, 96, 64, 64, upscale=False)
            self.block16 = BlockTypeB(128, 64)
            self.block17 = BlockTypeA(32, 64, 64, 64)
            self.block18 = BlockTypeB(128, 64)
            self.block19 = BlockTypeA(24, 64, 64, 64)
            self.block20 = BlockTypeB(128, 64)
            self.block21 = BlockTypeA(16, 64, 64, 64)
            self.block22 = BlockTypeB(128, 64)
            self.block23 = BlockTypeC(64, 16)

        def forward(self, x):
            c1, c2, c3, c4, c5 = self.backbone(x)
            x = self.block16(self.block15(c4, c5))
            x = self.block18(self.block17(c3, x))
            x = self.block20(self.block19(c2, x))
            x = self.block22(self.block21(c1, x))
            return self.block23(x)[:, 7:, :, :]

    torch.manual_seed(0)
    model = MLSDLarge().eval()
    # randomize BN running stats so folding is actually exercised
    gen = np.random.RandomState(7)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            n = m.running_mean.shape[0]
            m.running_mean.data = torch.from_numpy(
                gen.randn(n).astype(np.float32) * 0.2)
            m.running_var.data = torch.from_numpy(
                gen.rand(n).astype(np.float32) + 0.5)

    sd = hf.StateDict({k: v.numpy() for k, v in model.state_dict().items()})
    params = M.convert_mlsd(sd)

    x = np.random.RandomState(1).rand(1, 64, 64, 4).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x.transpose(0, 3, 1, 2))
                     ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(M.mlsd_apply(params, jnp.asarray(x)))
    assert got.shape == want.shape == (1, 32, 32, 9)
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_mlsd_decode_and_detector():
    from diffusionspatialcontrol_tpu.models import mlsd as M

    # synthetic tpMap: one strong center with a long displacement
    tp = np.zeros((32, 32, 9), np.float32)
    tp[..., 0] = -10.0
    tp[16, 16, 0] = 10.0
    tp[16, 16, 1:5] = [-12.0, 0.0, 12.0, 0.0]
    segs = M.decode_lines(tp, score_thr=0.1, dist_thr=20.0)
    assert segs.shape == (1, 4)
    np.testing.assert_allclose(segs[0], [4.0, 16.0, 28.0, 16.0], atol=1e-4)
    # below the distance threshold -> dropped
    tp[16, 16, 1:5] = [-2.0, 0.0, 2.0, 0.0]
    assert M.decode_lines(tp, score_thr=0.1, dist_thr=20.0).shape == (0, 4)

    params = M.mlsd_init(jax.random.PRNGKey(0))
    img = (np.random.RandomState(2).rand(40, 56, 3) * 255).astype(np.uint8)
    out = M.detect_mlsd(params, img)
    assert out.shape == (40, 56, 3)
    assert np.all((out >= 0) & (out <= 1))


def test_mlsd_via_manager():
    from diffusionspatialcontrol_tpu.app.api import ModelManager

    mgr = ModelManager()
    fn = mgr.get_preprocessor("MLSD")
    img = (np.random.RandomState(3).rand(32, 32, 3) * 255).astype(np.uint8)
    out = fn(img)
    assert out.shape == (32, 32, 3)


# ---------------------------------------------------------------------------
# ZoeDepth (model-based preprocessor)
# ---------------------------------------------------------------------------


def _tiny_hf_zoedepth():
    """transformers ZoeDepthForDepthEstimation with a tiny config matching
    models.zoedepth.ZOE_TINY (same structure as Intel/zoedepth-nyu-kitti)."""
    from transformers import BeitConfig
    from transformers import ZoeDepthConfig as HFZoeConfig
    from transformers import ZoeDepthForDepthEstimation

    backbone = BeitConfig(
        image_size=64, patch_size=16, num_hidden_layers=4, hidden_size=64,
        intermediate_size=128, num_attention_heads=4,
        use_relative_position_bias=True, reshape_hidden_states=False,
        out_features=["stage1", "stage2", "stage3", "stage4"],
        layer_scale_init_value=0.1, use_absolute_position_embeddings=False,
        attn_implementation="eager",
    )
    hf_cfg = HFZoeConfig(
        backbone_config=backbone,
        neck_hidden_sizes=[16, 24, 32, 32], fusion_hidden_size=32,
        num_relative_features=8, bottleneck_features=32,
        bin_embedding_dim=16, num_attractors=[4, 2, 2, 1],
        bin_configurations=[
            {"name": "nyu", "n_bins": 8, "min_depth": 1e-3,
             "max_depth": 10.0},
            {"name": "kitti", "n_bins": 8, "min_depth": 1e-3,
             "max_depth": 80.0},
        ],
        num_patch_transformer_layers=4, patch_transformer_hidden_size=128,
        patch_transformer_intermediate_size=32,
        patch_transformer_num_attention_heads=2,
    )
    import torch

    torch.manual_seed(0)
    model = ZoeDepthForDepthEstimation(hf_cfg).eval()
    # non-degenerate weights: _init_weights zeroes biases/tables; randomize
    gen = np.random.RandomState(3)
    with torch.no_grad():
        for name, par in model.named_parameters():
            par.copy_(torch.from_numpy(
                gen.randn(*par.shape).astype(np.float32) * 0.05))
    return model


def test_zoedepth_matches_transformers_torch():
    """Full-model numerics vs transformers' torch ZoeDepth (NK dual-head
    with patch-transformer router), non-square input so the relative
    position bias interpolation path is exercised."""
    import torch

    from diffusionspatialcontrol_tpu.convert import hf
    from diffusionspatialcontrol_tpu.models import zoedepth as Z

    model = _tiny_hf_zoedepth()
    sd = hf.StateDict({k: v.numpy() for k, v in model.state_dict().items()})
    params = Z.convert_zoedepth(sd, Z.ZOE_TINY)

    x = np.random.RandomState(1).rand(2, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    want_depth = out.predicted_depth.numpy()
    want_logits = out.domain_logits.numpy()

    got_depth, got_logits = Z.zoedepth_apply(params, Z.ZOE_TINY,
                                             jnp.asarray(x))
    got_depth = np.asarray(got_depth)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits,
                               atol=1e-4)
    assert got_depth.shape == want_depth.shape
    np.testing.assert_allclose(got_depth, want_depth, atol=1e-4, rtol=1e-3)


def test_zoedepth_detector_end_to_end_random_weights():
    from diffusionspatialcontrol_tpu.models import zoedepth as Z

    params = Z.zoedepth_init(jax.random.PRNGKey(0), Z.ZOE_TINY)
    img = (np.random.RandomState(2).rand(50, 70, 3) * 255).astype(np.uint8)
    out = Z.detect_zoedepth(params, img, Z.ZOE_TINY, target=(64, 96))
    assert out.shape == (50, 70, 3)
    assert np.all((out >= 0) & (out <= 1))


# ---------------------------------------------------------------------------
# NormalBae (NNET)
# ---------------------------------------------------------------------------


def test_normalbae_matches_torch_replica():
    """NNET (tiny config, full structure) vs a torch replica with the exact
    scannet.pt module layout (timm tf_efficientnet naming under
    encoder.original_model + decoder.*), including TF-SAME padding, folded
    BatchNorm stats, SE blocks, align_corners fusion upsampling, and the
    UPSTREAM ragged refinement (grid_sample at sampled points + scatter) —
    proving the dense-MLP + top-k-mask redesign is pointwise equivalent."""
    import math

    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from diffusionspatialcontrol_tpu.convert import hf
    from diffusionspatialcontrol_tpu.models import normalbae as NB

    cfg = NB.NNET_TINY

    class Conv2dSame(nn.Conv2d):
        def forward(self, x):
            ih, iw = x.shape[-2:]
            kh, kw = self.weight.shape[-2:]
            sh, sw = self.stride
            ph = max((math.ceil(ih / sh) - 1) * sh + kh - ih, 0)
            pw = max((math.ceil(iw / sw) - 1) * sw + kw - iw, 0)
            x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
            return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                            self.dilation, self.groups)

    class SE(nn.Module):
        def __init__(self, chs, rd):
            super().__init__()
            self.conv_reduce = nn.Conv2d(chs, rd, 1)
            self.conv_expand = nn.Conv2d(rd, chs, 1)

        def forward(self, x):
            s = x.mean((2, 3), keepdim=True)
            s = F.silu(self.conv_reduce(s))
            return x * torch.sigmoid(self.conv_expand(s))

    class DsConv(nn.Module):  # timm DepthwiseSeparableConv (stage 0)
        def __init__(self, in_c, out_c, k, stride):
            super().__init__()
            self.conv_dw = Conv2dSame(in_c, in_c, k, stride, groups=in_c,
                                      bias=False)
            self.bn1 = nn.BatchNorm2d(in_c, eps=1e-3)
            self.se = SE(in_c, max(1, int(in_c * 0.25)))
            self.conv_pw = Conv2dSame(in_c, out_c, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(out_c, eps=1e-3)
            self.skip = stride == 1 and in_c == out_c

        def forward(self, x):
            h = F.silu(self.bn1(self.conv_dw(x)))
            h = self.se(h)
            h = self.bn2(self.conv_pw(h))
            return h + x if self.skip else h

    class IR(nn.Module):  # timm InvertedResidual
        def __init__(self, in_c, out_c, e, k, stride):
            super().__init__()
            mid = in_c * e
            self.conv_pw = Conv2dSame(in_c, mid, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(mid, eps=1e-3)
            self.conv_dw = Conv2dSame(mid, mid, k, stride, groups=mid,
                                      bias=False)
            self.bn2 = nn.BatchNorm2d(mid, eps=1e-3)
            self.se = SE(mid, max(1, int(in_c * 0.25)))
            self.conv_pwl = Conv2dSame(mid, out_c, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(out_c, eps=1e-3)
            self.skip = stride == 1 and in_c == out_c

        def forward(self, x):
            h = F.silu(self.bn1(self.conv_pw(x)))
            h = F.silu(self.bn2(self.conv_dw(h)))
            h = self.se(h)
            h = self.bn3(self.conv_pwl(h))
            return h + x if self.skip else h

    class EffNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_stem = Conv2dSame(3, cfg.stem_channels, 3, 2,
                                        bias=False)
            self.bn1 = nn.BatchNorm2d(cfg.stem_channels, eps=1e-3)
            stages = []
            in_c = cfg.stem_channels
            for e, k, s, out_c, r in cfg.stages:
                blocks = []
                for i in range(r):
                    st = s if i == 0 else 1
                    blocks.append(
                        DsConv(in_c, out_c, k, st) if e == 1
                        else IR(in_c, out_c, e, k, st))
                    in_c = out_c
                stages.append(nn.Sequential(*blocks))
            self.blocks = nn.Sequential(*stages)
            self.conv_head = Conv2dSame(in_c, cfg.head_channels, 1,
                                        bias=False)

        def forward(self, x):
            x = F.silu(self.bn1(self.conv_stem(x)))
            taps = []
            for i, stage in enumerate(self.blocks):
                x = stage(x)
                taps.append(x)
            return [taps[i] for i in cfg.tap_stages] + [self.conv_head(x)]

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.original_model = EffNet()

        def forward(self, x):
            return self.original_model(x)

    class UpSampleBN(nn.Module):
        def __init__(self, skip_input, out_f):
            super().__init__()
            self._net = nn.Sequential(
                nn.Conv2d(skip_input, out_f, 3, 1, 1),
                nn.BatchNorm2d(out_f), nn.LeakyReLU(),
                nn.Conv2d(out_f, out_f, 3, 1, 1),
                nn.BatchNorm2d(out_f), nn.LeakyReLU())

        def forward(self, x, skip):
            up = F.interpolate(x, size=skip.shape[2:], mode="bilinear",
                               align_corners=True)
            return self._net(torch.cat([up, skip], dim=1))

    def norm_normalize_t(x):  # channels on dim 1
        n, kappa = x[:, :3], x[:, 3:]
        mag = torch.sqrt((n ** 2).sum(1, keepdim=True)) + 1e-10
        return torch.cat([n / mag, F.elu(kappa) + 1.0 + 0.01], dim=1)

    class Decoder(nn.Module):
        def __init__(self):
            super().__init__()
            taps = [cfg.stages[i][3] for i in cfg.tap_stages]
            f1, f2, f3, f4 = cfg.decoder_features
            h = cfg.mlp_hidden
            self.conv2 = nn.Conv2d(cfg.head_channels, cfg.head_channels, 1)
            self.up1 = UpSampleBN(cfg.head_channels + taps[3], f1)
            self.up2 = UpSampleBN(f1 + taps[2], f2)
            self.up3 = UpSampleBN(f2 + taps[1], f3)
            self.up4 = UpSampleBN(f3 + taps[0], f4)
            self.out_conv_res8 = nn.Conv2d(f2, 4, 3, 1, 1)

            def mlp(width):
                return nn.Sequential(
                    nn.Conv1d(width + 4, h, 1), nn.ReLU(),
                    nn.Conv1d(h, h, 1), nn.ReLU(),
                    nn.Conv1d(h, h, 1), nn.ReLU(),
                    nn.Conv1d(h, 4, 1))

            self.out_conv_res4 = mlp(f2)
            self.out_conv_res2 = mlp(f3)
            self.out_conv_res1 = mlp(f4)

        def refine(self, mlp, feat_src, out_prev, ratio, beta):
            """Upstream test-mode branch: top-int(beta*N)-uncertainty
            points, grid_sample of the SOURCE maps at target-grid coords,
            pointwise MLP, scatter into the upsampled prediction."""
            init = F.interpolate(out_prev, scale_factor=2, mode="bilinear",
                                 align_corners=True)
            B, _, H, W = init.shape
            n = int(ratio * H * W)
            n_imp = int(beta * n)
            unc = (-init[:, 3]).reshape(B, -1)
            idx = torch.sort(unc, dim=1, descending=True)[1][:, :n_imp]
            rows, cols = idx // W, idx % W
            rf = rows.float() / (H - 1) * 2 - 1
            cf = cols.float() / (W - 1) * 2 - 1
            coords = torch.stack([cf, rf], dim=-1).unsqueeze(1)
            feat = F.grid_sample(feat_src, coords, mode="bilinear",
                                 align_corners=True)
            ip = F.grid_sample(out_prev, coords, mode="bilinear",
                               align_corners=True)
            inp = torch.cat([feat, ip], dim=1)[:, :, 0, :]
            pred = norm_normalize_t(mlp(inp))
            out = init.clone()
            for i in range(B):
                out[i, :, rows[i], cols[i]] = pred[i]
            return out

        def forward(self, feats, ratio, beta):
            t2, t4, t8, t16, head = feats
            x_d0 = self.conv2(head)
            x_d1 = self.up1(x_d0, t16)
            x_d2 = self.up2(x_d1, t8)
            x_d3 = self.up3(x_d2, t4)
            x_d4 = self.up4(x_d3, t2)
            out8 = norm_normalize_t(self.out_conv_res8(x_d2))
            out4 = self.refine(self.out_conv_res4, x_d2, out8, ratio, beta)
            out2 = self.refine(self.out_conv_res2, x_d3, out4, ratio, beta)
            out1 = self.refine(self.out_conv_res1, x_d4, out2, ratio, beta)
            return out1

    class NNET(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Encoder()
            self.decoder = Decoder()

        def forward(self, x, ratio, beta):
            return self.decoder(self.encoder(x), ratio, beta)

    torch.manual_seed(0)
    model = NNET().eval()
    gen = np.random.RandomState(7)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            n = m.running_mean.shape[0]
            m.running_mean.data = torch.from_numpy(
                gen.randn(n).astype(np.float32) * 0.2)
            m.running_var.data = torch.from_numpy(
                gen.rand(n).astype(np.float32) + 0.5)

    sd = hf.StateDict({k: v.numpy() for k, v in model.state_dict().items()})
    params = NB.convert_nnet(sd, cfg)

    x = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    # (a) every pixel refined (ratio=1, beta=1): fully deterministic, the
    # strongest numeric check of the whole conv/MLP stack
    import dataclasses as _dc

    cfg_full = _dc.replace(cfg, sampling_ratio=1.0, importance_ratio=1.0)
    with torch.no_grad():
        want = model(xt, 1.0, 1.0).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(NB.nnet_apply(params, cfg_full, jnp.asarray(x)))
    assert got.shape == want.shape == (2, 64, 64, 4)
    np.testing.assert_allclose(got, want, atol=2e-4)

    # (b) partial top-k selection (beta=1 -> no random coverage): the
    # dense + mask redesign must equal upstream's sort + scatter
    cfg_topk = _dc.replace(cfg, sampling_ratio=0.4, importance_ratio=1.0)
    with torch.no_grad():
        want = model(xt, 0.4, 1.0).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(NB.nnet_apply(params, cfg_topk, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_normalbae_detector_and_manager():
    from diffusionspatialcontrol_tpu.app.api import ModelManager
    from diffusionspatialcontrol_tpu.models import normalbae as NB

    params = NB.nnet_init(jax.random.PRNGKey(0), NB.NNET_TINY)
    img = (np.random.RandomState(2).rand(50, 70, 3) * 255).astype(np.uint8)
    out = NB.detect_normalbae(params, img, NB.NNET_TINY, detect_res=64)
    assert out.shape == (50, 70, 3)
    assert np.all((out >= 0) & (out <= 1))

    # manager routing: an NNET config registered for "Normal Map" builds
    # the NNET path; default stays the depth-gradient fallback
    mgr = ModelManager()
    mgr.register_preprocessor("Normal Map", cfg=NB.NNET_TINY,
                              detect_resolution=64)
    fn = mgr.get_preprocessor("Normal Map")
    out = fn(img)
    assert out.shape == (50, 70, 3)
    assert np.all((out >= 0) & (out <= 1))


# ---------------------------------------------------------------------------
# PidiNet soft edge (the reference's default Soft Edge/Scribble/Sketch
# detector, app.py:749-753)
# ---------------------------------------------------------------------------


def _pidinet_random_sd(rng):
    """Random table5_pidinet torch-layout state dict."""
    from diffusionspatialcontrol_tpu.models import pidinet as P

    def w(*shape, scale=0.3):
        return (rng.randn(*shape) * scale).astype(np.float32)

    sd = {"init_block.weight": w(P.INPLANE, 3, 3, 3)}
    for name, li, in_c, out_c, strided in P._BLOCKS[1:]:
        sd[f"{name}.conv1.weight"] = w(in_c, 1, 3, 3)
        sd[f"{name}.conv2.weight"] = w(out_c, in_c, 1, 1)
        if strided:
            sd[f"{name}.shortcut.weight"] = w(out_c, in_c, 1, 1)
            sd[f"{name}.shortcut.bias"] = w(out_c)
    for i, ch in enumerate(P.FUSE_PLANES):
        sd[f"dilations.{i}.conv1.weight"] = w(P.DIL, ch, 1, 1)
        sd[f"dilations.{i}.conv1.bias"] = w(P.DIL)
        for j in (1, 2, 3, 4):
            sd[f"dilations.{i}.conv2_{j}.weight"] = w(P.DIL, P.DIL, 3, 3,
                                                      scale=0.1)
        sd[f"attentions.{i}.conv1.weight"] = w(4, P.DIL, 1, 1)
        sd[f"attentions.{i}.conv1.bias"] = w(4)
        sd[f"attentions.{i}.conv2.weight"] = w(1, 4, 3, 3)
        sd[f"conv_reduces.{i}.conv.weight"] = w(1, P.DIL, 1, 1)
        sd[f"conv_reduces.{i}.conv.bias"] = w(1)
    sd["classifier.weight"] = w(1, 4, 1, 1)
    sd["classifier.bias"] = w(1)
    return sd


def _torch_pidinet_forward(sd, x_nchw):
    """Reference-faithful torch forward of PiDiNet table5 (carv4, CDCM +
    CSAM heads) using the ORIGINAL pixel-difference conv formulations
    (two-conv 'cd', permuted 'ad', scattered 5x5 'rd') — validates both
    the port and the converter's folded-kernel equivalence."""
    import torch
    import torch.nn.functional as F

    from diffusionspatialcontrol_tpu.models import pidinet as P

    t = {k: torch.from_numpy(v) for k, v in sd.items()}

    def pdc_conv(x, w, pdc, groups=1):
        if pdc == "cv":
            return F.conv2d(x, w, None, padding=1, groups=groups)
        if pdc == "cd":
            yc = F.conv2d(x, w.sum(dim=[2, 3], keepdim=True), None,
                          padding=0, groups=groups)
            return F.conv2d(x, w, None, padding=1, groups=groups) - yc
        o, i = w.shape[:2]
        wf = w.reshape(o, i, -1)
        if pdc == "ad":
            w2 = (wf - wf[:, :, [3, 0, 1, 6, 4, 2, 7, 8, 5]]).reshape(
                o, i, 3, 3)
            return F.conv2d(x, w2, None, padding=1, groups=groups)
        buf = torch.zeros(o, i, 25)
        buf[:, :, [0, 2, 4, 10, 14, 20, 22, 24]] = wf[:, :, 1:]
        buf[:, :, [6, 7, 8, 11, 13, 16, 17, 18]] = -wf[:, :, 1:]
        return F.conv2d(x, buf.reshape(o, i, 5, 5), None, padding=2,
                        groups=groups)

    x = pdc_conv(x_nchw, t["init_block.weight"], P.PDC_TYPES[0])
    stages = []
    for name, li, in_c, out_c, strided in P._BLOCKS[1:]:
        inp = F.max_pool2d(x, 2, 2) if strided else x
        y = pdc_conv(inp, t[f"{name}.conv1.weight"], P.PDC_TYPES[li],
                     groups=in_c)
        y = F.conv2d(F.relu(y), t[f"{name}.conv2.weight"], None)
        if strided:
            inp = F.conv2d(inp, t[f"{name}.shortcut.weight"],
                           t[f"{name}.shortcut.bias"])
        x = inp + y
        if name in ("block1_3", "block2_4", "block3_4", "block4_4"):
            stages.append(x)
    H, W = x_nchw.shape[2], x_nchw.shape[3]
    maps = []
    for i, s in enumerate(stages):
        h = F.conv2d(F.relu(s), t[f"dilations.{i}.conv1.weight"],
                     t[f"dilations.{i}.conv1.bias"])
        h = sum(
            F.conv2d(h, t[f"dilations.{i}.conv2_{j + 1}.weight"], None,
                     padding=P.CDCM_DILATIONS[j],
                     dilation=P.CDCM_DILATIONS[j])
            for j in range(4)
        )
        g = F.conv2d(F.relu(h), t[f"attentions.{i}.conv1.weight"],
                     t[f"attentions.{i}.conv1.bias"])
        g = F.conv2d(g, t[f"attentions.{i}.conv2.weight"], None, padding=1)
        h = h * torch.sigmoid(g)
        e = F.conv2d(h, t[f"conv_reduces.{i}.conv.weight"],
                     t[f"conv_reduces.{i}.conv.bias"])
        maps.append(F.interpolate(e, (H, W), mode="bilinear",
                                  align_corners=False))
    fused = F.conv2d(torch.cat(maps, 1), t["classifier.weight"],
                     t["classifier.bias"])
    return torch.sigmoid(fused)


def test_pidinet_matches_torch_replica():
    import torch

    from diffusionspatialcontrol_tpu.models import pidinet as P

    rng = np.random.RandomState(0)
    sd = _pidinet_random_sd(rng)
    x = rng.rand(1, 3, 40, 48).astype(np.float32)
    with torch.no_grad():
        want = _torch_pidinet_forward(sd, torch.from_numpy(x)).numpy()
    params = P.convert_pidinet(sd)
    got = np.asarray(P.pidinet_apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))
    )).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_pidinet_fold_pdc_linearity():
    """Folded kernels reproduce the two-conv cd form exactly on a delta."""
    from diffusionspatialcontrol_tpu.models import pidinet as P

    rng = np.random.RandomState(1)
    w = rng.randn(2, 3, 3, 3).astype(np.float32)
    folded = P.fold_pdc(w, "cd")
    assert folded.shape == (2, 3, 3, 3)
    # the center tap absorbs -sum(w); all other taps unchanged
    np.testing.assert_allclose(folded[:, :, 1, 1],
                               w[:, :, 1, 1] - w.sum((2, 3)), rtol=1e-6)
    np.testing.assert_array_equal(folded[:, :, 0, :], w[:, :, 0, :])
    rd = P.fold_pdc(w, "rd")
    assert rd.shape == (2, 3, 5, 5)
    np.testing.assert_allclose(rd.sum((2, 3)), np.zeros((2, 3)),
                               atol=1e-5)


def test_pidinet_detector_and_manager():
    from diffusionspatialcontrol_tpu.app.api import ModelManager
    from diffusionspatialcontrol_tpu.models import pidinet as P

    params = P.pidinet_init(jax.random.PRNGKey(0))
    img = (np.random.RandomState(2).rand(50, 70, 3) * 255).astype(np.uint8)
    out = P.detect_soft_edge(params, img)
    assert out.shape == (50, 70, 3)
    assert np.all((out >= 0) & (out <= 1))
    scrib = P.detect_soft_edge(params, img, scribble=True)
    assert set(np.unique(scrib)).issubset({0.0, 1.0})
    safe = P.detect_soft_edge(params, img, safe=True)
    assert set(np.round(np.unique(safe * 2), 6)).issubset({0.0, 1.0, 2.0})

    m = ModelManager(dtype=jnp.float32)
    # "Soft Edge" now routes to PidiNet (reference default), the HED
    # variant stays available under the explicit name
    soft = m.get_preprocessor("Soft Edge")(img)
    assert soft.shape == (50, 70, 3)
    hed = m.get_preprocessor("Soft Edge (HED)")(img)
    assert hed.shape == (50, 70, 3)
    scrib2 = m.get_preprocessor("Scribble (PidiNet)")(img)
    assert set(np.unique(scrib2)).issubset({0.0, 1.0})


# ---------------------------------------------------------------------------
# Openpose hand / face sub-detectors (the reference's has_hand/has_face
# checkboxes, app.py:860-861 -> controlnet_aux include_hand/include_face)
# ---------------------------------------------------------------------------


def _cpm_random_sd(rng, keys_and_shapes):
    """Fan-in-scaled random weights: ~90 stacked convs must keep O(1)
    activations or fp32 rounding drift swamps the comparison."""
    out = {}
    for name, shape in keys_and_shapes:
        fan = int(np.prod(shape[1:])) if len(shape) > 1 else 1
        out[name] = (rng.randn(*shape) * (1.2 / np.sqrt(fan))).astype(
            np.float32)
    return out


def _hand_sd(rng):
    from diffusionspatialcontrol_tpu.models import openpose as op

    items = []
    for block, spec in op._hand_block_specs().items():
        for layer in spec:
            if len(layer) == 1:
                continue
            name, in_c, out_c, k = layer
            items.append((f"{block}.{name}.weight", (out_c, in_c, k, k)))
            items.append((f"{block}.{name}.bias", (out_c,)))
    return _cpm_random_sd(rng, items)


def _torch_hand_forward(sd, x):
    """Independent torch forward of the pytorch-openpose handpose_model
    (backbone model1_0, stage-1 model1_1, refinement model2..model6 on
    cat([heatmap, features]); ReLU everywhere except each stage's final
    1x1)."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(v) for k, v in sd.items()}

    def c(prefix, name, h, relu=True):
        w = t[f"{prefix}.{name}.weight"]
        h = F.conv2d(h, w, t[f"{prefix}.{name}.bias"],
                     padding=(w.shape[-1] - 1) // 2)
        return F.relu(h) if relu else h

    h = x
    for name in ("conv1_1", "conv1_2"):
        h = c("model1_0", name, h)
    h = F.max_pool2d(h, 2, 2)
    for name in ("conv2_1", "conv2_2"):
        h = c("model1_0", name, h)
    h = F.max_pool2d(h, 2, 2)
    for name in ("conv3_1", "conv3_2", "conv3_3", "conv3_4"):
        h = c("model1_0", name, h)
    h = F.max_pool2d(h, 2, 2)
    for name in ("conv4_1", "conv4_2", "conv4_3", "conv4_4",
                 "conv5_1", "conv5_2", "conv5_3_CPM"):
        h = c("model1_0", name, h)
    feat = h
    h = c("model1_1", "conv6_1_CPM", feat)
    h = c("model1_1", "conv6_2_CPM", h, relu=False)
    for s in range(2, 7):
        h = torch.cat([h, feat], dim=1)
        for i in range(1, 7):
            h = c(f"model{s}", f"Mconv{i}_stage{s}", h)
        h = c(f"model{s}", f"Mconv7_stage{s}", h, relu=False)
    return h


def test_openpose_hand_matches_torch_replica():
    import torch

    from diffusionspatialcontrol_tpu.convert import hf
    from diffusionspatialcontrol_tpu.models import openpose as op

    rng = np.random.RandomState(0)
    sd = _hand_sd(rng)
    x = rng.rand(1, 3, 48, 40).astype(np.float32) - 0.5
    with torch.no_grad():
        want = _torch_hand_forward(sd, torch.from_numpy(x)).numpy()
    params = op.convert_openpose_hand(hf.StateDict(sd))
    got = np.asarray(op.openpose_hand_apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))
    )).transpose(0, 3, 1, 2)
    assert got.shape == want.shape == (1, 22, 6, 5)
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def _face_sd(rng):
    from diffusionspatialcontrol_tpu.models import openpose as op

    items = []
    for layer in op._face_specs():
        if len(layer) == 1:
            continue
        name, in_c, out_c, k = layer
        items.append((f"{name}.weight", (out_c, in_c, k, k)))
        items.append((f"{name}.bias", (out_c,)))
    return _cpm_random_sd(rng, items)


def _torch_face_forward(sd, x):
    """Independent torch forward of controlnet_aux's FaceNet (same CPM
    topology as the hand net, 71 maps, flat attribute names)."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(v) for k, v in sd.items()}

    def c(name, h, relu=True):
        w = t[f"{name}.weight"]
        h = F.conv2d(h, w, t[f"{name}.bias"],
                     padding=(w.shape[-1] - 1) // 2)
        return F.relu(h) if relu else h

    h = x
    for name in ("conv1_1", "conv1_2"):
        h = c(name, h)
    h = F.max_pool2d(h, 2, 2)
    for name in ("conv2_1", "conv2_2"):
        h = c(name, h)
    h = F.max_pool2d(h, 2, 2)
    for name in ("conv3_1", "conv3_2", "conv3_3", "conv3_4"):
        h = c(name, h)
    h = F.max_pool2d(h, 2, 2)
    for name in ("conv4_1", "conv4_2", "conv4_3", "conv4_4",
                 "conv5_1", "conv5_2", "conv5_3_CPM"):
        h = c(name, h)
    feat = h
    h = c("conv6_1_CPM", feat)
    h = c("conv6_2_CPM", h, relu=False)
    for s in range(2, 7):
        h = torch.cat([h, feat], dim=1)
        for i in range(1, 7):
            h = c(f"Mconv{i}_stage{s}", h)
        h = c(f"Mconv7_stage{s}", h, relu=False)
    return h


def test_openpose_face_matches_torch_replica():
    import torch

    from diffusionspatialcontrol_tpu.convert import hf
    from diffusionspatialcontrol_tpu.models import openpose as op

    rng = np.random.RandomState(1)
    sd = _face_sd(rng)
    x = rng.rand(1, 3, 40, 48).astype(np.float32) - 0.5
    with torch.no_grad():
        want = _torch_face_forward(sd, torch.from_numpy(x)).numpy()
    params = op.convert_openpose_face(hf.StateDict(sd))
    got = np.asarray(op.openpose_face_apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))
    )).transpose(0, 3, 1, 2)
    assert got.shape == want.shape == (1, 71, 5, 6)
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_hand_face_boxes_from_body():
    """handDetect geometry: box center 0.33 past the wrist along
    elbow->wrist, side 1.5x the forearm; face box from nose/eye/ear
    spans."""
    from diffusionspatialcontrol_tpu.models import openpose as op

    # one person: nose 0, neck 1, right arm (2, 3, 4), right eye 14
    candidate = np.array([
        [50.0, 20.0, 1.0, 0],   # 0 nose
        [50.0, 40.0, 1.0, 1],   # 1 neck
        [30.0, 40.0, 1.0, 2],   # 2 r shoulder
        [30.0, 70.0, 1.0, 3],   # 3 r elbow
        [30.0, 100.0, 1.0, 4],  # 4 r wrist
        [45.0, 15.0, 1.0, 5],   # 14 r eye (row 5)
    ])
    person = -np.ones(20)
    person[0], person[1], person[2], person[3], person[4] = 0, 1, 2, 3, 4
    person[14] = 5
    subset = np.array([person])

    boxes = op.hand_boxes_from_body(candidate, subset, 200, 200)
    assert len(boxes) == 1
    x, y, size, is_left = boxes[0]
    assert not is_left
    # forearm length 30 -> width 45; center (30, 100 + 0.33*30 = 109.9)
    assert size == 45
    assert abs((x + size / 2) - 30) <= 1.5
    assert abs((y + size / 2) - 109.9) <= 1.5

    faces = op.face_box_from_body(candidate, subset, 200, 200)
    assert len(faces) == 1
    fx, fy, fsize = faces[0]
    # nose-eye max-axis distance 5 -> half 15 -> size 30 around the nose
    assert fsize == 30
    assert abs((fx + fsize / 2) - 50) <= 1.5
    assert abs((fy + fsize / 2) - 20) <= 1.5

    # arms/head below the 20 px floor are dropped
    tiny = candidate.copy()
    tiny[:, :2] *= 0.05
    assert op.hand_boxes_from_body(tiny, subset, 200, 200) == []
    assert op.face_box_from_body(tiny, subset, 200, 200) == []


def test_openpose_hand_face_end_to_end(monkeypatch):
    """detect_pose(include_hand/include_face) with a synthetic body pose:
    crops run through the (random-init) sub-nets and keypoints land on
    the canvas inside the crop regions."""
    from diffusionspatialcontrol_tpu.models import openpose as op

    # tiny crop protocol so the CPU forward stays cheap
    monkeypatch.setattr(op, "HAND_BOXSIZE", 32)
    monkeypatch.setattr(op, "HAND_SCALES", (1.0,))
    monkeypatch.setattr(op, "FACE_BOXSIZE", 32)

    hand_params = op.openpose_hand_init(jax.random.PRNGKey(1))
    img = (np.random.RandomState(2).rand(120, 120, 3) * 255).astype(
        np.uint8)

    # bypass the body pass: paint peaks via a stub that returns our pose
    candidate = np.array([
        [60.0, 20.0, 1.0, 0],
        [60.0, 40.0, 1.0, 1],
        [40.0, 40.0, 1.0, 2],
        [40.0, 60.0, 1.0, 3],
        [40.0, 80.0, 1.0, 4],
    ])
    person = -np.ones(20)
    person[:5] = [0, 1, 2, 3, 4]
    subset = np.array([person])

    boxes = op.hand_boxes_from_body(candidate, subset, 120, 120)
    assert boxes, "synthetic pose must yield a hand box"
    x, y, size, is_left = boxes[0]
    crop = img[y:y + size, x:x + size].astype(np.float32) / 255.0
    heat = op._crop_heatmaps(op.openpose_hand_apply, hand_params, crop,
                             op.N_HAND, op.HAND_BOXSIZE, op.HAND_SCALES)
    assert heat.shape == (size, size, op.N_HAND)
    pk = op.peaks_from_heatmaps(heat[:, :, :21])
    assert pk.shape == (21, 3)
    vis = pk[:, 0] >= 0
    assert np.all(pk[vis, 0] < size) and np.all(pk[vis, 1] < size)

    canvas = np.zeros((120, 120, 3), np.float32)
    pk2 = pk.copy()
    pk2[vis, 0] += x
    pk2[vis, 1] += y
    op.draw_handpose(canvas, pk2)
    if vis.any():
        assert canvas.sum() > 0

    face_params = op.openpose_face_init(jax.random.PRNGKey(2))
    canvas2 = np.zeros((120, 120, 3), np.float32)
    fpk = op.peaks_from_heatmaps(
        op._crop_heatmaps(op.openpose_face_apply, face_params, crop,
                          op.N_FACE, op.FACE_BOXSIZE, op.FACE_SCALES)
        [:, :, :70], sigma=0.0)
    op.draw_facepose(canvas2, fpk)
    assert canvas2.shape == (120, 120, 3)


def test_manager_openpose_include_options(monkeypatch):
    """The Openpose preprocessor closure accepts the reference's
    include_body/include_hand/include_face options via
    preprocessor_options; sub-nets build lazily."""
    from diffusionspatialcontrol_tpu.app.api import ModelManager
    from diffusionspatialcontrol_tpu.models import openpose as op

    monkeypatch.setattr(op, "HAND_BOXSIZE", 32)
    monkeypatch.setattr(op, "HAND_SCALES", (1.0,))
    monkeypatch.setattr(op, "FACE_BOXSIZE", 32)

    m = ModelManager(dtype=jnp.float32)
    m.register_preprocessor("Openpose", detect_resolution=64)
    fn = m.get_preprocessor("Openpose")
    img = (np.random.RandomState(3).rand(80, 64, 3) * 255).astype(np.uint8)
    out = fn(img)  # body only, no sub-nets built
    assert out.shape == (80, 64, 3)
    out2 = fn(img, include_body=False, include_hand=True,
              include_face=True)
    assert out2.shape == (80, 64, 3)
    assert np.all((out2 >= 0) & (out2 <= 1))


# ---------------------------------------------------------------------------
# round-4 review fixes: scribble NMS parity, 0..255-float inputs, local
# rasterization windows, preprocessor cache invalidation, layout sniffing
# ---------------------------------------------------------------------------


def test_nms_thin_binarizes_like_reference():
    """controlnet_aux nms(x, 127, 3) hard-binarizes at 127/255 BEFORE the
    final blur: weak ridges must vanish entirely; strong wide ridges
    survive as full-strength lines."""
    from diffusionspatialcontrol_tpu.models.pidinet import _nms_thin

    strong = np.zeros((40, 60), np.float32)
    strong[:, 26:34] = 1.0  # 8-px ridge keeps ~0.9 peak after sigma-3 blur
    out = _nms_thin(strong)
    assert set(np.unique(out)).issubset({0.0, 1.0})
    assert out[20, 28:32].max() == 1.0

    weak = np.zeros((40, 60), np.float32)
    weak[:, 26:34] = 0.35  # above the final 4/255 threshold, but the
    # blurred ridge peaks below 127/255 -> the binarize zeroes it all
    assert _nms_thin(weak).sum() == 0.0


def test_gauss_blur_kernel_width():
    """The blur matches cv2.GaussianBlur(x, (0,0), 3) on floats: radius
    4*sigma (not a 1-sigma truncation), unit DC gain."""
    from diffusionspatialcontrol_tpu.models.pidinet import _gauss_blur

    ones = np.ones((30, 30), np.float32)
    np.testing.assert_allclose(_gauss_blur(ones, 3.0), ones, atol=1e-5)
    imp = np.zeros((31, 31), np.float32)
    imp[15, 15] = 1.0
    out = _gauss_blur(imp, 3.0)
    # a sigma-3 Gaussian has visible mass 10 px out (4-sigma support);
    # the old 1-sigma kernel was exactly zero past 3 px
    assert out[15, 25] > 0.0
    np.testing.assert_allclose(out.sum(), 1.0, atol=1e-5)


def test_openpose_accepts_0_255_floats():
    """base64 HTTP uploads decode to float32 0..255; detect_pose must
    treat them like uint8 (a dtype-only check fed the net ~253s)."""
    from diffusionspatialcontrol_tpu.models import openpose as op

    params = op.openpose_body_init(jax.random.PRNGKey(0), jnp.float32)
    img8 = (np.random.RandomState(5).rand(64, 48, 3) * 255).astype(np.uint8)
    a = op.detect_pose(params, img8, detect_resolution=48)
    b = op.detect_pose(params, img8.astype(np.float32),
                       detect_resolution=48)
    np.testing.assert_array_equal(a, b)


def test_draw_windows_match_full_canvas():
    """The local-window rasterizers (bounded cost per primitive) produce
    bit-identical masks to the previous full-canvas distance fields."""
    from diffusionspatialcontrol_tpu.models import openpose as op

    h, w = 30, 40
    yy, xx = np.mgrid[0:h, 0:w]

    # disks, including one clipped at the canvas edge and one off-canvas
    canvas = np.zeros((h, w, 3), np.float32)
    pts = np.array([[5.2, 7.8, 1.0], [39.0, 29.0, 1.0], [-1.0, -1.0, 0.0]])
    op.draw_facepose(canvas, pts)
    ref = np.zeros((h, w, 3), np.float32)
    for x, y, s in pts:
        if x < 0:
            continue
        ref[(xx - x) ** 2 + (yy - y) ** 2 <= 9] = 1.0
    np.testing.assert_array_equal(canvas, ref)

    # a thick segment (capsule), partially clipped
    a = np.array([3.0, 4.0])
    b = np.array([37.5, 28.0])
    win = op._segment_window(h, w, a, b, 2.0)
    assert win is not None
    y0, y1, x0, x1, m = win
    ab = b - a
    t = np.clip(((xx - a[0]) * ab[0] + (yy - a[1]) * ab[1])
                / float((ab ** 2).sum()), 0.0, 1.0)
    d2 = (xx - (a[0] + t * ab[0])) ** 2 + (yy - (a[1] + t * ab[1])) ** 2
    full = d2 <= 4.0
    np.testing.assert_array_equal(full[y0:y1, x0:x1], m)
    outside = full.copy()
    outside[y0:y1, x0:x1] = False
    assert not outside.any()


def test_register_subnet_invalidates_parent_closure():
    """register_preprocessor('Openpose (hand)') after the parent closure
    was cached must invalidate it — otherwise an already-built random-init
    sub-net silently shadows the newly registered weights."""
    from diffusionspatialcontrol_tpu.app.api import ModelManager

    m = ModelManager(dtype=jnp.float32)
    m.register_preprocessor("Openpose", detect_resolution=64)
    fn1 = m.get_preprocessor("Openpose")
    assert m.get_preprocessor("Openpose") is fn1  # cached
    m.register_preprocessor("Openpose (hand)")
    fn2 = m.get_preprocessor("Openpose")
    assert fn2 is not fn1


def test_hed_layout_under_soft_edge_routes_to_hed(tmp_path):
    """HED-layout weights registered under 'Soft Edge' (the only valid
    layout before PidiNet became the default detector) are sniffed by key
    names and routed to the HED detector instead of raising KeyError."""
    from safetensors.numpy import save_file

    from diffusionspatialcontrol_tpu.app.api import ModelManager
    from diffusionspatialcontrol_tpu.models import hed as H

    params = H.hed_init(jax.random.PRNGKey(0))
    sd = {"norm": np.asarray(params["norm"],
                             np.float32).reshape(1, 3, 1, 1)}
    for b in range(1, 6):
        bp = params[f"block{b}"]
        for i, conv in enumerate(bp["convs"]):
            sd[f"block{b}.convs.{i}.weight"] = np.ascontiguousarray(
                np.asarray(conv["kernel"], np.float32).transpose(3, 2, 0, 1)
            )
            sd[f"block{b}.convs.{i}.bias"] = np.asarray(conv["bias"],
                                                        np.float32)
        sd[f"block{b}.projection.weight"] = np.ascontiguousarray(
            np.asarray(bp["projection"]["kernel"],
                       np.float32).transpose(3, 2, 0, 1)
        )
        sd[f"block{b}.projection.bias"] = np.asarray(
            bp["projection"]["bias"], np.float32)
    path = str(tmp_path / "ControlNetHED.safetensors")
    save_file(sd, path)

    m = ModelManager(dtype=jnp.float32)
    m.register_preprocessor("Soft Edge", path=path)
    fn = m.get_preprocessor("Soft Edge")
    img = (np.random.RandomState(0).rand(48, 48, 3) * 255).astype(np.uint8)
    out = fn(img)
    ref = H.detect_edges(params, img)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_peaks_largest_connected_region_rule():
    """Multi-blob heatmaps: peaks_from_heatmaps must follow controlnet_aux's
    hand rule (open_pose/hand.py:26-44) — the 8-connected component with the
    largest ORIGINAL-map sum wins, not the globally highest blurred pixel.
    Verified against a literal replica of the dependency's algorithm."""
    from scipy import ndimage
    from scipy.ndimage import gaussian_filter

    from diffusionspatialcontrol_tpu.models import openpose as op

    def reference_rule(map_ori, thre=0.05, sigma=3.0):
        one = gaussian_filter(map_ori, sigma=sigma)
        binary = one > thre
        if binary.sum() == 0:
            return None
        labels, k = ndimage.label(binary, structure=np.ones((3, 3)))
        sums = [map_ori[labels == i].sum() for i in range(1, k + 1)]
        best = int(np.argmax(sums)) + 1
        m = map_ori.copy()
        m[labels != best] = 0
        j = int(np.argmax(m))
        return divmod(j, m.shape[1])  # (y, x)

    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)

    def blob(cy, cx, amp, s):
        return amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))

    rng = np.random.RandomState(0)
    cases = []
    # tall narrow spike (global max) vs broad lower blob (larger sum):
    # the two rules disagree here — the regression this test pins.
    cases.append(blob(12, 12, 1.0, 3.0) + blob(44, 44, 0.55, 7.0))
    # single blob (rules agree) and random multi-blob fields
    cases.append(blob(30, 20, 0.8, 4.0))
    for _ in range(6):
        m = np.zeros((h, w))
        for _ in range(rng.randint(2, 5)):
            m += blob(rng.randint(5, 59), rng.randint(5, 59),
                      rng.uniform(0.2, 1.0), rng.uniform(1.0, 8.0))
        cases.append(m)

    heat = np.stack(cases, axis=-1).astype(np.float32)
    pk = op.peaks_from_heatmaps(heat, thre=0.05, sigma=3.0)
    for i, m in enumerate(cases):
        ref = reference_rule(m.astype(np.float32))
        assert ref is not None
        ry, rx = ref
        assert (pk[i, 0], pk[i, 1]) == (rx, ry), f"case {i}"
    # the engineered case 0 MUST differ from the old blurred-argmax rule
    old_j = np.argmax(gaussian_filter(cases[0].astype(np.float32), 3.0))
    oy, ox = divmod(int(old_j), w)
    assert (pk[0, 0], pk[0, 1]) != (ox, oy)
    # sub-threshold channel stays a sentinel
    low = np.full((h, w, 1), 1e-4, np.float32)
    pk_low = op.peaks_from_heatmaps(low, thre=0.05, sigma=3.0)
    assert tuple(pk_low[0]) == (-1.0, -1.0, 0.0)


class TestFaceDetect:
    """SCRFD-class detector: decode/NMS parity vs literal replicas of
    insightface scrfd.py, alignment math, and the host-side e2e path."""

    def test_decode_matches_insightface_replica(self):
        from diffusionspatialcontrol_tpu.models import face_detect as fd

        cfg = fd.FACEDETECT_TINY
        rng = np.random.RandomState(0)
        outs = []
        for stride in cfg.strides:
            g = cfg.input_size // stride
            a = cfg.num_anchors
            outs.append((
                jnp.asarray(rng.randn(1, g, g, a).astype(np.float32) * 2),
                jnp.asarray(rng.rand(1, g, g, a * 4).astype(np.float32) * 3),
                jnp.asarray(rng.randn(1, g, g, a * 10).astype(np.float32)),
            ))
        det_scale = 0.73
        dets, kpss = fd.decode_scrfd(outs, cfg, det_scale=det_scale,
                                     score_thresh=0.6)

        # literal replica of insightface SCRFD.forward + detect
        scores_list, bboxes_list, kpss_list = [], [], []
        for (cls, bbox, kps), stride in zip(outs, cfg.strides):
            scores = 1.0 / (1.0 + np.exp(-np.asarray(cls[0]))).reshape(-1)
            bbox_preds = np.asarray(bbox[0]).reshape(-1, 4) * stride
            kps_preds = np.asarray(kps[0]).reshape(-1, 10) * stride
            height = width = cfg.input_size // stride
            anchor_centers = np.stack(
                np.mgrid[:height, :width][::-1], axis=-1
            ).astype(np.float32).reshape(-1, 2) * stride
            anchor_centers = np.stack(
                [anchor_centers] * cfg.num_anchors, axis=1
            ).reshape(-1, 2)
            pos_inds = np.where(scores >= 0.6)[0]
            x1 = anchor_centers[:, 0] - bbox_preds[:, 0]
            y1 = anchor_centers[:, 1] - bbox_preds[:, 1]
            x2 = anchor_centers[:, 0] + bbox_preds[:, 2]
            y2 = anchor_centers[:, 1] + bbox_preds[:, 3]
            bboxes = np.stack([x1, y1, x2, y2], axis=-1)
            preds = []
            for i in range(0, 10, 2):
                preds.append(anchor_centers[:, 0] + kps_preds[:, i])
                preds.append(anchor_centers[:, 1] + kps_preds[:, i + 1])
            kk = np.stack(preds, axis=-1).reshape(-1, 5, 2)
            scores_list.append(scores[pos_inds])
            bboxes_list.append(bboxes[pos_inds])
            kpss_list.append(kk[pos_inds])
        scores = np.concatenate(scores_list)
        bboxes = np.concatenate(bboxes_list) / det_scale
        kk = np.concatenate(kpss_list) / det_scale
        order = scores.argsort()[::-1]
        pre = np.hstack([bboxes, scores[:, None]]).astype(
            np.float32)[order]
        kk = kk[order]

        # replica greedy NMS
        x1, y1, x2, y2, sc = pre.T
        areas = (x2 - x1 + 1) * (y2 - y1 + 1)
        idx = sc.argsort()[::-1]
        keep = []
        while idx.size > 0:
            i = idx[0]
            keep.append(i)
            xx1 = np.maximum(x1[i], x1[idx[1:]])
            yy1 = np.maximum(y1[i], y1[idx[1:]])
            xx2 = np.minimum(x2[i], x2[idx[1:]])
            yy2 = np.minimum(y2[i], y2[idx[1:]])
            w = np.maximum(0.0, xx2 - xx1 + 1)
            h = np.maximum(0.0, yy2 - yy1 + 1)
            ovr = w * h / (areas[i] + areas[idx[1:]] - w * h)
            idx = idx[1:][ovr <= cfg.nms_thresh]
        np.testing.assert_allclose(dets, pre[keep], rtol=1e-5)
        np.testing.assert_allclose(kpss, kk[keep], rtol=1e-5)
        assert (np.diff(dets[:, 4]) <= 1e-7).all()  # descending score

    def test_alignment_recovers_similarity(self):
        from diffusionspatialcontrol_tpu.models import face_detect as fd

        rng = np.random.RandomState(1)
        for _ in range(5):
            theta = rng.uniform(-1.0, 1.0)
            s = rng.uniform(0.5, 3.0)
            t = rng.uniform(-30, 30, size=2)
            rot = np.array([[np.cos(theta), -np.sin(theta)],
                            [np.sin(theta), np.cos(theta)]])
            lmk = fd.ARCFACE_DST @ (s * rot).T + t
            m = fd.estimate_norm(lmk.astype(np.float32))
            back = lmk @ m[:, :2].T + m[:, 2]
            np.testing.assert_allclose(back, fd.ARCFACE_DST, atol=1e-3)

    def test_warp_affine_translation_and_identity(self):
        from diffusionspatialcontrol_tpu.models import face_detect as fd

        img = np.arange(20 * 20 * 3, dtype=np.float32).reshape(20, 20, 3)
        ident = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        out = fd.warp_affine(img, ident, 20)
        np.testing.assert_allclose(out, img, atol=1e-4)
        # shift output by (+3, +2): out[y, x] = img[y - 2, x - 3]
        shift = np.array([[1.0, 0.0, 3.0], [0.0, 1.0, 2.0]])
        out = fd.warp_affine(img, shift, 20)
        np.testing.assert_allclose(out[5:, 5:], img[3:-2, 2:-3][:15, :15],
                                   atol=1e-4)

    def test_detect_and_align_e2e_tiny(self):
        from diffusionspatialcontrol_tpu.models import face_detect as fd

        cfg = fd.FACEDETECT_TINY
        params = fd.scrfd_init(jax.random.PRNGKey(0), cfg)
        img = (np.random.RandomState(2).rand(96, 80, 3) * 255).astype(
            np.uint8)
        dets, kpss = fd.detect_faces(params, img, cfg, top1_fallback=True)
        assert len(dets) >= 1 and dets.shape[1] == 5
        assert kpss.shape[1:] == (5, 2)
        align = fd.make_face_aligner(params, cfg, top1_fallback=True)
        crop = align(img)
        assert crop.shape == (112, 112, 3)
        np.testing.assert_array_equal(crop, align(img))  # deterministic
        # no-face policy: threshold nothing clears and no fallback -> None
        none_align = fd.make_face_aligner(params, cfg, top1_fallback=False)
        dets2, _ = fd.detect_faces(params, img, cfg, score_thresh=2.0)
        assert len(dets2) == 0

    def test_convert_scrfd_roundtrip(self):
        """A torch-layout state dict assembled from a tiny random init must
        convert into the same pytree structure (and a BN fold sanity
        check)."""
        from diffusionspatialcontrol_tpu.models import face_detect as fd

        cfg = fd.FACEDETECT_TINY
        rng = np.random.RandomState(3)
        state = {}

        def put_conv(prefix, cin, cout, k, bias=False):
            state[f"{prefix}.weight"] = rng.randn(
                cout, cin, k, k).astype(np.float32)
            if bias:
                state[f"{prefix}.bias"] = rng.randn(cout).astype(np.float32)

        def put_bn(prefix, c):
            state[f"{prefix}.weight"] = rng.rand(c).astype(np.float32) + 0.5
            state[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
            state[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32)
            state[f"{prefix}.running_var"] = rng.rand(c).astype(
                np.float32) + 0.1

        sc = cfg.stem_channels
        put_conv("backbone.stem.0.conv", 3, sc, 3)
        put_bn("backbone.stem.0.bn", sc)
        put_conv("backbone.stem.1.conv", sc, sc, 3)
        put_bn("backbone.stem.1.bn", sc)
        put_conv("backbone.stem.2.conv", sc, sc, 3)
        put_bn("backbone.stem.2.bn", sc)
        cin = sc
        for si, (nb, w) in enumerate(zip(cfg.stage_blocks,
                                         cfg.stage_widths)):
            for bi in range(nb):
                pre = f"backbone.layer{si + 1}.{bi}"
                put_conv(f"{pre}.conv1", cin, w, 3)
                put_bn(f"{pre}.bn1", w)
                put_conv(f"{pre}.conv2", w, w, 3)
                put_bn(f"{pre}.bn2", w)
                if bi == 0 and (si > 0 or cin != w):
                    put_conv(f"{pre}.downsample.0", cin, w, 1)
                    put_bn(f"{pre}.downsample.1", w)
                cin = w
        for i, w in enumerate(cfg.stage_widths[1:]):
            put_conv(f"neck.lateral_convs.{i}.conv", w, cfg.neck_channels,
                     1, bias=True)
        for i in range(3):
            put_conv(f"neck.fpn_convs.{i}.conv", cfg.neck_channels,
                     cfg.neck_channels, 3, bias=True)
        hin = cfg.neck_channels
        for i in range(cfg.head_convs):
            put_conv(f"bbox_head.cls_convs.{i}.conv", hin,
                     cfg.head_channels, 3, bias=True)
            hin = cfg.head_channels
        a = cfg.num_anchors
        put_conv("bbox_head.cls_pred", hin, a, 3, bias=True)
        put_conv("bbox_head.reg_pred", hin, a * 4, 3, bias=True)
        put_conv("bbox_head.kps_pred", hin, a * 10, 3, bias=True)

        params = fd.convert_scrfd(state, cfg)
        ref = fd.scrfd_init(jax.random.PRNGKey(0), cfg)
        assert jax.tree_util.tree_structure(
            params) == jax.tree_util.tree_structure(ref)
        # BN fold: scale = gamma/sqrt(var+eps), bias = beta - mean*scale
        g = state["backbone.stem.0.bn.weight"]
        var = state["backbone.stem.0.bn.running_var"]
        mu = state["backbone.stem.0.bn.running_mean"]
        beta = state["backbone.stem.0.bn.bias"]
        sc_ = g / np.sqrt(var + 1e-5)
        np.testing.assert_allclose(params["stem"][0]["bn"]["scale"], sc_,
                                   rtol=1e-5)
        np.testing.assert_allclose(params["stem"][0]["bn"]["bias"],
                                   beta - mu * sc_, rtol=1e-4)
        # the converted net runs
        out = fd.detect_faces(params, np.zeros((64, 64, 3), np.uint8), cfg,
                              top1_fallback=True)
        assert len(out[0]) >= 1

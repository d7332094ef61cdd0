"""App layer, light units: registry, region UI, profiling, loaders."""
import json
import threading
import urllib.error
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from diffusionspatialcontrol_tpu import registry
from diffusionspatialcontrol_tpu.app.api import (
    ControlNetUnit,
    ModelManager,
    inference,
)
from diffusionspatialcontrol_tpu.utils import region_ui
from tests.test_pipeline import TINY


@pytest.fixture(scope="module")
def manager():
    m = ModelManager(dtype=jnp.float32)
    m.register_random("tiny", TINY)
    return m


def test_sampler_registry():
    spec = registry.resolve_sampler("DPM++ 2M Karras")
    assert spec.solver == "dpmpp_2m" and spec.schedule == "karras"
    spec = registry.resolve_sampler("DPM++ 3M SDE Exponential")
    assert spec.discard_next_to_last_sigma and spec.brownian_noise
    spec = registry.resolve_sampler("DPM++ 2M SDE Heun Karras")
    assert spec.solver == "dpmpp_2m_sde_heun"
    with pytest.raises(KeyError):
        registry.resolve_sampler("nope")
    # every registered solver key exists in the solver table
    from diffusionspatialcontrol_tpu.samplers.solvers import SOLVERS

    for name, spec in registry.SAMPLERS.items():
        assert spec.solver in SOLVERS, name


def test_model_zoo_size():
    assert len(registry.MODEL_ZOO) == 52  # source/app.py:111-164
    assert len(registry.CONTROLNET_MODELS) == 12
    assert len(registry.T2I_ADAPTER_MODELS) == 7
    assert len(registry.IP_ADAPTER_MODELS) == 6


def test_region_color_clustering():
    img = np.zeros((64, 64, 3), np.uint8)
    img[:, :32] = [255, 0, 0]
    img[:32, 32:] = [0, 0, 255]
    # rest black (must survive as its own region via remap)
    masks = region_ui.extract_color_masks(img)
    assert len(masks) == 3
    areas = sorted(float(m.mean()) for m in masks)
    assert abs(areas[0] - 0.25) < 0.01
    assert abs(areas[2] - 0.5) < 0.01


def test_region_state_build_and_overlay():
    mask = np.zeros((32, 32), np.float32)
    mask[:, :16] = 1.0
    state = region_ui.build_region_state(
        ["red cat", "blue dog"], [mask, 1 - mask], weights=[0.5, 0.7]
    )
    assert state["red cat"]["weight"] == 0.5
    img = region_ui.create_mixed_img(state, 32, 32, selected="red cat")
    assert img.shape == (32, 32, 4)


def test_grayscale_map_convention():
    gray = np.full((8, 8), 255, np.uint8)
    gray[:4] = 0
    m = region_ui.mask_from_grayscale_map(gray)
    assert m[:4].all() and not m[4:].any()


def test_register_zoo(tmp_path, manager):
    # fake checkpoint dirs for two zoo entries (one SD2)
    (tmp_path / "stable-diffusion-v1-5").mkdir()
    (tmp_path / "stabilityai--stable-diffusion-2-1-base").mkdir()
    m = ModelManager()
    names = m.register_zoo(str(tmp_path))
    assert "Stable Diffusion v1.5" in names
    assert "Stable Diffusion v2.1" in names
    cfg21 = m._dirs["Stable Diffusion v2.1"][1]
    assert cfg21.unet.cross_attention_dim == 1024
    cfg15 = m._dirs["Stable Diffusion v1.5"][1]
    assert cfg15.unet.cross_attention_dim == 768


def test_profiling_utils():
    import time as _time

    from diffusionspatialcontrol_tpu.utils.profiling import (
        PhaseTimer,
        Watchdog,
    )

    t = PhaseTimer()
    with t.phase("a"):
        _time.sleep(0.01)
    summary = json.loads(t.summary(model="x"))
    assert summary["a_s"] >= 0.01 and summary["model"] == "x"

    w = Watchdog(timeout_s=0.001)
    _time.sleep(0.01)
    with pytest.raises(TimeoutError):
        w.check()
    Watchdog(timeout_s=100).check()  # no raise


def test_face_embed_contract():
    from diffusionspatialcontrol_tpu.ops.face_embed import (
        embed_face,
        embed_faces,
    )

    img = (np.random.RandomState(3).rand(80, 64, 3) * 255).astype(np.uint8)
    e1 = embed_face(img)
    e2 = embed_face(img)
    assert e1.shape == (512,) and e1.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(e1), 1.0, rtol=1e-5)
    np.testing.assert_array_equal(e1, e2)  # deterministic
    other = embed_face(255 - img)
    assert not np.allclose(e1, other)
    multi = embed_faces([img, 255 - img])
    np.testing.assert_allclose(np.linalg.norm(multi), 1.0, rtol=1e-5)


def test_arcface_matches_torch_replica():
    """ArcFace iResNet (tiny config, full structure) vs a torch replica
    with the exact arcface_torch ``backbone.pth`` module layout
    (conv1/bn1/prelu/layer1..4/bn2/fc/features), incl. pre-activation
    blocks, PReLU, BN running stats folded to affines, and the
    NCHW-vs-NHWC fc flatten permutation."""
    import torch
    import torch.nn as nn

    from diffusionspatialcontrol_tpu.convert import hf
    from diffusionspatialcontrol_tpu.models import arcface as AF

    cfg = AF.ARCFACE_TINY

    class IBasicBlock(nn.Module):
        def __init__(self, inp, planes, stride):
            super().__init__()
            self.bn1 = nn.BatchNorm2d(inp)
            self.conv1 = nn.Conv2d(inp, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.prelu = nn.PReLU(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes)
            self.downsample = None
            if stride != 1 or inp != planes:
                self.downsample = nn.Sequential(
                    nn.Conv2d(inp, planes, 1, stride, bias=False),
                    nn.BatchNorm2d(planes))

        def forward(self, x):
            identity = x
            out = self.bn3(self.conv2(self.prelu(self.bn2(
                self.conv1(self.bn1(x))))))
            if self.downsample is not None:
                identity = self.downsample(x)
            return out + identity

    class IResNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, cfg.stem_channels, 3, 1, 1,
                                   bias=False)
            self.bn1 = nn.BatchNorm2d(cfg.stem_channels)
            self.prelu = nn.PReLU(cfg.stem_channels)
            inp = cfg.stem_channels
            for li, (w, reps) in enumerate(
                    zip(cfg.widths, cfg.layers), 1):
                blocks = []
                for i in range(reps):
                    blocks.append(IBasicBlock(inp, w, 2 if i == 0 else 1))
                    inp = w
                setattr(self, f"layer{li}", nn.Sequential(*blocks))
            self.bn2 = nn.BatchNorm2d(inp)
            s = cfg.final_spatial
            self.fc = nn.Linear(inp * s * s, cfg.embed_dim)
            self.features = nn.BatchNorm1d(cfg.embed_dim)

        def forward(self, x):
            x = self.prelu(self.bn1(self.conv1(x)))
            for li in range(1, 5):
                x = getattr(self, f"layer{li}")(x)
            x = self.bn2(x)
            return self.features(self.fc(torch.flatten(x, 1)))

    torch.manual_seed(0)
    model = IResNet().eval()
    gen = np.random.RandomState(9)
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
            n = m.running_mean.shape[0]
            m.running_mean.data = torch.from_numpy(
                gen.randn(n).astype(np.float32) * 0.2)
            m.running_var.data = torch.from_numpy(
                gen.rand(n).astype(np.float32) + 0.5)

    sd = hf.StateDict({k: v.numpy() for k, v in model.state_dict().items()})
    params = AF.convert_arcface(sd, cfg)

    x = np.random.RandomState(1).uniform(
        -1, 1, (2, cfg.input_size, cfg.input_size, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(AF.arcface_apply(params, cfg, jnp.asarray(x)))
    assert got.shape == want.shape == (2, cfg.embed_dim)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_gradio_mask_helpers():
    """The Gradio layer's mask conventions (importable without gradio —
    the gradio import is deferred to build_ui): inpaint masks are
    white = regenerate like the HTTP server, IP masks land in [0, 1]."""
    from diffusionspatialcontrol_tpu.app import gradio_ui as gu

    gray_u8 = np.zeros((8, 8), np.uint8)
    gray_u8[:4] = 255
    # 3-channel uint8 and 2-D float inputs normalize identically
    m3 = gu._mask01(np.stack([gray_u8] * 3, -1))
    m2 = gu._mask01(gray_u8.astype(np.float32) / 255.0)
    np.testing.assert_allclose(m3, m2)
    assert m3.max() <= 1.0 and m3[0, 0] == 1.0 and m3[7, 0] == 0.0
    # inpaint convention: white (255) = regenerate = 1
    inp = (gu._gray(np.stack([gray_u8] * 3, -1)) > 127.5).astype(np.float32)
    assert inp[0, 0] == 1.0 and inp[7, 0] == 0.0


def test_gradio_pre_opts():
    """Per-unit Canny threshold sliders and Openpose body/hand/face
    checkboxes map to preprocessor_options for their preprocessor only
    (reference app.py:857-861 -> cv2.Canny / include_* at :666/:715)."""
    from diffusionspatialcontrol_tpu.app import gradio_ui as gu

    assert gu._pre_opts("Canny", 50, 150) == {"low": 50.0, "high": 150.0}
    assert gu._pre_opts("HED", 50, 150) is None
    assert gu._pre_opts("None", 50, 150) is None
    # Openpose defaults (body only) need no options dict at all
    assert gu._pre_opts("Openpose", 50, 150) is None
    assert gu._pre_opts("Openpose", 50, 150, True, True, False) == {
        "include_body": True, "include_hand": True, "include_face": False}
    assert gu._pre_opts("Openpose", 50, 150, False, False, True) == {
        "include_body": False, "include_hand": False, "include_face": True}


def test_warmup_default_buckets():
    from diffusionspatialcontrol_tpu.app.api import default_warmup_configs

    cfgs = default_warmup_configs("tiny")
    # 2 sizes x 2 batches x (plain, region)
    assert len(cfgs) == 8
    assert sum("region_state" in c for c in cfgs) == 4
    sizes = {(c["width"], c["height"]) for c in cfgs}
    assert sizes == {(512, 512), (768, 768)}


def test_server_cli_build_manager(tmp_path):
    """``python -m ...app.server`` CLI wiring: --random-model families,
    --model NAME=DIR validation, and the no-models error."""
    import argparse

    import pytest as _pytest

    from diffusionspatialcontrol_tpu.app.server import (
        build_manager_from_args, main,
    )

    def parse(argv):
        # reuse main()'s parser without serving: build the namespace the
        # same way main does
        p = argparse.ArgumentParser()
        p.add_argument("--model", action="append", default=[])
        p.add_argument("--zoo")
        p.add_argument("--random-model", action="append", default=[])
        p.add_argument("--preprocessor", action="append", default=[])
        p.add_argument("--image-encoder")
        p.add_argument("--face-embedder")
        p.add_argument("--dtype", default="bf16")
        return p.parse_args(argv)

    m = build_manager_from_args(parse(
        ["--random-model", "tiny:sd15:3", "--dtype", "f32"]
    ))
    assert "tiny" in m._dirs and m.dtype == jnp.float32

    with _pytest.raises(SystemExit):
        build_manager_from_args(parse(["--model", "missing-equals"]))
    with _pytest.raises(SystemExit):
        build_manager_from_args(parse([]))  # no models registered
    with _pytest.raises(SystemExit):
        build_manager_from_args(parse(["--random-model", "x:nofam"]))

    # main() with --help exits cleanly (argparse), proving the real parser
    with _pytest.raises(SystemExit) as ei:
        main(["--help"])
    assert ei.value.code == 0

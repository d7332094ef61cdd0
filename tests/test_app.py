"""App layer: registry resolution, region UI utils, inference(), server."""

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


@pytest.fixture(scope="module")
def manager():
    m = ModelManager(dtype=jnp.float32)
    m.register_random("tiny", TINY)
    return m


def test_inference_end_to_end(manager):
    mask = np.zeros((64, 64), np.float32)
    mask[:, :32] = 1.0
    result = inference(
        manager,
        prompt="a red cat and a dog",
        model="tiny",
        sampler="Euler Karras",
        steps=3,
        width=64,
        height=64,
        region_state=region_ui.build_region_state(["red cat"], [mask]),
        encoding_mode="short",
        dtype=jnp.float32,
    )
    assert result["images"].shape == (1, 64, 64, 3)
    assert result["images"].dtype == np.uint8
    t = json.loads(result["timings"])
    assert "sample_s" in t and "encode_s" in t


def test_inference_img2img_and_preview(manager):
    init = np.zeros((64, 64, 3), np.uint8)
    result = inference(
        manager, prompt="a cat", model="tiny", sampler="Euler",
        steps=3, width=64, height=64, init_image=init, strength=0.5,
        encoding_mode="short", dtype=jnp.float32,
    )
    assert result["images"].shape == (1, 64, 64, 3)

    result = inference(
        manager, prompt="a cat", model="tiny", sampler="Euler", steps=3,
        width=64, height=64, latent_preview=True, encoding_mode="short",
        dtype=jnp.float32,
    )
    assert len(result["previews"]) == 3


def test_http_server(manager):
    from diffusionspatialcontrol_tpu.app.server import serve

    server = serve(manager, port=0, block=False)
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/samplers"
        ) as r:
            samplers = json.loads(r.read())["samplers"]
        assert "DPM++ 2M Karras" in samplers

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps(
                {
                    "prompt": "a cat",
                    "model": "tiny",
                    "sampler": "Euler",
                    "steps": 2,
                    "width": 64,
                    "height": 64,
                    "encoding_mode": "short",
                }
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            payload = json.loads(r.read())
        assert len(payload["images"]) == 1
    finally:
        server.shutdown()


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


def test_inference_all_unit_types_at_once(manager):
    """ControlNet + T2I-Adapter + IP-Adapter through the single inference()
    entry point (reference contract: one call drives every unit,
    app.py:924-997, 1021-1096)."""
    from diffusionspatialcontrol_tpu.app.api import (
        ControlNetUnit,
        IPAdapterUnit,
        T2IAdapterUnit,
    )
    from diffusionspatialcontrol_tpu.models.clip_vision import (
        CLIPVisionConfig,
    )

    manager.register_image_encoder(cfg=CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, projection_dim=32,
    ))
    cond = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    ref_img = (np.random.RandomState(1).rand(32, 32, 3) * 255).astype(
        np.uint8
    )
    kwargs = dict(
        prompt="a cat", model="tiny", sampler="Euler", steps=3,
        width=64, height=64, encoding_mode="short", dtype=jnp.float32,
    )
    base = inference(manager, **kwargs)
    result = inference(
        manager,
        controlnet_units=[ControlNetUnit(model="Canny", image=cond,
                                         scale=0.8)],
        t2i_units=[T2IAdapterUnit(model="Sketch", image=cond, scale=0.7,
                                  conditioning_factor=0.5)],
        ip_adapter_units=[IPAdapterUnit(model="IP-Adapter", image=ref_img,
                                        scale=0.6)],
        **kwargs,
    )
    assert result["images"].shape == (1, 64, 64, 3)
    # units must change the output (controlnet fallback trunk is zero-init
    # no-op, but t2i/ip random weights are not)
    assert not np.array_equal(result["images"], base["images"])
    # the manager's cached UNet must NOT have been mutated by the
    # IP-Adapter install
    _, params, _ = manager.get("tiny")
    assert "ip" not in params["unet"]["mid_block"]["attention"]["blocks"][0][
        "attn2"
    ]
    # and a later plain call still works unchanged
    again = inference(manager, **kwargs)
    np.testing.assert_array_equal(again["images"], base["images"])


def test_inference_ip_adapter_variants(manager):
    from diffusionspatialcontrol_tpu.app.api import IPAdapterUnit

    ref_img = (np.random.RandomState(2).rand(48, 48, 3) * 255).astype(
        np.uint8
    )
    kwargs = dict(
        prompt="a cat", model="tiny", sampler="Euler", steps=2,
        width=64, height=64, encoding_mode="short", dtype=jnp.float32,
    )
    outs = {}
    for variant in ("IP-Adapter Plus", "IP-Adapter FaceID"):
        r = inference(
            manager,
            ip_adapter_units=[IPAdapterUnit(model=variant, image=ref_img,
                                            scale=0.5)],
            **kwargs,
        )
        outs[variant] = r["images"]
    assert not np.array_equal(outs["IP-Adapter Plus"],
                              outs["IP-Adapter FaceID"])

    # spatial mask gating changes the result
    mask = np.zeros((64, 64), np.float32)
    mask[:, :32] = 1.0
    masked = inference(
        manager,
        ip_adapter_units=[IPAdapterUnit(model="IP-Adapter Plus",
                                        image=ref_img, scale=0.5,
                                        mask=mask)],
        **kwargs,
    )
    assert not np.array_equal(masked["images"], outs["IP-Adapter Plus"])


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


def test_inference_multi_prompt_grid(manager):
    """2 prompts x 2 seeds with distinct per-prompt region states in one
    batched program (reference multi-prompt region split,
    encode_region_map_function.py:93-105)."""
    mask_a = np.zeros((64, 64), np.float32)
    mask_a[:, :32] = 1.0
    mask_b = np.zeros((64, 64), np.float32)
    mask_b[:, 32:] = 1.0
    result = inference(
        manager,
        prompt=["a red cat", "a blue dog"],
        model="tiny",
        sampler="Euler",
        steps=3,
        width=64,
        height=64,
        seed=[5, 6],
        region_state=[
            region_ui.build_region_state(["red cat"], [mask_a]),
            region_ui.build_region_state(["blue dog"], [mask_b]),
        ],
        encoding_mode="short",
        dtype=jnp.float32,
    )
    assert result["images"].shape == (4, 64, 64, 3)
    # prompt-major: row 2 = prompt 1 seed 5; equals the solo run
    solo = inference(
        manager, prompt="a blue dog", model="tiny", sampler="Euler",
        steps=3, width=64, height=64, seed=[5],
        region_state=region_ui.build_region_state(["blue dog"], [mask_b]),
        encoding_mode="short", dtype=jnp.float32,
    )
    # same seed/prompt row: identical up to cross-program fp noise (batch-4
    # vs batch-1 XLA fusions differ; a wrong row order would differ by
    # ~100+ levels on every pixel)
    diff = np.abs(result["images"][2].astype(np.int32)
                  - solo["images"][0].astype(np.int32))
    assert diff.max() <= 10 and diff.mean() < 2.0

    with pytest.raises(ValueError):
        inference(manager, prompt=["a", "b"], model="tiny", steps=2,
                  width=64, height=64, latent_preview=True,
                  encoding_mode="short", dtype=jnp.float32)


def test_http_server_multi_prompt(manager):
    import threading as _t  # noqa: F401  (threading imported at module top)
    from diffusionspatialcontrol_tpu.app.server import serve

    server = serve(manager, port=0, block=False)
    try:
        port = server.server_address[1]
        mask = [[1.0 if x < 32 else 0.0 for x in range(64)]
                for _ in range(64)]
        payload = {
            "prompt": ["a red cat", "a blue dog"],
            "model": "tiny",
            "sampler": "Euler",
            "steps": 2,
            "width": 64,
            "height": 64,
            "seed": [1, 2],
            "encoding_mode": "short",
            "region_state": [
                {"red cat": {"mask": mask, "weight": 1.0}},
                None,
            ],
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.loads(r.read())
        assert len(out["images"]) == 4
    finally:
        server.shutdown()


def test_inference_cancel_check_steps(manager):
    r1 = inference(
        manager, prompt="a cat", model="tiny", sampler="Euler", steps=4,
        width=64, height=64, encoding_mode="short", dtype=jnp.float32,
    )
    r2 = inference(
        manager, prompt="a cat", model="tiny", sampler="Euler", steps=4,
        width=64, height=64, encoding_mode="short", dtype=jnp.float32,
        cancel_check_steps=2,
    )
    # latents are bitwise identical (test_solvers); decode+uint8 run in a
    # differently-fused program here, so allow one quantization level
    diff = np.abs(r1["images"].astype(np.int32)
                  - r2["images"].astype(np.int32))
    assert diff.max() <= 1
    with pytest.raises(TimeoutError):
        inference(
            manager, prompt="a cat", model="tiny", sampler="Euler",
            steps=4, width=64, height=64, encoding_mode="short",
            dtype=jnp.float32, cancel_check_steps=1, timeout=1e-9,
        )


def test_http_server_units_and_preprocess(manager):
    from diffusionspatialcontrol_tpu.app.server import serve
    from diffusionspatialcontrol_tpu.models.clip_vision import (
        CLIPVisionConfig,
    )

    manager.register_image_encoder(cfg=CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, projection_dim=32,
    ))
    server = serve(manager, port=0, block=False)
    try:
        port = server.server_address[1]

        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                return r.status, json.loads(r.read())

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/preprocessors", timeout=30
        ) as r:
            pp_list = json.loads(r.read())
        assert "Depth" in pp_list["model_based_native"]
        assert "Canny" in pp_list["pure_image"]

        img = np.random.RandomState(0).rand(64, 64, 3).tolist()
        st, out = post("/preprocess", {"preprocessor": "Canny",
                                       "image": img})
        assert st == 200 and isinstance(out["image"], str)

        # /preprocess also accepts base64 image strings like every other
        # image-valued field, and decodes to the same control image
        import base64 as b64
        import io

        from PIL import Image

        u8 = (np.asarray(img) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(u8).save(buf, "PNG")
        st2, out2 = post("/preprocess", {
            "preprocessor": "Canny",
            "image": b64.b64encode(buf.getvalue()).decode(),
        })
        assert st2 == 200 and isinstance(out2["image"], str)
        # the base64 (0..255) and JSON-list ([0,1]) uploads of the SAME
        # uint8 image must produce the same control image (the 0..255
        # floats used to bypass detector normalization)
        st_l, out_l = post("/preprocess", {
            "preprocessor": "Canny", "image": (u8 / 255.0).tolist(),
        })
        assert st_l == 200 and out_l["image"] == out2["image"]

        # grayscale base64 uploads are expanded to RGB, and model-based
        # detectors get in-range inputs (both 500'd before round 4)
        manager.register_preprocessor("Openpose", detect_resolution=64)
        buf_l = io.BytesIO()
        Image.fromarray(u8[..., 0], mode="L").save(buf_l, "PNG")
        st3, out3 = post("/preprocess", {
            "preprocessor": "Openpose",
            "image": b64.b64encode(buf_l.getvalue()).decode(),
        })
        assert st3 == 200 and isinstance(out3["image"], str)

        st, out = post("/generate", {
            "prompt": "a cat", "model": "tiny", "sampler": "Euler",
            "steps": 2, "width": 64, "height": 64,
            "encoding_mode": "short",
            "controlnet_units": [
                {"model": "Canny", "image": img, "scale": 0.5,
                 "preprocessor": "Canny"}
            ],
            "ip_adapter_units": [
                {"model": "IP-Adapter",
                 "image": (np.random.RandomState(1).rand(32, 32, 3)
                           ).tolist(),
                 "scale": 0.4}
            ],
        })
        assert st == 200 and len(out["images"]) == 1
    finally:
        server.shutdown()


def test_inference_grid_with_controlnet(manager):
    """Grid mode with a ControlNet unit + per-prompt negative prompts
    (round-3): 2 prompts x 2 seeds in one sharded program, prompt-major
    order, per-seed invariance vs the single-prompt run."""
    cond = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    kwargs = dict(
        model="tiny", sampler="Euler", steps=3, width=64, height=64,
        encoding_mode="short", dtype=jnp.float32,
        controlnet_units=[
            ControlNetUnit(model="Canny", image=cond, scale=0.7)
        ],
    )
    result = inference(
        manager, prompt=["a red cat", "a blue dog"],
        neg_prompt=["bad quality", "worst quality"], seed=[5, 6], **kwargs
    )
    assert result["images"].shape == (4, 64, 64, 3)
    solo = inference(
        manager, prompt="a blue dog", neg_prompt="worst quality",
        seed=[6], **kwargs
    )
    # prompt-major row 3 = prompt 1, seed 6; identical up to cross-program
    # fp noise (batch-4 vs batch-1 fusions differ)
    diff = np.abs(result["images"][3].astype(np.int32)
                  - solo["images"][0].astype(np.int32))
    assert diff.max() <= 10 and diff.mean() < 2.0


def test_inference_hires_with_controlnet(manager):
    """Hires + ControlNet through inference(): extras are rebuilt at the
    hires resolution (reference model_k_diffusion.py:1206-1212)."""
    cond = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    result = inference(
        manager, prompt="a cat", model="tiny", sampler="Euler", steps=2,
        width=64, height=64, encoding_mode="short", dtype=jnp.float32,
        controlnet_units=[ControlNetUnit(model="Canny", image=cond)],
        hires_scale=2.0, hires_strength=0.5,
    )
    assert result["images"].shape == (1, 128, 128, 3)


def test_inference_preview_through_hires(manager):
    """Latent previews span the base AND hires passes (reference appends
    hires per-step decodes, model_k_diffusion.py:1221-1224)."""
    result = inference(
        manager, prompt="a cat", model="tiny", sampler="Euler", steps=3,
        width=64, height=64, encoding_mode="short", dtype=jnp.float32,
        hires_scale=2.0, hires_strength=0.5, latent_preview=True,
    )
    assert result["images"].shape == (1, 128, 128, 3)
    # 3 base steps + int(3*0.5)=1 hires step
    assert len(result["previews"]) == 4
    assert result["previews"][0].shape[1:3] == (64, 64)
    assert result["previews"][-1].shape[1:3] == (128, 128)


def test_inference_units_with_num_images_per_prompt(manager):
    """One conditioning image / reference image serves a multi-image
    fan-out (reference repeats embeds per image,
    model_k_diffusion.py:205-214)."""
    from diffusionspatialcontrol_tpu.app.api import (
        ControlNetUnit,
        IPAdapterUnit,
    )

    cond = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    ref_img = (np.random.RandomState(1).rand(32, 32, 3) * 255).astype(
        np.uint8
    )
    mask = np.zeros((64, 64), np.float32)
    mask[:, :32] = 1.0
    result = inference(
        manager, prompt="a cat", model="tiny", sampler="Euler", steps=2,
        width=64, height=64, num_images_per_prompt=2,
        encoding_mode="short", dtype=jnp.float32,
        controlnet_units=[ControlNetUnit(model="Canny", image=cond)],
        ip_adapter_units=[IPAdapterUnit(model="IP-Adapter", image=ref_img,
                                        scale=0.5, mask=mask)],
    )
    assert result["images"].shape == (2, 64, 64, 3)


def test_inference_with_lora_and_ti(manager, tmp_path):
    """LoRA paths and TI embedding files through inference() (reference:
    merge-into-weights loader app.py:532-597 + add_embedding :759-785);
    base cache stays pristine."""
    from safetensors.numpy import save_file

    rng = np.random.RandomState(0)
    # LoRA on a cross-attn to_q of the tiny unet (rank 2, dim 32 @ level 0)
    lora_sd = {
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_"
        "to_q.lora_down.weight": rng.randn(2, 32).astype(np.float32),
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_"
        "to_q.lora_up.weight": rng.randn(32, 2).astype(np.float32) * 0.5,
    }
    lora_path = str(tmp_path / "style.safetensors")
    save_file(lora_sd, lora_path)
    ti_path = str(tmp_path / "mytoken.safetensors")
    save_file({"mytoken": rng.randn(2, 64).astype(np.float32)}, ti_path)

    kwargs = dict(
        model="tiny", sampler="Euler", steps=2, width=64, height=64,
        encoding_mode="short", dtype=jnp.float32, seed=9,
    )
    base = inference(manager, prompt="a mytoken cat", **kwargs)
    styled = inference(manager, prompt="a mytoken cat",
                       loras=[(lora_path, 1.0)], ti_embeddings=[ti_path],
                       **kwargs)
    assert not np.array_equal(base["images"], styled["images"])
    # cached variant: second call hits the cache and reproduces exactly
    styled2 = inference(manager, prompt="a mytoken cat",
                        loras=[(lora_path, 1.0)], ti_embeddings=[ti_path],
                        **kwargs)
    np.testing.assert_array_equal(styled["images"], styled2["images"])
    # base model untouched by the merge
    base2 = inference(manager, prompt="a mytoken cat", **kwargs)
    np.testing.assert_array_equal(base["images"], base2["images"])


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


def test_faceid_with_arcface_embedder(manager):
    """FaceID e2e with the real recognition architecture (random weights):
    the manager-registered ArcFace network replaces the stub embedder and
    satisfies the 512-d normed_embedding contract (ops/face_embed.py)."""
    from diffusionspatialcontrol_tpu.app.api import IPAdapterUnit
    from diffusionspatialcontrol_tpu.models.arcface import ArcFaceConfig

    cfg512 = ArcFaceConfig(layers=(1, 1, 1, 1), widths=(8, 12, 16, 24),
                           stem_channels=8, embed_dim=512, input_size=32)
    manager.register_face_embedder(cfg=cfg512)
    try:
        embed = manager.get_face_embedder()
        img = (np.random.RandomState(5).rand(48, 48, 3) * 255).astype(
            np.uint8)
        e1, e2 = embed(img), embed(img)
        assert e1.shape == (512,) and e1.dtype == np.float32
        np.testing.assert_allclose(np.linalg.norm(e1), 1.0, rtol=1e-5)
        np.testing.assert_array_equal(e1, e2)  # deterministic
        assert not np.allclose(e1, embed(255 - img))

        r = inference(
            manager, prompt="a cat", model="tiny", sampler="Euler",
            steps=2, width=64, height=64, encoding_mode="short",
            dtype=jnp.float32,
            ip_adapter_units=[IPAdapterUnit(model="IP-Adapter FaceID",
                                            image=img, scale=0.5)],
        )
        assert r["images"].shape == (1, 64, 64, 3)
    finally:
        manager._face_spec = None
        manager._adapters.pop("face_embedder", None)


def test_http_server_img2img_inpaint_and_preview(manager):
    """Server passthrough for init_image / inpaint_mask / latent_preview
    (round-3): img2img and inpaint generate over HTTP, previews return as
    per-step galleries."""
    from diffusionspatialcontrol_tpu.app.server import serve

    server = serve(manager, port=0, block=False)
    try:
        port = server.server_address[1]

        def post(payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                return json.loads(r.read())

        base = {
            "prompt": "a cat", "model": "tiny", "sampler": "Euler",
            "steps": 2, "width": 64, "height": 64,
            "encoding_mode": "short",
        }
        init = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(
            int).tolist()
        out = post({**base, "init_image": init, "strength": 0.5})
        assert len(out["images"]) == 1

        mask = [[1.0 if x < 32 else 0.0 for x in range(64)]
                for _ in range(64)]
        out = post({**base, "init_image": init, "inpaint_mask": mask})
        assert len(out["images"]) == 1

        out = post({**base, "latent_preview": True})
        assert len(out["previews"]) == 2  # one gallery per step
        assert len(out["previews"][0]) == 1
    finally:
        server.shutdown()


def test_inference_without_cfg(manager):
    """cfg_scale <= 1 disables the CFG pair: the context must collapse to
    its cond half and unit extras / region biases must not be CFG-doubled
    (the conditioning batch would mismatch the latent batch)."""
    kwargs = dict(model="tiny", sampler="Euler", steps=2, width=64,
                  height=64, cfg_scale=1.0, encoding_mode="short",
                  dtype=jnp.float32)
    r = inference(manager, prompt="a cat", **kwargs)
    assert r["images"].shape == (1, 64, 64, 3)

    cond = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    r = inference(
        manager, prompt="a cat",
        controlnet_units=[ControlNetUnit(model="Canny", image=cond)],
        **kwargs,
    )
    assert r["images"].shape == (1, 64, 64, 3)

    mask = np.zeros((64, 64), np.float32)
    mask[:, :32] = 1.0
    r = inference(
        manager, prompt="a red cat",
        region_state=region_ui.build_region_state(["red cat"], [mask]),
        **kwargs,
    )
    assert r["images"].shape == (1, 64, 64, 3)


def test_grid_without_cfg(manager):
    """Grid mode (multi-prompt x seeds) with cfg_scale <= 1: the batched
    path must collapse the context to its cond half like api.inference."""
    mask = np.zeros((64, 64), np.float32)
    mask[:, :32] = 1.0
    r = inference(
        manager,
        prompt=["a red cat", "a blue dog"],
        model="tiny", sampler="Euler", steps=2, width=64, height=64,
        seed=[5, 6], cfg_scale=1.0, encoding_mode="short",
        region_state=[
            region_ui.build_region_state(["red cat"], [mask]),
            None,
        ],
        dtype=jnp.float32,
    )
    assert r["images"].shape == (4, 64, 64, 3)


def test_inference_cfg_tail_frac(manager):
    """cfg_tail_frac: the last fraction of steps runs cond-only. 0.0 is
    the plain path; >0 still returns valid images; unsupported combos
    raise instead of silently degrading."""
    kwargs = dict(
        model="tiny", sampler="Euler Karras", steps=4, width=64, height=64,
        seed=11, encoding_mode="short", dtype=jnp.float32,
    )
    base = inference(manager, prompt="a red cat", **kwargs)
    fast = inference(manager, prompt="a red cat", cfg_tail_frac=0.5,
                     **kwargs)
    assert fast["images"].shape == base["images"].shape
    assert fast["images"].dtype == np.uint8
    assert np.any(fast["images"] != base["images"])  # guidance changed

    with pytest.raises(ValueError):
        inference(manager, prompt="a red cat", cfg_tail_frac=0.5,
                  hires_scale=2.0, **kwargs)
    with pytest.raises(ValueError):
        inference(manager, prompt="a red cat", cfg_tail_frac=0.5,
                  latent_preview=True, **kwargs)


def test_inference_deepcache_interval(manager):
    """deepcache_interval: every N-th step runs the full UNet, the rest
    reuse the cached deep-branch features. interval<=1 is the plain path;
    >1 returns valid images; unsupported combos raise."""
    kwargs = dict(
        model="tiny", sampler="Euler Karras", steps=4, width=64, height=64,
        seed=11, encoding_mode="short", dtype=jnp.float32,
    )
    base = inference(manager, prompt="a red cat", **kwargs)
    fast = inference(manager, prompt="a red cat", deepcache_interval=2,
                     **kwargs)
    assert fast["images"].shape == base["images"].shape
    assert fast["images"].dtype == np.uint8
    assert np.any(fast["images"] != base["images"])  # reuse steps differ

    with pytest.raises(ValueError):
        inference(manager, prompt="a red cat", deepcache_interval=2,
                  hires_scale=2.0, **kwargs)
    with pytest.raises(ValueError):
        inference(manager, prompt="a red cat", deepcache_interval=2,
                  cfg_tail_frac=0.5, **kwargs)


def test_inference_bottleneck_low_scale(manager):
    """bottleneck_low_scale: the middle of the schedule runs at a reduced
    latent resolution. Returns full-size valid images; unsupported combos
    raise."""
    kwargs = dict(
        model="tiny", sampler="Euler Karras", steps=6, width=128,
        height=128, seed=11, encoding_mode="short", dtype=jnp.float32,
    )
    out = inference(manager, prompt="a red cat",
                    bottleneck_low_scale=0.5, **kwargs)
    assert out["images"].shape == (1, 128, 128, 3)
    assert out["images"].dtype == np.uint8
    with pytest.raises(ValueError):
        inference(manager, prompt="a red cat", bottleneck_low_scale=0.5,
                  deepcache_interval=2, **kwargs)
    with pytest.raises(ValueError):
        inference(manager, prompt="a red cat", bottleneck_low_scale=0.5,
                  hires_scale=2.0, **kwargs)


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


def test_latent_preview_validated_at_entry(manager):
    """An invalid latent_preview raises BEFORE sampling (no wasted run),
    and 'hires' previews without a hires pass are an error rather than
    silently returning base-pass previews (ADVICE r3)."""
    kwargs = dict(
        model="tiny", sampler="Euler", steps=4, width=64, height=64,
        seed=3, encoding_mode="short", dtype=jnp.float32,
    )
    with pytest.raises(ValueError, match="latent_preview"):
        inference(manager, prompt="a cat", latent_preview="nope", **kwargs)
    with pytest.raises(ValueError, match="hires"):
        inference(manager, prompt="a cat", latent_preview="hires", **kwargs)


def test_inference_tgate(manager):
    """tgate_gate_frac: cross-attn frozen + uncond half dropped after the
    gate. Full-size valid images; unsupported combos raise."""
    kwargs = dict(
        model="tiny", sampler="Euler", steps=6, width=64, height=64,
        seed=11, encoding_mode="short", dtype=jnp.float32,
    )
    out = inference(manager, prompt="a red cat", tgate_gate_frac=0.5,
                    **kwargs)
    assert out["images"].shape == (1, 64, 64, 3)
    assert out["images"].dtype == np.uint8
    with pytest.raises(ValueError, match="at most one"):
        inference(manager, prompt="a red cat", tgate_gate_frac=0.5,
                  deepcache_interval=2, **kwargs)
    with pytest.raises(ValueError, match="tgate"):
        inference(manager, prompt="a red cat", tgate_gate_frac=0.5,
                  hires_scale=2.0, **kwargs)


def test_turbo_modes_raise_with_init_image(manager):
    """Acceleration modes are txt2img-only: combining them with an init
    image must raise, not silently run plain img2img (regression: the
    init_image branch ran before any turbo-mode check)."""
    kwargs = dict(
        model="tiny", sampler="Euler", steps=4, width=64, height=64,
        encoding_mode="short", dtype=jnp.float32,
        init_image=(np.random.RandomState(0).rand(64, 64, 3) * 255).astype(
            np.uint8),
    )
    for turbo in (dict(bottleneck_low_scale=0.5),
                  dict(deepcache_interval=2),
                  dict(cfg_tail_frac=0.5)):
        with pytest.raises(ValueError, match="init_image"):
            inference(manager, prompt="a cat", **kwargs, **turbo)
    with pytest.raises(ValueError, match="cancel_check_steps"):
        inference(manager, prompt="a cat", model="tiny", sampler="Euler",
                  steps=4, width=64, height=64, encoding_mode="short",
                  dtype=jnp.float32, cancel_check_steps=2,
                  bottleneck_low_scale=0.5)


def test_unit_image_uint8_normalized(manager):
    """Preprocessor-less unit images arriving as uint8 (e.g. from the
    Gradio UI) are rescaled to the documented [0, 1] contract."""
    from diffusionspatialcontrol_tpu.app.api import _maybe_preprocess

    img_u8 = (np.random.RandomState(1).rand(32, 32, 3) * 255).astype(
        np.uint8)
    unit = ControlNetUnit(model="Canny", image=img_u8, preprocessor=None)
    out = _maybe_preprocess(manager, unit)
    assert out.dtype == np.float32 and out.max() <= 1.0
    np.testing.assert_allclose(out, img_u8.astype(np.float32) / 255.0)
    # float inputs pass through untouched
    unit_f = ControlNetUnit(model="Canny", image=img_u8 / 255.0,
                            preprocessor=None)
    np.testing.assert_allclose(_maybe_preprocess(manager, unit_f),
                               img_u8 / 255.0)


def test_http_job_queue(manager):
    """Async job API: submit -> poll -> done matches the synchronous
    /generate result for the same seed; queued jobs can be cancelled;
    a running job with cancel_check_steps aborts at a chunk boundary."""
    import time as _time

    from diffusionspatialcontrol_tpu.app.server import serve

    server = serve(manager, port=0, block=False)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"

    def post(path, payload=None):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload or {}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    def get(path):
        with urllib.request.urlopen(base + path) as r:
            return json.loads(r.read())

    body = {"prompt": "a cat", "model": "tiny", "sampler": "Euler",
            "steps": 3, "width": 64, "height": 64, "seed": 21,
            "encoding_mode": "short"}
    try:
        sync = post("/generate", body)

        job = post("/jobs", body)
        assert job["status"] in ("queued", "running")
        jid = job["job_id"]
        for _ in range(600):
            st = get(f"/jobs/{jid}")
            if st["status"] in ("done", "error", "cancelled"):
                break
            _time.sleep(0.5)
        assert st["status"] == "done", st.get("error")
        assert st["progress"]["done"] == st["progress"]["total"]
        assert st["images"] == sync["images"]  # byte-identical PNGs
        assert jid in {j["job_id"] for j in get("/jobs")["jobs"]}

        # cancel while queued: enqueue two long jobs back-to-back; the
        # second is guaranteed still queued when we cancel it
        long_body = dict(body, steps=12, seed=1,
                         cancel_check_steps=1)
        j1 = post("/jobs", long_body)
        j2 = post("/jobs", dict(long_body, seed=2))
        c = post(f"/jobs/{j2['job_id']}/cancel")
        assert c["status"] == "cancelled"

        # cancel the running one mid-scan (chunk boundary re-entry)
        _time.sleep(0.2)
        post(f"/jobs/{j1['job_id']}/cancel")
        for _ in range(600):
            s1 = get(f"/jobs/{j1['job_id']}")
            if s1["status"] in ("done", "error", "cancelled"):
                break
            _time.sleep(0.5)
        # either it was aborted mid-run or it finished before the flag
        # was seen — both are valid terminal states, never "error"
        assert s1["status"] in ("cancelled", "done"), s1.get("error")

        # bad payloads are rejected at submit time
        try:
            post("/jobs", {"model": "tiny"})
            assert False, "missing prompt must 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # unknown job id
        try:
            get("/jobs/job-99999")
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()


def test_http_server_base64_image_inputs(manager):
    """Image-valued JSON fields accept base64 PNG strings: init_image
    (0..255), region masks (grayscale map, drawn = <255), and unit images
    ([0,1] after decode). Base64 and nested-list payloads must produce
    identical images for equivalent content."""
    import base64 as b64
    import io as _io

    from PIL import Image

    from diffusionspatialcontrol_tpu.app.server import serve

    def png_b64(arr):
        buf = _io.BytesIO()
        Image.fromarray(np.asarray(arr, np.uint8)).save(buf, format="PNG")
        return b64.b64encode(buf.getvalue()).decode()

    server = serve(manager, port=0, block=False)
    try:
        port = server.server_address[1]

        def post(payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                return json.loads(r.read())

        base = {
            "prompt": "a red cat", "model": "tiny", "sampler": "Euler",
            "steps": 2, "width": 64, "height": 64, "seed": 3,
            "encoding_mode": "short",
        }

        # init_image: base64 == nested lists (0..255)
        rng = np.random.RandomState(0)
        init_u8 = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        a = post({**base, "init_image": init_u8.tolist(),
                  "strength": 0.5})
        b = post({**base, "init_image": png_b64(init_u8),
                  "strength": 0.5})
        assert a["images"][0] == b["images"][0]

        # region mask: grayscale map (drawn = 0, background = 255)
        gray = np.full((64, 64), 255, np.uint8)
        gray[:, :32] = 0
        state_list = {"red cat": {
            "mask": [[1.0 if x < 32 else 0.0 for x in range(64)]
                     for _ in range(64)],
            "weight": 0.8, "mask_outsides": 0.2}}
        state_b64 = {"red cat": {"mask": png_b64(gray),
                                 "weight": 0.8, "mask_outsides": 0.2}}
        a = post({**base, "region_state": state_list})
        b = post({**base, "region_state": state_b64})
        assert a["images"][0] == b["images"][0]

        # ControlNet unit image: base64 (0..255 PNG) == lists in [0, 1]
        cond_u8 = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        unit_list = {"model": "Canny",
                     "image": (cond_u8 / 255.0).tolist()}
        unit_b64 = {"model": "Canny", "image": png_b64(cond_u8)}
        a = post({**base, "controlnet_units": [unit_list]})
        b = post({**base, "controlnet_units": [unit_b64]})
        assert a["images"][0] == b["images"][0]
    finally:
        server.shutdown()


def test_warmup_api(manager):
    """api.warmup pre-compiles a list of inference configs; results echo
    the scalar statics with per-config seconds. A re-warm of the same
    bucket hits the jit cache (no recompile) — asserted indirectly by it
    completing much faster than the cold run on CPU too."""
    from diffusionspatialcontrol_tpu.app.api import warmup

    cfgs = [
        {"model": "tiny", "sampler": "Euler", "steps": 2,
         "width": 64, "height": 64, "encoding_mode": "short"},
    ]
    out = warmup(manager, cfgs)
    assert len(out) == 1
    assert out[0]["seconds"] > 0
    assert out[0]["config"]["sampler"] == "Euler"
    again = warmup(manager, cfgs)
    assert again[0]["seconds"] < out[0]["seconds"]


def test_warmup_default_buckets():
    from diffusionspatialcontrol_tpu.app.api import default_warmup_configs

    cfgs = default_warmup_configs("tiny")
    # 2 sizes x 2 batches x (plain, region)
    assert len(cfgs) == 8
    assert sum("region_state" in c for c in cfgs) == 4
    sizes = {(c["width"], c["height"]) for c in cfgs}
    assert sizes == {(512, 512), (768, 768)}


def test_http_server_warmup(manager):
    from diffusionspatialcontrol_tpu.app.server import serve

    server = serve(manager, port=0, block=False)
    port = server.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/warmup",
            data=json.dumps({"configs": [
                {"prompt": "warm", "model": "tiny", "sampler": "Euler",
                 "steps": 2, "width": 64, "height": 64,
                 "encoding_mode": "short"},
            ]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            payload = json.loads(r.read())
        assert len(payload["results"]) == 1
        assert payload["results"][0]["seconds"] > 0

        # unknown model -> 400 with the KeyError message
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/warmup",
            data=json.dumps({"model": "nope"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_inference_hires_sampler_override(manager):
    """The hires pass can run its own sampler (reference ``sampler_hires``
    dropdown, app.py:867, selected for the upscale recursion at
    app.py:1101/1187). Passing the base sampler explicitly is a no-op;
    a different solver changes the hires pass."""
    kw = dict(
        prompt="a cat", model="tiny", sampler="Euler", steps=3, seed=7,
        width=64, height=64, encoding_mode="short", dtype=jnp.float32,
        # strength 0.9 -> a 2-step hires pass starting at sigma_1, the one
        # sigma that differs between schedules (a 1-step pass would start
        # at sigma_min, identical across schedules, and a single step to
        # sigma=0 makes Heun degenerate to Euler)
        hires_scale=2.0, hires_strength=0.9,
    )
    base = inference(manager, **kw)["images"]
    same = inference(manager, hires_sampler="Euler", **kw)["images"]
    np.testing.assert_array_equal(base, same)
    other = inference(manager, hires_sampler="Heun Karras", **kw)["images"]
    assert not np.array_equal(base, other)


def test_inference_hires_region_toggle(manager):
    """``hires_region`` mirrors the reference's ``hr_region_condition``
    checkbox (app.py:879): ON re-encodes the region biases at the target
    resolution for the upscale pass, OFF runs the hires pass unbiased."""
    mask = np.zeros((64, 64), np.float32)
    mask[:, :32] = 1.0
    kw = dict(
        prompt="a red cat and a dog", model="tiny", sampler="Euler",
        steps=3, seed=3, width=64, height=64, encoding_mode="short",
        dtype=jnp.float32,
        region_state=region_ui.build_region_state(["red cat"], [mask]),
        # strength 0.9 -> the hires pass starts at sigma_1 ~ 1.6 where the
        # sigma-scaled region bias is visible above uint8 quantization (a
        # 1-step pass runs only at sigma_min ~ 0.03)
        hires_scale=2.0, hires_strength=0.9,
    )
    on = inference(manager, hires_region=True, **kw)["images"]
    off = inference(manager, hires_region=False, **kw)["images"]
    assert on.shape == off.shape == (1, 128, 128, 3)
    assert not np.array_equal(on, off)


def test_inpaint_invert_mask(manager):
    """``invert_mask`` regenerates where mask==0 (reference inverts the
    uploaded mask when "Black areas are used" is checked, app.py:921):
    inverting both the mask and the flag is bitwise-identical."""
    rs = np.random.RandomState(5)
    init = (rs.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    kw = dict(
        prompt="a cat", model="tiny", sampler="Euler", steps=3, seed=11,
        width=64, height=64, encoding_mode="short", dtype=jnp.float32,
        init_image=init, strength=0.8,
    )
    plain = inference(manager, inpaint_mask=mask, **kw)["images"]
    flipped = inference(manager, inpaint_mask=1.0 - mask,
                        invert_mask=True, **kw)["images"]
    np.testing.assert_array_equal(plain, flipped)


def test_ip_adapter_invert_mask(manager):
    """Per-unit ``invert_mask`` applies the IP mask where it is 0
    (reference ImageOps.invert under ``invert_ip_adapter_mask_mode``,
    app.py:787-795): inverting both the mask and the flag is
    bitwise-identical."""
    from diffusionspatialcontrol_tpu.app.api import IPAdapterUnit

    ref_img = (np.random.RandomState(2).rand(48, 48, 3) * 255).astype(
        np.uint8
    )
    mask = np.zeros((64, 64), np.float32)
    mask[:, :32] = 1.0
    kw = dict(
        prompt="a cat", model="tiny", sampler="Euler", steps=2, seed=9,
        width=64, height=64, encoding_mode="short", dtype=jnp.float32,
    )
    plain = inference(
        manager,
        ip_adapter_units=[IPAdapterUnit(model="IP-Adapter Plus",
                                        image=ref_img, scale=0.5,
                                        mask=mask)],
        **kw,
    )["images"]
    flipped = inference(
        manager,
        ip_adapter_units=[IPAdapterUnit(model="IP-Adapter Plus",
                                        image=ref_img, scale=0.5,
                                        mask=1.0 - mask,
                                        invert_mask=True)],
        **kw,
    )["images"]
    np.testing.assert_array_equal(plain, flipped)


def test_preprocessor_options_canny_thresholds(manager):
    """Per-unit ``preprocessor_options`` forward detector knobs (reference:
    the Canny low/high threshold sliders, app.py:707-709)."""
    rs = np.random.RandomState(1)
    img = (rs.rand(64, 64, 3) * 255).astype(np.uint8) / 255.0
    from diffusionspatialcontrol_tpu.app.api import _maybe_preprocess

    loose = _maybe_preprocess(manager, ControlNetUnit(
        model="Canny", image=img, preprocessor="Canny",
        preprocessor_options={"low": 20.0, "high": 40.0}))
    tight = _maybe_preprocess(manager, ControlNetUnit(
        model="Canny", image=img, preprocessor="Canny",
        preprocessor_options={"low": 200.0, "high": 250.0}))
    assert loose.shape == tight.shape == (64, 64, 3)
    # looser thresholds keep strictly more edge pixels
    assert loose.sum() > tight.sum()


def test_latent_preview_base_hires_split(manager):
    """``latent_preview="base"/"hires"`` mirror the reference's independent
    preview checkboxes (``latent_processing`` vs ``hr_process_enabled``,
    app.py:868/874): each returns only that pass's per-step decodes."""
    kw = dict(
        prompt="a cat", model="tiny", sampler="Euler", steps=3, seed=1,
        width=64, height=64, encoding_mode="short", dtype=jnp.float32,
        hires_scale=2.0, hires_strength=0.5,
    )
    both = inference(manager, latent_preview=True, **kw)["previews"]
    base = inference(manager, latent_preview="base", **kw)["previews"]
    hires = inference(manager, latent_preview="hires", **kw)["previews"]
    assert len(both) == 4 and len(base) == 3 and len(hires) == 1
    assert base[0].shape[1:3] == (64, 64)
    assert hires[0].shape[1:3] == (128, 128)
    np.testing.assert_array_equal(both[0], base[0])
    np.testing.assert_array_equal(both[-1], hires[-1])
    with pytest.raises(ValueError):
        inference(manager, latent_preview="nope", **kw)


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

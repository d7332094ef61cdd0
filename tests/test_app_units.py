"""App layer: conditioning units (ControlNet/T2I/IP-Adapter) through
inference() (split from test_app.py for xdist load spreading)."""
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
    from diffusionspatialcontrol_tpu.models.clip_vision import (
        CLIPVisionConfig,
    )

    m = ModelManager(dtype=jnp.float32)
    m.register_random("tiny", TINY)
    m.register_image_encoder(cfg=CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, projection_dim=32,
    ))
    return m


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


def test_faceid_raw_photo_with_detector(manager):
    """The reference's full FaceAnalysis flow on a RAW photo: SCRFD detect
    -> 5-point align -> embed -> FaceID generation (source/app.py:800-825).
    With a registered detector the FaceID unit's image is treated as a raw
    photo; the aligned crop (not the whole image) feeds the embedder."""
    from diffusionspatialcontrol_tpu.app.api import IPAdapterUnit
    from diffusionspatialcontrol_tpu.models.face_detect import (
        FACEDETECT_TINY,
    )
    from diffusionspatialcontrol_tpu.ops.face_embed import embed_face

    photo = (np.random.RandomState(7).rand(96, 80, 3) * 255).astype(
        np.uint8)
    kwargs = dict(
        prompt="a person", model="tiny", sampler="Euler", steps=2,
        width=64, height=64, encoding_mode="short", dtype=jnp.float32,
    )
    unit = IPAdapterUnit(model="IP-Adapter FaceID", image=photo, scale=0.5)
    base = inference(manager, ip_adapter_units=[unit], **kwargs)

    manager.register_face_detector(cfg=FACEDETECT_TINY, top1_fallback=True)
    try:
        aligner = manager.get_face_aligner()
        crop = aligner(photo)
        assert crop.shape == (112, 112, 3)
        # embedding contract unchanged: the pipeline embeds the CROP
        assert not np.allclose(embed_face(crop), embed_face(photo))
        r = inference(manager, ip_adapter_units=[unit], **kwargs)
        assert r["images"].shape == (1, 64, 64, 3)
        # detector changes the conditioning (crop embeds != photo embeds)
        assert not np.array_equal(r["images"], base["images"])
        # explicit aligned-crop run matches the detector run bitwise
        unit_crop = IPAdapterUnit(model="IP-Adapter FaceID", image=crop,
                                  scale=0.5)
        manager._detector_spec = None
        manager._adapters.pop("face_aligner", None)
        r2 = inference(manager, ip_adapter_units=[unit_crop], **kwargs)
        np.testing.assert_array_equal(r["images"], r2["images"])
        # no-face policy: a threshold nothing clears raises (the reference
        # would crash on faces[0]; we raise a ValueError instead)
        manager.register_face_detector(cfg=FACEDETECT_TINY,
                                       top1_fallback=False)
        manager._adapters["face_aligner"] = lambda img: None
        with pytest.raises(ValueError, match="no face detected"):
            inference(manager, ip_adapter_units=[unit], **kwargs)
    finally:
        manager._detector_spec = None
        manager._adapters.pop("face_aligner", None)

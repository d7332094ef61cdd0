"""App layer: grid/multi-prompt + hires + inpaint e2e paths
(split from test_app.py; these are the heaviest compiles)."""
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


def test_grid_img2img_per_seed_invariance(manager):
    """Grid-mode img2img (VERDICT r4 item 7): per-prompt init images in
    the batched multi-prompt path (reference batched img2img,
    model_k_diffusion.py:543). Every sample must be bitwise identical to
    its equivalent single img2img run — the per-sample PRNG contract."""
    rng = np.random.RandomState(11)
    img_a = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    img_b = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    kwargs = dict(
        model="tiny", sampler="Euler", steps=3, width=64, height=64,
        strength=0.6, encoding_mode="short", dtype=jnp.float32,
    )
    grid = inference(
        manager, prompt=["a red cat", "a blue dog"], seed=[5, 9],
        init_image=[img_a, img_b], **kwargs,
    )
    assert grid["images"].shape == (4, 64, 64, 3)
    solo = inference(manager, prompt="a blue dog", seed=5,
                     init_image=img_b, **kwargs)
    np.testing.assert_array_equal(grid["images"][2], solo["images"][0])
    # one init image can serve every prompt
    shared = inference(
        manager, prompt=["a red cat", "a blue dog"], seed=[5, 9],
        init_image=img_a, **kwargs,
    )
    assert shared["images"].shape == (4, 64, 64, 3)
    assert not np.array_equal(shared["images"][2], grid["images"][2])
    # inpaint stays single-prompt
    with pytest.raises(ValueError, match="inpaint"):
        inference(manager, prompt=["a", "b"], seed=[1, 2],
                  init_image=img_a,
                  inpaint_mask=np.ones((64, 64), np.float32), **kwargs)

"""App layer: sampling modes through inference() — CFG variants,
cancellation, previews, turbo modes (split from test_app.py)."""
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

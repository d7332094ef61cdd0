"""Bottleneck sampling (resolution-scheduled solver phases).

Opt-in acceleration with no reference counterpart (PAPERS.md "Training-free
Diffusion Acceleration with Bottleneck Sampling"): the middle of the solver
schedule runs at a reduced latent resolution, with the model's denoised
estimate resized and re-noised at each boundary.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionspatialcontrol_tpu.config import GenerationConfig
from diffusionspatialcontrol_tpu.models import factory
from diffusionspatialcontrol_tpu.pipeline.pipeline import (
    DenoiseExtras,
    StableDiffusionTPU,
)
from diffusionspatialcontrol_tpu.text.tokenizer import HashTokenizer
from tests.test_pipeline import TINY

GEN = GenerationConfig(height=128, width=128, num_inference_steps=6,
                       dtype=jnp.float32)


@pytest.fixture(scope="module")
def pipe():
    params = factory.init_pipeline_params(
        jax.random.PRNGKey(0), TINY, jnp.float32
    )
    return StableDiffusionTPU(TINY, params, tokenizer=HashTokenizer())


def test_bottleneck_end_to_end(pipe):
    ctx, _ = pipe.encode_prompt(["a cat on a bench"], ["bad"])
    img = pipe.txt2img_bottleneck(ctx, GEN, low_scale=0.5, seed=7)
    assert img.shape == (1, 128, 128, 3)
    assert np.all(np.isfinite(np.asarray(img)))


def test_bottleneck_deterministic_and_differs_from_plain(pipe):
    ctx, _ = pipe.encode_prompt(["a cat"], [""])
    a = pipe.txt2img_bottleneck(ctx, GEN, low_scale=0.5, seed=3,
                                decode=False)
    b = pipe.txt2img_bottleneck(ctx, GEN, low_scale=0.5, seed=3,
                                decode=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    plain = pipe.txt2img(ctx, GEN, seed=3, decode=False)
    assert a.shape == plain.shape
    assert not np.allclose(np.asarray(a), np.asarray(plain))


def test_bottleneck_with_region_state(pipe):
    ctx, ids = pipe.encode_prompt(["a red cat and a blue dog"], [""])
    mask = np.zeros((128, 128), np.float32)
    mask[:, :64] = 1.0
    state = {"red cat": {"mask": mask, "weight": 1.0, "mask_outsides": 0.3}}
    base = pipe.txt2img_bottleneck(ctx, GEN, low_scale=0.5, seed=3,
                                   decode=False)
    controlled = pipe.txt2img_bottleneck(
        ctx, GEN, low_scale=0.5, seed=3, decode=False,
        region_state=([state], ids, 1),
    )
    assert not np.allclose(np.asarray(base), np.asarray(controlled))


def test_bottleneck_region_state_no_cfg(pipe):
    """guidance_scale<=1 (no-CFG fast path): the internal region re-encode
    must NOT produce CFG-doubled biases against an un-doubled batch
    (regression: encode_region was called with its default do_cfg=True)."""
    ctx, ids = pipe.encode_prompt(["a red cat and a blue dog"], [""])
    cond = ctx[ctx.shape[0] // 2:]  # cond half only, as api.inference does
    gen = dataclasses.replace(GEN, guidance_scale=1.0)
    mask = np.zeros((128, 128), np.float32)
    mask[:, :64] = 1.0
    state = {"red cat": {"mask": mask, "weight": 1.0, "mask_outsides": 0.3}}
    out = pipe.txt2img_bottleneck(
        cond, gen, low_scale=0.5, seed=3, decode=False,
        region_state=([state], ids, 1),
    )
    assert out.shape[0] == 1
    assert np.all(np.isfinite(np.asarray(out)))


def test_bottleneck_rejections(pipe):
    ctx, _ = pipe.encode_prompt(["a cat"], [""])
    with pytest.raises(ValueError, match="bottleneck"):
        pipe.txt2img_bottleneck(
            ctx, dataclasses.replace(GEN, sampler="dpmpp_2m_sde"), seed=0)
    t2i = tuple(
        jnp.zeros((2, 16 // 2**i, 16 // 2**i, c))
        for i, c in enumerate(TINY.unet.block_out_channels)
    )
    with pytest.raises(ValueError, match="resolution-bound"):
        pipe.txt2img_bottleneck(
            ctx, GEN, seed=0,
            extras=DenoiseExtras(t2i_residuals=t2i, t2i_active=(1.0,) * 6))
    with pytest.raises(ValueError, match="region_state"):
        pipe.txt2img_bottleneck(
            ctx, GEN, seed=0,
            region_biases=tuple(jnp.zeros((2, 16, 77)) for _ in range(4)))
    with pytest.raises(ValueError, match="middle"):
        pipe.txt2img_bottleneck(ctx, GEN, mid_frac=(0.9, 0.1), seed=0)

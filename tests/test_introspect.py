"""Latent-history + DAAM heatmap tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionspatialcontrol_tpu.introspect import daam
from diffusionspatialcontrol_tpu.models import factory
from diffusionspatialcontrol_tpu.pipeline.pipeline import StableDiffusionTPU
from diffusionspatialcontrol_tpu.text.tokenizer import HashTokenizer
from tests.test_pipeline import GEN, TINY


@pytest.fixture(scope="module")
def pipe():
    params = factory.init_pipeline_params(
        jax.random.PRNGKey(0), TINY, jnp.float32
    )
    return StableDiffusionTPU(TINY, params, tokenizer=HashTokenizer())


def test_latent_history(pipe):
    ctx, _ = pipe.encode_prompt(["a cat"], [""])
    final, hist = pipe.txt2img(ctx, GEN, seed=0, decode=False,
                               return_history=True)
    assert hist.shape == (GEN.num_inference_steps, 1, 8, 8, 4)
    np.testing.assert_array_equal(np.asarray(hist[-1]), np.asarray(final))
    # history also powers the latent-preview gallery
    previews = pipe.decode_latents(hist[:, 0])
    assert previews.shape == (GEN.num_inference_steps, 64, 64, 3)


def test_daam_heatmaps(pipe):
    ctx, ids = pipe.encode_prompt(["a red cat on a bench"], [""])
    final, hist = pipe.txt2img(ctx, GEN, seed=1, decode=False,
                               return_history=True)
    sigmas, _ = pipe._schedule(GEN)
    cond_ctx = ctx[1:]  # cond half
    maps = daam.heatmaps_for_trajectory(
        pipe.params, pipe.model_cfg, hist, sigmas, cond_ctx,
    )
    assert maps.shape == (1, 8, 8, 77)
    assert np.all(np.isfinite(np.asarray(maps)))
    assert float(maps.max()) <= 1.0 + 1e-6
    tok_map = daam.token_heatmap(maps, [1, 2])
    assert tok_map.shape == (1, 8, 8)


def test_region_compliance_monotonic_in_weight(pipe):
    """Attention-mass-inside-mask must increase monotonically with the
    region weight S (the bias directly raises in-mask logits for the
    phrase's tokens), even on random weights — the machine-checkable form
    of the reference's human spatial-control eval (README.md:68-75)."""
    mask = np.zeros((64, 64), np.float32)
    mask[:, :24] = 1.0
    fracs = []
    for w in (0.0, 0.45, 0.9):
        state = {"red cat": {"mask": mask, "weight": w,
                             "mask_outsides": 0.0}}
        c = daam.region_compliance(
            pipe, GEN, "a red cat on a bench", "", state, seed=3)
        assert set(c) == {"red cat"}
        fracs.append(c["red cat"])
    assert all(np.isfinite(fracs))
    assert fracs[0] < fracs[1] < fracs[2], fracs
    # the mask covers 24/64 of the width; the uncontrolled fraction should
    # be in that ballpark, and full weight should pull in well above it
    assert 0.05 < fracs[0] < 0.8

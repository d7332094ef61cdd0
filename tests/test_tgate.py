"""TGATE-style temporal attention decomposition (opt-in acceleration).

PAPERS.md "Faster Diffusion via Temporal Attention Decomposition":
cross-attention outputs converge after the semantics-planning phase; past
the gate step they are frozen (CFG-pair-averaged) and the uncond half is
dropped. No reference counterpart.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionspatialcontrol_tpu.config import GenerationConfig
from diffusionspatialcontrol_tpu.models import factory
from diffusionspatialcontrol_tpu.models.unet import UNetCond, unet_apply
from diffusionspatialcontrol_tpu.pipeline.pipeline import StableDiffusionTPU
from diffusionspatialcontrol_tpu.text.tokenizer import HashTokenizer
from tests.test_pipeline import TINY

GEN = GenerationConfig(height=64, width=64, num_inference_steps=6,
                       dtype=jnp.float32)


@pytest.fixture(scope="module")
def pipe():
    params = factory.init_pipeline_params(
        jax.random.PRNGKey(0), TINY, jnp.float32
    )
    return StableDiffusionTPU(TINY, params, tokenizer=HashTokenizer())


def test_unet_xattn_collect_consume_roundtrip(pipe):
    """collect_xattn returns one entry per cross-attention call, and
    feeding them back via xattn_cache on the same inputs reproduces the
    plain forward exactly (the cache replaces recomputation 1:1)."""
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4), jnp.float32)
    t = jnp.full((2,), 500.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77, TINY.unet.
                                                    cross_attention_dim),
                            jnp.float32)
    cond = UNetCond(context=ctx)
    ref = unet_apply(pipe.params["unet"], TINY.unet, x, t, cond)
    out, xa = unet_apply(pipe.params["unet"], TINY.unet, x, t, cond,
                         collect_xattn=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    n_xattn = sum(
        len(b["attentions"][j]["blocks"])
        for blocks in (pipe.params["unet"]["down_blocks"],
                       pipe.params["unet"]["up_blocks"])
        for b in blocks if b["attentions"]
        for j in range(len(b["attentions"]))
    ) + len(pipe.params["unet"]["mid_block"]["attention"]["blocks"])
    assert len(xa) == n_xattn
    cached = unet_apply(pipe.params["unet"], TINY.unet, x, t, cond,
                        xattn_cache=xa)
    np.testing.assert_array_equal(np.asarray(cached), np.asarray(ref))
    with pytest.raises(ValueError, match="unconsumed"):
        unet_apply(pipe.params["unet"], TINY.unet, x, t, cond,
                   xattn_cache=xa + xa)


def test_tgate_end_to_end_and_gate1_fallback(pipe):
    ctx, _ = pipe.encode_prompt(["a red cat on a bench"], ["bad"])
    img = pipe.txt2img_tgate(ctx, GEN, gate_frac=0.5, seed=7,
                             uint8_output=True)
    assert img.shape == (1, 64, 64, 3)
    assert img.dtype == jnp.uint8
    # gate_frac >= 1 runs the plain path: bitwise identical to txt2img
    a = pipe.txt2img_tgate(ctx, GEN, gate_frac=1.0, seed=3, decode=False)
    b = pipe.txt2img(ctx, GEN, seed=3, decode=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tgate_deterministic_and_differs_from_plain(pipe):
    ctx, _ = pipe.encode_prompt(["a cat"], [""])
    a = pipe.txt2img_tgate(ctx, GEN, gate_frac=0.5, seed=3, decode=False)
    b = pipe.txt2img_tgate(ctx, GEN, gate_frac=0.5, seed=3, decode=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    plain = pipe.txt2img(ctx, GEN, seed=3, decode=False)
    assert a.shape == plain.shape
    assert not np.allclose(np.asarray(a), np.asarray(plain))


def test_tgate_no_cfg_and_region(pipe):
    ctx, ids = pipe.encode_prompt(["a red cat and a blue dog"], [""])
    mask = np.zeros((64, 64), np.float32)
    mask[:, :32] = 1.0
    state = {"red cat": {"mask": mask, "weight": 1.0, "mask_outsides": 0.3}}
    biases = pipe.encode_region([state], ids, height=64, width=64)
    controlled = pipe.txt2img_tgate(ctx, GEN, gate_frac=0.5, seed=3,
                                    region_biases=biases, decode=False)
    base = pipe.txt2img_tgate(ctx, GEN, gate_frac=0.5, seed=3, decode=False)
    assert not np.allclose(np.asarray(controlled), np.asarray(base))
    # guidance off: cache applies without CFG averaging
    cond = ctx[ctx.shape[0] // 2:]
    gen1 = dataclasses.replace(GEN, guidance_scale=1.0)
    out = pipe.txt2img_tgate(cond, gen1, gate_frac=0.5, seed=3, decode=False)
    assert np.all(np.isfinite(np.asarray(out)))


def test_tgate_rejects_unsupported_sampler(pipe):
    ctx, _ = pipe.encode_prompt(["a cat"], [""])
    with pytest.raises(ValueError, match="tgate"):
        pipe.txt2img_tgate(
            ctx, dataclasses.replace(GEN, sampler="dpmpp_2m_sde"),
            gate_frac=0.5, seed=0)

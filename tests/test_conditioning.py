"""ControlNet / T2I-Adapter / inpaint / hires-fix integration tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionspatialcontrol_tpu.config import T2IAdapterConfig
from diffusionspatialcontrol_tpu.models import factory
from diffusionspatialcontrol_tpu.models.controlnet import (
    controlnet_apply,
    controlnet_init,
)
from diffusionspatialcontrol_tpu.models.t2i_adapter import (
    t2i_adapter_apply,
    t2i_adapter_init,
)
from diffusionspatialcontrol_tpu.pipeline.pipeline import StableDiffusionTPU
from diffusionspatialcontrol_tpu.text.tokenizer import HashTokenizer
from tests.test_pipeline import GEN, TINY


@pytest.fixture(scope="module")
def pipe():
    params = factory.init_pipeline_params(
        jax.random.PRNGKey(0), TINY, jnp.float32
    )
    return StableDiffusionTPU(TINY, params, tokenizer=HashTokenizer())


@pytest.fixture(scope="module")
def cn_params():
    return controlnet_init(jax.random.PRNGKey(1), TINY.unet,
                           dtype=jnp.float32)


def test_controlnet_output_shapes(cn_params):
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.array([500.0, 500.0])
    ctx = jnp.zeros((2, 77, 64))
    img = jnp.zeros((2, 64, 64, 3))
    down, mid = controlnet_apply(cn_params, TINY.unet, x, t, ctx, img)
    assert len(down) == 12
    assert down[0].shape == (2, 8, 8, 32)
    assert mid.shape == (2, 1, 1, 128)


def test_fresh_controlnet_is_noop(cn_params):
    """Zero-initialized heads -> all residuals exactly zero (diffusers
    init parity)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    t = jnp.array([100.0])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 64))
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    down, mid = controlnet_apply(cn_params, TINY.unet, x, t, ctx, img)
    for r in down:
        assert float(jnp.abs(r).max()) == 0.0
    assert float(jnp.abs(mid).max()) == 0.0


def test_t2i_adapter_shapes():
    cfg = T2IAdapterConfig(channels=(32, 64, 128, 128))
    params = t2i_adapter_init(jax.random.PRNGKey(0), cfg, jnp.float32)
    img = jnp.zeros((1, 64, 64, 3))
    feats = t2i_adapter_apply(params, cfg, img)
    assert [f.shape for f in feats] == [
        (1, 8, 8, 32), (1, 4, 4, 64), (1, 2, 2, 128), (1, 1, 1, 128)
    ]


def test_txt2img_with_controlnet(pipe, cn_params):
    ctx, _ = pipe.encode_prompt(["a cat"], [""])
    img = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32
    )
    extras = pipe.build_controlnet_extras(
        GEN, [cn_params], [img], scales=[1.0]
    )
    out = pipe.txt2img(ctx, GEN, seed=0, extras=extras, decode=False)
    assert np.all(np.isfinite(np.asarray(out)))
    # zero-init controlnet -> identical to no controlnet
    base = pipe.txt2img(ctx, GEN, seed=0, decode=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)


def test_controlnet_keep_window():
    from diffusionspatialcontrol_tpu.pipeline.pipeline import (
        controlnet_keep_schedule,
    )

    keeps = controlnet_keep_schedule(10, [0.0, 0.3], [1.0, 0.7])
    np.testing.assert_array_equal(keeps[0], np.ones(10))
    # unit 2 active only for steps with i/10 >= 0.3 and (i+1)/10 <= 0.7
    np.testing.assert_array_equal(
        keeps[1], [0, 0, 0, 1, 1, 1, 1, 0, 0, 0]
    )


def test_txt2img_with_t2i_adapter(pipe):
    cfg = T2IAdapterConfig(channels=(32, 64, 128, 128))
    ad = t2i_adapter_init(jax.random.PRNGKey(3), cfg, jnp.float32)
    ctx, _ = pipe.encode_prompt(["a cat"], [""])
    img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                      jnp.float32)
    extras = pipe.build_t2i_extras(GEN, [ad], [img], scales=[0.8],
                                   conditioning_factor=0.5)
    out = pipe.txt2img(ctx, GEN, seed=0, extras=extras, decode=False)
    base = pipe.txt2img(ctx, GEN, seed=0, decode=False)
    assert np.all(np.isfinite(np.asarray(out)))
    assert not np.allclose(np.asarray(out), np.asarray(base))


def test_inpaint_shapes_finite(pipe):
    ctx, _ = pipe.encode_prompt(["a cat"], [""])
    init = jnp.asarray(
        np.random.RandomState(1).uniform(-0.5, 0.5, (1, 64, 64, 3)),
        jnp.float32,
    )
    mask = np.zeros((1, 64, 64), np.float32)
    mask[:, :32, :] = 1.0  # regenerate top half
    out = pipe.inpaint(ctx, init, jnp.asarray(mask), GEN, seed=2,
                       decode=False)
    assert out.shape == (1, 8, 8, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_inpaint_runs_and_blends(pipe):
    ctx, _ = pipe.encode_prompt(["a cat"], [""])
    init = jnp.zeros((1, 64, 64, 3), jnp.float32)
    mask = np.zeros((1, 64, 64), np.float32)
    mask[:, :32, :] = 1.0
    a = pipe.inpaint(ctx, init, jnp.asarray(mask), GEN, seed=2, decode=False)
    full_mask = np.ones((1, 64, 64), np.float32)
    b = pipe.inpaint(ctx, init, jnp.asarray(full_mask), GEN, seed=2,
                     decode=False)
    # different masks must give different outputs
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_hires_fix(pipe):
    ctx, _ = pipe.encode_prompt(["a cat"], [""])
    out = pipe.txt2img(
        ctx, GEN, seed=0,
        hires={"scale": 2.0, "strength": 0.5, "mode": "bilinear"},
    )
    assert out.shape == (1, 128, 128, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_upscale_mode_parsing():
    from diffusionspatialcontrol_tpu.ops.resize import parse_upscale_mode

    assert parse_upscale_mode("Latent (bicubic antialiased)") == (
        "bicubic", True
    )
    assert parse_upscale_mode("Latent (nearest-exact)") == (
        "nearest-exact", False
    )


def test_hires_with_region_reencode(pipe):
    ctx, ids = pipe.encode_prompt(["a red cat"], [""])
    mask = np.zeros((64, 64), np.float32)
    mask[:, :32] = 1.0
    state = {"red cat": {"mask": mask, "weight": 1.0, "mask_outsides": 0.0}}
    biases = pipe.encode_region([state], ids, height=64, width=64)
    out = pipe.txt2img(
        ctx, GEN, seed=0, region_biases=biases,
        hires={"scale": 2.0, "strength": 0.5,
               "region_state": ([state], ids, 1)},
    )
    assert out.shape == (1, 128, 128, 3)
    # with region at hires vs without -> different results
    out2 = pipe.txt2img(
        ctx, GEN, seed=0, region_biases=biases,
        hires={"scale": 2.0, "strength": 0.5},
    )
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_hires_region_reencode_no_cfg(pipe):
    """guidance_scale<=1 + hires + region_state: the hires pass re-encodes
    biases WITHOUT CFG doubling (regression: encode_region defaulted to
    do_cfg=True, producing 2B biases against a B-batch cond-only context)."""
    ctx, ids = pipe.encode_prompt(["a red cat"], [""])
    cond = ctx[ctx.shape[0] // 2:]
    gen = dataclasses.replace(GEN, guidance_scale=1.0)
    mask = np.zeros((64, 64), np.float32)
    mask[:, :32] = 1.0
    state = {"red cat": {"mask": mask, "weight": 1.0, "mask_outsides": 0.0}}
    biases = pipe.encode_region([state], ids, height=64, width=64,
                                do_cfg=False)
    out = pipe.txt2img(
        cond, gen, seed=0, region_biases=biases,
        hires={"scale": 2.0, "strength": 0.5,
               "region_state": ([state], ids, 1)},
    )
    assert out.shape == (1, 128, 128, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_hires_with_controlnet_rebuilds_extras(pipe, cn_params):
    """Hires + ControlNet: extras are re-prepared at the target resolution
    via hires['rebuild_extras'] (reference re-prepares cond images inside
    its hires recursion, model_k_diffusion.py:1206-1212)."""
    ctx, _ = pipe.encode_prompt(["a cat"], [""])
    raw = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)

    def rebuild(gen_for):
        img = jax.image.resize(
            jnp.asarray(raw), (gen_for.height, gen_for.width, 3), "bilinear"
        )[None]
        return pipe.build_controlnet_extras(
            gen_for, [cn_params], [img], scales=[1.0]
        )

    out = pipe.txt2img(
        ctx, GEN, seed=0, extras=rebuild(GEN),
        hires={"scale": 2.0, "strength": 0.5, "rebuild_extras": rebuild},
    )
    assert out.shape == (1, 128, 128, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_hires_with_base_res_unit_extras_raises(pipe, cn_params):
    """Base-resolution ControlNet extras cannot drive the hires pass; the
    pipeline must reject them instead of tracing into a shape mismatch."""
    ctx, _ = pipe.encode_prompt(["a cat"], [""])
    img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                      jnp.float32)
    extras = pipe.build_controlnet_extras(GEN, [cn_params], [img],
                                          scales=[1.0])
    with pytest.raises(ValueError, match="rebuild_extras"):
        pipe.txt2img(ctx, GEN, seed=0, extras=extras,
                     hires={"scale": 2.0, "strength": 0.5})


def test_hires_with_t2i_rebuilds_extras(pipe):
    cfg = T2IAdapterConfig(channels=(32, 64, 128, 128))
    ad = t2i_adapter_init(jax.random.PRNGKey(3), cfg, jnp.float32)
    ctx, _ = pipe.encode_prompt(["a cat"], [""])
    raw = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)

    def rebuild(gen_for):
        img = jax.image.resize(
            jnp.asarray(raw), (gen_for.height, gen_for.width, 3), "bilinear"
        )[None]
        return pipe.build_t2i_extras(gen_for, [ad], [img], scales=[0.8],
                                     conditioning_factor=0.5)

    out = pipe.txt2img(
        ctx, GEN, seed=0, extras=rebuild(GEN),
        hires={"scale": 2.0, "strength": 0.5, "rebuild_extras": rebuild},
    )
    assert out.shape == (1, 128, 128, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    base = pipe.txt2img(ctx, GEN, seed=0,
                        hires={"scale": 2.0, "strength": 0.5})
    assert not np.allclose(np.asarray(out), np.asarray(base))


def test_hires_preview_covers_both_passes(pipe):
    """return_history through hires returns both passes' per-step latents
    (reference spans base + hires decodes, model_k_diffusion.py:1221-1224)."""
    out, hists = pipe.txt2img(
        ctx := pipe.encode_prompt(["a cat"], [""])[0], GEN, seed=0,
        hires={"scale": 2.0, "strength": 0.5}, return_history=True,
    )
    assert out.shape == (1, 128, 128, 3)
    assert isinstance(hists, list) and len(hists) == 2
    base_hist, hr_hist = hists
    assert base_hist.shape[-3:-1] == (8, 8)
    assert hr_hist.shape[-3:-1] == (16, 16)
    assert base_hist.shape[0] > 0 and hr_hist.shape[0] > 0


def test_img2img_and_inpaint_history(pipe):
    ctx, _ = pipe.encode_prompt(["a cat"], [""])
    init = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    out, hist = pipe.img2img(ctx, init, GEN, strength=0.5, seed=1,
                             decode=False, return_history=True)
    assert hist.shape[1:] == out.shape
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    mask = jnp.asarray(np.ones((1, 64, 64), np.float32))
    out2, hist2 = pipe.inpaint(ctx, img, mask, GEN, seed=1, decode=False,
                               return_history=True)
    assert hist2.shape[1:] == out2.shape


def test_hires_with_seed_list(pipe):
    """Per-sample seed lists survive the hires recursion (the hires pass
    derives seed+1 per sample) and stay batch-composition invariant."""
    ctx2, _ = pipe.encode_prompt(["a cat"] * 2, [""] * 2)
    ctx1, _ = pipe.encode_prompt(["a cat"], [""])
    hires = {"scale": 2.0, "strength": 0.5, "mode": "bilinear"}
    batch = pipe.txt2img(ctx2, GEN, seed=[7, 9], hires=dict(hires))
    assert batch.shape == (2, 128, 128, 3)
    solo = pipe.txt2img(ctx1, GEN, seed=[9], hires=dict(hires))
    np.testing.assert_allclose(
        np.asarray(batch[1]), np.asarray(solo[0]), atol=1e-4
    )


def test_img2img_seed_list_batch_invariance(pipe):
    ctx2, _ = pipe.encode_prompt(["a cat"] * 2, [""] * 2)
    ctx1, _ = pipe.encode_prompt(["a cat"], [""])
    init = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 4))
    batch = pipe.img2img(ctx2, init, GEN, strength=0.5, seed=[5, 6],
                         decode=False)
    solo = pipe.img2img(ctx1, init[1:], GEN, strength=0.5, seed=[6],
                        decode=False)
    np.testing.assert_allclose(
        np.asarray(batch[1]), np.asarray(solo[0]), atol=1e-4
    )
    with pytest.raises(ValueError):
        pipe.img2img(ctx2, init, GEN, seed=[1, 2, 3])


def test_inpaint_seed_list(pipe):
    ctx, _ = pipe.encode_prompt(["a cat"], [""])
    init = jnp.zeros((1, 64, 64, 3), jnp.float32)
    mask = jnp.asarray(np.ones((1, 64, 64), np.float32))
    a = pipe.inpaint(ctx, init, mask, GEN, seed=[4], decode=False)
    b = pipe.inpaint(ctx, init, mask, GEN, seed=[4], decode=False)
    c = pipe.inpaint(ctx, init, mask, GEN, seed=[5], decode=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_inpaint_asymmetric_vae_preset():
    """9-ch inpaint UNet + asymmetric VAE preset end-to-end, random-init
    (reference: AsymmetricAutoencoderKL-aware decode,
    model_diffusers.py:1516-1549)."""
    import dataclasses as _dc

    from diffusionspatialcontrol_tpu.config import sd15_asym_inpaint_config

    asym_cfg = sd15_asym_inpaint_config()
    tiny_asym = _dc.replace(
        TINY,
        unet=_dc.replace(TINY.unet, in_channels=9),
        vae=_dc.replace(
            TINY.vae, asymmetric=True,
            decoder_layers_per_block=TINY.vae.layers_per_block,
        ),
    )
    assert asym_cfg.vae.asymmetric and asym_cfg.unet.in_channels == 9
    params = factory.init_pipeline_params(
        jax.random.PRNGKey(0), tiny_asym, jnp.float32
    )
    pipe = StableDiffusionTPU(tiny_asym, params, tokenizer=HashTokenizer())
    ctx, _ = pipe.encode_prompt(["a cat"], [""])
    init = jnp.zeros((1, 64, 64, 3), jnp.float32)
    mask = np.zeros((1, 64, 64), np.float32)
    mask[:, :, 32:] = 1.0
    out = pipe.inpaint(ctx, init, jnp.asarray(mask), GEN, seed=1)
    assert out.shape == (1, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    # the conditioned decode must consume the known pixels: different init
    # images give different outputs even with identical latents/mask
    init2 = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.5
    out2 = pipe.inpaint(ctx, init2, jnp.asarray(mask), GEN, seed=1)
    assert not np.allclose(np.asarray(out), np.asarray(out2))

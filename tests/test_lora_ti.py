"""LoRA merge and textual-inversion injection tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionspatialcontrol_tpu.convert import lora as lora_mod
from diffusionspatialcontrol_tpu.convert.textual_inversion import (
    EmbeddingTokenizer,
    add_embeddings,
)
from diffusionspatialcontrol_tpu.models.clip import clip_init
from diffusionspatialcontrol_tpu.models.unet import unet_init
from diffusionspatialcontrol_tpu.text.tokenizer import HashTokenizer
from tests.test_pipeline import TINY


@pytest.fixture()
def params():
    return {
        "unet": unet_init(jax.random.PRNGKey(0), TINY.unet, jnp.float32),
        "clip": clip_init(jax.random.PRNGKey(1), TINY.clip, jnp.float32),
    }


def test_lora_merge_linear(params):
    rank = 4
    # target: down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q
    target = params["unet"]["down_blocks"][0]["attentions"][0]["blocks"][0][
        "attn1"
    ]["to_q"]
    before = np.asarray(target["kernel"], np.float32)
    o, i = before.shape[1], before.shape[0]
    rng = np.random.RandomState(0)
    down = rng.randn(rank, i).astype(np.float32)
    up = rng.randn(o, rank).astype(np.float32)
    sd = {
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_"
        "to_q.lora_down.weight": down,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_"
        "to_q.lora_up.weight": up,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_"
        "to_q.alpha": np.float32(rank),
    }
    lora_mod.merge_lora(params, sd, scale=0.5)
    after = np.asarray(target["kernel"], np.float32)
    want = before + 0.5 * (up @ down).T
    np.testing.assert_allclose(after, want, rtol=1e-5, atol=1e-6)


def test_lora_merge_text_encoder(params):
    target = params["clip"]["layers"][0]["q_proj"]
    before = np.asarray(target["kernel"], np.float32)
    i, o = before.shape
    rng = np.random.RandomState(1)
    down = rng.randn(2, i).astype(np.float32)
    up = rng.randn(o, 2).astype(np.float32)
    sd = {
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj.lora_down"
        ".weight": down,
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj.lora_up"
        ".weight": up,
    }
    lora_mod.merge_lora(params, sd, scale=1.0)
    after = np.asarray(target["kernel"], np.float32)
    np.testing.assert_allclose(after, before + (up @ down).T, rtol=1e-5)


def test_lora_ff_and_conv_names(params):
    """ff.net.0.proj and proj_out (1x1 conv) resolve."""
    idx = lora_mod._module_index(params["unet"])
    assert (
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj"
        in idx
    )
    assert "mid_block.attentions.0.transformer_blocks.0.attn2.to_k" in idx
    assert "down_blocks.0.downsamplers.0.conv" in idx

    # merge a 1x1 conv lora on proj_in
    target = params["unet"]["down_blocks"][0]["attentions"][0]["proj_in"]
    before = np.asarray(target["kernel"], np.float32)  # (1, 1, C, C)
    c = before.shape[-1]
    rng = np.random.RandomState(2)
    down = rng.randn(2, c, 1, 1).astype(np.float32)
    up = rng.randn(c, 2, 1, 1).astype(np.float32)
    sd = {
        "lora_unet_down_blocks_0_attentions_0_proj_in.lora_down.weight":
            down,
        "lora_unet_down_blocks_0_attentions_0_proj_in.lora_up.weight": up,
    }
    lora_mod.merge_lora(params, sd, scale=1.0)
    after = np.asarray(target["kernel"], np.float32)
    want = before + (
        up.reshape(c, 2) @ down.reshape(2, c)
    ).T[None, None]
    np.testing.assert_allclose(after, want, rtol=1e-5)


def test_lora_unmatched_raises(params):
    sd = {
        "lora_unet_nonexistent_module.lora_down.weight": np.zeros((2, 4)),
        "lora_unet_nonexistent_module.lora_up.weight": np.zeros((4, 2)),
    }
    with pytest.raises(ValueError):
        lora_mod.merge_lora(params, sd)


def test_textual_inversion_injection():
    import dataclasses

    cfg = dataclasses.replace(TINY.clip, vocab_size=49408)
    clip_params = clip_init(jax.random.PRNGKey(0), cfg, jnp.float32)
    # pad table by 8 slots (as convert_clip would)
    clip_params["token_embedding"] = jnp.concatenate(
        [clip_params["token_embedding"],
         jnp.zeros((8, cfg.hidden_size), jnp.float32)]
    )
    tok = HashTokenizer()
    vecs = np.random.RandomState(0).randn(3, cfg.hidden_size).astype(
        np.float32
    )
    new_params, wrapped = add_embeddings(
        clip_params, tok, {"mychar": vecs}, vocab_size=49408
    )
    # trigger word becomes 3 consecutive new ids
    ids = wrapped.encode("a photo of mychar smiling",
                         add_special_tokens=False)
    assert ids.count(49408) == 1 and ids.count(49409) == 1
    pos = ids.index(49408)
    assert ids[pos : pos + 3] == [49408, 49409, 49410]
    # rows installed
    np.testing.assert_allclose(
        np.asarray(new_params["token_embedding"][49408:49411]), vecs,
        atol=1e-6,
    )
    # non-trigger words unaffected
    base_ids = tok.encode("a photo of", add_special_tokens=False)
    assert ids[:pos] == base_ids


def test_textual_inversion_word_boundary():
    tok = EmbeddingTokenizer(HashTokenizer())
    tok.next_id = 1000
    tok.register("char", 1)
    ids = tok.tokenize_to_ids("characters are not char, ok")
    assert ids.count(1000) == 1

"""Golden tests for A1111 prompt parsing/encoding (cases from the reference
docstrings, prompt_parser.py:317-337)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionspatialcontrol_tpu.config import CLIPTextConfig
from diffusionspatialcontrol_tpu.models.clip import clip_init
from diffusionspatialcontrol_tpu.text import prompt_parser as pp
from diffusionspatialcontrol_tpu.text.tokenizer import HashTokenizer


def test_parse_normal_text():
    assert pp.parse_prompt_attention("normal text") == [["normal text", 1.0]]


def test_parse_important_word():
    assert pp.parse_prompt_attention("an (important) word") == [
        ["an ", 1.0],
        ["important", 1.1],
        [" word", 1.0],
    ]


def test_parse_unbalanced():
    assert pp.parse_prompt_attention("(unbalanced") == [["unbalanced", 1.1]]


def test_parse_literal():
    assert pp.parse_prompt_attention(r"\(literal\]") == [["(literal]", 1.0]]


def test_parse_unnecessary_parens():
    assert pp.parse_prompt_attention("(unnecessary)(parens)") == [
        ["unnecessaryparens", 1.1]
    ]


def test_parse_complex_golden():
    got = pp.parse_prompt_attention(
        "a (((house:1.3)) [on] a (hill:0.5), sun, (((sky)))."
    )
    want = [
        ["a ", 1.0],
        ["house", 1.5730000000000004],
        [" ", 1.1],
        ["on", 1.0],
        [" a ", 1.1],
        ["hill", 0.55],
        [", sun, ", 1.1],
        ["sky", 1.4641000000000006],
        [".", 1.1],
    ]
    assert len(got) == len(want)
    for (gt, gw), (wt, ww) in zip(got, want):
        assert gt == wt
        assert abs(gw - ww) < 1e-9


def test_parse_explicit_weight():
    assert pp.parse_prompt_attention("(word:3.12)") == [["word", 3.12]]


def test_parse_break():
    got = pp.parse_prompt_attention("before BREAK after")
    assert ["BREAK", -1] in got


def test_tokenize_line_short():
    tok = HashTokenizer()
    chunks, count = pp.tokenize_line(tok, "a cat on a bench")
    assert len(chunks) == 1
    assert len(chunks[0].tokens) == 77
    assert chunks[0].tokens[0] == tok.bos_token_id
    assert chunks[0].tokens[-1] == tok.eos_token_id
    assert all(m == 1.0 for m in chunks[0].multipliers)


def test_tokenize_line_weights_applied():
    tok = HashTokenizer()
    chunks, _ = pp.tokenize_line(tok, "a (cat:1.5) here")
    mults = chunks[0].multipliers
    assert 1.5 in mults
    assert mults[0] == 1.0  # bos


def test_tokenize_line_long_prompt_chunking():
    tok = HashTokenizer()
    words = " ".join(f"w{i}" for i in range(100))
    chunks, count = pp.tokenize_line(tok, words)
    assert len(chunks) == 2
    assert all(len(c.tokens) == 77 for c in chunks)


def test_tokenize_line_break_splits_chunks():
    tok = HashTokenizer()
    chunks, _ = pp.tokenize_line(tok, "first part BREAK second part")
    assert len(chunks) == 2


def test_comma_backtrack():
    """Tokens after the last comma near the 75-boundary move to the next
    chunk (A1111 comma_padding_backtrack=20)."""
    tok = HashTokenizer()
    # 70 words, comma, then 10 more words -> the 10 words after the comma
    # should start chunk 2 rather than splitting mid-phrase
    text = " ".join(f"w{i}" for i in range(70)) + ", " + " ".join(
        f"x{i}" for i in range(10)
    )
    chunks, _ = pp.tokenize_line(tok, text)
    assert len(chunks) == 2
    # chunk 2 contains all the x tokens
    x_ids = [tok.tokenize_to_ids(f"x{i}")[0] for i in range(10)]
    chunk2 = chunks[1].tokens
    for xid in x_ids:
        assert xid in chunk2


SMALL = CLIPTextConfig(vocab_size=49408, hidden_size=32,
                       intermediate_size=64, num_layers=2, num_heads=2)


@pytest.fixture(scope="module")
def clip_small():
    return clip_init(jax.random.PRNGKey(0), SMALL, jnp.float32)


def test_encode_prompt_a1111_shapes(clip_small):
    tok = HashTokenizer()
    ctx, ids = pp.encode_prompt_a1111(
        clip_small, SMALL, tok, ["a (red:1.3) cat"], ["bad quality"]
    )
    assert ctx.shape == (2, 77, 32)
    assert len(ids) == 1 and len(ids[0]) == 77


def test_encode_prompt_a1111_long_gets_multiple_chunks(clip_small):
    tok = HashTokenizer()
    long_prompt = " ".join(f"w{i}" for i in range(100))
    ctx, ids = pp.encode_prompt_a1111(
        clip_small, SMALL, tok, [long_prompt], [""]
    )
    assert ctx.shape == (2, 154, 32)
    assert len(ids[0]) == 154


def test_encode_prompt_a1111_weight_changes_embedding(clip_small):
    tok = HashTokenizer()
    a, _ = pp.encode_prompt_a1111(clip_small, SMALL, tok, ["a red cat"], [""])
    b, _ = pp.encode_prompt_a1111(
        clip_small, SMALL, tok, ["a (red:1.8) cat"], [""]
    )
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # mean restoration keeps the overall pair mean stable-ish
    assert abs(float(jnp.mean(a)) - float(jnp.mean(b))) < 0.05


def test_encode_prompt_long_shapes(clip_small):
    tok = HashTokenizer()
    ctx, ids = pp.encode_prompt_long(
        clip_small, SMALL, tok, ["a (red:1.3) cat"], ["bad"]
    )
    assert ctx.shape == (2, 77, 32)
    assert len(ids[0]) == 77


def test_encode_prompt_long_multichunk(clip_small):
    tok = HashTokenizer()
    long_prompt = " ".join(f"w{i}" for i in range(120))
    ctx, ids = pp.encode_prompt_long(
        clip_small, SMALL, tok, [long_prompt], [""]
    )
    assert ctx.shape == (2, 154, 32)
    assert len(ids[0]) == 152  # (75*2)+2 raw ids (pre-rewrap layout)


def test_encoder_mode_dispatch(clip_small):
    from diffusionspatialcontrol_tpu.text.encoder import encode_prompts

    tok = HashTokenizer()
    for mode in ("short", "a1111", "long"):
        ctx, ids = encode_prompts(
            clip_small, SMALL, tok, ["a cat"], [""], mode=mode
        )
        assert ctx.shape[0] == 2
        assert ctx.shape[2] == 32


def test_clip_bpe_algorithm_synthetic_vocab():
    """BPE merge behavior on a hand-built vocab: 'lowest' should merge
    via ranked pairs exactly like the GPT-2/CLIP algorithm."""
    from diffusionspatialcontrol_tpu.text.tokenizer import CLIPTokenizer

    vocab = {}
    for i, tok in enumerate(
        ["<|startoftext|>", "<|endoftext|>", "l", "o", "w", "e", "s", "t",
         "lo", "low", "es", "est", "est</w>", "low</w>", "e</w>", "t</w>",
         "s</w>", "w</w>", "o</w>", "l</w>", ",</w>"]
    ):
        vocab[tok] = i
    tok = CLIPTokenizer(vocab, [("l", "o"), ("lo", "w"), ("e", "s"),
                                ("es", "t</w>"), ("low", "w</w>")])
    # 'lowest': l o w e s t</w> -> lo, low | es, est</w> by merge rank
    ids = tok.tokenize_to_ids("lowest")
    decoded = [k for k, v in tok.encoder.items() if v in ids]
    assert "low" in decoded and "est</w>" in decoded

    # bos/eos wrapping
    full = tok.encode("lowest")
    assert full[0] == vocab["<|startoftext|>"]
    assert full[-1] == vocab["<|endoftext|>"]

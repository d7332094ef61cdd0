"""Region-map encoding + region-biased attention vs reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusionspatialcontrol_tpu.ops import attention as attn_ops
from diffusionspatialcontrol_tpu.ops import region_map


def test_std_unbiased_matches_torch_semantics():
    x = np.random.RandomState(0).randn(3, 5, 7).astype(np.float32)
    ours = float(attn_ops._std_unbiased(jnp.asarray(x)))
    want = float(np.std(x, ddof=1))
    assert abs(ours - want) < 1e-5


def test_region_attention_matches_manual_formula():
    rng = np.random.RandomState(1)
    B, H, L, S, D = 2, 3, 16, 7, 8
    q = rng.randn(B, H, L, D).astype(np.float32)
    k = rng.randn(B, H, S, D).astype(np.float32)
    v = rng.randn(B, H, S, D).astype(np.float32)
    region = rng.randn(B, L, S).astype(np.float32)
    sigma = np.float32(3.7)

    scale = D**-0.5
    logits = np.einsum("bhld,bhsd->bhls", q, k) * scale
    std = np.std(logits, ddof=1)
    w = region * sigma * std
    biased = logits + w[:, None]
    probs = np.exp(biased - biased.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    want = np.einsum("bhls,bhsd->bhld", probs, v)

    got = attn_ops.region_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(region),
        jnp.asarray(sigma),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_region_attention_zero_bias_equals_plain():
    rng = np.random.RandomState(2)
    q = rng.randn(1, 2, 8, 4).astype(np.float32)
    k = rng.randn(1, 2, 5, 4).astype(np.float32)
    v = rng.randn(1, 2, 5, 4).astype(np.float32)
    zero = jnp.zeros((1, 8, 5), jnp.float32)
    a = attn_ops.region_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), zero,
        jnp.asarray(1.0)
    )
    b = attn_ops.attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_phrase_token_counts_ngram_matching():
    prompt = [100, 7, 8, 9, 7, 8, 50]
    counts = region_map.phrase_token_counts(prompt, [[7, 8], [9], [404]])
    # phrase [7,8] occurs at idx 1 and 4
    np.testing.assert_array_equal(
        counts[0], [0, 1, 1, 0, 1, 1, 0]
    )
    np.testing.assert_array_equal(counts[1], [0, 0, 0, 1, 0, 0, 0])
    np.testing.assert_array_equal(counts[2], [0] * 7)


def test_phrase_token_counts_overlapping_accumulates():
    # overlapping occurrences add, matching the reference's `+=`
    prompt = [5, 5, 5]
    counts = region_map.phrase_token_counts(prompt, [[5, 5]])
    np.testing.assert_array_equal(counts[0], [1, 2, 1])


def test_rasterize_biases_shapes_and_signs():
    H = W = 64
    mask = np.zeros((1, H, W), np.float32)
    mask[0, :32, :] = 1.0  # top half
    weights = jnp.asarray([0.5])
    outs = jnp.asarray([0.25])
    counts = jnp.asarray(np.array([[0, 1, 1, 0]], np.float32))
    biases = region_map.rasterize_region_biases(
        jnp.asarray(mask), weights, outs, counts, height=H, width=W
    )
    assert len(biases) == 4
    shapes = [b.shape for b in biases]
    assert shapes == [(64, 4), (16, 4), (4, 4), (1, 4)]
    b0 = np.asarray(biases[0]).reshape(8, 8, 4)
    # inside region: +weight on matched token columns
    np.testing.assert_allclose(b0[0, 0], [0, 0.5, 0.5, 0], atol=1e-6)
    # outside region: -mask_outsides
    np.testing.assert_allclose(b0[7, 0], [0, -0.25, -0.25, 0], atol=1e-6)
    # unmatched token columns stay zero everywhere
    assert np.all(b0[:, :, 0] == 0)


def test_encode_region_state_cfg_layout():
    H = W = 64
    mask = np.zeros((H, W), np.float32)
    mask[:, :32] = 1.0
    state = {"cat": {"mask": mask, "weight": 1.0, "mask_outsides": 0.0}}

    def tok(phrase):
        return {"cat": [7]}[phrase]

    ids = [[49406, 7, 49407, 0]]
    biases = region_map.encode_region_state(
        [state], ids, tok, height=H, width=W, num_images_per_prompt=2,
        do_cfg=True,
    )
    assert len(biases) == 4
    # batch: [u, u, c, c] (uncond duplicated per reference ids quirk)
    assert biases[0].shape == (4, 64, 4)
    np.testing.assert_allclose(
        np.asarray(biases[0][0]), np.asarray(biases[0][2]), atol=0
    )


def test_none_state_gives_zero_biases():
    biases = region_map.encode_region_state(
        [None], [[1, 2]], lambda p: [], height=64, width=64
    )
    for b in biases:
        assert float(jnp.abs(b).sum()) == 0.0


def test_gram_std_matches_direct():
    rng = np.random.RandomState(7)
    q = rng.randn(2, 4, 64, 16).astype(np.float32)
    k = rng.randn(2, 4, 11, 16).astype(np.float32)
    scale = 16**-0.5
    logits = np.einsum("bhld,bhsd->bhls", q, k) * scale
    want = np.std(logits, ddof=1)
    got = float(attn_ops.logits_std_gram(jnp.asarray(q), jnp.asarray(k),
                                         scale))
    assert abs(got - want) / want < 1e-4


def test_fused_region_attention_matches_reference_impl():
    rng = np.random.RandomState(8)
    q = rng.randn(2, 4, 32, 16).astype(np.float32)
    k = rng.randn(2, 4, 9, 16).astype(np.float32)
    v = rng.randn(2, 4, 9, 16).astype(np.float32)
    region = rng.randn(2, 32, 9).astype(np.float32)
    sigma = jnp.asarray(5.0)
    ref = attn_ops.region_attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(region),
        sigma,
    )
    got = attn_ops.region_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(region),
        sigma,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4,
                               atol=2e-5)


def test_multi_prompt_region_states_aligned_layout():
    """Two prompts with different region states: batch layout must be
    [u0, u1, c0, c1] aligned with the context (reference bug fixed — see
    DIVERGENCES.md item 1)."""
    H = W = 64
    m0 = np.zeros((H, W), np.float32)
    m0[:, :32] = 1.0
    m1 = np.zeros((H, W), np.float32)
    m1[:32, :] = 1.0
    s0 = {"cat": {"mask": m0, "weight": 1.0, "mask_outsides": 0.0}}
    s1 = {"dog": {"mask": m1, "weight": 0.5, "mask_outsides": 0.2}}

    toks = {"cat": [7], "dog": [9]}
    ids = [[1, 7, 2, 0], [1, 9, 2, 0]]
    biases = region_map.encode_region_state(
        [s0, s1], ids, lambda p: toks[p], height=H, width=W, do_cfg=True
    )
    b0 = np.asarray(biases[0])  # (4, 64, 4): [u0, u1, c0, c1]
    assert b0.shape == (4, 64, 4)
    # cond rows equal their uncond rows (ids quirk), and prompt 0 != prompt 1
    np.testing.assert_array_equal(b0[0], b0[2])
    np.testing.assert_array_equal(b0[1], b0[3])
    assert not np.array_equal(b0[2], b0[3])
    # prompt 0's bias lives on token column 1 (the 'cat' position)
    assert np.abs(b0[2][:, 1]).max() > 0
    assert np.abs(b0[2][:, 3]).max() == 0

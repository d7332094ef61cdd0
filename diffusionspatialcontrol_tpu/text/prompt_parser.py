"""A1111 prompt-weighting and long-prompt encoders.

Implements the reference's two weighted encoding modes on top of our JAX CLIP:

  * ``parse_prompt_attention``: AUTOMATIC1111 emphasis grammar — (), [],
    (text:w), \\-escapes, BREAK (reference: source/modules/prompt_parser.py:
    303-391; golden cases in its docstring are unit-tested here).
  * A1111 chunked encoding: 75-token chunks with comma backtrack 20, BREAK
    chunk splits, per-chunk bos/eos wrap, z *= multiplier with original-mean
    restoration over the [uncond, cond] pair (prompt_parser.py:50-136,
    196-221; pairing per encoder_prompt_modify.py:760-773).
  * "Long prompt" encoding: community lpw semantics — weighted tokens across
    up to 3x77 chunks, per-chunk re-wrap, per-sample mean restoration
    (encoder_prompt_modify.py:127-388, no_boseos_middle=False default).

Both return ``(context, cond_ids_per_prompt)`` with context stacked
[uncond..., cond...]; the ids (incl. specials/padding) feed the region-map
n-gram matcher exactly as the reference's returned id arrays do.
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import CLIPTextConfig
from ..models.clip import clip_apply

CHUNK_LEN = 75
COMMA_PADDING_BACKTRACK = 20

re_attention = re.compile(
    r"""
\\\(|
\\\)|
\\\[|
\\]|
\\\\|
\\|
\(|
\[|
:([+-]?[.\d]+)\)|
\)|
]|
[^\\()\[\]:]+|
:
""",
    re.X,
)

re_break = re.compile(r"\s*\bBREAK\b\s*", re.S)


def parse_prompt_attention(text: str) -> List[List]:
    """A1111 emphasis parser; see module docstring for grammar."""
    res: List[List] = []
    round_brackets: List[int] = []
    square_brackets: List[int] = []

    round_bracket_multiplier = 1.1
    square_bracket_multiplier = 1 / 1.1

    def multiply_range(start_position, multiplier):
        for p in range(start_position, len(res)):
            res[p][1] *= multiplier

    for m in re_attention.finditer(text):
        tok = m.group(0)
        weight = m.group(1)

        if tok.startswith("\\"):
            res.append([tok[1:], 1.0])
        elif tok == "(":
            round_brackets.append(len(res))
        elif tok == "[":
            square_brackets.append(len(res))
        elif weight is not None and round_brackets:
            multiply_range(round_brackets.pop(), float(weight))
        elif tok == ")" and round_brackets:
            multiply_range(round_brackets.pop(), round_bracket_multiplier)
        elif tok == "]" and square_brackets:
            multiply_range(square_brackets.pop(), square_bracket_multiplier)
        else:
            parts = re.split(re_break, tok)
            for i, part in enumerate(parts):
                if i > 0:
                    res.append(["BREAK", -1])
                res.append([part, 1.0])

    for pos in round_brackets:
        multiply_range(pos, round_bracket_multiplier)

    for pos in square_brackets:
        multiply_range(pos, square_bracket_multiplier)

    if len(res) == 0:
        res = [["", 1.0]]

    i = 0
    while i + 1 < len(res):
        if res[i][1] == res[i + 1][1]:
            res[i][0] += res[i + 1][0]
            res.pop(i + 1)
        else:
            i += 1

    return res


# ---------------------------------------------------------------------------
# A1111 chunked tokenization
# ---------------------------------------------------------------------------


class PromptChunk:
    def __init__(self):
        self.tokens: List[int] = []
        self.multipliers: List[float] = []


def _empty_chunk(id_start, id_end):
    c = PromptChunk()
    c.tokens = [id_start] + [id_end] * (CHUNK_LEN + 1)
    c.multipliers = [1.0] * (CHUNK_LEN + 2)
    return c


def tokenize_line(tokenizer, line: str,
                  enable_emphasis: bool = True) -> Tuple[List[PromptChunk], int]:
    """A1111 FrozenCLIPEmbedderWithCustomWordsBase.tokenize_line
    (reference: prompt_parser.py:50-136)."""
    id_start = tokenizer.bos_token_id
    id_end = tokenizer.eos_token_id
    comma_token = getattr(tokenizer, "comma_token_id", None)

    parsed = parse_prompt_attention(line) if enable_emphasis else [[line, 1.0]]
    tokenized = [
        tokenizer.encode(text, add_special_tokens=False)
        for text, _ in parsed
    ]

    chunks: List[PromptChunk] = []
    chunk = PromptChunk()
    token_count = 0
    last_comma = -1

    def next_chunk(is_last=False):
        nonlocal token_count, last_comma, chunk
        if is_last:
            token_count += len(chunk.tokens)
        else:
            token_count += CHUNK_LEN

        to_add = CHUNK_LEN - len(chunk.tokens)
        if to_add > 0:
            chunk.tokens += [id_end] * to_add
            chunk.multipliers += [1.0] * to_add

        chunk.tokens = [id_start] + chunk.tokens + [id_end]
        chunk.multipliers = [1.0] + chunk.multipliers + [1.0]

        last_comma = -1
        chunks.append(chunk)
        chunk = PromptChunk()

    for tokens, (text, weight) in zip(tokenized, parsed):
        if text == "BREAK" and weight == -1:
            next_chunk()
            continue

        position = 0
        while position < len(tokens):
            token = tokens[position]

            if token == comma_token:
                last_comma = len(chunk.tokens)
            elif (
                COMMA_PADDING_BACKTRACK != 0
                and len(chunk.tokens) == CHUNK_LEN
                and last_comma != -1
                and len(chunk.tokens) - last_comma
                <= COMMA_PADDING_BACKTRACK
            ):
                break_location = last_comma + 1
                reloc_tokens = chunk.tokens[break_location:]
                reloc_mults = chunk.multipliers[break_location:]
                chunk.tokens = chunk.tokens[:break_location]
                chunk.multipliers = chunk.multipliers[:break_location]
                next_chunk()
                chunk.tokens = reloc_tokens
                chunk.multipliers = reloc_mults

            if len(chunk.tokens) == CHUNK_LEN:
                next_chunk()

            chunk.tokens.append(token)
            chunk.multipliers.append(weight)
            position += 1

    if len(chunk.tokens) > 0 or len(chunks) == 0:
        next_chunk(is_last=True)

    return chunks, token_count


def encode_prompt_a1111(
    clip_params,
    clip_cfg: CLIPTextConfig,
    tokenizer,
    prompts: Sequence[str],
    negative_prompts: Sequence[str],
    clip_skip: int = 2,
    num_images_per_prompt: int = 1,
) -> Tuple[jnp.ndarray, List[List[int]]]:
    """Mode 0. Per batch item the [uncond_i, cond_i] pair is chunked,
    encoded per 77-token chunk, weighted, mean-restored over the pair, and
    chunks are concatenated on the sequence axis
    (reference: prompt_parser.py:161-221, encoder_prompt_modify.py:760-773).

    Divergence from the reference: all batch items are padded to the global
    max chunk count (the reference would fail to torch.cat mismatched
    lengths for batch > 1)."""
    if len(negative_prompts) == 1 and len(prompts) > 1:
        negative_prompts = list(negative_prompts) * len(prompts)

    id_start, id_end = tokenizer.bos_token_id, tokenizer.eos_token_id

    per_item = []
    max_chunks = 1
    for neg, pos in zip(negative_prompts, prompts):
        c_neg, _ = tokenize_line(tokenizer, neg)
        c_pos, _ = tokenize_line(tokenizer, pos)
        max_chunks = max(max_chunks, len(c_neg), len(c_pos))
        per_item.append((c_neg, c_pos))

    uncond_out, cond_out = [], []
    uncond_ids, cond_ids = [], []
    for c_neg, c_pos in per_item:
        zs, toks = [], []
        for i in range(max_chunks):
            pair = [
                (c_neg[i] if i < len(c_neg)
                 else _empty_chunk(id_start, id_end)),
                (c_pos[i] if i < len(c_pos)
                 else _empty_chunk(id_start, id_end)),
            ]
            tokens = np.asarray([c.tokens for c in pair], np.int32)
            mults = np.asarray([c.multipliers for c in pair], np.float32)
            z = clip_apply(clip_params, clip_cfg, jnp.asarray(tokens),
                           clip_skip=clip_skip).astype(jnp.float32)
            # original-mean restoration over the pair (prompt_parser.py:214-219)
            original_mean = jnp.mean(z)
            z = z * jnp.asarray(mults)[..., None]
            z = z * (original_mean / jnp.mean(z))
            zs.append(z)
            toks.append(tokens)
        z_full = jnp.concatenate(zs, axis=1)  # (2, 77*chunks, C)
        ids_full = np.concatenate(toks, axis=1)  # (2, 77*chunks)
        uncond_out.append(z_full[0])
        cond_out.append(z_full[1])
        uncond_ids.append(list(ids_full[0]))
        cond_ids.append(list(ids_full[1]))

    context = jnp.stack(uncond_out + cond_out)
    if num_images_per_prompt > 1:
        context = jnp.repeat(context, num_images_per_prompt, axis=0)
    return context, [list(map(int, r)) for r in cond_ids]


# ---------------------------------------------------------------------------
# Long-prompt (lpw) encoding
# ---------------------------------------------------------------------------


def _get_prompts_with_weights(tokenizer, prompts, max_length):
    tokens, weights = [], []
    for text in prompts:
        text_token: List[int] = []
        text_weight: List[float] = []
        for word, weight in parse_prompt_attention(text):
            tok = tokenizer.encode(word, add_special_tokens=False)
            text_token += tok
            text_weight += [weight] * len(tok)
            if len(text_token) > max_length:
                break
        tokens.append(text_token[:max_length])
        weights.append(text_weight[:max_length])
    return tokens, weights


def _pad_tokens_and_weights(tokens, weights, max_length, bos, eos, pad,
                            chunk_length=77):
    """no_boseos_middle=False layout (encoder_prompt_modify.py:162-184)."""
    max_embeddings_multiples = (max_length - 2) // (chunk_length - 2)
    weights_length = max_embeddings_multiples * chunk_length
    for i in range(len(tokens)):
        tokens[i] = (
            [bos] + tokens[i] + [pad] * (max_length - 1 - len(tokens[i]) - 1)
            + [eos]
        )
        w: List[float] = []
        if len(weights[i]) == 0:
            w = [1.0] * weights_length
        else:
            for j in range(max_embeddings_multiples):
                w.append(1.0)
                w += weights[i][
                    j * (chunk_length - 2):
                    min(len(weights[i]), (j + 1) * (chunk_length - 2))
                ]
                w.append(1.0)
            w += [1.0] * (weights_length - len(w))
        weights[i] = w[:]
    return tokens, weights


def _encode_chunked(clip_params, clip_cfg, token_array: np.ndarray,
                    clip_skip: int, chunk_length: int = 77):
    """get_unweighted_text_embeddings with no_boseos_middle=False
    (encoder_prompt_modify.py:212-252): encode each re-wrapped chunk, keep
    all positions."""
    n_chunks = (token_array.shape[1] - 2) // (chunk_length - 2)
    if n_chunks <= 1:
        return clip_apply(clip_params, clip_cfg, jnp.asarray(token_array),
                          clip_skip=clip_skip).astype(jnp.float32)
    outs = []
    bos = token_array[0, 0]
    eos = token_array[0, -1]
    for i in range(n_chunks):
        chunk = token_array[
            :, i * (chunk_length - 2): (i + 1) * (chunk_length - 2) + 2
        ].copy()
        chunk[:, 0] = bos
        chunk[:, -1] = eos
        outs.append(
            clip_apply(clip_params, clip_cfg, jnp.asarray(chunk),
                       clip_skip=clip_skip).astype(jnp.float32)
        )
    return jnp.concatenate(outs, axis=1)


def encode_prompt_long(
    clip_params,
    clip_cfg: CLIPTextConfig,
    tokenizer,
    prompts: Sequence[str],
    negative_prompts: Sequence[str],
    clip_skip: int = 2,
    num_images_per_prompt: int = 1,
    max_embeddings_multiples: int = 3,
) -> Tuple[jnp.ndarray, List[List[int]]]:
    """Mode 1 (encoder_prompt_modify.py:254-392)."""
    if len(negative_prompts) == 1 and len(prompts) > 1:
        negative_prompts = list(negative_prompts) * len(prompts)
    chunk_length = 77
    max_length = (chunk_length - 2) * max_embeddings_multiples + 2

    p_tokens, p_weights = _get_prompts_with_weights(
        tokenizer, prompts, max_length - 2
    )
    u_tokens, u_weights = _get_prompts_with_weights(
        tokenizer, negative_prompts, max_length - 2
    )

    longest = max(
        max(len(t) for t in p_tokens), max(len(t) for t in u_tokens)
    )
    mult = min(
        max_embeddings_multiples, (longest - 1) // (chunk_length - 2) + 1
    )
    mult = max(1, mult)
    max_length = (chunk_length - 2) * mult + 2

    bos, eos = tokenizer.bos_token_id, tokenizer.eos_token_id
    pad = getattr(tokenizer, "pad_token_id", eos)
    p_tokens, p_weights = _pad_tokens_and_weights(
        p_tokens, p_weights, max_length, bos, eos, pad, chunk_length
    )
    u_tokens, u_weights = _pad_tokens_and_weights(
        u_tokens, u_weights, max_length, bos, eos, pad, chunk_length
    )

    p_arr = np.asarray(p_tokens, np.int32)
    u_arr = np.asarray(u_tokens, np.int32)
    p_emb = _encode_chunked(clip_params, clip_cfg, p_arr, clip_skip,
                            chunk_length)
    u_emb = _encode_chunked(clip_params, clip_cfg, u_arr, clip_skip,
                            chunk_length)

    # weighting with per-sample mean restore (encoder_prompt_modify.py:379-388)
    def reweight(emb, weights):
        w = jnp.asarray(np.asarray(weights, np.float32))[..., None]
        prev_mean = jnp.mean(emb, axis=(-2, -1), keepdims=True)
        emb = emb * w
        cur_mean = jnp.mean(emb, axis=(-2, -1), keepdims=True)
        return emb * (prev_mean / cur_mean)

    p_emb = reweight(p_emb, p_weights)
    u_emb = reweight(u_emb, u_weights)

    context = jnp.concatenate([u_emb, p_emb], axis=0)
    if num_images_per_prompt > 1:
        context = jnp.repeat(context, num_images_per_prompt, axis=0)
    return context, [list(map(int, r)) for r in p_arr]

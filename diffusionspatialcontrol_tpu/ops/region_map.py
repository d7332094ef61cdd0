"""Region-map encoding: phrase masks -> per-resolution cross-attention biases.

Reference semantics (source/modules/encode_region_map_function.py:21-77),
re-designed so everything after token matching runs device-side under jit:

  host side  : n-gram matching of each phrase's token ids inside the prompt
               ids -> a per-phrase token *count* row (occurrences may overlap
               and accumulate, matching the reference's `+=` at :63);
  device side: binarize mask, bicubic-resize to each UNet level resolution
               (r = 8,16,32,64), re-binarize against the per-phrase max of the
               *rounded* resize (emulating the reference's uint8 cv2 resize +
               `== max` at :50-51), apply strength S (`weight`) inside and
               -S' (`mask_outsides`) outside (:52-53), then one einsum with
               the token counts -> bias (L_r, S_text).

The reference's uncond quirk is reproduced: negative-prompt ids are replaced
by the positive ids before matching (encode_region_map_function.py:91), so
the uncond half of the CFG batch receives the *same* bias as the cond half.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LEVEL_RATIOS = (8, 16, 32, 64)


def phrase_token_counts(prompt_ids: Sequence[int],
                        phrase_ids: Sequence[Sequence[int]]) -> np.ndarray:
    """(P, S) matrix: counts[p, s] = number of occurrences of phrase p's token
    n-gram covering prompt position s (reference loop at
    encode_region_map_function.py:59-69)."""
    prompt_ids = list(prompt_ids)
    s_len = len(prompt_ids)
    counts = np.zeros((len(phrase_ids), s_len), np.float32)
    for p, ids in enumerate(phrase_ids):
        ids = list(ids)
        n = len(ids)
        if n == 0:
            continue
        for idx in range(s_len):
            if prompt_ids[idx : idx + n] == ids:
                counts[p, idx : idx + n] += 1.0
    return counts


def level_shape(height: int, width: int, ratio: int) -> Tuple[int, int]:
    """ceil(H/r), ceil(W/r) (reference: encode_region_map_function.py:31)."""
    return (-(-height // ratio), -(-width // ratio))


@functools.partial(jax.jit, static_argnames=("height", "width"))
def rasterize_region_biases(
    masks: jnp.ndarray,  # (P, Hm, Wm) binary: 1 inside the region
    weights: jnp.ndarray,  # (P,) strengths S
    mask_outsides: jnp.ndarray,  # (P,) anti-strengths S'
    token_counts: jnp.ndarray,  # (P, S_text)
    *,
    height: int,
    width: int,
) -> Tuple[jnp.ndarray, ...]:
    """Returns one (L_r, S_text) fp32 bias per level ratio (8, 16, 32, 64)."""
    p = masks.shape[0]
    masks = masks.astype(jnp.float32)
    out = []
    for ratio in LEVEL_RATIOS:
        h_r, w_r = level_shape(height, width, ratio)
        m = jax.image.resize(masks, (p, h_r, w_r), "cubic")
        # Emulate the reference's uint8 round-trip then ==max binarization.
        m = jnp.round(jnp.clip(m, 0.0, 255.0))
        mx = m.max(axis=(1, 2), keepdims=True)
        m = (m == mx).astype(jnp.float32)
        pix = m * weights[:, None, None] + (1.0 - m) * (
            -mask_outsides[:, None, None]
        )
        pix = pix.reshape(p, h_r * w_r)
        out.append(
            jnp.einsum("pl,ps->ls", pix, token_counts.astype(jnp.float32))
        )
    return tuple(out)


def encode_region_state(
    states: Sequence[Optional[Dict]],
    prompt_ids_per_prompt: Sequence[Sequence[int]],
    phrase_tokenize,  # callable: str -> List[int] (no special tokens)
    *,
    height: int,
    width: int,
    num_images_per_prompt: int = 1,
    do_cfg: bool = True,
) -> Optional[Tuple[jnp.ndarray, ...]]:
    """Full equivalent of the reference's ``encode_region_map``
    (encode_region_map_function.py:79-124) producing the per-level bias
    tensors consumed by the UNet's cross-attention layers.

    ``states``: one per prompt; each maps phrase -> dict with keys ``mask``
    ((H, W) binary array, 1 = inside), ``weight`` (S) and ``mask_outsides``
    (S'). Returns a tuple over levels of (B_cfg, L_r, S_text) arrays where
    the batch axis is [uncond..., cond...] when ``do_cfg`` (uncond == cond by
    the reference's ids quirk), repeated ``num_images_per_prompt`` times.
    """
    n_prompts = len(prompt_ids_per_prompt)
    states = list(states) + [None] * (n_prompts - len(states))
    s_text = len(prompt_ids_per_prompt[0])

    per_prompt: List[Tuple[jnp.ndarray, ...]] = []
    for state, ids in zip(states, prompt_ids_per_prompt):
        if not state:
            per_prompt.append(
                tuple(
                    jnp.zeros((level_shape(height, width, r)[0]
                               * level_shape(height, width, r)[1], s_text),
                              jnp.float32)
                    for r in LEVEL_RATIOS
                )
            )
            continue
        phrases = [k for k, v in state.items() if v.get("mask") is not None]
        masks = np.stack(
            [np.asarray(state[k]["mask"], np.float32) for k in phrases]
        )
        weights = np.array([float(state[k]["weight"]) for k in phrases],
                           np.float32)
        outs = np.array(
            [float(state[k].get("mask_outsides", 0.0)) for k in phrases],
            np.float32,
        )
        counts = phrase_token_counts(
            ids, [phrase_tokenize(k) for k in phrases]
        )
        per_prompt.append(
            rasterize_region_biases(
                jnp.asarray(masks), jnp.asarray(weights), jnp.asarray(outs),
                jnp.asarray(counts), height=height, width=width,
            )
        )

    levels = []
    for li in range(len(LEVEL_RATIOS)):
        stacked = jnp.stack([pp[li] for pp in per_prompt])  # (N, L, S)
        if do_cfg:
            # uncond half duplicates cond (reference ids quirk, :91).
            stacked = jnp.concatenate([stacked, stacked], axis=0)
        stacked = jnp.repeat(stacked, num_images_per_prompt, axis=0)
        levels.append(stacked)
    return tuple(levels)

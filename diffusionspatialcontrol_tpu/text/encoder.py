"""Prompt encoding front-end.

The reference offers three selectable encoding modes
(source/modules/encoder_prompt_modify.py:814 ``encode_prompt_function``):
  0 "Automatic111": A1111 chunked emphasis encoding (prompt_parser.py)
  1 "Long Prompt" : diffusers-community weighted multi-chunk encoder
  2 "Short Prompt": stock 77-token CLIP encode

This module implements mode 2 now ("short"), with modes 0/1 plugged in by
``text.prompt_parser`` (A1111 semantics) as they land. All modes return
``(context, cond_ids_per_prompt)`` where context stacks
[uncond..., cond...] for CFG and the raw cond token ids feed the region-map
n-gram matcher (SURVEY.md §2.2 item 4).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import CLIPTextConfig
from ..models.clip import clip_apply


def tokenize_batch(tokenizer, prompts: Sequence[str],
                   max_length: int = 77) -> np.ndarray:
    rows = []
    for p in prompts:
        ids = tokenizer.encode(p, add_special_tokens=True, truncation=True,
                               max_length=max_length)
        ids = ids + [tokenizer.pad_token_id] * (max_length - len(ids))
        rows.append(ids)
    return np.asarray(rows, np.int32)


def encode_prompts(
    clip_params,
    clip_cfg: CLIPTextConfig,
    tokenizer,
    prompts: List[str],
    negative_prompts: List[str],
    clip_skip: int = 2,
    mode: str = "short",
    num_images_per_prompt: int = 1,
) -> Tuple[jnp.ndarray, List[List[int]]]:
    if mode in ("a1111", "automatic1111"):
        from .prompt_parser import encode_prompt_a1111

        return encode_prompt_a1111(
            clip_params, clip_cfg, tokenizer, prompts, negative_prompts,
            clip_skip=clip_skip,
            num_images_per_prompt=num_images_per_prompt,
        )
    if mode == "long":
        from .prompt_parser import encode_prompt_long

        return encode_prompt_long(
            clip_params, clip_cfg, tokenizer, prompts, negative_prompts,
            clip_skip=clip_skip,
            num_images_per_prompt=num_images_per_prompt,
        )

    if len(negative_prompts) == 1 and len(prompts) > 1:
        negative_prompts = negative_prompts * len(prompts)
    cond_ids = tokenize_batch(tokenizer, prompts,
                              clip_cfg.max_position_embeddings)
    uncond_ids = tokenize_batch(tokenizer, negative_prompts,
                                clip_cfg.max_position_embeddings)
    all_ids = jnp.asarray(np.concatenate([uncond_ids, cond_ids], axis=0))
    context = clip_apply(clip_params, clip_cfg, all_ids, clip_skip=clip_skip)
    if num_images_per_prompt > 1:
        context = jnp.repeat(context, num_images_per_prompt, axis=0)
    return context, [list(r) for r in cond_ids]

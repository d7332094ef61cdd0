"""CLIP text encoder (functional JAX) with clip-skip.

Capability parity with the reference's use of ``transformers.CLIPTextModel``
plus its clip-skip semantics: take ``hidden_states[-clip_skip]`` and apply the
final layer norm (reference: source/modules/prompt_parser.py:267-278 and
encoder_prompt_modify.py:186-205).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import CLIPTextConfig
from .layers import ACTIVATIONS, layer_norm, linear, linear_init, norm_init


def clip_init(key, cfg: CLIPTextConfig, dtype=jnp.bfloat16) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.num_layers + 3)
    d = cfg.hidden_size
    params: Dict[str, Any] = {
        "token_embedding": jax.random.normal(
            keys[0], (cfg.vocab_size, d), jnp.float32
        ).astype(dtype)
        * 0.02,
        "position_embedding": jax.random.normal(
            keys[1], (cfg.max_position_embeddings, d), jnp.float32
        ).astype(dtype)
        * 0.01,
        "layers": [],
        "final_layer_norm": norm_init(d, dtype),
    }
    for i in range(cfg.num_layers):
        k = jax.random.split(keys[2 + i], 6)
        params["layers"].append(
            {
                "layer_norm1": norm_init(d, dtype),
                "q_proj": linear_init(k[0], d, d, dtype=dtype),
                "k_proj": linear_init(k[1], d, d, dtype=dtype),
                "v_proj": linear_init(k[2], d, d, dtype=dtype),
                "out_proj": linear_init(k[3], d, d, dtype=dtype),
                "layer_norm2": norm_init(d, dtype),
                "fc1": linear_init(k[4], d, cfg.intermediate_size, dtype=dtype),
                "fc2": linear_init(k[5], cfg.intermediate_size, d, dtype=dtype),
            }
        )
    return params


def _causal_mask(seq_len: int) -> jnp.ndarray:
    i = jnp.arange(seq_len)[:, None]
    j = jnp.arange(seq_len)[None, :]
    return jnp.where(j <= i, 0.0, -jnp.inf).astype(jnp.float32)


def _clip_attention(p, x, num_heads: int, mask: jnp.ndarray):
    b, l, d = x.shape
    hd = d // num_heads
    scale = hd**-0.5

    def split(t):
        return t.reshape(b, l, num_heads, hd).transpose(0, 2, 1, 3)

    q = split(linear(p["q_proj"], x)) * scale
    k = split(linear(p["k_proj"], x))
    v = split(linear(p["v_proj"], x))
    logits = jnp.einsum("bhld,bhsd->bhls", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhls,bhsd->bhld", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
    return linear(p["out_proj"], out)


def clip_apply(
    params: Dict[str, Any],
    cfg: CLIPTextConfig,
    input_ids: jnp.ndarray,  # (B, 77) int32
    clip_skip: int = 1,
) -> jnp.ndarray:
    """Encode token ids to (B, 77, hidden). ``clip_skip`` k takes the hidden
    state k layers from the end (k=1: final layer), then applies the final
    layer norm — matching A1111/reference semantics
    (prompt_parser.py:267-278: ``clip_skip > 1`` => hidden_states[-clip_skip]
    + final_layer_norm)."""
    act = ACTIVATIONS[cfg.hidden_act]
    x = params["token_embedding"][input_ids]
    x = x + params["position_embedding"][None, : x.shape[1]]
    mask = _causal_mask(x.shape[1])

    n_run = cfg.num_layers - (clip_skip - 1)
    for layer in params["layers"][:n_run]:
        h = layer_norm(layer["layer_norm1"], x)
        x = x + _clip_attention(layer, h, cfg.num_heads, mask)
        h = layer_norm(layer["layer_norm2"], x)
        h = linear(layer["fc2"], act(linear(layer["fc1"], h)))
        x = x + h
    return layer_norm(params["final_layer_norm"], x)

"""Attention ops, including the region-biased cross-attention core.

The novel mechanism of the reference (source/modules/attention_modify.py:74-103,
``scaled_dot_product_attention_regionstate``) is:

    s  = Q @ K^T * scale            (+ optional base attention bias)
    w  = region_state * sigma * std(s)      # std over the WHOLE logits tensor
    a  = softmax(s + broadcast_over_heads(w))
    out = a @ V

Exact semantics reproduced here:
  * ``std`` is the unbiased (ddof=1) standard deviation over all elements of the
    logits tensor *after* the base attention bias has been added
    (attention_modify.py:90-95; torch.Tensor.std default correction=1).
  * The bias ``w`` has shape (B, L, S) and is broadcast across heads
    (the reference's ``repeat_interleave`` over the flattened B*H axis,
    attention_modify.py:96-99).
  * Softmax in float32 (the reference upcasts via ``upcast_softmax``).

This module is the pure-jnp reference implementation; the fused Pallas kernel in
``ops/pallas/region_attention.py`` must match it bit-for-bit in fp32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _std_unbiased(x: jnp.ndarray) -> jnp.ndarray:
    """torch.Tensor.std() equivalent: unbiased, over all elements, in fp32."""
    xf = x.astype(jnp.float32)
    n = xf.size
    mean = jnp.mean(xf)
    # Sample variance with Bessel's correction (torch default correction=1).
    var = jnp.sum((xf - mean) ** 2) / (n - 1)
    return jnp.sqrt(var)


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              scale: Optional[float] = None) -> jnp.ndarray:
    """Plain scaled dot-product attention.

    q: (B, H, L, D); k, v: (B, H, S, D). Returns (B, H, L, D).
    Routed through jax.nn.dot_product_attention (XLA's fused TPU attention:
    ~9x faster than materialized-logits einsum at L=4096) with fp32 softmax
    accumulation; replaces the reference's cuda SDPA / xformers paths
    (attention_modify.py:483, 177-184)."""
    out = jax.nn.dot_product_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        scale=scale,
    )
    return out.transpose(0, 2, 1, 3)


def attention_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        scale: Optional[float] = None) -> jnp.ndarray:
    """Materialized-logits reference implementation (used by tests to pin
    down the fused path's numerics)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhld,bhsd->bhls", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhls,bhsd->bhld", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def region_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     region_state: jnp.ndarray, sigma: jnp.ndarray,
                     weight_scale: float = 1.0,
                     scale: Optional[float] = None) -> jnp.ndarray:
    """Region-biased cross-attention (jnp reference implementation).

    q: (B, H, L, D); k, v: (B, H, S, D); region_state: (B, L, S) — the
    rasterized per-resolution mask bias M with strengths S/S' baked in;
    sigma: scalar current noise level.

    Computes softmax(s + region_state * weight_scale * sigma * std(s)) @ V with
    std taken over the entire (B, H, L, S) logits tensor (matching the
    reference's global ``qk.std()`` at source/modules/model_k_diffusion.py:561
    and attention_modify.py:95).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhld,bhsd->bhls", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * scale
    std = _std_unbiased(logits)
    w = region_state.astype(jnp.float32) * (
        jnp.float32(weight_scale) * sigma.astype(jnp.float32) * std
    )
    logits = logits + w[:, None, :, :]
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhls,bhsd->bhld", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def attention_probs(q: jnp.ndarray, k: jnp.ndarray,
                    region_state: Optional[jnp.ndarray] = None,
                    sigma: Optional[jnp.ndarray] = None,
                    weight_scale: float = 1.0,
                    scale: Optional[float] = None) -> jnp.ndarray:
    """Softmax attention probabilities (B, H, L, S) — used by the DAAM-style
    heatmap introspection path (capability per SURVEY.md §2.2 item 14)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhld,bhsd->bhls", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * scale
    if region_state is not None:
        std = _std_unbiased(logits)
        w = region_state.astype(jnp.float32) * (
            jnp.float32(weight_scale) * sigma.astype(jnp.float32) * std
        )
        logits = logits + w[:, None, :, :]
    return jax.nn.softmax(logits, axis=-1)

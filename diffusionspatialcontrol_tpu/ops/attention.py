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


def logits_std_gram(q: jnp.ndarray, k: jnp.ndarray,
                    scale: float) -> jnp.ndarray:
    """Unbiased std of the full logits tensor s = scale * Q K^T computed
    WITHOUT materializing s, via moment identities:

        sum(s)   = scale * sum_bh <sum_l q, sum_s k>
        sum(s^2) = scale^2 * sum_bh tr(Qgram_bh Kgram_bh),
                   Qgram = sum_l q q^T, Kgram = sum_s k k^T

    O(BH (L+S) D^2) instead of the reference's O(BH L S D) logits pass
    (attention_modify.py:90-95) — this is what makes the spatial-control
    overhead vanish. All accumulation in fp32.
    """
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    n = q.shape[0] * q.shape[1] * q.shape[2] * k.shape[2]
    q_sum = qf.sum(axis=2)  # (B, H, D)
    k_sum = kf.sum(axis=2)
    total = jnp.einsum("bhd,bhd->", q_sum, k_sum) * scale
    q_gram = jnp.einsum("bhld,bhle->bhde", qf, qf)
    k_gram = jnp.einsum("bhsd,bhse->bhde", kf, kf)
    total_sq = jnp.einsum("bhde,bhde->", q_gram, k_gram) * (scale * scale)
    mean = total / n
    var = (total_sq - n * mean * mean) / (n - 1)
    return jnp.sqrt(jnp.maximum(var, 0.0))


def region_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     region_state: jnp.ndarray, sigma: jnp.ndarray,
                     weight_scale: float = 1.0,
                     scale: Optional[float] = None) -> jnp.ndarray:
    """Region-biased cross-attention.

    q: (B, H, L, D); k, v: (B, H, S, D); region_state: (B, L, S) — the
    rasterized per-resolution mask bias M with strengths S/S' baked in;
    sigma: scalar current noise level.

    Computes softmax(s + region_state * weight_scale * sigma * std(s)) @ V
    with std taken over the entire (B, H, L, S) logits tensor (matching the
    reference's global ``qk.std()`` at source/modules/model_k_diffusion.py:561
    and attention_modify.py:95). The std comes from the closed-form Gram
    reduction (``logits_std_gram``) and the biased softmax-V runs through
    XLA's fused attention, so full logits are never materialized.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    std = logits_std_gram(q, k, scale)
    w = region_state.astype(jnp.float32) * (
        jnp.float32(weight_scale) * sigma.astype(jnp.float32) * std
    )
    out = jax.nn.dot_product_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        bias=w[:, None, :, :],
        scale=scale,
    )
    return out.transpose(0, 2, 1, 3)


def region_attention_reference(q, k, v, region_state, sigma,
                               weight_scale: float = 1.0,
                               scale: Optional[float] = None) -> jnp.ndarray:
    """Materialized-logits implementation mirroring the reference's
    scaled_dot_product_attention_regionstate step by step — the numerics
    oracle for the fused paths."""
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


# ---------------------------------------------------------------------------
# BTNH-layout entry points ((B, L, H, D) — the natural layout after the
# projection reshape, avoiding the BHLD transpose round trips that showed
# up as ~2.4 ms/step of pure data formatting in profiles)
# ---------------------------------------------------------------------------


def attention_nlhd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   scale: Optional[float] = None) -> jnp.ndarray:
    """q: (B, L, H, D); k, v: (B, S, H, D) -> (B, L, H, D)."""
    return jax.nn.dot_product_attention(q, k, v, scale=scale)


def logits_std_gram_nlhd(q: jnp.ndarray, k: jnp.ndarray, scale: float,
                         axis_name: Optional[str] = None) -> jnp.ndarray:
    """BTNH variant; with ``axis_name`` set (inside shard_map) the moment
    sums are psum'd so the std stays global over the full batch — the ONLY
    cross-device communication the sampling step needs (the reference's
    std is global by definition, attention_modify.py:95)."""
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    n = q.shape[0] * q.shape[2] * q.shape[1] * k.shape[1]
    q_sum = qf.sum(axis=1)  # (B, H, D)
    k_sum = kf.sum(axis=1)
    total = jnp.einsum("bhd,bhd->", q_sum, k_sum) * scale
    q_gram = jnp.einsum("blhd,blhe->bhde", qf, qf)
    k_gram = jnp.einsum("bshd,bshe->bhde", kf, kf)
    total_sq = jnp.einsum("bhde,bhde->", q_gram, k_gram) * (scale * scale)
    if axis_name is not None:
        total = jax.lax.psum(total, axis_name)
        total_sq = jax.lax.psum(total_sq, axis_name)
        n = n * jax.lax.psum(1, axis_name)
    mean = total / n
    var = (total_sq - n * mean * mean) / (n - 1)
    return jnp.sqrt(jnp.maximum(var, 0.0))


def region_attention_nlhd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          region_state: jnp.ndarray, sigma: jnp.ndarray,
                          weight_scale: float = 1.0,
                          scale: Optional[float] = None,
                          axis_name: Optional[str] = None) -> jnp.ndarray:
    """BTNH variant of region_attention; region_state: (B, L, S)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    std = logits_std_gram_nlhd(q, k, scale, axis_name=axis_name)
    w = region_state.astype(jnp.float32) * (
        jnp.float32(weight_scale) * sigma.astype(jnp.float32) * std
    )
    return jax.nn.dot_product_attention(
        q, k, v, bias=w[:, None, :, :], scale=scale
    )

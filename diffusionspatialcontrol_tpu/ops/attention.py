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


def _centered_gram_moments(qc, kc, q_mean, k_mean, scale, L, S):
    """Per-(b,h) mean and centered sum of squares of s = scale * Q K^T from
    centered Gram matrices. With qc = q - q_mean, kc = k - k_mean:

        mean_bh = scale * <q_mean, k_mean>
        M2_bh   = sum_{l,s} (s - mean_bh)^2
                = scale^2 * [ tr(QcGram KcGram)
                              + S * k_mean^T QcGram k_mean
                              + L * q_mean^T KcGram q_mean ]

    (exact: every cross term contains a centered sum, which is zero). All
    three terms are non-negative, so unlike the raw-moment form
    E[s^2] - E[s]^2 there is NO catastrophic cancellation — the variance
    survives fp32 even at the largest latents (1920x1088, n ~ 4e7), where
    the raw form loses it. Inputs are (B, H, *, D)-contracted einsums built
    by the layout-specific wrappers below."""
    qc_gram = jnp.einsum("bhld,bhle->bhde", qc, qc)
    kc_gram = jnp.einsum("bhsd,bhse->bhde", kc, kc)
    tr = jnp.einsum("bhde,bhde->bh", qc_gram, kc_gram)
    term_q = S * jnp.einsum("bhd,bhde,bhe->bh", k_mean, qc_gram, k_mean)
    term_k = L * jnp.einsum("bhd,bhde,bhe->bh", q_mean, kc_gram, q_mean)
    means = jnp.einsum("bhd,bhd->bh", q_mean, k_mean) * scale
    m2 = (tr + term_q + term_k) * (scale * scale)
    return means, m2


def logits_std_gram(q: jnp.ndarray, k: jnp.ndarray,
                    scale: float) -> jnp.ndarray:
    """Unbiased std of the full logits tensor s = scale * Q K^T computed
    WITHOUT materializing s: centered per-(b,h) Gram moments
    (``_centered_gram_moments``) combined by the parallel-variance rule.

    O(BH (L+S) D^2) instead of the reference's O(BH L S D) logits pass
    (attention_modify.py:90-95) — this is what makes the spatial-control
    overhead vanish. All accumulation in fp32; the centered form is
    cancellation-free (validated against an fp64 oracle at 1920x1088
    shapes, tests/test_pallas.py)."""
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    L, S = q.shape[2], k.shape[2]
    q_mean = qf.mean(axis=2)  # (B, H, D)
    k_mean = kf.mean(axis=2)
    means, m2 = _centered_gram_moments(
        qf - q_mean[:, :, None], kf - k_mean[:, :, None],
        q_mean, k_mean, scale, L, S,
    )
    n = means.size * L * S
    grand_mean = jnp.mean(means)
    total_m2 = jnp.sum(m2) + (L * S) * jnp.sum((means - grand_mean) ** 2)
    return jnp.sqrt(jnp.maximum(total_m2 / (n - 1), 0.0))


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
    """BTNH variant of ``logits_std_gram`` (q: (B, L, H, D)); with
    ``axis_name`` set (inside shard_map) the scalar moment sums are psum'd
    so the std stays global over the full batch — the ONLY cross-device
    communication the sampling step needs (the reference's std is global by
    definition, attention_modify.py:95)."""
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    L, S = q.shape[1], k.shape[1]
    q_mean = qf.mean(axis=1)  # (B, H, D)
    k_mean = kf.mean(axis=1)
    qc = (qf - q_mean[:, None]).transpose(0, 2, 1, 3)  # (B, H, L, D)
    kc = (kf - k_mean[:, None]).transpose(0, 2, 1, 3)
    means, m2 = _centered_gram_moments(qc, kc, q_mean, k_mean, scale, L, S)
    n_group = L * S
    if axis_name is not None:
        # 4 scalar all-reduces: enough to reconstruct the global variance
        # from per-device group stats (equal group sizes).
        t_m2 = jax.lax.psum(jnp.sum(m2), axis_name)
        t_mean = jax.lax.psum(jnp.sum(means), axis_name)
        t_mean2 = jax.lax.psum(jnp.sum(means * means), axis_name)
        groups = means.size * jax.lax.psum(1, axis_name)
        grand_mean = t_mean / groups
        between = jnp.maximum(t_mean2 - groups * grand_mean**2, 0.0)
        total_m2 = t_m2 + n_group * between
        n = groups * n_group
    else:
        grand_mean = jnp.mean(means)
        total_m2 = (
            jnp.sum(m2) + n_group * jnp.sum((means - grand_mean) ** 2)
        )
        n = means.size * n_group
    return jnp.sqrt(jnp.maximum(total_m2 / (n - 1), 0.0))


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

"""Deterministic per-step noise generation.

The reference uses k-diffusion's BrownianTreeNoiseSampler (torchsde) for the
SDE samplers so that results are deterministic per seed and independent of
batch composition (reference: source/modules/model_k_diffusion.py:884-890).

We achieve the same *guarantees* TPU-natively: every (seed, step, draw) triple
maps to an independent standard-normal slice via PRNG key folding, generated
in one device-side pass. Exact torchsde bit-parity is neither possible nor a
goal (different PRNG); determinism and batch-size invariance are.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def step_noise(
    key: jax.Array,
    n_steps: int,
    draws_per_step: int,
    shape: Tuple[int, ...],
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Returns (n_steps, draws_per_step, *shape) standard normal noise.

    ``key`` is either a single PRNG key (split per batch element) or a
    stacked (B, ...) array of per-sample keys — in the latter case each
    sample's noise stream depends only on its own key, so results are
    invariant to batch composition and mesh sharding (the guarantee the
    reference gets from per-sample BrownianTree seeds,
    model_k_diffusion.py:884-890)."""
    batch = shape[0]
    sample_shape = shape[1:]

    def per_sample(sample_key):
        return jax.random.normal(
            sample_key, (n_steps, draws_per_step) + sample_shape, dtype
        )

    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key) and key.ndim == 1:
        keys = key  # stacked per-sample typed keys
    else:
        keys = jax.random.split(key, batch)
    per = jax.vmap(per_sample)(keys)  # (B, n_steps, draws, ...)
    return jnp.moveaxis(per, 0, 2)  # (n_steps, draws, B, ...)

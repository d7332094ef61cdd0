"""Parameter construction: random init (tests/benchmarks) and, via
``convert.hf``, conversion from HF SD checkpoints.

Random-init params have the exact structure/shapes of converted real weights,
so every test and benchmark exercises the same compiled programs as
production inference (throughput is weight-independent).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .clip import clip_init
from .unet import unet_init
from .vae import vae_init


def init_pipeline_params(
    key: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "clip": clip_init(k1, cfg.clip, dtype),
        "unet": unet_init(k2, cfg.unet, dtype),
        "vae": vae_init(k3, cfg.vae, dtype),
    }


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))

"""Converted-checkpoint caching via orbax.

The reference re-loads HF checkpoints through diffusers with per-model
in-process caches and deepcopy-per-request (source/app.py:263-340). Here a
converted param pytree can be snapshotted once with orbax and memory-mapped
back in seconds on any later process — the checkpoint/resume story for a
serving fleet (SURVEY.md §5 checkpoint row).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax


def save_params(path: str, params: Dict[str, Any]) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, params, force=True)
    ckpt.wait_until_finished()


def load_params(path: str, like: Dict[str, Any] | None = None
                ) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    if like is not None:
        target = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), like
        )
        return ckpt.restore(path, target)
    return ckpt.restore(path)


def cached_convert(model_dir: str, cache_dir: str, cfg, dtype,
                   n_extra_tokens: int = 64) -> Dict[str, Any]:
    """Convert a diffusers checkpoint, snapshotting the pytree under
    ``cache_dir`` keyed by the model path; later calls restore directly."""
    key = os.path.basename(os.path.normpath(model_dir))
    snap = os.path.join(cache_dir, f"{key}-{cfg.name}")
    if os.path.exists(snap):
        return load_params(snap)
    from .hf import load_pipeline_params

    params = load_pipeline_params(model_dir, cfg, dtype, n_extra_tokens)
    os.makedirs(cache_dir, exist_ok=True)
    save_params(snap, params)
    return params

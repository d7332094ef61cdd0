"""Explicit-SPMD sampling via shard_map.

GSPMD auto-sharding of the jitted scan inserts opportunistic reshards on
small shapes; this runner instead pins the program: every tensor is
batch-sharded, params replicated, and the ONLY collective is the psum of
the region-std moments (the reference's std is global over the CFG batch by
definition, attention_modify.py:95 — a 3-scalar psum per cross-attn layer
per step, riding ICI).

Per-seed results match the single-device pipeline bit-for-bit up to fp32
reduction order (tested on the virtual CPU mesh).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import GenerationConfig, ModelConfig
from ..pipeline.pipeline import make_denoise_fn
from ..samplers import schedules, solvers

try:  # jax >= 0.8
    from jax import shard_map as _shard_map_new

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map_new(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


@functools.partial(
    jax.jit,
    static_argnames=(
        "model_cfg", "solver_name", "sigmas_key", "guidance_scale",
        "guidance_rescale", "attn_impl", "solver_opts", "mesh",
        "compute_dtype",
    ),
)
def _sample_spmd(
    params,
    latents,  # (B, h, w, 4) batch-shardable
    context_pairs,  # (B, 2, S, D): per-sample [uncond, cond]
    region_biases_pairs,  # tuple of (B, 2, L, S) or None
    noise,  # (n_steps, draws, B, ...) or None
    *,
    model_cfg: ModelConfig,
    solver_name: str,
    sigmas_key: Tuple[float, ...],
    guidance_scale: float,
    guidance_rescale: float,
    attn_impl: str,
    solver_opts: Tuple,
    mesh: Mesh,
    compute_dtype=jnp.bfloat16,
):
    sigmas = np.asarray(sigmas_key, np.float64)
    table = schedules.ddpm_sigma_table(model_cfg)
    log_table = jnp.asarray(np.log(table), jnp.float32)

    def local_run(params, latents, ctx_pairs, bias_pairs, noise):
        # local halves layout [u..., c...] as make_denoise_fn expects
        context = jnp.concatenate([ctx_pairs[:, 0], ctx_pairs[:, 1]])
        biases = None
        if bias_pairs is not None:
            biases = tuple(
                jnp.concatenate([bp[:, 0], bp[:, 1]]) for bp in bias_pairs
            )
        denoise = make_denoise_fn(
            params, model_cfg, context, biases, log_table,
            guidance_scale, guidance_rescale, attn_impl,
            compute_dtype=compute_dtype, sigma_steps=sigmas[:-1],
            axis_name="data",
        )
        solver_fn, _, _ = solvers.SOLVERS[solver_name]
        return solver_fn(denoise, latents, sigmas, noise=noise,
                         **dict(solver_opts))

    bias_spec = (
        None if region_biases_pairs is None
        else tuple(P("data") for _ in region_biases_pairs)
    )
    noise_spec = None if noise is None else P(None, None, "data")
    return shard_map(
        local_run,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), bias_spec, noise_spec),
        out_specs=P("data"),
        check_rep=False,
    )(params, latents, context_pairs, region_biases_pairs, noise)


def sample_spmd(
    pipe,
    context: jnp.ndarray,  # (2B, S, D) [uncond..., cond...]
    gen: GenerationConfig,
    seeds,
    mesh: Mesh,
    region_biases: Optional[Tuple[jnp.ndarray, ...]] = None,
) -> jnp.ndarray:
    """Data-parallel sampling over ``mesh`` with explicit shardings.

    Returns raw latents (B, h, w, 4); decode via pipe.decode_latents."""
    sigmas, defaults = pipe._schedule(gen)
    seeds = [int(s) for s in seeds]
    batch = len(seeds)
    keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
    k_lat = jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys)
    k_noise = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
    shape = (batch, gen.latent_height, gen.latent_width, 4)
    latents = jax.vmap(
        lambda k: jax.random.normal(k, shape[1:], jnp.float32)
    )(k_lat) * float(np.sqrt(sigmas[0] ** 2 + 1.0))

    noise = pipe._solver_noise(k_noise, sigmas, shape, gen.sampler)

    # pair layouts, sharded on the sample axis
    s_len = context.shape[1]
    pairs = context.reshape(2, batch, s_len, -1).transpose(1, 0, 2, 3)
    bias_pairs = None
    if region_biases is not None:
        bias_pairs = tuple(
            b.reshape((2, batch) + b.shape[1:]).transpose(1, 0, 2, 3)
            for b in region_biases
        )

    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    params = jax.device_put(pipe.params, rep)
    latents = jax.device_put(latents, dp)
    pairs = jax.device_put(pairs, dp)
    if bias_pairs is not None:
        bias_pairs = tuple(jax.device_put(b, dp) for b in bias_pairs)
    if noise is not None:
        noise = jax.device_put(
            noise, NamedSharding(mesh, P(None, None, "data"))
        )

    opts = pipe._solver_opts(gen, defaults)
    return _sample_spmd(
        params, latents, pairs, bias_pairs, noise,
        model_cfg=pipe.model_cfg,
        solver_name=gen.sampler,
        sigmas_key=tuple(float(s) for s in sigmas),
        guidance_scale=gen.guidance_scale,
        guidance_rescale=gen.guidance_rescale,
        attn_impl=pipe.attn_impl,
        solver_opts=tuple(sorted(opts.items())),
        mesh=mesh,
        compute_dtype=gen.dtype,
    )

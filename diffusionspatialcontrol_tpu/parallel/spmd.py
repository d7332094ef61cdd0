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


#: Collective HLO ops the sampling program is allowed to contain. The only
#: semantically required collective is the region-std moment psum
#: (all-reduce); anything else (all-gather / all-to-all / collective-permute)
#: means GSPMD re-introduced a reshard — the exact failure mode that
#: deadlocked the round-1 dryrun (MULTICHIP_r01.json rc=134).
_FORBIDDEN_COLLECTIVES = ("all-gather", "all-to-all", "collective-permute")


def assert_only_allreduce(compiled_text: str) -> None:
    """Raise if the compiled HLO contains any collective other than
    all-reduce (see _FORBIDDEN_COLLECTIVES)."""
    import re

    for line in compiled_text.splitlines():
        for op in _FORBIDDEN_COLLECTIVES:
            # match HLO op names like "all-gather(", "all-gather-start("
            if re.search(rf"= *\S+ +{op}[-.(]", line) or f" {op}(" in line:
                raise AssertionError(
                    f"forbidden collective {op!r} in compiled sampling "
                    f"program: {line.strip()[:200]}"
                )


def sample_spmd(
    pipe,
    context: jnp.ndarray,  # (2B, S, D) [uncond..., cond...]
    gen: GenerationConfig,
    seeds,
    mesh: Mesh,
    region_biases: Optional[Tuple[jnp.ndarray, ...]] = None,
    check_collectives: bool = False,
) -> jnp.ndarray:
    """Data-parallel sampling over ``mesh`` with explicit shardings.

    With ``check_collectives`` the program is lowered and compiled first and
    its HLO asserted to contain no collective beyond the region-std
    all-reduce, then executed.

    Returns raw latents (B, h, w, 4); decode via pipe.decode_latents."""
    from ..pipeline.pipeline import _keyed_normal, _seed_fold_keys

    sigmas, defaults = pipe._schedule(gen)
    seeds = [int(s) for s in seeds]
    batch = len(seeds)
    k_lat, k_noise = _seed_fold_keys(seeds, 2)
    shape = (batch, gen.latent_height, gen.latent_width, 4)
    latents = _keyed_normal(k_lat, shape) * float(
        np.sqrt(sigmas[0] ** 2 + 1.0)
    )

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
    kwargs = dict(
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
    args = (params, latents, pairs, bias_pairs, noise)
    if check_collectives:
        compiled = _sample_spmd.lower(*args, **kwargs).compile()
        assert_only_allreduce(compiled.as_text())
        return compiled(*args)  # AOT executable: no second compile
    return _sample_spmd(*args, **kwargs)

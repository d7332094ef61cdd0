"""txt2img / img2img / inpaint generation pipeline: one jitted program each.

Replaces the reference's two parallel pipeline stacks (k-diffusion:
source/modules/model_k_diffusion.py; diffusers schedulers:
source/modules/model_diffusers.py) with a single functional core: the CLIP
encode, the full sampler loop (CFG pair batched on the batch axis, region
biases resident on device, ControlNet/T2I/IP-Adapter conditioning inside the
loop), and the VAE decode each compile to one XLA program. Host work is
tokenization and PIL I/O only.

Math parity notes:
  * initial latents are scaled by (sigma_0^2 + 1)^0.5
    (reference: model_k_diffusion.py:1043 txt2img, :655 img2img);
  * CFG mixes *denoised* outputs: u + g*(c-u) (model_k_diffusion.py:1162-1166)
    followed by guidance_rescale (model_k_diffusion.py:71-82);
  * the sigma-space denoiser wraps an epsilon or v prediction UNet exactly as
    CompVisDenoiser / CompVisVDenoiser do
    (reference: source/modules/external_k_diffusion.py:86-114, 142-182),
    including the channel-slice fix for 9-channel inpaint UNets (:113);
  * 4-channel inpainting re-blends x = m*x + (1-m)*(z_init + sigma*noise)
    every model call (model_k_diffusion.py:1599-1612 in sigma-space form);
  * ControlNet runs per step on x*c_in with per-unit keep windows
    (model_k_diffusion.py:1119-1154; keep schedule :355-424); T2I-Adapter
    residuals apply while step < steps*conditioning_factor
    (model_k_diffusion.py:1110-1117).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GenerationConfig, ModelConfig
from ..models.unet import (
    RegionState,
    UNetCond,
    deepcache_shape,
    unet_apply,
    unet_apply_deepcache,
)
from ..models.vae import vae_decode, vae_encode
from ..samplers import brownian, schedules, solvers


def rescale_noise_cfg(noise_cfg, noise_pred_text, guidance_rescale):
    """Port of the reference's rescale_noise_cfg
    (model_k_diffusion.py:71-82; arXiv:2305.08891 §3.4)."""
    axes = tuple(range(1, noise_pred_text.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True, ddof=1)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True, ddof=1)
    rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * rescaled + (1 - guidance_rescale) * noise_cfg


def _sigma_to_t(sigma, log_sigma_table: jnp.ndarray):
    return jnp.interp(
        jnp.log(jnp.maximum(sigma, 1e-10)),
        log_sigma_table,
        jnp.arange(log_sigma_table.shape[0], dtype=jnp.float32),
    )


def controlnet_keep_schedule(steps: int, starts: Sequence[float],
                             ends: Sequence[float]) -> np.ndarray:
    """(n_units, steps) keep mask: 1 inside [start, end) fraction of the run
    (reference: model_k_diffusion.py preprocess_controlnet :355-424, same
    formula as diffusers)."""
    n = len(starts)
    keeps = np.zeros((n, steps), np.float32)
    for u, (s, e) in enumerate(zip(starts, ends)):
        for i in range(steps):
            keeps[u, i] = 1.0 - float(i / steps < s or (i + 1) / steps > e)
    return keeps


@dataclasses.dataclass
class ChunkedPause:
    """Mid-run checkpoint from :meth:`StableDiffusionTPU.sample_chunked`:
    the solver state at a chunk boundary. Everything else about the run
    (schedule, noise table, initial latents) is deterministic from the
    call arguments, so resuming with the same arguments + this state is
    bitwise identical to never having paused."""

    x: jnp.ndarray  # current latents (sigma-space)
    carry: Any  # solver multistep carry pytree (None before first chunk)
    pos: int  # scan steps completed
    n_total: int  # total scan steps of the schedule (consistency check)


@dataclasses.dataclass
class DenoiseExtras:
    """Optional per-generation conditioning consumed inside the denoise fn.
    All arrays are already CFG-doubled ([uncond..., cond...]) where needed."""

    # ControlNet: parallel lists over units.
    controlnet_params: Optional[List[Any]] = None
    controlnet_images: Optional[List[jnp.ndarray]] = None  # (B_cfg, H, W, 3)
    controlnet_scales: Optional[np.ndarray] = None  # (n_units, n_steps) static
    controlnet_guess: bool = False
    # T2I-Adapter: residuals precomputed once (B_cfg batch included).
    t2i_residuals: Optional[Tuple[jnp.ndarray, ...]] = None
    t2i_active: Optional[np.ndarray] = None  # (n_steps,) static 0/1
    # IP-Adapter decoupled attention inputs.
    ip_tokens: Optional[Tuple[jnp.ndarray, ...]] = None
    ip_scales: Optional[Tuple[float, ...]] = None
    ip_masks: Optional[Tuple[Optional[jnp.ndarray], ...]] = None
    # 4-channel inpaint blend (sigma-space, see module docstring).
    inpaint_mask: Optional[jnp.ndarray] = None  # (B, h, w, 1), 1 = regenerate
    inpaint_image_latents: Optional[jnp.ndarray] = None  # (B, h, w, 4)
    inpaint_noise: Optional[jnp.ndarray] = None  # (B, h, w, 4)
    # 9-channel inpaint UNet concat [mask, masked_image_latents].
    extra_channels: Optional[jnp.ndarray] = None  # (B_cfg, h, w, 5)


jax.tree_util.register_dataclass(
    DenoiseExtras,
    data_fields=[
        "controlnet_params",
        "controlnet_images",
        "t2i_residuals",
        "ip_tokens",
        "ip_masks",
        "inpaint_mask",
        "inpaint_image_latents",
        "inpaint_noise",
        "extra_channels",
    ],
    meta_fields=["controlnet_scales", "controlnet_guess", "t2i_active",
                 "ip_scales"],
)


def _is_seed_list(seed) -> bool:
    return isinstance(seed, (list, tuple, np.ndarray))


def _seed_fold_keys(seed, folds: int):
    """Derive ``folds`` independent PRNG keys from ``seed``.

    Scalar seed: rows of ``jax.random.split(PRNGKey(seed), folds)`` (single
    keys). List/array seed: each returned entry is a stacked (B,) key array
    built by per-sample ``fold_in`` so every sample's noise streams depend
    only on its own seed — results invariant to batch composition and mesh
    shape (SURVEY.md §4 test item e)."""
    if _is_seed_list(seed):
        # typed key array (same threefry streams as PRNGKey): (B,) keys
        keys = jax.vmap(jax.random.key)(
            jnp.asarray([int(s) for s in seed], jnp.uint32)
        )
        return tuple(
            jax.vmap(lambda k, i=i: jax.random.fold_in(k, i))(keys)
            for i in range(folds)
        )
    key = jax.random.PRNGKey(seed)
    return tuple(jax.random.split(key, folds))


def _keyed_normal(k, shape, dtype=jnp.float32):
    """Standard normal of ``shape``; ``k`` is a single key or stacked (B,)
    per-sample keys (B = shape[0])."""
    if jnp.issubdtype(k.dtype, jax.dtypes.prng_key) and k.ndim == 1:
        return jax.vmap(
            lambda kk: jax.random.normal(kk, shape[1:], dtype)
        )(k)
    return jax.random.normal(k, shape, dtype)


def _seed_to_arr(seed):
    """Device representation of ``seed`` for in-program key derivation:
    uint32 scalar for a single seed, (B,) uint32 for a per-sample list."""
    if _is_seed_list(seed):
        return jnp.asarray([int(s) for s in seed], jnp.uint32)
    return jnp.uint32(int(seed))


def _fold_keys_from_arr(seed_arr, folds: int):
    """Traced twin of :func:`_seed_fold_keys` taking the uint32 array form
    produced by :func:`_seed_to_arr`, usable inside jit. Derives the exact
    same key values/streams (PRNGKey+split for scalars, typed key+fold_in
    per sample for lists): in-program latent/noise draws are bitwise equal
    to the eager helpers (tests/test_pipeline.py asserts this in
    isolation). End-to-end sampling outputs agree only to float rounding —
    XLA fuses the in-program draws with neighbouring ops, so the two
    compiled programs round differently at the ULP level."""
    if seed_arr.ndim == 1:
        keys = jax.vmap(jax.random.key)(seed_arr)
        return tuple(
            jax.vmap(lambda k, i=i: jax.random.fold_in(k, i))(keys)
            for i in range(folds)
        )
    return tuple(jax.random.split(jax.random.PRNGKey(seed_arr), folds))


def _solver_noise_fn(rng, sigmas, shape, solver_name: str):
    """Per-step solver noise table (None for deterministic solvers).
    Pure function of (rng, static schedule/shape) — callable eagerly or
    inside the jitted sampling program."""
    _, draws, _ = solvers.SOLVERS[solver_name]
    if solver_name == "restart":
        n = solvers.restart_plan_len(sigmas)
        return brownian.step_noise(rng, n, 1, shape)
    if draws == 0:
        return None
    return brownian.step_noise(rng, len(sigmas) - 1, draws, shape)


def _next_seed(seed):
    """seed + 1, elementwise for per-sample seed lists (hires recursion —
    reference derives the hires pass's noise from a fresh seed,
    model_k_diffusion.py:1179-1226)."""
    if _is_seed_list(seed):
        return [int(s) + 1 for s in seed]
    return seed + 1


def _interleave_cfg(a: jnp.ndarray) -> jnp.ndarray:
    """[u0..uB, c0..cB] -> [u0, c0, u1, c1, ...].

    Under batch sharding the halves layout puts a sample's uncond and cond
    rows on different devices, which makes GSPMD insert an all-to-all in
    the sampling scan; the interleaved layout keeps each CFG pair
    device-local (see parallel/mesh.py). Pure relayout — per-sample model
    outputs are batch-order invariant, so semantics are unchanged."""
    half = a.shape[0] // 2
    return (
        a.reshape((2, half) + a.shape[1:])
        .swapaxes(0, 1)
        .reshape((-1,) + a.shape[1:])
    )


def cond_half_conditioning(
    context: jnp.ndarray,
    region_biases: Optional[Tuple[jnp.ndarray, ...]],
    extras: Optional[DenoiseExtras],
):
    """Slice every CFG-doubled ([uncond..., cond...]) conditioning tensor
    down to its cond half, for a no-CFG (guidance off) segment. Fields that
    are never CFG-doubled (inpaint mask/latents/noise, guess-mode
    ControlNet images — see build_controlnet_extras) pass through."""

    def half(a):
        return a[a.shape[0] // 2:]

    ctx = half(context)
    rb = (None if region_biases is None
          else tuple(half(b) for b in region_biases))
    ex = extras
    if extras is not None:
        ex = dataclasses.replace(
            extras,
            controlnet_images=(
                extras.controlnet_images
                if extras.controlnet_images is None or extras.controlnet_guess
                else [half(i) for i in extras.controlnet_images]),
            t2i_residuals=(
                None if extras.t2i_residuals is None
                else tuple(half(f) for f in extras.t2i_residuals)),
            ip_tokens=(
                None if extras.ip_tokens is None
                else tuple(half(t) for t in extras.ip_tokens)),
            ip_masks=(
                None if extras.ip_masks is None
                else tuple(None if m is None else half(m)
                           for m in extras.ip_masks)),
            extra_channels=(
                None if extras.extra_channels is None
                else half(extras.extra_channels)),
        )
    return ctx, rb, ex


def make_denoise_fn(
    params: Dict[str, Any],
    model_cfg: ModelConfig,
    context: jnp.ndarray,  # (B or 2B, S, D) [uncond..., cond...] when CFG
    region_biases: Optional[Tuple[jnp.ndarray, ...]],
    log_sigma_table: jnp.ndarray,
    guidance_scale: float,
    guidance_rescale: float = 0.0,
    attn_impl: str = "xla",
    compute_dtype=jnp.bfloat16,
    extras: Optional[DenoiseExtras] = None,
    sigma_steps: Optional[np.ndarray] = None,  # static per-step sigmas
    axis_name: Optional[str] = None,  # set inside shard_map (parallel/spmd)
    conv_impl: Optional[str] = None,  # default: follow attn_impl
    xattn_cache: Optional[Tuple[jnp.ndarray, ...]] = None,  # TGATE tail
    collect_xattn: bool = False,  # denoise returns (x0, xattn outputs)
):
    """Builds the sigma-space denoiser D(x; sigma) used by every solver.

    ``xattn_cache`` / ``collect_xattn``: TGATE cross-attention freezing
    (models/unet.py unet_apply docs). The cache path is only supported
    with guidance off — the TGATE tail collapses the CFG pair (both
    halves share the frozen cross-attention, making them identical)."""
    do_cfg = guidance_scale > 1.0
    if xattn_cache is not None and do_cfg:
        raise ValueError(
            "xattn_cache requires guidance off (the TGATE tail runs "
            "cond-only; with a shared frozen cross-attention the CFG "
            "halves are identical)"
        )
    ex = extras or DenoiseExtras()
    context = context.astype(compute_dtype)
    if ex.ip_tokens is not None:
        ex = dataclasses.replace(
            ex, ip_tokens=tuple(t.astype(compute_dtype) for t in ex.ip_tokens)
        )
    if do_cfg:
        # One-time relayout of every CFG-doubled conditioning tensor to the
        # interleaved convention (see _interleave_cfg).
        cfg_batch = context.shape[0]
        context = _interleave_cfg(context)
        if region_biases is not None:
            region_biases = tuple(_interleave_cfg(b) for b in region_biases)

        def _maybe(a):
            return (
                _interleave_cfg(a)
                if a is not None and a.shape[0] == cfg_batch
                else a
            )

        ex = dataclasses.replace(
            ex,
            controlnet_images=(
                None if ex.controlnet_images is None
                else [_maybe(i) for i in ex.controlnet_images]
            ),
            t2i_residuals=(
                None if ex.t2i_residuals is None
                else tuple(_maybe(r) for r in ex.t2i_residuals)
            ),
            ip_tokens=(
                None if ex.ip_tokens is None
                else tuple(_maybe(t) for t in ex.ip_tokens)
            ),
            ip_masks=(
                None if ex.ip_masks is None
                else tuple(_maybe(m) for m in ex.ip_masks)
            ),
            extra_channels=_maybe(ex.extra_channels),
        )
    sig_steps = (
        jnp.asarray(sigma_steps, jnp.float32)
        if sigma_steps is not None
        else None
    )

    def step_index(sigma):
        # Nearest schedule entry: robust for the second-order solvers'
        # intermediate sigmas (reference keys per-step state by distinct
        # sigma strings, model_k_diffusion.py:1645-1651).
        return jnp.argmin(jnp.abs(sig_steps - sigma))

    def denoise(x, sigma):
        if ex.inpaint_mask is not None:
            m = ex.inpaint_mask
            proper = ex.inpaint_image_latents + sigma * ex.inpaint_noise
            x = m * x + (1.0 - m) * proper

        if do_cfg:
            # interleaved duplication: device-local under batch sharding
            x_in = jnp.stack([x, x], axis=1).reshape((-1,) + x.shape[1:])
        else:
            x_in = x
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        t = _sigma_to_t(sigma, log_sigma_table)
        t_b = jnp.full((x_in.shape[0],), t, jnp.float32)

        scaled_in = (x_in * c_in).astype(compute_dtype)
        model_in = scaled_in
        if ex.extra_channels is not None:
            model_in = jnp.concatenate(
                [model_in, ex.extra_channels.astype(compute_dtype)], axis=-1
            )

        region = None
        if region_biases is not None:
            region = RegionState(region_biases, sigma)

        cn_down = None
        cn_mid = None
        if ex.controlnet_params is not None:
            from ..models.controlnet import controlnet_apply

            idx = step_index(sigma)
            scale_tab = jnp.asarray(ex.controlnet_scales, jnp.float32)
            for u, (cn_p, cn_img) in enumerate(
                zip(ex.controlnet_params, ex.controlnet_images)
            ):
                unit_scale = scale_tab[u][idx]
                if ex.controlnet_guess and do_cfg:
                    # cond rows are the odd interleaved positions
                    d_res, m_res = controlnet_apply(
                        cn_p, model_cfg.unet, scaled_in[1::2],
                        t_b[1::2], context[1::2],
                        cn_img[1::2] if cn_img.shape[0] == x_in.shape[0]
                        else cn_img,
                        conditioning_scale=unit_scale, guess_mode=True,
                    )

                    def _zero_ileave(r):
                        return jnp.stack(
                            [jnp.zeros_like(r), r], axis=1
                        ).reshape((-1,) + r.shape[1:])

                    d_res = tuple(_zero_ileave(r) for r in d_res)
                    m_res = _zero_ileave(m_res)
                else:
                    d_res, m_res = controlnet_apply(
                        cn_p, model_cfg.unet, scaled_in, t_b, context,
                        cn_img, conditioning_scale=unit_scale,
                    )
                if cn_down is None:
                    cn_down, cn_mid = list(d_res), m_res
                else:
                    cn_down = [a + b for a, b in zip(cn_down, d_res)]
                    cn_mid = cn_mid + m_res
            cn_down = tuple(cn_down)

        t2i_res = None
        if ex.t2i_residuals is not None:
            idx = step_index(sigma)
            active = jnp.asarray(ex.t2i_active, jnp.float32)[idx]
            t2i_res = tuple(r * active for r in ex.t2i_residuals)

        cond = UNetCond(
            context=context,
            region=region,
            controlnet_down=cn_down,
            controlnet_mid=cn_mid,
            t2i_residuals=t2i_res,
            ip_tokens=ex.ip_tokens,
            ip_scales=ex.ip_scales,
            ip_masks=ex.ip_masks,
        )

        xa = None
        if collect_xattn:
            out, xa = unet_apply(
                params["unet"], model_cfg.unet, model_in, t_b, cond,
                attn_impl=attn_impl, axis_name=axis_name,
                conv_impl=conv_impl, collect_xattn=True,
            )
        else:
            out = unet_apply(
                params["unet"], model_cfg.unet, model_in, t_b, cond,
                attn_impl=attn_impl, axis_name=axis_name,
                conv_impl=conv_impl, xattn_cache=xattn_cache,
            )
        out = out.astype(jnp.float32)

        if model_cfg.prediction_type == "v_prediction":
            c_skip = 1.0 / (sigma**2 + 1.0)
            c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
            denoised = out * c_out + x_in * c_skip
        else:
            denoised = x_in - out * sigma

        if do_cfg:
            pair = denoised.reshape(
                (x.shape[0], 2) + denoised.shape[1:]
            )
            d_u, d_c = pair[:, 0], pair[:, 1]
            mixed = d_u + guidance_scale * (d_c - d_u)
            if guidance_rescale > 0.0:
                mixed = rescale_noise_cfg(mixed, d_c, guidance_rescale)
            return (mixed, xa) if collect_xattn else mixed
        return (denoised, xa) if collect_xattn else denoised

    return denoise


def make_denoise_cached_fn(
    params: Dict[str, Any],
    model_cfg: ModelConfig,
    context: jnp.ndarray,
    region_biases: Optional[Tuple[jnp.ndarray, ...]],
    log_sigma_table: jnp.ndarray,
    guidance_scale: float,
    guidance_rescale: float = 0.0,
    attn_impl: str = "xla",
    compute_dtype=jnp.bfloat16,
    extras: Optional[DenoiseExtras] = None,
    axis_name: Optional[str] = None,
    conv_impl: Optional[str] = None,
):
    """DeepCache variant of :func:`make_denoise_fn`: the returned
    ``denoise_c(x, sigma, cache, use_cache) -> (denoised, cache)`` threads
    the UNet's deep-branch feature cache (models/unet.py
    unet_apply_deepcache) through the solver scan. Same CFG interleave,
    sigma-space wrap, v-prediction and guidance_rescale math as the plain
    denoiser; ControlNet / T2I-Adapter extras are rejected (they inject
    into the cached branch)."""
    do_cfg = guidance_scale > 1.0
    ex = extras or DenoiseExtras()
    if ex.controlnet_params is not None or ex.t2i_residuals is not None:
        raise ValueError(
            "deepcache does not support ControlNet/T2I-Adapter units"
        )
    context = context.astype(compute_dtype)
    if ex.ip_tokens is not None:
        ex = dataclasses.replace(
            ex, ip_tokens=tuple(t.astype(compute_dtype) for t in ex.ip_tokens)
        )
    if do_cfg:
        cfg_batch = context.shape[0]
        context = _interleave_cfg(context)
        if region_biases is not None:
            region_biases = tuple(_interleave_cfg(b) for b in region_biases)

        def _maybe(a):
            return (
                _interleave_cfg(a)
                if a is not None and a.shape[0] == cfg_batch
                else a
            )

        ex = dataclasses.replace(
            ex,
            ip_tokens=(
                None if ex.ip_tokens is None
                else tuple(_maybe(t) for t in ex.ip_tokens)
            ),
            ip_masks=(
                None if ex.ip_masks is None
                else tuple(_maybe(m) for m in ex.ip_masks)
            ),
            extra_channels=_maybe(ex.extra_channels),
        )

    def denoise_c(x, sigma, cache, use_cache):
        if ex.inpaint_mask is not None:
            m = ex.inpaint_mask
            proper = ex.inpaint_image_latents + sigma * ex.inpaint_noise
            x = m * x + (1.0 - m) * proper

        if do_cfg:
            x_in = jnp.stack([x, x], axis=1).reshape((-1,) + x.shape[1:])
        else:
            x_in = x
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        t = _sigma_to_t(sigma, log_sigma_table)
        t_b = jnp.full((x_in.shape[0],), t, jnp.float32)

        model_in = (x_in * c_in).astype(compute_dtype)
        if ex.extra_channels is not None:
            model_in = jnp.concatenate(
                [model_in, ex.extra_channels.astype(compute_dtype)], axis=-1
            )

        region = None
        if region_biases is not None:
            region = RegionState(region_biases, sigma)

        cond = UNetCond(
            context=context,
            region=region,
            ip_tokens=ex.ip_tokens,
            ip_scales=ex.ip_scales,
            ip_masks=ex.ip_masks,
        )

        out, cache = unet_apply_deepcache(
            params["unet"], model_cfg.unet, model_in, t_b, cond, cache,
            use_cache, attn_impl=attn_impl, axis_name=axis_name,
            conv_impl=conv_impl,
        )
        out = out.astype(jnp.float32)

        if model_cfg.prediction_type == "v_prediction":
            c_skip = 1.0 / (sigma**2 + 1.0)
            c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
            denoised = out * c_out + x_in * c_skip
        else:
            denoised = x_in - out * sigma

        if do_cfg:
            pair = denoised.reshape(
                (x.shape[0], 2) + denoised.shape[1:]
            )
            d_u, d_c = pair[:, 0], pair[:, 1]
            mixed = d_u + guidance_scale * (d_c - d_u)
            if guidance_rescale > 0.0:
                mixed = rescale_noise_cfg(mixed, d_c, guidance_rescale)
            return mixed, cache
        return denoised, cache

    return denoise_c


# ---------------------------------------------------------------------------
# Jitted sampling core (cached per static config)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "model_cfg",
        "solver_name",
        "sigmas_key",
        "guidance_scale",
        "guidance_rescale",
        "attn_impl",
        "conv_impl",
        "solver_opts",
        "decode",
        "compute_dtype",
        "return_history",
        "uint8_output",
        "init_shape",
    ),
)
def _sample_core(
    params,
    latents,
    context,
    region_biases,
    noise,
    extras,
    seed_arr=None,
    *,
    init_shape: Optional[Tuple[int, ...]] = None,
    model_cfg: ModelConfig,
    solver_name: str,
    sigmas_key: Tuple[float, ...],
    guidance_scale: float,
    guidance_rescale: float,
    attn_impl: str,
    solver_opts: Tuple[Tuple[str, Any], ...],
    decode: bool,
    conv_impl: Optional[str] = None,
    compute_dtype=jnp.bfloat16,
    return_history: bool = False,
    uint8_output: bool = False,
):
    sigmas = np.asarray(sigmas_key, np.float64)
    if init_shape is not None:
        # Seeded in-program init: derive the keys and draw the initial
        # latents + solver noise inside this compiled program instead of
        # as separate eager dispatches — on a remote-execution backend
        # each eager op costs a full relay round trip (~30 ms, CLAUDE.md),
        # so folding them here removes 3-4 round trips per image. The
        # streams are bitwise-identical to the eager helpers; end-to-end
        # outputs agree to float rounding (fusion context differs between
        # the two programs) — tests/test_pipeline.py::
        # test_seeded_in_program_init.
        k_lat, k_noise = _fold_keys_from_arr(seed_arr, 2)
        latents = _keyed_normal(k_lat, init_shape) * float(
            np.sqrt(sigmas[0] ** 2 + 1.0)
        )
        noise = _solver_noise_fn(k_noise, sigmas, init_shape, solver_name)
    table = schedules.ddpm_sigma_table(model_cfg)
    log_table = jnp.asarray(np.log(table), jnp.float32)

    denoise = make_denoise_fn(
        params, model_cfg, context, region_biases, log_table,
        guidance_scale, guidance_rescale, attn_impl,
        compute_dtype=compute_dtype, extras=extras,
        sigma_steps=sigmas[:-1], conv_impl=conv_impl,
    )
    solver_fn, _, _ = solvers.SOLVERS[solver_name]
    res = solver_fn(denoise, latents, sigmas, noise=noise,
                    return_history=return_history, **dict(solver_opts))
    x, hist = res if return_history else (res, None)
    if decode:
        ci = attn_impl if conv_impl is None else conv_impl
        x = vae_decode(params["vae"], model_cfg.vae, x, conv_impl=ci)
        if uint8_output:
            # device-side uint8 conversion: 4x less host transfer (the
            # device->host link dominates serving latency)
            x = jnp.round(
                jnp.clip(x * 0.5 + 0.5, 0.0, 1.0) * 255.0
            ).astype(jnp.uint8)
    return (x, hist) if return_history else x




@functools.partial(
    jax.jit,
    static_argnames=(
        "init_shape", "model_cfg", "solver_name", "sigmas_key", "gate",
        "guidance_scale", "guidance_rescale", "attn_impl", "conv_impl",
        "solver_opts", "decode", "compute_dtype", "uint8_output",
    ),
)
def _tgate_core(
    params,
    latents,
    context,
    region_biases,
    noise,
    extras,
    seed_arr=None,
    *,
    init_shape: Optional[Tuple[int, ...]] = None,
    model_cfg: ModelConfig,
    solver_name: str,
    sigmas_key: Tuple[float, ...],
    gate: int,
    guidance_scale: float,
    guidance_rescale: float,
    attn_impl: str,
    conv_impl: Optional[str],
    solver_opts: Tuple[Tuple[str, Any], ...],
    decode: bool,
    compute_dtype=jnp.bfloat16,
    uint8_output: bool = False,
):
    """Single-program TGATE: CFG segment + gate collect forward +
    frozen-cross-attention cond-only tail + decode, all in ONE compiled
    program. The round-3 chunked formulation (sample_chunked pause ->
    eager _collect_xattn_once -> sample_chunked resume) dispatched 3-4
    separate programs plus eager init ops; on the remote-execution
    backend each costs a relay round trip, which ate the method's entire
    saving (bench_tgate r4: 0.86-1.22 s vs 0.69 s plain — a net LOSS).
    One program has none of that overhead and lets XLA schedule the
    whole trajectory."""
    sigmas = np.asarray(sigmas_key, np.float64)
    if init_shape is not None:
        k_lat, k_noise = _fold_keys_from_arr(seed_arr, 2)
        latents = _keyed_normal(k_lat, init_shape) * float(
            np.sqrt(sigmas[0] ** 2 + 1.0)
        )
        noise = _solver_noise_fn(k_noise, sigmas, init_shape, solver_name)
    table = schedules.ddpm_sigma_table(model_cfg)
    log_table = jnp.asarray(np.log(table), jnp.float32)
    n_total = len(sigmas) - 1
    opts = dict(solver_opts)
    solver_fn, _, _ = solvers.SOLVERS[solver_name]

    # segment 1: steps [0, gate) with full conditioning (CFG on)
    denoise1 = make_denoise_fn(
        params, model_cfg, context, region_biases, log_table,
        guidance_scale, guidance_rescale, attn_impl,
        compute_dtype=compute_dtype, extras=extras,
        sigma_steps=sigmas[:-1], conv_impl=conv_impl,
    )
    x1, carry = solver_fn(denoise1, latents, sigmas, noise=noise,
                          segment=(0, gate), return_carry=True, **opts)

    # gate: one collect forward capturing every cross-attention output
    denoise_c = make_denoise_fn(
        params, model_cfg, context, region_biases, log_table,
        guidance_scale, guidance_rescale, attn_impl,
        compute_dtype=compute_dtype, extras=extras,
        sigma_steps=np.asarray([sigmas[gate]], np.float64),
        conv_impl=conv_impl, collect_xattn=True,
    )
    _, xa = denoise_c(x1, jnp.float32(sigmas[gate]))

    if guidance_scale > 1.0:
        # interleaved CFG layout [u0, c0, ...] -> pair average; tail runs
        # cond-only at half batch (with a shared frozen cross-attention
        # both CFG halves are identical — TGATE's speedup)
        xa = tuple(0.5 * (e[0::2] + e[1::2]) for e in xa)
        ctx2, _, ex2 = cond_half_conditioning(context, None, extras)
    else:
        ctx2, ex2 = context, extras
    # region biases and IP tokens are dead past the gate (cross-attention
    # is never recomputed); drop them for a leaner tail
    if ex2 is not None and ex2.ip_tokens is not None:
        ex2 = dataclasses.replace(
            ex2, ip_tokens=None, ip_scales=None, ip_masks=None)
    denoise2 = make_denoise_fn(
        params, model_cfg, ctx2, None, log_table, 1.0, 0.0, attn_impl,
        compute_dtype=compute_dtype, extras=ex2,
        sigma_steps=sigmas[:-1], conv_impl=conv_impl, xattn_cache=xa,
    )
    x = solver_fn(denoise2, x1, sigmas, noise=noise, carry_in=carry,
                  segment=(gate, n_total - gate), **opts)

    if decode:
        ci = attn_impl if conv_impl is None else conv_impl
        x = vae_decode(params["vae"], model_cfg.vae, x, conv_impl=ci)
        if uint8_output:
            x = jnp.round(
                jnp.clip(x * 0.5 + 0.5, 0.0, 1.0) * 255.0
            ).astype(jnp.uint8)
    return x


@functools.partial(
    jax.jit,
    static_argnames=(
        "model_cfg", "solver_name", "sigmas_key", "guidance_scale",
        "guidance_rescale", "attn_impl", "conv_impl", "solver_opts",
        "compute_dtype", "segment_size",
    ),
)
def _sample_chunk(
    params,
    carry,  # None on the first chunk; the solver carry afterwards
    latents,
    context,
    region_biases,
    noise,
    extras,
    start,  # traced scalar step offset -> one program per segment_size
    *,
    model_cfg: ModelConfig,
    solver_name: str,
    sigmas_key: Tuple[float, ...],
    guidance_scale: float,
    guidance_rescale: float,
    attn_impl: str,
    solver_opts: Tuple[Tuple[str, Any], ...],
    compute_dtype=jnp.bfloat16,
    segment_size: int = 1,
    conv_impl: Optional[str] = None,
):
    """One ``segment_size``-step chunk of the sampling scan (see
    StableDiffusionTPU.sample_chunked)."""
    sigmas = np.asarray(sigmas_key, np.float64)
    table = schedules.ddpm_sigma_table(model_cfg)
    log_table = jnp.asarray(np.log(table), jnp.float32)
    denoise = make_denoise_fn(
        params, model_cfg, context, region_biases, log_table,
        guidance_scale, guidance_rescale, attn_impl,
        compute_dtype=compute_dtype, extras=extras,
        sigma_steps=sigmas[:-1], conv_impl=conv_impl,
    )
    solver_fn, _, _ = solvers.SOLVERS[solver_name]
    return solver_fn(
        denoise, latents, sigmas, noise=noise,
        carry_in=carry, segment=(start, segment_size), return_carry=True,
        **dict(solver_opts),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "model_cfg", "solver_name", "sigmas_key", "guidance_scale",
        "guidance_rescale", "attn_impl", "conv_impl", "cache_interval",
        "decode", "compute_dtype", "uint8_output",
    ),
)
def _sample_deepcache_core(
    params,
    latents,
    context,
    region_biases,
    extras,
    *,
    model_cfg: ModelConfig,
    solver_name: str,
    sigmas_key: Tuple[float, ...],
    guidance_scale: float,
    guidance_rescale: float,
    attn_impl: str,
    cache_interval: int,
    decode: bool,
    conv_impl: Optional[str] = None,
    compute_dtype=jnp.bfloat16,
    uint8_output: bool = False,
):
    """DeepCache sampling program: every ``cache_interval``-th step runs
    the full UNet and refreshes the deep-feature cache; the steps between
    reuse it and run only the shallow layers (models/unet.py
    unet_apply_deepcache). Step 0 is always a full step. One compiled
    program — the caching schedule is a static per-step flag in the scan
    inputs, the reuse/recompute choice a lax.cond on it."""
    sigmas = np.asarray(sigmas_key, np.float64)
    table = schedules.ddpm_sigma_table(model_cfg)
    log_table = jnp.asarray(np.log(table), jnp.float32)

    denoise_c = make_denoise_cached_fn(
        params, model_cfg, context, region_biases, log_table,
        guidance_scale, guidance_rescale, attn_impl,
        compute_dtype=compute_dtype, extras=extras, conv_impl=conv_impl,
    )
    n = solvers.scan_length(solver_name, sigmas)
    use_cache = (np.arange(n) % int(cache_interval) != 0).astype(np.float64)
    b_in = latents.shape[0] * (2 if guidance_scale > 1.0 else 1)
    cache0 = jnp.zeros(
        deepcache_shape(model_cfg.unet, b_in, latents.shape[1],
                        latents.shape[2]),
        compute_dtype,
    )
    solver_fn = solvers.DEEPCACHE_SOLVERS[solver_name]
    x = solver_fn(denoise_c, latents, sigmas, cache0, use_cache)
    if decode:
        ci = attn_impl if conv_impl is None else conv_impl
        x = vae_decode(params["vae"], model_cfg.vae, x, conv_impl=ci)
        if uint8_output:
            x = jnp.round(
                jnp.clip(x * 0.5 + 0.5, 0.0, 1.0) * 255.0
            ).astype(jnp.uint8)
    return x


@functools.partial(
    jax.jit,
    static_argnames=(
        "model_cfg", "sigma", "guidance_scale", "guidance_rescale",
        "attn_impl", "conv_impl", "compute_dtype",
    ),
)
def _denoise_once(
    params,
    x,
    context,
    region_biases,
    extras,
    *,
    model_cfg: ModelConfig,
    sigma: float,
    guidance_scale: float,
    guidance_rescale: float,
    attn_impl: str,
    conv_impl: Optional[str] = None,
    compute_dtype=jnp.bfloat16,
):
    """One CFG-mixed denoised estimate x0_hat(x, sigma) — the same denoiser
    the solver scans run, evaluated once. Used at the resolution boundaries
    of :meth:`StableDiffusionTPU.txt2img_bottleneck` to re-noise from the
    model's prediction instead of resizing the noisy latent directly."""
    table = schedules.ddpm_sigma_table(model_cfg)
    log_table = jnp.asarray(np.log(table), jnp.float32)
    denoise = make_denoise_fn(
        params, model_cfg, context, region_biases, log_table,
        guidance_scale, guidance_rescale, attn_impl,
        compute_dtype=compute_dtype, extras=extras,
        sigma_steps=np.asarray([sigma], np.float64), conv_impl=conv_impl,
    )
    return denoise(x, jnp.float32(sigma))


# ---------------------------------------------------------------------------
# User-facing pipeline
# ---------------------------------------------------------------------------


class StableDiffusionTPU:
    """txt2img / img2img / inpaint with optional region control, ControlNet,
    T2I-Adapter, IP-Adapter, and hires fix.

    Public surface mirrors the reference's
    ``StableDiffusionPipeline.txt2img / img2img / inpaiting``
    (model_k_diffusion.py:943, 543, 1365)."""

    def __init__(self, model_cfg: ModelConfig, params: Dict[str, Any],
                 tokenizer=None, attn_impl: Optional[str] = None,
                 conv_impl: Optional[str] = None,
                 seed_in_program: bool = True):
        self.model_cfg = model_cfg
        self.params = params
        self.tokenizer = tokenizer
        if attn_impl is None:
            # Pallas kernels measure ~13% faster end-to-end on TPU; on CPU
            # they would run in interpret mode, so default to XLA there.
            attn_impl = (
                "pallas" if jax.default_backend() == "tpu" else "xla"
            )
        self.attn_impl = attn_impl
        # Resnet conv path. Default "xla": the round-3 A/B showed XLA's
        # conv+fusion pipeline beats the fused Pallas GN+SiLU+conv kernel
        # at the hot shapes (level0 64x64x320 pair 276 ms vs 443 ms / 20
        # iters; whole-pipeline BENCH_r02 0.831 s pallas vs 0.720 s xla).
        # "pallas" remains selectable for future kernel work (PERF.md).
        self.conv_impl = conv_impl or "xla"
        # txt2img draws initial latents + solver noise inside the compiled
        # sampling program (saves 3-4 eager relay round trips per image,
        # ~30 ms each on the axon backend). False restores the round-2
        # eager-init program — same PRNG streams, already in the remote
        # compile cache; useful when the compile relay is degraded.
        self.seed_in_program = seed_in_program
        self.sigma_table = schedules.ddpm_sigma_table(model_cfg)

    # -- prompt encoding ----------------------------------------------------

    def encode_prompt(
        self,
        prompts: Sequence[str],
        negative_prompts: Sequence[str],
        clip_skip: int = 2,
        mode: str = "short",
        num_images_per_prompt: int = 1,
    ) -> Tuple[jnp.ndarray, List[List[int]]]:
        """Returns (context (2B, S, D) [uncond..., cond...], cond token ids
        per prompt for region matching)."""
        from ..text.encoder import encode_prompts

        return encode_prompts(
            self.params["clip"], self.model_cfg.clip, self.tokenizer,
            list(prompts), list(negative_prompts), clip_skip=clip_skip,
            mode=mode, num_images_per_prompt=num_images_per_prompt,
        )

    # -- region state -------------------------------------------------------

    def encode_region(
        self,
        region_states: Sequence[Optional[dict]],
        prompt_ids: Sequence[Sequence[int]],
        height: int,
        width: int,
        num_images_per_prompt: int = 1,
        do_cfg: bool = True,
    ):
        from ..ops.region_map import encode_region_state

        if not any(region_states):
            return None

        def tok(phrase: str) -> List[int]:
            return self.tokenizer.encode(phrase, add_special_tokens=False)

        return encode_region_state(
            region_states, prompt_ids, tok, height=height, width=width,
            num_images_per_prompt=num_images_per_prompt, do_cfg=do_cfg,
        )

    # -- conditioning builders ---------------------------------------------

    def build_controlnet_extras(
        self,
        gen: GenerationConfig,
        controlnet_params: Sequence,
        cond_images: Sequence[jnp.ndarray],  # each (B, H, W, 3) in [0, 1]
        scales: Sequence[float],
        starts: Optional[Sequence[float]] = None,
        ends: Optional[Sequence[float]] = None,
        guess_mode: bool = False,
        do_cfg: bool = True,
    ) -> DenoiseExtras:
        n = len(controlnet_params)
        starts = list(starts or [0.0] * n)
        ends = list(ends or [1.0] * n)
        keeps = controlnet_keep_schedule(gen.num_inference_steps, starts,
                                         ends)
        scale_tab = keeps * np.asarray(scales, np.float32)[:, None]
        imgs = []
        for img in cond_images:
            img = jnp.asarray(img, jnp.float32)
            if do_cfg and not guess_mode:
                img = jnp.concatenate([img, img], axis=0)
            imgs.append(img)
        return DenoiseExtras(
            controlnet_params=list(controlnet_params),
            controlnet_images=imgs,
            controlnet_scales=tuple(map(tuple, scale_tab)),
            controlnet_guess=guess_mode,
        )

    def build_t2i_extras(
        self,
        gen: GenerationConfig,
        adapter_params: Sequence,
        cond_images: Sequence[jnp.ndarray],
        scales: Sequence[float],
        conditioning_factor: float = 1.0,
        do_cfg: bool = True,
        base: Optional[DenoiseExtras] = None,
        adapter_cfg=None,
    ) -> DenoiseExtras:
        from ..config import T2IAdapterConfig
        from ..models.t2i_adapter import multi_adapter_apply

        if adapter_cfg is None:
            # adapter trunk channels must mirror the UNet's levels
            adapter_cfg = T2IAdapterConfig(
                channels=self.model_cfg.unet.block_out_channels
            )
        feats = multi_adapter_apply(
            adapter_params, adapter_cfg,
            [jnp.asarray(i, jnp.float32) for i in cond_images], scales
        )
        if do_cfg:
            feats = tuple(jnp.concatenate([f, f], axis=0) for f in feats)
        steps = gen.num_inference_steps
        active = (
            np.arange(steps) < int(steps * conditioning_factor)
        ).astype(np.float32)
        return dataclasses.replace(
            base or DenoiseExtras(),
            t2i_residuals=feats, t2i_active=tuple(active),
        )

    def build_ip_extras(
        self,
        adapters: Sequence,  # List[models.ip_adapter.LoadedIPAdapter]
        image_embeds: Sequence[jnp.ndarray],  # per adapter, (B, D) or (B,P,D)
        scales: Sequence[float],
        masks: Optional[Sequence[Optional[jnp.ndarray]]] = None,
        uncond_image_embeds: Optional[Sequence[jnp.ndarray]] = None,
        do_cfg: bool = True,
        base: Optional[DenoiseExtras] = None,
    ) -> DenoiseExtras:
        """Project image embeds to IP tokens, CFG-doubled
        [uncond_tokens, cond_tokens] (reference:
        prepare_ip_adapter_image_embeds, model_k_diffusion.py:173-222).
        ``masks``: optional per-adapter (B, H, W) spatial gates
        (reference: attention_modify.py:676-683)."""
        ip_tokens = []
        for i, (ad, emb) in enumerate(zip(adapters, image_embeds)):
            cond_tok = ad.project(jnp.asarray(emb))
            if do_cfg:
                u_emb = (
                    jnp.asarray(uncond_image_embeds[i])
                    if uncond_image_embeds is not None
                    else jnp.zeros_like(jnp.asarray(emb))
                )
                uncond_tok = ad.project(u_emb)
                cond_tok = jnp.concatenate([uncond_tok, cond_tok], axis=0)
            ip_tokens.append(cond_tok)
        mask_tuple = None
        if masks is not None:
            mask_tuple = tuple(
                None if m is None else jnp.concatenate(
                    [jnp.asarray(m)] * (2 if do_cfg else 1), axis=0
                )
                for m in masks
            )
        ex = base or DenoiseExtras()
        return dataclasses.replace(
            ex,
            ip_tokens=tuple(ip_tokens),
            ip_scales=tuple(float(s) for s in scales),
            ip_masks=mask_tuple,
        )

    # -- sampling -----------------------------------------------------------

    def _schedule(self, gen: GenerationConfig):
        _, _, defaults = solvers.SOLVERS[gen.sampler]
        sigmas = schedules.get_sigmas(
            self.model_cfg,
            gen.num_inference_steps,
            gen.schedule,
            defaults.get("discard_next_to_last_sigma", False),
        )
        return sigmas, defaults

    def _solver_noise(self, rng, sigmas, shape, solver_name: str):
        return _solver_noise_fn(rng, sigmas, shape, solver_name)

    def _solver_opts(self, gen: GenerationConfig, defaults: dict):
        opts = {
            k: v
            for k, v in defaults.items()
            if k not in ("discard_next_to_last_sigma", "brownian")
        }
        if gen.sampler in ("euler_ancestral", "dpm_2_ancestral",
                           "dpmpp_2s_ancestral", "dpmpp_sde", "dpmpp_2m_sde",
                           "dpmpp_2m_sde_heun", "dpmpp_3m_sde"):
            opts["eta"] = gen.eta
        return opts

    def _run(self, latents, context, region_biases, sigmas, gen, noise,
             extras, decode, return_history=False, uint8_output=False,
             seed_arr=None, init_shape=None):
        return _sample_core(
            self.params, latents, context, region_biases, noise,
            extras, seed_arr,
            init_shape=init_shape,
            model_cfg=self.model_cfg,
            solver_name=gen.sampler,
            sigmas_key=tuple(float(s) for s in sigmas),
            guidance_scale=gen.guidance_scale,
            guidance_rescale=gen.guidance_rescale,
            attn_impl=self.attn_impl,
            conv_impl=self.conv_impl,
            solver_opts=tuple(sorted(self._solver_opts(
                gen, self._schedule(gen)[1]).items())),
            decode=decode,
            compute_dtype=gen.dtype,
            return_history=return_history,
            uint8_output=uint8_output,
        )


    def sample_chunked(
        self,
        context: jnp.ndarray,
        gen: GenerationConfig,
        seed=0,
        region_biases=None,
        batch_size: int = 1,
        extras: Optional[DenoiseExtras] = None,
        chunk_steps: int = 8,
        on_chunk=None,
        latents: Optional[jnp.ndarray] = None,
        decode: bool = True,
        uint8_output: bool = False,
        resume: Optional["ChunkedPause"] = None,
    ):
        """txt2img with host re-entry every ``chunk_steps`` solver steps.

        The reference asserts its inference timeout inside every model_fn
        call (model_k_diffusion.py:1094-1095); an XLA scan admits no
        mid-program host checks, so this runner splits the scan into
        dynamic segments of one compiled program each and calls
        ``on_chunk(steps_done, steps_total)`` between them — ``on_chunk``
        may raise (e.g. ``Watchdog.check``) to cancel the run. All per-step
        inputs come from the full static schedule and the solver carry is
        threaded through unchanged, so results are BITWISE IDENTICAL to the
        single-scan path with eager init (``seed_in_program=False``;
        tests/test_solvers.py). Against the default in-program-init
        txt2img they agree to float rounding only (fusion context differs
        between programs). Costs: at most three compiled variants (first
        chunk, steady chunk, remainder) and a host sync per chunk.

        Pause/resume (the reference keeps an unused ``self._interrupt``
        flag, model_diffusers.py:237/:342 — never wired; here the scan
        chunking makes mid-run checkpointing real): ``on_chunk`` may return
        ``False`` to pause, in which case this method returns a
        :class:`ChunkedPause` holding the solver state at the chunk
        boundary. Passing it back via ``resume=`` (with the same seed/gen/
        conditioning arguments) continues the run and produces output
        bitwise identical to an uninterrupted one — the schedule, noise
        table, and initial latents are all deterministic functions of the
        arguments, so only ``(x, carry, pos)`` need to travel.
        """
        if gen.sampler not in solvers.CHUNKABLE:
            raise ValueError(
                f"solver {gen.sampler!r} does not support chunked "
                f"execution (host-unrolled or adaptive)"
            )
        sigmas, defaults = self._schedule(gen)
        if _is_seed_list(seed):
            batch_size = len(seed)
        k_lat, k_noise = _seed_fold_keys(seed, 2)
        shape = (batch_size, gen.latent_height, gen.latent_width, 4)
        if latents is None:
            latents = _keyed_normal(k_lat, shape)
        latents = latents * float(np.sqrt(sigmas[0] ** 2 + 1.0))
        noise = self._solver_noise(k_noise, sigmas, shape, gen.sampler)

        n_total = solvers.scan_length(gen.sampler, sigmas)
        opts = tuple(sorted(self._solver_opts(gen, defaults).items()))
        if resume is not None:
            if resume.n_total != n_total:
                raise ValueError(
                    "resume state was captured under a different schedule "
                    f"({resume.n_total} scan steps vs {n_total})"
                )
            carry, x, pos = resume.carry, resume.x, int(resume.pos)
        else:
            carry = None
            x = latents
            pos = 0
        while pos < n_total:
            size = min(int(chunk_steps), n_total - pos)
            x, carry = _sample_chunk(
                self.params, carry, latents, context, region_biases,
                noise, extras, jnp.int32(pos),
                model_cfg=self.model_cfg,
                solver_name=gen.sampler,
                sigmas_key=tuple(float(v) for v in sigmas),
                guidance_scale=gen.guidance_scale,
                guidance_rescale=gen.guidance_rescale,
                attn_impl=self.attn_impl,
                conv_impl=self.conv_impl,
                solver_opts=opts,
                compute_dtype=gen.dtype,
                segment_size=size,
            )
            # real re-entry point: wait for the chunk before checking
            # (note: on the axon relay block_until_ready is advisory —
            # see CLAUDE.md — so wall-clock there is approximate)
            jax.block_until_ready(x)
            pos += size
            if on_chunk is not None:
                if on_chunk(pos, n_total) is False and pos < n_total:
                    return ChunkedPause(x=x, carry=carry, pos=pos,
                                        n_total=n_total)
        if decode:
            x = self.decode_latents(x)
            if uint8_output:
                x = jnp.round(
                    jnp.clip(x * 0.5 + 0.5, 0.0, 1.0) * 255.0
                ).astype(jnp.uint8)
        return x

    def txt2img_cfg_tail(
        self,
        context: jnp.ndarray,
        gen: GenerationConfig,
        tail_frac: float,
        seed=0,
        region_biases=None,
        batch_size: int = 1,
        extras: Optional[DenoiseExtras] = None,
        decode: bool = True,
        uint8_output: bool = False,
    ):
        """txt2img with the final ``tail_frac`` of solver steps run
        WITHOUT the CFG pair (cond batch only, guidance off) — an optional
        acceleration mode with no reference counterpart (the reference
        always runs both halves every step). Rationale: by the low-sigma
        tail the cond and uncond predictions have largely converged, so
        dropping the uncond pass halves the tail's UNet work for a
        near-imperceptible output change (cf. PAPERS.md step-skipping
        lines). Built on the chunked runner's pause/resume: segment 1 runs
        the CFG program to the cutoff, segment 2 resumes the SAME solver
        carry/noise streams with cond-only conditioning, so
        ``tail_frac=0.0`` is bitwise identical to :meth:`txt2img`."""
        sigmas, _ = self._schedule(gen)
        n_total = solvers.scan_length(gen.sampler, sigmas)
        n_tail = int(round(n_total * float(tail_frac)))
        cutoff = max(1, n_total - n_tail)  # keep >= 1 CFG step
        if cutoff >= n_total or gen.guidance_scale <= 1.0:
            return self.txt2img(
                context, gen, seed=seed, region_biases=region_biases,
                batch_size=batch_size, extras=extras, decode=decode,
                uint8_output=uint8_output,
            )
        pause = self.sample_chunked(
            context, gen, seed=seed, region_biases=region_biases,
            batch_size=batch_size, extras=extras, chunk_steps=cutoff,
            on_chunk=lambda done, total: done < cutoff, decode=False,
        )
        ctx2, rb2, ex2 = cond_half_conditioning(
            context, region_biases, extras)
        gen2 = dataclasses.replace(gen, guidance_scale=1.0)
        return self.sample_chunked(
            ctx2, gen2, seed=seed, region_biases=rb2, batch_size=batch_size,
            extras=ex2, chunk_steps=n_total, resume=pause, decode=decode,
            uint8_output=uint8_output,
        )

    def txt2img_tgate(
        self,
        context: jnp.ndarray,
        gen: GenerationConfig,
        gate_frac: float = 0.5,
        seed=0,
        region_biases=None,
        batch_size: int = 1,
        extras: Optional[DenoiseExtras] = None,
        decode: bool = True,
        uint8_output: bool = False,
    ):
        """TGATE-style temporal attention decomposition (PAPERS.md "Faster
        Diffusion via Temporal Attention Decomposition"): cross-attention
        outputs converge once the semantics are planned, so after the gate
        step they are frozen. Segment 1 runs the first ``gate_frac`` of
        solver steps normally (CFG on); at the gate one extra forward
        captures every cross-attention output, CFG-pair-averaged; segment 2
        resumes the SAME solver carry and noise streams cond-only (with a
        shared frozen cross-attention both CFG halves are identical, so the
        uncond half is dropped — that is TGATE's speedup) with the frozen
        outputs substituted for all cross-attention compute.

        Opt-in acceleration with no reference counterpart; excluded from
        headline benchmarks. ``gate_frac>=1`` is exactly :meth:`txt2img`.
        ControlNet / T2I residuals stay live (they inject into resnets);
        region control and IP-Adapter influence persists only through the
        frozen outputs past the gate (consistent with the method: the
        sigma-scaled region term fades by the tail anyway)."""
        sigmas, _ = self._schedule(gen)
        n_total = solvers.scan_length(gen.sampler, sigmas)
        gate = int(round(n_total * float(gate_frac)))
        if gate >= n_total:
            return self.txt2img(
                context, gen, seed=seed, region_biases=region_biases,
                batch_size=batch_size, extras=extras, decode=decode,
                uint8_output=uint8_output,
            )
        gate = max(1, gate)
        if gen.sampler not in solvers.DEEPCACHE_SOLVERS:
            # the gate sigma must be the scan-step sigma (sigmas[gate]);
            # that mapping only holds for the plain one-eval-per-step
            # deterministic solvers
            raise ValueError(
                f"tgate supports {sorted(solvers.DEEPCACHE_SOLVERS)}, "
                f"not {gen.sampler!r}"
            )
        if _is_seed_list(seed):
            batch_size = len(seed)
        shape = (batch_size, gen.latent_height, gen.latent_width, 4)
        if self.seed_in_program:
            seed_init = dict(seed_arr=_seed_to_arr(seed), init_shape=shape)
            latents = noise = None
        else:
            seed_init = {}
            k_lat, k_noise = _seed_fold_keys(seed, 2)
            latents = _keyed_normal(k_lat, shape) * float(
                np.sqrt(sigmas[0] ** 2 + 1.0)
            )
            noise = self._solver_noise(k_noise, sigmas, shape, gen.sampler)
        opts = tuple(sorted(self._solver_opts(
            gen, self._schedule(gen)[1]).items()))
        return _tgate_core(
            self.params, latents, context, region_biases, noise, extras,
            model_cfg=self.model_cfg,
            solver_name=gen.sampler,
            sigmas_key=tuple(float(s) for s in sigmas),
            gate=gate,
            guidance_scale=gen.guidance_scale,
            guidance_rescale=gen.guidance_rescale,
            attn_impl=self.attn_impl,
            conv_impl=self.conv_impl,
            solver_opts=opts,
            decode=decode,
            compute_dtype=gen.dtype,
            uint8_output=uint8_output,
            **seed_init,
        )

    def txt2img_deepcache(
        self,
        context: jnp.ndarray,
        gen: GenerationConfig,
        cache_interval: int = 3,
        seed=0,
        region_biases=None,
        batch_size: int = 1,
        extras: Optional[DenoiseExtras] = None,
        decode: bool = True,
        uint8_output: bool = False,
    ):
        """txt2img with DeepCache-style deep-branch feature reuse: every
        ``cache_interval``-th solver step runs the full UNet; the steps
        between reuse the cached deep features and run only the shallow
        layers (models/unet.py unet_apply_deepcache). Opt-in acceleration
        mode with no reference counterpart (the reference always runs the
        full UNet every step); ``cache_interval=1`` runs every step full
        and matches :meth:`txt2img` to fusion tolerance. Deterministic
        solvers only (euler / dpmpp_2m); ControlNet / T2I-Adapter units
        are rejected (they inject into the cached branch)."""
        if gen.sampler not in solvers.DEEPCACHE_SOLVERS:
            raise ValueError(
                f"deepcache supports {sorted(solvers.DEEPCACHE_SOLVERS)}, "
                f"not {gen.sampler!r}"
            )
        sigmas, _ = self._schedule(gen)
        if _is_seed_list(seed):
            batch_size = len(seed)
        k_lat, _ = _seed_fold_keys(seed, 2)  # same init stream as txt2img
        shape = (batch_size, gen.latent_height, gen.latent_width, 4)
        latents = _keyed_normal(k_lat, shape)
        latents = latents * float(np.sqrt(sigmas[0] ** 2 + 1.0))
        return _sample_deepcache_core(
            self.params, latents, context, region_biases, extras,
            model_cfg=self.model_cfg,
            solver_name=gen.sampler,
            sigmas_key=tuple(float(v) for v in sigmas),
            guidance_scale=gen.guidance_scale,
            guidance_rescale=gen.guidance_rescale,
            attn_impl=self.attn_impl,
            cache_interval=int(cache_interval),
            decode=decode,
            conv_impl=self.conv_impl,
            compute_dtype=gen.dtype,
            uint8_output=uint8_output,
        )

    def txt2img_bottleneck(
        self,
        context: jnp.ndarray,
        gen: GenerationConfig,
        low_scale: float = 0.5,
        mid_frac: Tuple[float, float] = (0.2, 0.8),
        seed=0,
        region_biases=None,
        region_state=None,  # (states, prompt_ids, nipp): re-encode per res
        batch_size: int = 1,
        extras: Optional[DenoiseExtras] = None,
        decode: bool = True,
        uint8_output: bool = False,
    ):
        """Bottleneck sampling (resolution scheduling — PAPERS.md
        "Training-free Diffusion Acceleration with Bottleneck Sampling"):
        the solver runs the first ``mid_frac[0]`` of the schedule at full
        resolution, the middle at ``low_scale`` of the latent size, and
        the tail at full resolution again. At each boundary the latent is
        NOT resized directly — the model's denoised estimate x0_hat is
        resized and re-noised with fresh noise at the boundary sigma (the
        noise component of a bilinearly-resized latent is low-passed and
        under-scaled; re-noising from x0_hat keeps the marginal exact).

        Opt-in acceleration with no reference counterpart; deterministic
        solvers only (euler / dpmpp_2m — each phase restarts the solver
        carry, so multistep history does not cross a resolution change).
        Region control: pass ``region_state`` (same triple as
        hires["region_state"]) so biases are re-encoded per resolution;
        resolution-bound extras (ControlNet / T2I / inpaint /
        extra-channels) are rejected, IP tokens pass through."""
        if gen.sampler not in solvers.DEEPCACHE_SOLVERS:
            raise ValueError(
                f"bottleneck sampling supports "
                f"{sorted(solvers.DEEPCACHE_SOLVERS)}, not {gen.sampler!r}"
            )
        ex = extras or DenoiseExtras()
        if (ex.controlnet_params is not None or ex.t2i_residuals is not None
                or ex.inpaint_mask is not None
                or ex.extra_channels is not None):
            raise ValueError(
                "bottleneck sampling does not support resolution-bound "
                "extras (ControlNet / T2I-Adapter / inpaint)"
            )
        if region_biases is not None and region_state is None:
            raise ValueError(
                "bottleneck sampling needs region_state (raw states + "
                "prompt ids) to re-encode biases at the low resolution; "
                "precomputed region_biases alone cannot serve both sizes"
            )
        from ..ops.resize import resize_latents

        sigmas, defaults = self._schedule(gen)
        opts = tuple(sorted(self._solver_opts(gen, defaults).items()))
        n = len(sigmas) - 1
        i1 = max(1, int(round(n * float(mid_frac[0]))))
        i2 = min(n - 1, int(round(n * float(mid_frac[1]))))
        if not i1 < i2:
            raise ValueError(f"mid_frac {mid_frac} leaves no middle phase "
                             f"for {n} steps")
        lh, lw = gen.latent_height, gen.latent_width
        # the UNet downsamples 3x: keep the low-res latent 8-aligned
        bh = max(8, int(round(lh * float(low_scale) / 8)) * 8)
        bw = max(8, int(round(lw * float(low_scale) / 8)) * 8)

        if _is_seed_list(seed):
            batch_size = len(seed)
        k_lat, _, k_b1, k_b2 = _seed_fold_keys(seed, 4)
        shape = (batch_size, lh, lw, 4)
        latents = _keyed_normal(k_lat, shape)
        latents = latents * float(np.sqrt(sigmas[0] ** 2 + 1.0))

        hi_biases = region_biases
        lo_biases = None
        if region_state is not None:
            states, ids, nipp = region_state
            do_cfg = gen.guidance_scale > 1.0
            hi_biases = self.encode_region(
                states, ids, height=lh * 8, width=lw * 8,
                num_images_per_prompt=nipp, do_cfg=do_cfg)
            lo_biases = self.encode_region(
                states, ids, height=bh * 8, width=bw * 8,
                num_images_per_prompt=nipp, do_cfg=do_cfg)

        def seg(x, lo, hi, biases, decode_out, uint8_out):
            return _sample_core(
                self.params, x, context, biases, None, extras,
                model_cfg=self.model_cfg, solver_name=gen.sampler,
                sigmas_key=tuple(float(v) for v in sigmas[lo:hi + 1]),
                guidance_scale=gen.guidance_scale,
                guidance_rescale=gen.guidance_rescale,
                attn_impl=self.attn_impl, solver_opts=opts,
                decode=decode_out, conv_impl=self.conv_impl,
                compute_dtype=gen.dtype, uint8_output=uint8_out,
            )

        def boundary(x, sigma, new_h, new_w, biases, key):
            x0 = _denoise_once(
                self.params, x, context, biases, extras,
                model_cfg=self.model_cfg, sigma=float(sigma),
                guidance_scale=gen.guidance_scale,
                guidance_rescale=gen.guidance_rescale,
                attn_impl=self.attn_impl, conv_impl=self.conv_impl,
                compute_dtype=gen.dtype,
            )
            x0 = resize_latents(x0, new_h, new_w, mode="bilinear")
            eps = _keyed_normal(key, x0.shape)
            return x0 + float(sigma) * eps

        x = seg(latents, 0, i1, hi_biases, False, False)
        x = boundary(x, sigmas[i1], bh, bw, hi_biases, k_b1)
        x = seg(x, i1, i2, lo_biases, False, False)
        x = boundary(x, sigmas[i2], lh, lw, lo_biases, k_b2)
        return seg(x, i2, n, hi_biases, decode, uint8_output)

    def txt2img(
        self,
        context: jnp.ndarray,
        gen: GenerationConfig,
        seed: int = 0,
        region_biases=None,
        batch_size: int = 1,
        decode: bool = True,
        latents: Optional[jnp.ndarray] = None,
        extras: Optional[DenoiseExtras] = None,
        hires: Optional[dict] = None,
        return_history: bool = False,
        uint8_output: bool = False,
    ):
        """Core txt2img on pre-encoded context. Returns decoded images
        (B, H, W, 3) fp32 in [-1, 1] (or raw latents with decode=False).

        ``hires``: optional dict(scale=2.0, strength=0.6, steps=None,
        mode="bilinear", antialias=False, sampler=None, schedule=None) —
        latent upscale + recursive img2img (reference:
        model_k_diffusion.py:1179-1226; modes source/app.py:2117-2127;
        sampler/schedule override the hires pass like the reference's
        ``sampler_hires`` dropdown, app.py:867).

        ``seed`` may be a list (one per batch element): each sample's
        latents/noise then depend only on its own seed, making results
        invariant to batch composition and mesh shape (SURVEY.md §4 item e).

        With ``return_history`` and hires, returns ``(images, [base_hist,
        hires_hist])`` — both passes' per-step latents, matching the
        reference's preview list that spans the base loop and the hires
        recursion (model_k_diffusion.py:782-783, 1221-1224).
        """
        sigmas, defaults = self._schedule(gen)
        if _is_seed_list(seed):
            batch_size = len(seed)
        shape = (batch_size, gen.latent_height, gen.latent_width, 4)
        if latents is None and self.seed_in_program:
            # Initial latents + solver noise are drawn inside the compiled
            # sampling program (see _sample_core) — same PRNG streams as
            # the eager path below without its per-op dispatch cost.
            seed_init = dict(seed_arr=_seed_to_arr(seed), init_shape=shape)
            latents = noise = None
        else:
            seed_init = {}
            k_lat, k_noise = _seed_fold_keys(seed, 2)
            if latents is None:
                latents = _keyed_normal(k_lat, shape)
            latents = latents * float(np.sqrt(sigmas[0] ** 2 + 1.0))
            noise = self._solver_noise(k_noise, sigmas, shape, gen.sampler)
        out = self._run(latents, context, region_biases, sigmas, gen, noise,
                        extras, decode=decode and hires is None,
                        return_history=return_history,
                        uint8_output=uint8_output and hires is None,
                        **seed_init)
        if hires is None:
            return out
        base_history = None
        if return_history:
            out, base_history = out

        # Hires fix: resize latents, recursive img2img at the target size.
        from ..ops.resize import resize_latents

        scale = float(hires.get("scale", 2.0))
        new_h = int(gen.height * scale) // 8
        new_w = int(gen.width * scale) // 8
        up = resize_latents(out, new_h, new_w,
                            mode=hires.get("mode", "bilinear"),
                            antialias=bool(hires.get("antialias", False)))
        gen_hr = dataclasses.replace(
            gen, height=new_h * 8, width=new_w * 8,
            num_inference_steps=hires.get("steps")
            or gen.num_inference_steps,
            # the hires pass may run a different sampler/schedule than the
            # base pass (reference: the separate `sampler_hires` dropdown,
            # app.py:867/1101/1187 selects it for the upscale recursion)
            sampler=hires.get("sampler") or gen.sampler,
            schedule=hires.get("schedule") or gen.schedule,
        )
        # Region biases are resolution-keyed; the hires pass needs them
        # re-encoded at the target size (the reference re-encodes inside
        # its recursive img2img from the raw state,
        # model_k_diffusion.py:1050). Callers pass hires["region_state"]
        # (raw state dicts + prompt ids) to enable that here.
        hr_biases = None
        if hires.get("region_state") is not None:
            states, ids, nipp = hires["region_state"]
            hr_biases = self.encode_region(
                states, ids, height=gen_hr.height, width=gen_hr.width,
                num_images_per_prompt=nipp,
                do_cfg=gen_hr.guidance_scale > 1.0,
            )
        # ControlNet cond-images and T2I residuals are resolution-bound;
        # the reference re-prepares them at the target size inside its
        # hires recursion (model_k_diffusion.py:1206-1212). Callers pass
        # hires["rebuild_extras"] = fn(gen_hr) -> DenoiseExtras to do the
        # same here; IP tokens are resolution-free and pass through.
        hr_extras = extras
        if hires.get("rebuild_extras") is not None:
            hr_extras = hires["rebuild_extras"](gen_hr)
        elif extras is not None and (
            extras.controlnet_images is not None
            or extras.t2i_residuals is not None
        ):
            raise ValueError(
                "hires with ControlNet/T2I units needs "
                "hires['rebuild_extras'] (a fn(gen_hr) -> DenoiseExtras "
                "re-preparing the unit images at the target resolution); "
                "base-resolution extras cannot drive the hires pass"
            )
        hr_out = self.img2img(
            context, up, gen_hr,
            strength=float(hires.get("strength", 0.6)),
            seed=_next_seed(seed), region_biases=hr_biases,
            decode=decode, extras=hr_extras,
            return_history=return_history,
        )
        if return_history:
            hr_out, hr_history = hr_out
            return hr_out, [base_history, hr_history]
        return hr_out

    def img2img(
        self,
        context: jnp.ndarray,
        init_latents: jnp.ndarray,
        gen: GenerationConfig,
        strength: float = 0.8,
        seed: int = 0,
        region_biases=None,
        decode: bool = True,
        extras: Optional[DenoiseExtras] = None,
        return_history: bool = False,
    ):
        """img2img: truncate the schedule by strength and noise the init
        latents (reference: model_k_diffusion.py:628-655).

        ``seed`` may be a list with one entry per batch element, giving each
        sample its own noise stream (same contract as ``txt2img``)."""
        sigmas, defaults = self._schedule(gen)
        init_timestep = min(
            int(gen.num_inference_steps * strength), gen.num_inference_steps
        )
        t_start = max(gen.num_inference_steps - init_timestep, 0)
        sigma_sched = sigmas[t_start:]

        if _is_seed_list(seed) and len(seed) != init_latents.shape[0]:
            raise ValueError(
                f"img2img seed list length {len(seed)} != batch "
                f"{init_latents.shape[0]}"
            )
        k_lat, k_noise = _seed_fold_keys(seed, 2)
        noise0 = _keyed_normal(k_lat, init_latents.shape)
        latents = init_latents + noise0 * float(
            np.sqrt(sigma_sched[0] ** 2 + 1.0)
        )

        noise = self._solver_noise(k_noise, sigma_sched, init_latents.shape,
                                   gen.sampler)
        return self._run(latents, context, region_biases, sigma_sched, gen,
                         noise, extras, decode, return_history=return_history)

    def inpaint(
        self,
        context: jnp.ndarray,
        init_image: jnp.ndarray,  # (B, H, W, 3) in [-1, 1]
        mask: jnp.ndarray,  # (B, H, W) 1 = regenerate
        gen: GenerationConfig,
        strength: float = 1.0,
        seed: int = 0,
        region_biases=None,
        decode: bool = True,
        extras: Optional[DenoiseExtras] = None,
        return_history: bool = False,
    ):
        """Inpainting (reference: model_k_diffusion.py:1365-1660).

        4-channel UNets blend the init latents back each step outside the
        mask; 9-channel inpaint UNets additionally receive
        [mask, masked_image_latents] channels.

        ``seed`` may be a list with one entry per batch element (same
        contract as ``txt2img``)."""
        if _is_seed_list(seed) and len(seed) != init_image.shape[0]:
            raise ValueError(
                f"inpaint seed list length {len(seed)} != batch "
                f"{init_image.shape[0]}"
            )
        k_enc, k_lat, k_noise, k_blend = _seed_fold_keys(seed, 4)
        b, h, w, _ = init_image.shape
        latent_shape = (b, h // 8, w // 8, 4)

        image_latents = vae_encode(
            self.params["vae"], self.model_cfg.vae, init_image, rng=k_enc,
            conv_impl=self.conv_impl,
        )
        mask_l = jax.image.resize(
            mask.astype(jnp.float32), (b, h // 8, w // 8), "nearest"
        )[..., None]

        sigmas, defaults = self._schedule(gen)
        init_timestep = min(
            int(gen.num_inference_steps * strength), gen.num_inference_steps
        )
        t_start = max(gen.num_inference_steps - init_timestep, 0)
        sigma_sched = sigmas[t_start:]

        nine_channel = self.model_cfg.unet.in_channels == 9
        extras = extras or DenoiseExtras()
        do_cfg = gen.guidance_scale > 1.0
        if nine_channel:
            masked_image = init_image * (1.0 - np.asarray(
                jax.image.resize(mask.astype(jnp.float32), (b, h, w),
                                 "nearest")
            ))[..., None]
            masked_latents = vae_encode(
                self.params["vae"], self.model_cfg.vae,
                jnp.asarray(masked_image), rng=k_enc,
                conv_impl=self.conv_impl,
            )
            extra_ch = jnp.concatenate([mask_l, masked_latents], axis=-1)
            if do_cfg:
                extra_ch = jnp.concatenate([extra_ch, extra_ch], axis=0)
            extras = dataclasses.replace(extras, extra_channels=extra_ch)
        else:
            blend_noise = _keyed_normal(k_blend, latent_shape)
            extras = dataclasses.replace(
                extras,
                inpaint_mask=mask_l,
                inpaint_image_latents=image_latents,
                inpaint_noise=blend_noise,
            )

        if strength >= 1.0 or nine_channel:
            latents = _keyed_normal(k_lat, latent_shape)
            latents = latents * float(np.sqrt(sigma_sched[0] ** 2 + 1.0))
        else:
            noise0 = _keyed_normal(k_lat, latent_shape)
            latents = image_latents + noise0 * float(
                np.sqrt(sigma_sched[0] ** 2 + 1.0)
            )

        noise = self._solver_noise(k_noise, sigma_sched, latent_shape,
                                   gen.sampler)
        asym = self.model_cfg.vae.asymmetric
        out = self._run(latents, context, region_biases, sigma_sched, gen,
                        noise, extras, decode and not asym,
                        return_history=return_history)
        history = None
        if return_history:
            out, history = out
        if decode and asym:
            # mask-conditioned decode: the decoder reconstructs the known
            # pixels from the masked init image at every scale (reference:
            # AsymmetricAutoencoderKL decode, model_diffusers.py:1516-1549)
            mask_full = jax.image.resize(
                mask.astype(jnp.float32), (b, h, w), "nearest"
            )[..., None]
            out = vae_decode(
                self.params["vae"], self.model_cfg.vae, out,
                cond_image=init_image * (1.0 - mask_full),
                cond_mask=mask_full,
                conv_impl=self.conv_impl,
            )
        return (out, history) if return_history else out

    # -- codecs -------------------------------------------------------------

    def encode_image(self, images: jnp.ndarray, seed: int = 0):
        """images (B, H, W, 3) in [-1, 1] -> scaled latents."""
        return vae_encode(
            self.params["vae"], self.model_cfg.vae, images,
            rng=jax.random.PRNGKey(seed),
            conv_impl=self.conv_impl,
        )

    def decode_latents(self, latents: jnp.ndarray):
        return vae_decode(self.params["vae"], self.model_cfg.vae, latents,
                          conv_impl=self.conv_impl)

    @staticmethod
    def to_uint8(images: jnp.ndarray) -> np.ndarray:
        if images.dtype == jnp.uint8 or images.dtype == np.uint8:
            return np.asarray(images)
        from ..runtime import native

        return native.tensor_to_u8(np.asarray(images))

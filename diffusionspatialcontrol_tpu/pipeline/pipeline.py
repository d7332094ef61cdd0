"""txt2img / img2img generation pipeline: one jitted program per config.

Replaces the reference's two parallel pipeline stacks (k-diffusion:
source/modules/model_k_diffusion.py; diffusers schedulers:
source/modules/model_diffusers.py) with a single functional core: the CLIP
encode, the full sampler loop (CFG pair batched on the batch axis, region
biases resident on device), and the VAE decode each compile to one XLA
program. Host work is tokenization and PIL I/O only.

Math parity notes:
  * initial latents are scaled by (sigma_0^2 + 1)^0.5
    (reference: model_k_diffusion.py:1043 txt2img, :655 img2img);
  * CFG mixes *denoised* outputs: u + g*(c-u) (model_k_diffusion.py:1162-1166)
    followed by guidance_rescale (model_k_diffusion.py:71-82);
  * the sigma-space denoiser wraps an epsilon or v prediction UNet exactly as
    CompVisDenoiser / CompVisVDenoiser do
    (reference: source/modules/external_k_diffusion.py:86-114, 142-182),
    including the channel-slice fix for 9-channel inpaint UNets (:113).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GenerationConfig, ModelConfig
from ..models.clip import clip_apply
from ..models.unet import RegionState, UNetCond, unet_apply
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
    cond_extras: Optional[dict] = None,
    extra_channels: Optional[jnp.ndarray] = None,
    inpaint_blend: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
):
    """Builds D(x; sigma) for the solvers.

    ``extra_channels``: (B_cfg, h, w, 5) mask+masked-latents concat for the
    9-channel inpaint UNet (reference: model_k_diffusion.py:1618-1620).
    ``inpaint_blend``: (mask, init_latents) for per-step 4-channel latent
    blending (reference: model_k_diffusion.py:1599-1612).
    """
    do_cfg = guidance_scale > 1.0
    cond_extras = cond_extras or {}

    def denoise(x, sigma):
        if inpaint_blend is not None:
            mask, init_latents = inpaint_blend
            noised_init = init_latents + jnp.sqrt(sigma**2 + 1.0) * (
                inpaint_blend_noise(x)
            )
            x = x * mask + noised_init * (1 - mask)

        x_in = jnp.concatenate([x, x], axis=0) if do_cfg else x
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        t = _sigma_to_t(sigma, log_sigma_table)
        t_b = jnp.full((x_in.shape[0],), t, jnp.float32)

        model_in = (x_in * c_in).astype(compute_dtype)
        if extra_channels is not None:
            model_in = jnp.concatenate(
                [model_in, extra_channels.astype(compute_dtype)], axis=-1
            )

        region = None
        if region_biases is not None:
            region = RegionState(region_biases, sigma)
        cond = UNetCond(context=context, region=region, **cond_extras)

        out = unet_apply(
            params["unet"], model_cfg.unet, model_in, t_b, cond,
            attn_impl=attn_impl,
        ).astype(jnp.float32)

        if model_cfg.prediction_type == "v_prediction":
            c_skip = 1.0 / (sigma**2 + 1.0)
            c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
            denoised = out * c_out + x_in * c_skip
        else:
            denoised = x_in - out * sigma

        if do_cfg:
            d_u, d_c = jnp.split(denoised, 2, axis=0)
            mixed = d_u + guidance_scale * (d_c - d_u)
            if guidance_rescale > 0.0:
                mixed = rescale_noise_cfg(mixed, d_c, guidance_rescale)
            return mixed
        return denoised

    return denoise


def inpaint_blend_noise(x):  # placeholder hook, replaced in inpaint milestone
    return jnp.zeros_like(x)


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
        "solver_opts",
        "decode",
        "compute_dtype",
    ),
)
def _sample_core(
    params,
    latents,
    context,
    region_biases,
    noise,
    *,
    model_cfg: ModelConfig,
    solver_name: str,
    sigmas_key: Tuple[float, ...],
    guidance_scale: float,
    guidance_rescale: float,
    attn_impl: str,
    solver_opts: Tuple[Tuple[str, Any], ...],
    decode: bool,
    compute_dtype=jnp.bfloat16,
):
    sigmas = np.asarray(sigmas_key, np.float64)
    table = schedules.ddpm_sigma_table(model_cfg)
    log_table = jnp.asarray(np.log(table), jnp.float32)

    denoise = make_denoise_fn(
        params, model_cfg, context, region_biases, log_table,
        guidance_scale, guidance_rescale, attn_impl,
        compute_dtype=compute_dtype,
    )
    solver_fn, _, _ = solvers.SOLVERS[solver_name]
    x = solver_fn(denoise, latents, sigmas, noise=noise, **dict(solver_opts))
    if decode:
        return vae_decode(params["vae"], model_cfg.vae, x)
    return x


# ---------------------------------------------------------------------------
# User-facing pipeline
# ---------------------------------------------------------------------------


class StableDiffusionTPU:
    """txt2img / img2img with optional region control.

    Public surface mirrors the reference's ``StableDiffusionPipeline.txt2img``
    / ``img2img`` (model_k_diffusion.py:943, 543) with prompts, negative
    prompts, region state, sampler/schedule selection, CFG, clip-skip, seeds,
    and hires-fix upscaling.
    """

    def __init__(self, model_cfg: ModelConfig, params: Dict[str, Any],
                 tokenizer=None, attn_impl: str = "xla"):
        self.model_cfg = model_cfg
        self.params = params
        self.tokenizer = tokenizer
        self.attn_impl = attn_impl
        self.sigma_table = schedules.ddpm_sigma_table(model_cfg)

    # -- prompt encoding ----------------------------------------------------

    def encode_prompt(
        self,
        prompts: Sequence[str],
        negative_prompts: Sequence[str],
        clip_skip: int = 2,
        mode: str = "short",
    ) -> Tuple[jnp.ndarray, List[List[int]]]:
        """Returns (context (2B, S, D) [uncond..., cond...], cond token ids
        per prompt for region matching). Delegates to text.encoder for the
        three encoding modes."""
        from ..text.encoder import encode_prompts

        return encode_prompts(
            self.params["clip"], self.model_cfg.clip, self.tokenizer,
            list(prompts), list(negative_prompts), clip_skip=clip_skip,
            mode=mode,
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

    def _solver_noise(self, rng, sigmas, gen: GenerationConfig, shape,
                      solver_name: str):
        _, draws, _ = solvers.SOLVERS[solver_name]
        if solver_name == "restart":
            n = solvers.restart_plan_len(sigmas)
            return brownian.step_noise(rng, n, 1, shape)
        if draws == 0:
            return None
        return brownian.step_noise(rng, len(sigmas) - 1, draws, shape)

    def txt2img(
        self,
        context: jnp.ndarray,
        gen: GenerationConfig,
        seed: int = 0,
        region_biases=None,
        batch_size: int = 1,
        decode: bool = True,
        latents: Optional[jnp.ndarray] = None,
    ):
        """Core txt2img on pre-encoded context. Returns decoded images
        (B, H, W, 3) fp32 in [-1, 1] (or raw latents with decode=False)."""
        sigmas, defaults = self._schedule(gen)
        key = jax.random.PRNGKey(seed)
        k_lat, k_noise = jax.random.split(key)
        shape = (batch_size, gen.latent_height, gen.latent_width, 4)
        if latents is None:
            latents = jax.random.normal(k_lat, shape, jnp.float32)
        latents = latents * float(np.sqrt(sigmas[0] ** 2 + 1.0))

        noise = self._solver_noise(k_noise, sigmas, gen, shape, gen.sampler)
        opts = {
            k: v
            for k, v in defaults.items()
            if k not in ("discard_next_to_last_sigma", "brownian")
        }
        if gen.sampler in ("euler_ancestral", "dpm_2_ancestral",
                           "dpmpp_2s_ancestral", "dpmpp_sde", "dpmpp_2m_sde",
                           "dpmpp_2m_sde_heun", "dpmpp_3m_sde"):
            opts["eta"] = gen.eta

        return _sample_core(
            self.params,
            latents,
            context,
            region_biases,
            noise,
            model_cfg=self.model_cfg,
            solver_name=gen.sampler,
            sigmas_key=tuple(float(s) for s in sigmas),
            guidance_scale=gen.guidance_scale,
            guidance_rescale=gen.guidance_rescale,
            attn_impl=self.attn_impl,
            solver_opts=tuple(sorted(opts.items())),
            decode=decode,
            compute_dtype=gen.dtype,
        )

    def img2img(
        self,
        context: jnp.ndarray,
        init_latents: jnp.ndarray,
        gen: GenerationConfig,
        strength: float = 0.8,
        seed: int = 0,
        region_biases=None,
        decode: bool = True,
    ):
        """img2img: truncate the schedule by strength and noise the init
        latents (reference: model_k_diffusion.py:628-655)."""
        sigmas, defaults = self._schedule(gen)
        init_timestep = min(
            int(gen.num_inference_steps * strength), gen.num_inference_steps
        )
        t_start = max(gen.num_inference_steps - init_timestep, 0)
        sigma_sched = sigmas[t_start:]

        key = jax.random.PRNGKey(seed)
        k_lat, k_noise = jax.random.split(key)
        noise0 = jax.random.normal(k_lat, init_latents.shape, jnp.float32)
        latents = init_latents + noise0 * float(
            np.sqrt(sigma_sched[0] ** 2 + 1.0)
        )

        noise = self._solver_noise(k_noise, sigma_sched, gen,
                                   init_latents.shape, gen.sampler)
        opts = {
            k: v
            for k, v in defaults.items()
            if k not in ("discard_next_to_last_sigma", "brownian")
        }
        return _sample_core(
            self.params,
            latents,
            context,
            region_biases,
            noise,
            model_cfg=self.model_cfg,
            solver_name=gen.sampler,
            sigmas_key=tuple(float(s) for s in sigma_sched),
            guidance_scale=gen.guidance_scale,
            guidance_rescale=gen.guidance_rescale,
            attn_impl=self.attn_impl,
            solver_opts=tuple(sorted(opts.items())),
            decode=decode,
            compute_dtype=gen.dtype,
        )

    # -- codecs -------------------------------------------------------------

    def encode_image(self, images: jnp.ndarray, seed: int = 0):
        """images (B, H, W, 3) in [-1, 1] -> scaled latents."""
        return vae_encode(
            self.params["vae"], self.model_cfg.vae, images,
            rng=jax.random.PRNGKey(seed),
        )

    def decode_latents(self, latents: jnp.ndarray):
        return vae_decode(self.params["vae"], self.model_cfg.vae, latents)

    @staticmethod
    def to_uint8(images: jnp.ndarray) -> np.ndarray:
        arr = np.asarray(jnp.clip(images * 0.5 + 0.5, 0.0, 1.0))
        return (arr * 255).round().astype(np.uint8)

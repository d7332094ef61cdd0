"""IP-Adapter: image-prompt projection models + UNet weight installation.

Capability parity with the reference's IPAdapterMixin
(source/modules/ip_adapter.py:48-292) and its six supported variants
(source/app.py:77-85): base / light (ImageProjection), full-face
(IPAdapterFullImageProjection — source/modules/embedding_ipadapter.py:9-24),
plus / plus-face (perceiver Resampler), and FaceID (MLP over insightface id
embeddings, with a side LoRA loaded via convert.lora).

State-dict layout (diffusers convention, split at ip_adapter.py:178-195):
``image_proj.*`` -> the projection model; ``ip_adapter.{2k+1}.to_k_ip/
to_v_ip.weight`` -> decoupled K/V weights per cross-attention layer, indexed
over the UNet's attention-processor order which in diffusers is
**down blocks, up blocks, then mid** (module registration order). Install
follows that order into our tree.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import UNetConfig
from .layers import layer_norm, linear


# ---------------------------------------------------------------------------
# Projection models
# ---------------------------------------------------------------------------


def image_projection_apply(p, image_embeds: jnp.ndarray,
                           num_tokens: int = 4) -> jnp.ndarray:
    """Base/light ImageProjection: linear -> (B, num_tokens, cross_dim)
    -> LayerNorm."""
    x = linear(p["proj"], image_embeds)
    b = x.shape[0]
    x = x.reshape(b, num_tokens, -1)
    return layer_norm(p["norm"], x)


def full_projection_apply(p, image_embeds: jnp.ndarray,
                          num_tokens: int = 1) -> jnp.ndarray:
    """IPAdapterFullImageProjection (reference: embedding_ipadapter.py:9-24):
    FeedForward(gelu) -> reshape tokens -> LayerNorm."""
    h = linear(p["ff_in"], image_embeds)
    h = jax.nn.gelu(h, approximate=False)
    h = linear(p["ff_out"], h)
    if num_tokens > 1:
        h = h.reshape(-1, num_tokens, p["norm"]["scale"].shape[0])
        return layer_norm(p["norm"], h)
    return layer_norm(p["norm"], h)[:, None, :]


def resampler_apply(p, hidden_states: jnp.ndarray,
                    heads: int = 20) -> jnp.ndarray:
    """Perceiver Resampler (plus variants): learned latents cross-attend to
    CLIP penultimate hidden states; diffusers IPAdapterPlusImageProjection."""
    x = linear(p["proj_in"], hidden_states)
    b = x.shape[0]
    latents = jnp.broadcast_to(
        p["latents"][None], (b,) + p["latents"].shape
    ).astype(x.dtype)
    for layer in p["layers"]:
        residual = latents
        ln_q = layer_norm(layer["ln0"], latents)
        ln_kv = layer_norm(layer["ln1"], x)
        kv = jnp.concatenate([ln_kv, ln_q], axis=1)
        q = linear(layer["to_q"], ln_q)
        k = linear(layer["to_k"], kv)
        v = linear(layer["to_v"], kv)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], heads, -1)

        out = jax.nn.dot_product_attention(split(q), split(k), split(v))
        out = out.reshape(q.shape)
        latents = residual + linear(layer["to_out"], out)
        # FF
        h = layer_norm(layer["ff_norm"], latents)
        h = linear(layer["ff_out"], jax.nn.gelu(linear(layer["ff_in"], h),
                                                approximate=False))
        latents = latents + h
    latents = linear(p["proj_out"], latents)
    return layer_norm(p["norm_out"], latents)


def faceid_projection_apply(p, id_embeds: jnp.ndarray,
                            num_tokens: int = 4) -> jnp.ndarray:
    """FaceID MLP projection over insightface id embeddings (512-d)."""
    h = linear(p["ff_in"], id_embeds)
    h = jax.nn.gelu(h, approximate=False)
    h = linear(p["ff_out"], h)
    h = h.reshape(-1, num_tokens, p["norm"]["scale"].shape[0])
    return layer_norm(p["norm"], h)


# ---------------------------------------------------------------------------
# State-dict conversion
# ---------------------------------------------------------------------------


def _lin(sd, name, dtype, bias=True):
    p = {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"],
                                          np.float32).T, dtype)}
    if bias and f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32),
                                dtype)
    return p


def _ln(sd, name, dtype):
    return {
        "scale": jnp.asarray(np.asarray(sd[f"{name}.weight"], np.float32),
                             dtype),
        "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32),
                            dtype),
    }


def detect_variant(image_proj_sd: Dict[str, np.ndarray]) -> str:
    keys = set(image_proj_sd)
    if "latents" in keys:
        return "resampler"  # plus / plus-face
    if "proj.weight" in keys:
        return "linear"  # base / light
    if any(k.startswith("proj.0") for k in keys):
        return "mlp"  # full-face / faceid
    raise ValueError(f"unknown image_proj layout: {sorted(keys)[:8]}")


def convert_image_proj(image_proj_sd: Dict[str, np.ndarray],
                       dtype=jnp.bfloat16) -> Tuple[str, Dict[str, Any], int]:
    """Returns (variant, params, num_tokens)."""
    variant = detect_variant(image_proj_sd)
    if variant == "linear":
        p = {
            "proj": _lin(image_proj_sd, "proj", dtype),
            "norm": _ln(image_proj_sd, "norm", dtype),
        }
        cross = p["norm"]["scale"].shape[0]
        num_tokens = p["proj"]["kernel"].shape[1] // cross
        return "linear", p, num_tokens
    if variant == "mlp":
        p = {
            "ff_in": _lin(image_proj_sd, "proj.0", dtype),
            "ff_out": _lin(image_proj_sd, "proj.2", dtype),
            "norm": _ln(image_proj_sd, "norm", dtype),
        }
        cross = p["norm"]["scale"].shape[0]
        num_tokens = max(1, p["ff_out"]["kernel"].shape[1] // cross)
        return "mlp", p, num_tokens
    # resampler
    sd = image_proj_sd
    layers = []
    i = 0
    while any(k.startswith(f"layers.{i}.") for k in sd):
        pre = f"layers.{i}"
        layers.append(
            {
                "ln0": _ln(sd, f"{pre}.0.norm1", dtype),
                "ln1": _ln(sd, f"{pre}.0.norm2", dtype),
                "to_q": _lin(sd, f"{pre}.0.to_q", dtype, bias=False),
                "to_k": _lin(sd, f"{pre}.0.to_kv", dtype, bias=False),
                "to_v": _lin(sd, f"{pre}.0.to_kv", dtype, bias=False),
                "to_out": _lin(sd, f"{pre}.0.to_out", dtype, bias=False),
                "ff_norm": _ln(sd, f"{pre}.1.0", dtype),
                "ff_in": _lin(sd, f"{pre}.1.1", dtype),
                "ff_out": _lin(sd, f"{pre}.1.3", dtype),
            }
        )
        # split fused to_kv into k and v halves
        kv = layers[-1]["to_k"]["kernel"]
        half = kv.shape[1] // 2
        layers[-1]["to_k"] = {"kernel": kv[:, :half]}
        layers[-1]["to_v"] = {"kernel": kv[:, half:]}
        i += 1
    p = {
        "latents": jnp.asarray(np.asarray(sd["latents"], np.float32)[0],
                               dtype),
        "proj_in": _lin(sd, "proj_in", dtype),
        "proj_out": _lin(sd, "proj_out", dtype),
        "norm_out": _ln(sd, "norm_out", dtype),
        "layers": layers,
    }
    num_tokens = p["latents"].shape[0]
    return "resampler", p, num_tokens


def cross_attn_paths(unet_cfg: UNetConfig) -> List[Tuple]:
    """Paths to every cross-attn ('attn2') param dict in our UNet tree, in
    diffusers attn-processor order: down blocks, up blocks, mid."""
    paths: List[Tuple] = []
    for level in range(unet_cfg.num_levels):
        if unet_cfg.attn_levels[level]:
            for j in range(unet_cfg.layers_per_block):
                for tb in range(unet_cfg.transformer_layers_per_block):
                    paths.append(("down_blocks", level, "attentions", j,
                                  "blocks", tb, "attn2"))
    for i in range(unet_cfg.num_levels):
        level = unet_cfg.num_levels - 1 - i
        if unet_cfg.attn_levels[level]:
            for j in range(unet_cfg.layers_per_block + 1):
                for tb in range(unet_cfg.transformer_layers_per_block):
                    paths.append(("up_blocks", i, "attentions", j,
                                  "blocks", tb, "attn2"))
    # the mid block always carries attention in the SD family (our unet_init
    # builds it unconditionally)
    for tb in range(unet_cfg.transformer_layers_per_block):
        paths.append(("mid_block", "attention", "blocks", tb, "attn2"))
    return paths


def install_ip_adapter_weights(
    unet_params: Dict[str, Any],
    unet_cfg: UNetConfig,
    ip_adapter_sds: Sequence[Dict[str, np.ndarray]],
    dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    """Install decoupled to_k_ip/to_v_ip weights for 1..N adapters into
    every cross-attn layer (the capability of the reference's missing
    ``UNet2DConditionLoadersMixin_modify`` — see SURVEY.md §2.1 on
    u_net_modify.py:23)."""
    paths = cross_attn_paths(unet_cfg)
    for li, path in enumerate(paths):
        node = unet_params
        for p in path:
            node = node[p]
        key_id = 2 * li + 1
        ip_list = []
        for sd in ip_adapter_sds:
            ip_list.append(
                {
                    "to_k": {
                        "kernel": jnp.asarray(
                            np.asarray(sd[f"{key_id}.to_k_ip.weight"],
                                       np.float32).T, dtype
                        )
                    },
                    "to_v": {
                        "kernel": jnp.asarray(
                            np.asarray(sd[f"{key_id}.to_v_ip.weight"],
                                       np.float32).T, dtype
                        )
                    },
                }
            )
        node["ip"] = ip_list
    return unet_params


def uninstall_ip_adapter_weights(unet_params: Dict[str, Any],
                                 unet_cfg: UNetConfig) -> Dict[str, Any]:
    """unload_ip_adapter equivalent (reference: ip_adapter.py:263-292)."""
    for path in cross_attn_paths(unet_cfg):
        node = unet_params
        for p in path:
            node = node[p]
        node.pop("ip", None)
    return unet_params


@dataclasses.dataclass
class LoadedIPAdapter:
    variant: str
    proj_params: Dict[str, Any]
    num_tokens: int

    def project(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        if self.variant == "linear":
            return image_projection_apply(self.proj_params, image_embeds,
                                          self.num_tokens)
        if self.variant == "mlp":
            return full_projection_apply(self.proj_params, image_embeds,
                                         self.num_tokens)
        return resampler_apply(self.proj_params, image_embeds)


def load_ip_adapter(
    unet_params: Dict[str, Any],
    unet_cfg: UNetConfig,
    state_dicts: Sequence[Dict[str, Dict[str, np.ndarray]]],
    dtype=jnp.bfloat16,
) -> List[LoadedIPAdapter]:
    """Full load path (reference: IPAdapterMixin.load_ip_adapter,
    ip_adapter.py:52-239): splits each state dict into image_proj +
    ip_adapter groups, installs UNet K/V weights, returns projection
    wrappers."""
    adapters = []
    ip_sds = []
    for sd in state_dicts:
        variant, proj, num_tokens = convert_image_proj(sd["image_proj"],
                                                       dtype)
        adapters.append(LoadedIPAdapter(variant, proj, num_tokens))
        ip_sds.append(sd["ip_adapter"])
    install_ip_adapter_weights(unet_params, unet_cfg, ip_sds, dtype)
    return adapters

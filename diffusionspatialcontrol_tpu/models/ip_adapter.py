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
from typing import Any, Dict, List, Optional, Sequence, Tuple

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
    # head_dim-64 convention: 1280-dim plus adapters -> 20 heads (the
    # diffusers IPAdapterPlusImageProjection default)
    p["heads"] = max(1, p["latents"].shape[-1] // 64)
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


def cross_attn_hidden_dims(unet_cfg: UNetConfig) -> List[int]:
    """Inner (query/output) channel dim of each cross-attn layer, aligned
    with ``cross_attn_paths`` order."""
    dims: List[int] = []
    ch = unet_cfg.block_out_channels
    n = unet_cfg.num_levels
    for path in cross_attn_paths(unet_cfg):
        if path[0] == "down_blocks":
            dims.append(ch[path[1]])
        elif path[0] == "up_blocks":
            dims.append(ch[n - 1 - path[1]])
        else:
            dims.append(ch[-1])
    return dims


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
        return resampler_apply(self.proj_params, image_embeds,
                               heads=self.proj_params.get("heads", 20))


def copy_tree_containers(tree):
    """Recursive copy of dict/list/tuple containers, sharing array leaves.
    Lets ``install_ip_adapter_weights`` write into a per-request UNet tree
    without mutating the ModelManager's cached params (the reference
    deepcopies whole models per request, app.py:312-340; we only copy the
    container skeleton)."""
    if isinstance(tree, dict):
        return {k: copy_tree_containers(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [copy_tree_containers(v) for v in tree]
    if isinstance(tree, tuple):
        return tuple(copy_tree_containers(v) for v in tree)
    return tree


def split_ip_adapter_state_dict(
    flat: Dict[str, np.ndarray],
) -> Dict[str, Dict[str, np.ndarray]]:
    """Flat {'image_proj.x': t, 'ip_adapter.y': t} (safetensors layout) ->
    {'image_proj': {...}, 'ip_adapter': {...}} (reference split:
    ip_adapter.py:178-185)."""
    out: Dict[str, Dict[str, np.ndarray]] = {"image_proj": {},
                                             "ip_adapter": {}}
    for k, v in flat.items():
        group, _, rest = k.partition(".")
        if group in out:
            out[group][rest] = v
    return out


def load_ip_adapter_file(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Load one IP-Adapter weight file (.safetensors or torch pickle) into
    the split {image_proj, ip_adapter} groups (reference:
    ip_adapter.py:160-195; pickles go through the restricted-unpickler
    equivalent torch.load with weights_only)."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        flat = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                flat[k] = f.get_tensor(k)
        return split_ip_adapter_state_dict(flat)
    import torch  # CPU-only in this image; weights_only = safe load

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "image_proj" in sd and "ip_adapter" in sd:
        return {
            g: {k: v.float().numpy() for k, v in sd[g].items()}
            for g in ("image_proj", "ip_adapter")
        }
    return split_ip_adapter_state_dict(
        {k: v.float().numpy() for k, v in sd.items()}
    )


def random_state_dict(
    unet_cfg: UNetConfig,
    variant: str = "linear",
    seed: int = 0,
    embed_dim: int = 1024,
    num_tokens: int = 4,
    hidden_dims: Optional[Dict[str, int]] = None,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Synthetic {image_proj, ip_adapter} state dict with the exact layout
    of the real weight files — used by tests and by the ModelManager's
    zero-egress fallback (converted checkpoints are identical programs;
    throughput/shape behavior is weight-independent).

    ``variant``: 'linear' (base/light), 'mlp' (full-face), 'faceid'
    (512-d id embeds), or 'resampler' (plus / plus-face)."""
    rng = np.random.RandomState(seed)
    cross = unet_cfg.cross_attention_dim

    def r(*shape, s=0.02):
        return (rng.randn(*shape) * s).astype(np.float32)

    if variant == "linear":
        proj = {
            "proj.weight": r(num_tokens * cross, embed_dim),
            "proj.bias": np.zeros(num_tokens * cross, np.float32),
            "norm.weight": np.ones(cross, np.float32),
            "norm.bias": np.zeros(cross, np.float32),
        }
    elif variant in ("mlp", "faceid"):
        in_dim = 512 if variant == "faceid" else embed_dim
        tokens = num_tokens if variant == "faceid" else 1
        proj = {
            "proj.0.weight": r(in_dim * 2, in_dim),
            "proj.0.bias": np.zeros(in_dim * 2, np.float32),
            "proj.2.weight": r(tokens * cross, in_dim * 2),
            "proj.2.bias": np.zeros(tokens * cross, np.float32),
            "norm.weight": np.ones(cross, np.float32),
            "norm.bias": np.zeros(cross, np.float32),
        }
    elif variant == "resampler":
        dim = max(cross, 64)
        proj = {
            "latents": r(1, 16, dim, s=1.0),
            "proj_in.weight": r(dim, embed_dim),
            "proj_in.bias": np.zeros(dim, np.float32),
            "proj_out.weight": r(cross, dim),
            "proj_out.bias": np.zeros(cross, np.float32),
            "norm_out.weight": np.ones(cross, np.float32),
            "norm_out.bias": np.zeros(cross, np.float32),
        }
        for i in range(2):
            pre = f"layers.{i}"
            proj.update({
                f"{pre}.0.norm1.weight": np.ones(dim, np.float32),
                f"{pre}.0.norm1.bias": np.zeros(dim, np.float32),
                f"{pre}.0.norm2.weight": np.ones(dim, np.float32),
                f"{pre}.0.norm2.bias": np.zeros(dim, np.float32),
                f"{pre}.0.to_q.weight": r(dim, dim),
                f"{pre}.0.to_kv.weight": r(2 * dim, dim),
                f"{pre}.0.to_out.weight": r(dim, dim),
                f"{pre}.1.0.weight": np.ones(dim, np.float32),
                f"{pre}.1.0.bias": np.zeros(dim, np.float32),
                f"{pre}.1.1.weight": r(4 * dim, dim),
                f"{pre}.1.1.bias": np.zeros(4 * dim, np.float32),
                f"{pre}.1.3.weight": r(dim, 4 * dim),
                f"{pre}.1.3.bias": np.zeros(dim, np.float32),
            })
    else:
        raise ValueError(f"unknown variant {variant!r}")

    ip = {}
    dims = hidden_dims or cross_attn_hidden_dims(unet_cfg)
    for li, hidden in enumerate(dims):
        ip[f"{2*li+1}.to_k_ip.weight"] = r(hidden, cross, s=0.05)
        ip[f"{2*li+1}.to_v_ip.weight"] = r(hidden, cross, s=0.05)
    return {"image_proj": proj, "ip_adapter": ip}


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

"""HF/diffusers checkpoint -> JAX param-tree conversion.

Replaces the reference's reliance on ``diffusers.from_pretrained`` for its
~53-model zoo (source/app.py:111-164, 358-488): any SD1.x/2.x checkpoint in
diffusers layout (``unet/diffusion_pytorch_model.safetensors``, ``vae/...``,
``text_encoder/model.safetensors``, ``tokenizer/``) converts directly into
our functional param trees — no torch in the load path for safetensors
(loaded via safetensors.numpy), torch only as a fallback for .bin pickles
(restricted via ``weights_only=True``, the modern equivalent of the
reference's allowlist unpickler, source/modules/safe.py:186-188).

Layout transforms: torch conv (O, I, kh, kw) -> HWIO; torch linear
(O, I) -> (I, O); norms map weight/bias -> scale/bias.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..config import CLIPTextConfig, ModelConfig, UNetConfig, VAEConfig


class StateDict:
    """Flat name->np.ndarray view over one or more weight files."""

    def __init__(self, tensors: Dict[str, np.ndarray]):
        self.tensors = tensors
        self.used: set = set()

    @classmethod
    def load(cls, path: str) -> "StateDict":
        tensors: Dict[str, np.ndarray] = {}
        if path.endswith(".safetensors"):
            from safetensors import safe_open

            with safe_open(path, framework="np") as f:
                for k in f.keys():
                    t = f.get_tensor(k)
                    tensors[k] = t
        else:
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            for k, v in sd.items():
                tensors[k] = v.float().numpy()
        return cls(tensors)

    def get(self, key: str, aliases: tuple = ()) -> np.ndarray:
        for k in (key,) + aliases:
            if k in self.tensors:
                self.used.add(k)
                t = self.tensors[k]
                if t.dtype == np.float16 or str(t.dtype) == "bfloat16":
                    t = t.astype(np.float32)
                return np.asarray(t, np.float32)
        raise KeyError(f"missing weight {key}")

    def unused(self):
        return sorted(set(self.tensors) - self.used)


def _conv(sd: StateDict, name: str, dtype) -> Dict[str, jnp.ndarray]:
    w = sd.get(f"{name}.weight")
    b = sd.get(f"{name}.bias")
    return {
        "kernel": jnp.asarray(w.transpose(2, 3, 1, 0), dtype),
        "bias": jnp.asarray(b, dtype),
    }


def _linear(sd: StateDict, name: str, dtype,
            bias: bool = True) -> Dict[str, jnp.ndarray]:
    w = sd.get(f"{name}.weight")
    p = {"kernel": jnp.asarray(w.T, dtype)}
    if bias:
        p["bias"] = jnp.asarray(sd.get(f"{name}.bias"), dtype)
    return p


def _norm(sd: StateDict, name: str, dtype) -> Dict[str, jnp.ndarray]:
    return {
        "scale": jnp.asarray(sd.get(f"{name}.weight"), dtype),
        "bias": jnp.asarray(sd.get(f"{name}.bias"), dtype),
    }


def _resnet(sd: StateDict, pre: str, has_shortcut: bool, dtype):
    p = {
        "norm1": _norm(sd, f"{pre}.norm1", dtype),
        "conv1": _conv(sd, f"{pre}.conv1", dtype),
        "time_emb_proj": _linear(sd, f"{pre}.time_emb_proj", dtype),
        "norm2": _norm(sd, f"{pre}.norm2", dtype),
        "conv2": _conv(sd, f"{pre}.conv2", dtype),
    }
    if has_shortcut:
        p["conv_shortcut"] = _conv(sd, f"{pre}.conv_shortcut", dtype)
    return p


def _attention(sd: StateDict, pre: str, dtype):
    return {
        "to_q": _linear(sd, f"{pre}.to_q", dtype, bias=False),
        "to_k": _linear(sd, f"{pre}.to_k", dtype, bias=False),
        "to_v": _linear(sd, f"{pre}.to_v", dtype, bias=False),
        "to_out": _linear(sd, f"{pre}.to_out.0", dtype),
    }


def _transformer(sd: StateDict, pre: str, cfg: UNetConfig, dtype):
    if cfg.use_linear_projection:
        proj_in = _linear(sd, f"{pre}.proj_in", dtype)
        proj_out = _linear(sd, f"{pre}.proj_out", dtype)
    else:
        proj_in = _conv(sd, f"{pre}.proj_in", dtype)
        proj_out = _conv(sd, f"{pre}.proj_out", dtype)
    blocks = []
    for tb in range(cfg.transformer_layers_per_block):
        bp = f"{pre}.transformer_blocks.{tb}"
        blocks.append(
            {
                "norm1": _norm(sd, f"{bp}.norm1", dtype),
                "attn1": _attention(sd, f"{bp}.attn1", dtype),
                "norm2": _norm(sd, f"{bp}.norm2", dtype),
                "attn2": _attention(sd, f"{bp}.attn2", dtype),
                "norm3": _norm(sd, f"{bp}.norm3", dtype),
                "ff": {
                    "proj_in": _linear(sd, f"{bp}.ff.net.0.proj", dtype),
                    "proj_out": _linear(sd, f"{bp}.ff.net.2", dtype),
                },
            }
        )
    return {
        "norm": _norm(sd, f"{pre}.norm", dtype),
        "proj_in": proj_in,
        "blocks": blocks,
        "proj_out": proj_out,
    }


def convert_unet(sd: StateDict, cfg: UNetConfig,
                 dtype=jnp.bfloat16) -> Dict[str, Any]:
    params: Dict[str, Any] = {
        "conv_in": _conv(sd, "conv_in", dtype),
        "time_embedding": {
            "linear_1": _linear(sd, "time_embedding.linear_1", dtype),
            "linear_2": _linear(sd, "time_embedding.linear_2", dtype),
        },
    }

    down = []
    in_c = cfg.block_out_channels[0]
    for level, out_c in enumerate(cfg.block_out_channels):
        pre = f"down_blocks.{level}"
        block = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block):
            cin = in_c if j == 0 else out_c
            block["resnets"].append(
                _resnet(sd, f"{pre}.resnets.{j}", cin != out_c, dtype)
            )
            if cfg.attn_levels[level]:
                block["attentions"].append(
                    _transformer(sd, f"{pre}.attentions.{j}", cfg, dtype)
                )
        if level < cfg.num_levels - 1:
            block["downsample"] = _conv(sd, f"{pre}.downsamplers.0.conv",
                                        dtype)
        down.append(block)
        in_c = out_c
    params["down_blocks"] = down

    params["mid_block"] = {
        "resnet1": _resnet(sd, "mid_block.resnets.0", False, dtype),
        "attention": _transformer(sd, "mid_block.attentions.0", cfg, dtype),
        "resnet2": _resnet(sd, "mid_block.resnets.1", False, dtype),
    }

    up = []
    rev = list(reversed(cfg.block_out_channels))
    from ..models.unet import _up_skip_channels

    for i, out_c in enumerate(rev):
        level = cfg.num_levels - 1 - i
        pre = f"up_blocks.{i}"
        prev_c = rev[max(i - 1, 0)]
        skip_cs = _up_skip_channels(cfg, level)
        block = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block + 1):
            res_in = (prev_c if j == 0 else out_c) + skip_cs[j]
            block["resnets"].append(
                _resnet(sd, f"{pre}.resnets.{j}", res_in != out_c, dtype)
            )
            if cfg.attn_levels[level]:
                block["attentions"].append(
                    _transformer(sd, f"{pre}.attentions.{j}", cfg, dtype)
                )
        if i < cfg.num_levels - 1:
            block["upsample"] = _conv(sd, f"{pre}.upsamplers.0.conv", dtype)
        up.append(block)
    params["up_blocks"] = up

    params["conv_norm_out"] = _norm(sd, "conv_norm_out", dtype)
    params["conv_out"] = _conv(sd, "conv_out", dtype)
    return params


def _vae_resnet(sd: StateDict, pre: str, has_shortcut: bool, dtype):
    p = {
        "norm1": _norm(sd, f"{pre}.norm1", dtype),
        "conv1": _conv(sd, f"{pre}.conv1", dtype),
        "norm2": _norm(sd, f"{pre}.norm2", dtype),
        "conv2": _conv(sd, f"{pre}.conv2", dtype),
    }
    if has_shortcut:
        p["conv_shortcut"] = _conv(sd, f"{pre}.conv_shortcut", dtype)
    return p


def _vae_attn(sd: StateDict, pre: str, dtype):
    return {
        "group_norm": _norm(sd, f"{pre}.group_norm", dtype),
        "to_q": _linear(sd, f"{pre}.to_q", dtype),
        "to_k": _linear(sd, f"{pre}.to_k", dtype),
        "to_v": _linear(sd, f"{pre}.to_v", dtype),
        "to_out": _linear(sd, f"{pre}.to_out.0", dtype),
    }


def convert_vae(sd: StateDict, cfg: VAEConfig,
                dtype=jnp.bfloat16) -> Dict[str, Any]:
    chans = cfg.block_out_channels
    enc: Dict[str, Any] = {"conv_in": _conv(sd, "encoder.conv_in", dtype)}
    down = []
    in_c = chans[0]
    for lv, out_c in enumerate(chans):
        pre = f"encoder.down_blocks.{lv}"
        block = {"resnets": [
            _vae_resnet(sd, f"{pre}.resnets.{j}",
                        (in_c if j == 0 else out_c) != out_c, dtype)
            for j in range(cfg.layers_per_block)
        ]}
        if lv < len(chans) - 1:
            block["downsample"] = _conv(sd, f"{pre}.downsamplers.0.conv",
                                        dtype)
        down.append(block)
        in_c = out_c
    enc["down_blocks"] = down
    enc["mid"] = {
        "resnet1": _vae_resnet(sd, "encoder.mid_block.resnets.0", False,
                               dtype),
        "attention": _vae_attn(sd, "encoder.mid_block.attentions.0", dtype),
        "resnet2": _vae_resnet(sd, "encoder.mid_block.resnets.1", False,
                               dtype),
    }
    enc["conv_norm_out"] = _norm(sd, "encoder.conv_norm_out", dtype)
    enc["conv_out"] = _conv(sd, "encoder.conv_out", dtype)
    enc["quant_conv"] = _conv(sd, "quant_conv", dtype)

    dec: Dict[str, Any] = {
        "post_quant_conv": _conv(sd, "post_quant_conv", dtype),
        "conv_in": _conv(sd, "decoder.conv_in", dtype),
        "mid": {
            "resnet1": _vae_resnet(sd, "decoder.mid_block.resnets.0", False,
                                   dtype),
            "attention": _vae_attn(sd, "decoder.mid_block.attentions.0",
                                   dtype),
            "resnet2": _vae_resnet(sd, "decoder.mid_block.resnets.1", False,
                                   dtype),
        },
    }
    up = []
    dchans = cfg.decoder_block_out_channels or chans
    d_layers = cfg.decoder_layers_per_block or cfg.layers_per_block
    rev = list(reversed(dchans))
    in_c = rev[0]
    for lv, out_c in enumerate(rev):
        pre = f"decoder.up_blocks.{lv}"
        block = {"resnets": [
            _vae_resnet(sd, f"{pre}.resnets.{j}",
                        (in_c if j == 0 else out_c) != out_c, dtype)
            for j in range(d_layers + 1)
        ]}
        if lv < len(rev) - 1:
            block["upsample"] = _conv(sd, f"{pre}.upsamplers.0.conv", dtype)
        up.append(block)
        in_c = out_c
    dec["up_blocks"] = up
    dec["conv_norm_out"] = _norm(sd, "decoder.conv_norm_out", dtype)
    dec["conv_out"] = _conv(sd, "decoder.conv_out", dtype)
    # AsymmetricAutoencoderKL: mask-condition encoder feeding known-pixel
    # features into every decoder scale (strides inferred from kernel size,
    # matching MaskConditionEncoder's 3x3-stride-1 / 4x4-stride-2 split)
    if "decoder.condition_encoder.layers.0.weight" in sd.tensors:
        layers = []
        i = 0
        while f"decoder.condition_encoder.layers.{i}.weight" in sd.tensors:
            layers.append(
                _conv(sd, f"decoder.condition_encoder.layers.{i}", dtype)
            )
            i += 1
        dec["condition_encoder"] = {"layers": layers}
    return {"encoder": enc, "decoder": dec}


def convert_clip(sd: StateDict, cfg: CLIPTextConfig,
                 dtype=jnp.bfloat16, n_extra_tokens: int = 0
                 ) -> Dict[str, Any]:
    """``n_extra_tokens``: pad slots appended to the embedding table for
    textual-inversion token injection without retracing (SURVEY.md §7
    'padded embedding table')."""
    pre = "text_model"
    tok_emb = sd.get(f"{pre}.embeddings.token_embedding.weight")
    if n_extra_tokens:
        pad = np.zeros((n_extra_tokens, tok_emb.shape[1]), np.float32)
        tok_emb = np.concatenate([tok_emb, pad], axis=0)
    params: Dict[str, Any] = {
        "token_embedding": jnp.asarray(tok_emb, dtype),
        "position_embedding": jnp.asarray(
            sd.get(f"{pre}.embeddings.position_embedding.weight"), dtype
        ),
        "layers": [],
        "final_layer_norm": _norm(sd, f"{pre}.final_layer_norm", dtype),
    }
    for i in range(cfg.num_layers):
        lp = f"{pre}.encoder.layers.{i}"
        params["layers"].append(
            {
                "layer_norm1": _norm(sd, f"{lp}.layer_norm1", dtype),
                "q_proj": _linear(sd, f"{lp}.self_attn.q_proj", dtype),
                "k_proj": _linear(sd, f"{lp}.self_attn.k_proj", dtype),
                "v_proj": _linear(sd, f"{lp}.self_attn.v_proj", dtype),
                "out_proj": _linear(sd, f"{lp}.self_attn.out_proj", dtype),
                "layer_norm2": _norm(sd, f"{lp}.layer_norm2", dtype),
                "fc1": _linear(sd, f"{lp}.mlp.fc1", dtype),
                "fc2": _linear(sd, f"{lp}.mlp.fc2", dtype),
            }
        )
    return params


def convert_clip_vision(sd: StateDict, cfg, dtype=jnp.bfloat16):
    """CLIPVisionModelWithProjection (transformers layout) -> our
    models.clip_vision tree (reference registers this encoder for
    IP-Adapters, ip_adapter.py:197-226)."""
    pre = "vision_model"
    emb = f"{pre}.embeddings"
    params: Dict[str, Any] = {
        "class_embedding": jnp.asarray(
            sd.get(f"{emb}.class_embedding"), dtype
        ),
        "patch_embedding": {
            "kernel": jnp.asarray(
                sd.get(f"{emb}.patch_embedding.weight")
                .transpose(2, 3, 1, 0), dtype
            )
        },
        "position_embedding": jnp.asarray(
            sd.get(f"{emb}.position_embedding.weight"), dtype
        ),
        # transformers spells it "pre_layrnorm"
        "pre_layrnorm": _norm(sd, f"{pre}.pre_layrnorm", dtype),
        "layers": [],
        "post_layernorm": _norm(sd, f"{pre}.post_layernorm", dtype),
        "visual_projection": {
            "kernel": jnp.asarray(
                sd.get("visual_projection.weight").T, dtype
            )
        },
    }
    for i in range(cfg.num_layers):
        lp = f"{pre}.encoder.layers.{i}"
        params["layers"].append(
            {
                "layer_norm1": _norm(sd, f"{lp}.layer_norm1", dtype),
                "q_proj": _linear(sd, f"{lp}.self_attn.q_proj", dtype),
                "k_proj": _linear(sd, f"{lp}.self_attn.k_proj", dtype),
                "v_proj": _linear(sd, f"{lp}.self_attn.v_proj", dtype),
                "out_proj": _linear(sd, f"{lp}.self_attn.out_proj", dtype),
                "layer_norm2": _norm(sd, f"{lp}.layer_norm2", dtype),
                "fc1": _linear(sd, f"{lp}.mlp.fc1", dtype),
                "fc2": _linear(sd, f"{lp}.mlp.fc2", dtype),
            }
        )
    return params


def _find_weights(dirpath: str, names=("diffusion_pytorch_model.safetensors",
                                       "model.safetensors",
                                       "diffusion_pytorch_model.bin",
                                       "pytorch_model.bin")):
    for n in names:
        p = os.path.join(dirpath, n)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"no weight file in {dirpath}")


def load_state_dict(path: str) -> StateDict:
    """StateDict from a weight file OR a model directory (resolves the
    standard diffusers/transformers file names)."""
    if os.path.isdir(path):
        path = _find_weights(path)
    return StateDict.load(path)


def load_pipeline_params(model_dir: str, cfg: ModelConfig,
                         dtype=jnp.bfloat16,
                         n_extra_tokens: int = 0) -> Dict[str, Any]:
    """Convert a diffusers-layout checkpoint directory."""
    unet_sd = StateDict.load(_find_weights(os.path.join(model_dir, "unet")))
    vae_sd = StateDict.load(_find_weights(os.path.join(model_dir, "vae")))
    clip_sd = StateDict.load(
        _find_weights(os.path.join(model_dir, "text_encoder"))
    )
    return {
        "unet": convert_unet(unet_sd, cfg.unet, dtype),
        "vae": convert_vae(vae_sd, cfg.vae, dtype),
        "clip": convert_clip(clip_sd, cfg.clip, dtype, n_extra_tokens),
    }


def convert_controlnet(sd: StateDict, cfg: UNetConfig,
                       dtype=jnp.bfloat16) -> Dict[str, Any]:
    """ControlNet state dict (diffusers layout) -> our controlnet tree
    (models/controlnet.py)."""
    params: Dict[str, Any] = {
        "conv_in": _conv(sd, "conv_in", dtype),
        "time_embedding": {
            "linear_1": _linear(sd, "time_embedding.linear_1", dtype),
            "linear_2": _linear(sd, "time_embedding.linear_2", dtype),
        },
    }
    ce = {"conv_in": _conv(sd, "controlnet_cond_embedding.conv_in", dtype),
          "blocks": [], "conv_out": _conv(
              sd, "controlnet_cond_embedding.conv_out", dtype)}
    i = 0
    while f"controlnet_cond_embedding.blocks.{i}.weight" in sd.tensors:
        ce["blocks"].append(
            _conv(sd, f"controlnet_cond_embedding.blocks.{i}", dtype)
        )
        i += 1
    params["cond_embedding"] = ce

    down = []
    in_c = cfg.block_out_channels[0]
    for level, out_c in enumerate(cfg.block_out_channels):
        pre = f"down_blocks.{level}"
        block = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block):
            cin = in_c if j == 0 else out_c
            block["resnets"].append(
                _resnet(sd, f"{pre}.resnets.{j}", cin != out_c, dtype)
            )
            if cfg.attn_levels[level]:
                block["attentions"].append(
                    _transformer(sd, f"{pre}.attentions.{j}", cfg, dtype)
                )
        if level < cfg.num_levels - 1:
            block["downsample"] = _conv(sd, f"{pre}.downsamplers.0.conv",
                                        dtype)
        down.append(block)
        in_c = out_c
    params["down_blocks"] = down
    params["mid_block"] = {
        "resnet1": _resnet(sd, "mid_block.resnets.0", False, dtype),
        "attention": _transformer(sd, "mid_block.attentions.0", cfg, dtype),
        "resnet2": _resnet(sd, "mid_block.resnets.1", False, dtype),
    }
    zero_convs = []
    i = 0
    while f"controlnet_down_blocks.{i}.weight" in sd.tensors:
        zero_convs.append(_conv(sd, f"controlnet_down_blocks.{i}", dtype))
        i += 1
    params["zero_convs"] = zero_convs
    params["mid_zero_conv"] = _conv(sd, "controlnet_mid_block", dtype)
    return params


def convert_t2i_adapter(sd: StateDict, dtype=jnp.bfloat16) -> Dict[str, Any]:
    """TencentARC full_adapter state dict -> our t2i tree
    (models/t2i_adapter.py). diffusers names: adapter.conv_in (only for
    light variants), adapter.body.{i}.in_conv, .resnets.{j}.block1/block2."""
    blocks = []
    i = 0
    while any(k.startswith(f"adapter.body.{i}.") for k in sd.tensors):
        pre = f"adapter.body.{i}"
        block: Dict[str, Any] = {"in_conv": None, "resnets": []}
        if f"{pre}.in_conv.weight" in sd.tensors:
            block["in_conv"] = _conv(sd, f"{pre}.in_conv", dtype)
        j = 0
        while f"{pre}.resnets.{j}.block1.weight" in sd.tensors:
            block["resnets"].append(
                {
                    "block1": _conv(sd, f"{pre}.resnets.{j}.block1", dtype),
                    "block2": _conv(sd, f"{pre}.resnets.{j}.block2", dtype),
                }
            )
            j += 1
        blocks.append(block)
        i += 1
    params = {"blocks": blocks}
    if "adapter.conv_in.weight" in sd.tensors:
        # full_adapter's conv_in folds into the first block's in_conv slot
        params["blocks"][0]["in_conv"] = _conv(sd, "adapter.conv_in", dtype)
    return params

"""LoRA merge-into-weights loader.

Replicates the reference's kohya-format LoRA merging
(source/app.py:532-597 ``load_lora_control_pipeline``): for every
``lora_unet_*`` / ``lora_te_*`` down/up pair, merge

    W += lora_scale * up @ down

directly into the target weight (the reference skips ``.alpha`` keys and
uses the user scale alone — reproduced). Supports linear layers, 1x1 conv
(as the reference) and additionally full kxk conv LoRA pairs (the reference
would crash on those).

Also supports the diffusers/PEFT naming variant (``lora_A``/``lora_B``).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np


def _module_index(tree, prefix=(), inside_ff=False) -> Dict[str, Tuple]:
    """name (diffusers dotted, e.g. down_blocks.0.attentions.0.
    transformer_blocks.0.attn1.to_q) -> path tuple into our tree."""
    out: Dict[str, Tuple] = {}

    def walk(node, path, names, in_ff):
        if isinstance(node, dict):
            if "kernel" in node:
                out[".".join(names)] = tuple(path)
                return
            for k, v in node.items():
                seg = k
                nxt_ff = in_ff
                if k == "blocks":
                    seg = "transformer_blocks"
                elif k == "ff":
                    seg = "ff"
                    nxt_ff = True
                elif k == "proj_in" and in_ff:
                    seg = "net.0.proj"
                elif k == "proj_out" and in_ff:
                    seg = "net.2"
                elif k == "to_out":
                    seg = "to_out.0"
                elif k == "downsample":
                    seg = "downsamplers.0.conv"
                elif k == "upsample":
                    seg = "upsamplers.0.conv"
                elif k == "mid_block":
                    seg = "mid_block"
                elif k == "resnet1":
                    seg = "resnets.0"
                elif k == "resnet2":
                    seg = "resnets.1"
                elif k == "attention" and names and names[-1] == "mid_block":
                    seg = "attentions.0"
                walk(v, path + [k], names + [seg], nxt_ff)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, path + [i], names + [str(i)], in_ff)

    walk(tree, [], [], False)
    return out


_CLIP_RENAMES = {
    "q_proj": "self_attn.q_proj",
    "k_proj": "self_attn.k_proj",
    "v_proj": "self_attn.v_proj",
    "out_proj": "self_attn.out_proj",
    "fc1": "mlp.fc1",
    "fc2": "mlp.fc2",
}


def _clip_module_index(tree) -> Dict[str, Tuple]:
    out: Dict[str, Tuple] = {}
    for i, layer in enumerate(tree.get("layers", [])):
        for k in layer:
            if isinstance(layer[k], dict) and "kernel" in layer[k]:
                name = _CLIP_RENAMES.get(k, k)
                out[f"text_model.encoder.layers.{i}.{name}"] = (
                    "layers", i, k
                )
    return out


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _set_kernel(tree, path, new_kernel):
    node = _get(tree, path)
    node["kernel"] = new_kernel


def _normalize(name: str) -> str:
    return name.replace(".", "_")


def merge_lora(
    params: Dict[str, Any],
    state_dict: Dict[str, np.ndarray],
    scale: float = 1.0,
) -> Dict[str, Any]:
    """Merge a LoRA state dict into {unet, clip} params (in place on the
    tree structure; arrays are replaced functionally). Returns params."""
    unet_index = {
        _normalize(k): v for k, v in _module_index(params["unet"]).items()
    }
    clip_index = {
        _normalize(k): v
        for k, v in _clip_module_index(params["clip"]).items()
    }

    pairs: Dict[str, Dict[str, np.ndarray]] = {}
    for key, val in state_dict.items():
        m = re.match(
            r"(lora_unet|lora_te\d*)_(.+)\.(lora_down|lora_up|lora_A|lora_B)"
            r"\.weight",
            key,
        )
        if not m:
            continue
        prefix, module, role = m.group(1), m.group(2), m.group(3)
        role = {"lora_A": "down", "lora_B": "up",
                "lora_down": "down", "lora_up": "up"}[role]
        pairs.setdefault(f"{prefix}_{module}", {})[role] = np.asarray(
            val, np.float32
        )

    merged = 0
    skipped: List[str] = []
    for module, pair in pairs.items():
        if "down" not in pair or "up" not in pair:
            skipped.append(module)
            continue
        is_te = module.startswith("lora_te")
        name = re.sub(r"^(lora_unet_|lora_te\d*_)", "", module)
        index = clip_index if is_te else unet_index
        tree = params["clip"] if is_te else params["unet"]
        if name not in index:
            skipped.append(module)
            continue
        path = index[name]
        node = _get(tree, path)
        kernel = np.asarray(node["kernel"], np.float32)
        up, down = pair["up"], pair["down"]
        if up.ndim == 4:
            up2 = up.reshape(up.shape[0], up.shape[1])
            if down.shape[2:] == (1, 1):
                down2 = down.reshape(down.shape[0], down.shape[1])
                delta = (up2 @ down2)  # (O, I)
                delta = delta.T[None, None]  # (1, 1, I, O)
            else:
                delta = np.einsum("or,rihw->oihw", up2, down)
                delta = delta.transpose(2, 3, 1, 0)  # HWIO
        else:
            delta = (up @ down).T  # (I, O)
        node["kernel"] = jnp.asarray(kernel + scale * delta,
                                     node["kernel"].dtype)
        merged += 1

    if merged == 0 and pairs:
        raise ValueError(
            f"no LoRA modules matched; examples: {list(pairs)[:5]}"
        )
    return params

"""HED soft-edge detector (ControlNetHED, Apache-2.0 lineage).

The reference's "Soft Edge" control preprocessor (and the model-based
variant of "Scribble") runs controlnet_aux's HEDdetector
(reference: source/app.py:745-753: HED / PidiNet with scribble=True for
Scribble). This is the TPU-native equivalent of the HED path: the VGG-style
5-block side-output network in JAX with a converter for the
``ControlNetHED.pth`` layout (``norm``, ``block{k}.convs.{i}.*``,
``block{k}.projection.*``), plus the detector post-processing (sigmoid of
the mean side output; scribble mode thresholds to a binary sketch).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import conv2d

# (in_c, out_c, n_convs) per block; blocks 2..5 are preceded by 2x2 maxpool.
_BLOCKS = [(3, 64, 2), (64, 128, 2), (128, 256, 3), (256, 512, 3),
           (512, 512, 3)]


def hed_init(key, dtype=jnp.float32) -> Dict[str, Any]:
    params: Dict[str, Any] = {"norm": jnp.zeros((3,), dtype)}
    for b, (in_c, out_c, n) in enumerate(_BLOCKS, start=1):
        block: Dict[str, Any] = {"convs": []}
        for i in range(n):
            key, sub = jax.random.split(key)
            c_in = in_c if i == 0 else out_c
            block["convs"].append({
                "kernel": (jax.random.normal(sub, (3, 3, c_in, out_c),
                                             jnp.float32)
                           / np.sqrt(9 * c_in)).astype(dtype),
                "bias": jnp.zeros((out_c,), dtype),
            })
        key, sub = jax.random.split(key)
        block["projection"] = {
            "kernel": (jax.random.normal(sub, (1, 1, out_c, 1), jnp.float32)
                       * 0.1).astype(dtype),
            "bias": jnp.zeros((1,), dtype),
        }
        params[f"block{b}"] = block
    return params


def convert_hed(sd, dtype=jnp.float32) -> Dict[str, Any]:
    """``sd``: convert.hf.StateDict over ControlNetHED.pth (torch conv
    (O, I, kh, kw) -> HWIO; ``norm`` is the learned (1, 3, 1, 1) input
    shift)."""
    params: Dict[str, Any] = {
        "norm": jnp.asarray(sd.get("norm").reshape(3), dtype)
    }
    for b, (_, _, n) in enumerate(_BLOCKS, start=1):
        block: Dict[str, Any] = {"convs": []}
        for i in range(n):
            block["convs"].append({
                "kernel": jnp.asarray(
                    sd.get(f"block{b}.convs.{i}.weight")
                    .transpose(2, 3, 1, 0), dtype),
                "bias": jnp.asarray(sd.get(f"block{b}.convs.{i}.bias"),
                                    dtype),
            })
        block["projection"] = {
            "kernel": jnp.asarray(
                sd.get(f"block{b}.projection.weight").transpose(2, 3, 1, 0),
                dtype),
            "bias": jnp.asarray(sd.get(f"block{b}.projection.bias"), dtype),
        }
        params[f"block{b}"] = block
    return params


def hed_apply(params, pixels: jnp.ndarray) -> List[jnp.ndarray]:
    """pixels: (B, H, W, 3) RGB in [0, 255] (the detector feeds raw pixel
    values; the only normalization is the learned ``norm`` shift). Returns
    the 5 side-output logit maps at strides 1/1, 1/2, 1/4, 1/8, 1/16."""
    h = pixels.astype(jnp.float32) - params["norm"].astype(jnp.float32)
    outs = []
    for b in range(1, 6):
        if b > 1:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID",
            )
        block = params[f"block{b}"]
        for conv in block["convs"]:
            h = jax.nn.relu(conv2d(conv, h))
        outs.append(conv2d(block["projection"], h, padding="VALID"))
    return outs


def detect_edges(params, image: np.ndarray, scribble: bool = False
                 ) -> np.ndarray:
    """Full detector (controlnet_aux HEDdetector contract): RGB image ->
    (H, W, 3) [0, 1] soft-edge map; ``scribble`` thresholds to the binary
    sketch the Scribble ControlNet expects."""
    img = np.asarray(image)
    if img.dtype != np.uint8 and img.max() <= 1.0:
        img = (img * 255.0).astype(np.float32)
    img = img.astype(np.float32)
    h, w = img.shape[:2]
    # pad to a multiple of 16 so the side outputs resize cleanly
    ph = (-h) % 16
    pw = (-w) % 16
    padded = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
    outs = jax.jit(hed_apply)(params, jnp.asarray(padded)[None])
    th, tw = padded.shape[:2]
    edges = [
        np.asarray(jax.image.resize(o[0, :, :, 0], (th, tw), "bilinear"))
        for o in outs
    ]
    edge = 1.0 / (1.0 + np.exp(-np.mean(np.stack(edges), axis=0)))
    edge = edge[:h, :w]
    if scribble:
        # controlnet_aux HEDdetector's scribble branch is the same
        # nms(127, 3) + blur + 4/255-binarize pass PidiNet uses
        from .pidinet import _nms_thin

        edge = _nms_thin(edge)
    return np.stack([edge.astype(np.float32)] * 3, -1)

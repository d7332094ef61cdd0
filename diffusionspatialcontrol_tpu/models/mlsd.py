"""MLSD line-segment detector (MobileV2_MLSD_Large, Apache-2.0 lineage).

The reference's "MLSD" control preprocessor runs controlnet_aux's
MLSDdetector (reference: source/app.py:733-734 — the ``mlsd_large_512_fp32``
checkpoint from lllyasviel/ControlNet annotators). This is the TPU-native
equivalent: the truncated MobileNetV2 backbone (4-channel input: RGB + ones
plane) with FPN taps at features {1, 3, 6, 10, 13}, the BlockTypeA/B/C
decoder pyramid, and the center/displacement line decoding + white-on-black
line rendering.

BatchNorm layers are inference-only and folded at conversion time into a
per-channel (scale, bias) applied after each convolution, so the JAX apply
fn is a pure conv/affine/ReLU chain — one XLA program, NHWC throughout.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from jax import lax

# torchvision-style inverted residual setting, truncated after the 96-wide
# stage: (expand_ratio, out_channels, num_blocks, first_stride).
_IR_SETTING = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
               (6, 96, 3, 1))
#: feature indices tapped for the FPN (c1..c5 at strides 2, 4, 8, 16, 16)
_FPN = (1, 3, 6, 10, 13)
_STEM_C = 32


def _conv(x, p, stride=1, groups=1, dilation=1, padding=None):
    """Conv (NHWC, HWIO) followed by the folded-BN per-channel affine."""
    k = p["kernel"]
    kh = k.shape[0]
    if padding is None:
        pad = dilation * (kh - 1) // 2
        padding = ((pad, pad), (pad, pad))
    y = lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride), padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _cbn_init(key, in_c, out_c, k=3, dtype=jnp.float32):
    fan = in_c * k * k
    return {
        "kernel": (jax.random.normal(key, (k, k, in_c, out_c), jnp.float32)
                   / math.sqrt(fan)).astype(dtype),
        "scale": jnp.ones((out_c,), dtype),
        "bias": jnp.zeros((out_c,), dtype),
    }


def _dw_init(key, c, dtype):
    p = _cbn_init(key, 1, c, 3, dtype)  # depthwise: HWIO with I=1
    return p


def mlsd_init(key, dtype=jnp.float32) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 64))
    params: Dict[str, Any] = {
        "stem": _cbn_init(next(ks), 4, _STEM_C, 3, dtype)
    }
    blocks: List[Dict[str, Any]] = []
    in_c = _STEM_C
    for t, c, n, s in _IR_SETTING:
        for i in range(n):
            hidden = round(in_c * t)
            blk: Dict[str, Any] = {}
            if t != 1:
                blk["expand"] = _cbn_init(next(ks), in_c, hidden, 1, dtype)
            blk["dw"] = _dw_init(next(ks), hidden, dtype)
            blk["project"] = _cbn_init(next(ks), hidden, c, 1, dtype)
            blocks.append(blk)
            in_c = c
    params["blocks"] = blocks

    def type_a(k1, k2, in_c1, in_c2):
        return {"conv1": _cbn_init(k1, in_c2, 64, 1, dtype),
                "conv2": _cbn_init(k2, in_c1, 64, 1, dtype)}

    def type_b(k1, k2, in_c, out_c):
        return {"conv1": _cbn_init(k1, in_c, in_c, 3, dtype),
                "conv2": _cbn_init(k2, in_c, out_c, 3, dtype)}

    params["block15"] = type_a(next(ks), next(ks), 64, 96)
    params["block16"] = type_b(next(ks), next(ks), 128, 64)
    params["block17"] = type_a(next(ks), next(ks), 32, 64)
    params["block18"] = type_b(next(ks), next(ks), 128, 64)
    params["block19"] = type_a(next(ks), next(ks), 24, 64)
    params["block20"] = type_b(next(ks), next(ks), 128, 64)
    params["block21"] = type_a(next(ks), next(ks), 16, 64)
    params["block22"] = type_b(next(ks), next(ks), 128, 64)
    params["block23"] = {
        "conv1": _cbn_init(next(ks), 64, 64, 3, dtype),  # dilation 5
        "conv2": _cbn_init(next(ks), 64, 64, 3, dtype),
        "conv3": _cbn_init(next(ks), 64, 16, 1, dtype),
    }
    return params


# ---------------------------------------------------------------------------
# Converter (torch ``mlsd_large_512_fp32.pth`` layout)
# ---------------------------------------------------------------------------


def _fold_bn(sd, conv_key, bn_key, dtype, eps=1e-5):
    """(O, I, kh, kw) conv + BatchNorm running stats -> HWIO kernel and
    per-channel post-conv (scale, bias)."""
    kernel = np.asarray(sd.get(f"{conv_key}.weight")).transpose(2, 3, 1, 0)
    conv_bias = (np.asarray(sd.get(f"{conv_key}.bias"))
                 if f"{conv_key}.bias" in sd.tensors else 0.0)
    if bn_key is None:
        scale = np.ones((kernel.shape[-1],), np.float32)
        bias = np.asarray(conv_bias, np.float32)
        if bias.ndim == 0:
            bias = np.zeros((kernel.shape[-1],), np.float32)
    else:
        gamma = np.asarray(sd.get(f"{bn_key}.weight"), np.float32)
        beta = np.asarray(sd.get(f"{bn_key}.bias"), np.float32)
        mean = np.asarray(sd.get(f"{bn_key}.running_mean"), np.float32)
        var = np.asarray(sd.get(f"{bn_key}.running_var"), np.float32)
        scale = gamma / np.sqrt(var + eps)
        bias = beta + scale * (conv_bias - mean)
    return {"kernel": jnp.asarray(kernel, dtype),
            "scale": jnp.asarray(scale, dtype),
            "bias": jnp.asarray(bias, dtype)}


def _fold_dw(sd, conv_key, bn_key, dtype):
    """Depthwise torch conv (C, 1, kh, kw) -> HWIO (kh, kw, 1, C)."""
    p = _fold_bn(sd, conv_key, bn_key, dtype)
    k = np.asarray(sd.get(f"{conv_key}.weight")).transpose(2, 3, 1, 0)
    # torch depthwise: (C, 1, kh, kw) -> transposed gives (kh, kw, 1, C)
    p["kernel"] = jnp.asarray(k, dtype)
    return p


def convert_mlsd(sd, dtype=jnp.float32) -> Dict[str, Any]:
    """``sd``: convert.hf.StateDict over the MobileV2_MLSD_Large checkpoint
    (keys ``backbone.features.N...`` + ``block15..block23...``)."""
    params: Dict[str, Any] = {
        "stem": _fold_bn(sd, "backbone.features.0.0",
                         "backbone.features.0.1", dtype)
    }
    blocks = []
    idx = 1
    for t, c, n, s in _IR_SETTING:
        for _ in range(n):
            base = f"backbone.features.{idx}.conv"
            blk: Dict[str, Any] = {}
            if t != 1:
                blk["expand"] = _fold_bn(sd, f"{base}.0.0", f"{base}.0.1",
                                         dtype)
                blk["dw"] = _fold_dw(sd, f"{base}.1.0", f"{base}.1.1", dtype)
                blk["project"] = _fold_bn(sd, f"{base}.2", f"{base}.3",
                                          dtype)
            else:
                blk["dw"] = _fold_dw(sd, f"{base}.0.0", f"{base}.0.1", dtype)
                blk["project"] = _fold_bn(sd, f"{base}.1", f"{base}.2",
                                          dtype)
            blocks.append(blk)
            idx += 1
    params["blocks"] = blocks
    for b in (15, 17, 19, 21):
        params[f"block{b}"] = {
            "conv1": _fold_bn(sd, f"block{b}.conv1.0", f"block{b}.conv1.1",
                              dtype),
            "conv2": _fold_bn(sd, f"block{b}.conv2.0", f"block{b}.conv2.1",
                              dtype),
        }
    for b in (16, 18, 20, 22):
        params[f"block{b}"] = {
            "conv1": _fold_bn(sd, f"block{b}.conv1.0", f"block{b}.conv1.1",
                              dtype),
            "conv2": _fold_bn(sd, f"block{b}.conv2.0", f"block{b}.conv2.1",
                              dtype),
        }
    params["block23"] = {
        "conv1": _fold_bn(sd, "block23.conv1.0", "block23.conv1.1", dtype),
        "conv2": _fold_bn(sd, "block23.conv2.0", "block23.conv2.1", dtype),
        "conv3": _fold_bn(sd, "block23.conv3", None, dtype),
    }
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


from ..ops.resize import resize_bilinear_align_corners as _resize_bilinear_ac  # noqa: E501


def _backbone(params, x):
    h = _relu6(_conv(x, params["stem"], stride=2))
    feats = [h]
    i = 0
    for t, c, n, s in _IR_SETTING:
        for j in range(n):
            blk = params["blocks"][i]
            stride = s if j == 0 else 1
            inp = h
            y = h
            if "expand" in blk:
                y = _relu6(_conv(y, blk["expand"]))
            hidden = y.shape[-1]
            y = _relu6(_conv(y, blk["dw"], stride=stride, groups=hidden))
            y = _conv(y, blk["project"])
            if stride == 1 and inp.shape[-1] == y.shape[-1]:
                y = inp + y
            h = y
            feats.append(h)
            i += 1
    return [feats[k] for k in _FPN]


def _type_a(p, a, b, upscale=True):
    b = jax.nn.relu(_conv(b, p["conv1"]))
    a = jax.nn.relu(_conv(a, p["conv2"]))
    if upscale:
        b = _resize_bilinear_ac(b, b.shape[1] * 2, b.shape[2] * 2)
    return jnp.concatenate([a, b], axis=-1)


def _type_b(p, x):
    x = jax.nn.relu(_conv(x, p["conv1"])) + x
    return _conv(x, p["conv2"])


def mlsd_apply(params, pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels: (B, H, W, 4) — RGB/127.5-1 plus a ones plane, H and W
    multiples of 16. Returns the 9-channel tpMap at stride 2:
    channel 0 = center logits, 1:5 = displacement (dx0, dy0, dx1, dy1)."""
    c1, c2, c3, c4, c5 = _backbone(params, pixels)
    x = _type_a(params["block15"], c4, c5, upscale=False)
    x = _type_b(params["block16"], x)
    x = _type_a(params["block17"], c3, x)
    x = _type_b(params["block18"], x)
    x = _type_a(params["block19"], c2, x)
    x = _type_b(params["block20"], x)
    x = _type_a(params["block21"], c1, x)
    x = _type_b(params["block22"], x)
    p23 = params["block23"]
    x = jax.nn.relu(_conv(x, p23["conv1"], dilation=5))
    x = jax.nn.relu(_conv(x, p23["conv2"]))
    x = _conv(x, p23["conv3"])
    return x[..., 7:]


def decode_lines(tpmap: np.ndarray, score_thr: float = 0.10,
                 dist_thr: float = 20.0, topk: int = 200,
                 ksize: int = 3) -> np.ndarray:
    """controlnet_aux ``pred_lines`` decoding: non-max-suppressed sigmoid
    center peaks + displacement endpoints -> (N, 4) segments [x0,y0,x1,y1]
    in tpMap pixel units (half input resolution)."""
    center = tpmap[..., 0]
    disp = tpmap[..., 1:5]
    heat = 1.0 / (1.0 + np.exp(-center))
    pad = (ksize - 1) // 2
    hp = np.pad(heat, pad, mode="constant", constant_values=-np.inf)
    h, w = heat.shape
    windows = np.lib.stride_tricks.sliding_window_view(hp, (ksize, ksize))
    hmax = windows.max(axis=(-2, -1))
    nms = np.where(hmax == heat, heat, 0.0)
    flat = nms.reshape(-1)
    idx = np.argpartition(flat, -topk)[-topk:]
    idx = idx[np.argsort(-flat[idx])]
    yy, xx = idx // w, idx % w
    scores = flat[idx]

    start = disp[..., :2]
    end = disp[..., 2:]
    dist = np.sqrt(((start - end) ** 2).sum(-1))
    segs = []
    for y, x, s in zip(yy, xx, scores):
        if s > score_thr and dist[y, x] > dist_thr:
            dx0, dy0, dx1, dy1 = disp[y, x]
            segs.append([x + dx0, y + dy0, x + dx1, y + dy1])
    return np.asarray(segs, np.float32).reshape(-1, 4)


def detect_mlsd(params, image: np.ndarray, thr_v: float = 0.1,
                thr_d: float = 0.1, detect_res: int = 512) -> np.ndarray:
    """Full detector (controlnet_aux MLSDdetector contract): RGB image ->
    (H, W, 3) float [0, 1] white-line-on-black map. ``thr_v``/``thr_d`` are
    the score and length thresholds (detector defaults 0.1/0.1).

    Matches upstream pred_lines preprocessing: the image is resized to the
    ``detect_res`` square the score/dist thresholds are calibrated for, the
    ones plane is concatenated BEFORE the /127.5-1 normalization (so the
    checkpoint's 4th input plane is 1/127.5-1, what it was trained with),
    and decoded segments are rescaled to the original (h, w)."""
    img = np.asarray(image)
    if img.dtype != np.uint8 and img.max() <= 1.0:
        img = img * 255.0
    img = img.astype(np.float32)
    h, w = img.shape[:2]
    try:
        import cv2

        net_in = cv2.resize(img, (detect_res, detect_res),
                            interpolation=cv2.INTER_AREA)
    except ImportError:  # pragma: no cover - cv2 is in the image
        net_in = np.asarray(jax.image.resize(
            jnp.asarray(img), (detect_res, detect_res, img.shape[-1]),
            "bilinear"))
    ones = np.ones(net_in.shape[:2] + (1,), np.float32)
    batch = (np.concatenate([net_in, ones], -1)[None] / 127.5) - 1.0
    tpmap = np.asarray(jax.jit(mlsd_apply)(params, jnp.asarray(batch))[0],
                       np.float32)
    segs = decode_lines(tpmap, score_thr=thr_v, dist_thr=thr_d)
    segs = segs * 2.0  # tpMap is at half network resolution
    # back to original pixel coordinates (upstream w_ratio / h_ratio)
    segs = segs * np.array([w / detect_res, h / detect_res] * 2, np.float32)
    canvas = np.zeros((h, w), np.float32)
    try:
        import cv2

        for x0, y0, x1, y1 in segs:
            cv2.line(canvas, (int(x0), int(y0)), (int(x1), int(y1)), 1.0, 1)
    except ImportError:  # pragma: no cover - cv2 is in the image
        for x0, y0, x1, y1 in segs:
            n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
            xs = np.clip(np.linspace(x0, x1, n).astype(int), 0, w - 1)
            ys = np.clip(np.linspace(y0, y1, n).astype(int), 0, h - 1)
            canvas[ys, xs] = 1.0
    return np.stack([canvas] * 3, -1)

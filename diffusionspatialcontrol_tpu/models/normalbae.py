"""NormalBae surface-normal estimator (NNET, EfficientNet-B5 encoder).

The reference's "Normal Map" preprocessor runs controlnet_aux's
NormalBaeDetector (reference: source/app.py:739) — the NNET network of
Bae et al., "Estimating and Exploiting the Aleatoric Uncertainty in
Surface Normal Estimation" (ICCV 2021) with the public ``scannet.pt``
checkpoint. This is the TPU-native equivalent:

  * ``tf_efficientnet_b5_ap`` feature encoder: TF-SAME-padded MBConv
    stages with SiLU and squeeze-excitation; BatchNorm (eps 1e-3) folded
    at conversion into per-channel post-conv affines so the apply fn is a
    pure conv/affine/SiLU chain;
  * coarse-to-fine decoder: 1x1 bottleneck on the 2048-ch head conv,
    four UpSampleBN fusion stages (align_corners=True upsample + two
    conv/BN/LeakyReLU) against the 1/16..1/2 encoder taps, a 1/8-res
    4-channel (normal xyz + kappa concentration) head;
  * three uncertainty-guided refinement levels (1/4, 1/2, 1/1).
    Upstream grid-samples features at the most-uncertain pixels and runs
    a shared pointwise MLP over that ragged set; with align_corners=True
    sampling at integer target-pixel coordinates that equals
    "align-corners upsample, then pointwise MLP" — so here the MLP runs
    DENSE over the whole map (1x1 matmuls on the MXU, static shapes) and
    a top-k + random-coverage mask selects which pixels adopt the refined
    prediction. Per selected pixel the value matches upstream exactly;
    unselected pixels keep the upsampled coarse prediction, as upstream.

``convert_nnet`` consumes the ``scannet.pt`` state dict (after the
``module.`` strip controlnet_aux's loader performs): timm EfficientNet
names under ``encoder.original_model.*`` + ``decoder.*``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.resize import resize_bilinear_align_corners as _resize_ac


@dataclasses.dataclass(frozen=True)
class NormalBaeConfig:
    # encoder (tf_efficientnet_b5_ap): per stage
    # (expand_ratio, kernel, first_stride, out_channels, repeats)
    stem_channels: int = 48
    stages: Tuple[Tuple[int, int, int, int, int], ...] = (
        (1, 3, 1, 24, 3),
        (6, 3, 2, 40, 5),
        (6, 5, 2, 64, 5),
        (6, 3, 2, 128, 7),
        (6, 5, 1, 176, 7),
        (6, 5, 2, 304, 9),
        (6, 3, 1, 512, 3),
    )
    head_channels: int = 2048
    #: stage outputs feeding the decoder skips (1/2, 1/4, 1/8, 1/16 res);
    #: the 1/32 input is the head conv output (features[11] upstream)
    tap_stages: Tuple[int, int, int, int] = (0, 1, 2, 4)
    #: UpSampleBN output widths for up1..up4 (decoder.py skip fusions)
    decoder_features: Tuple[int, int, int, int] = (1024, 512, 256, 128)
    mlp_hidden: int = 128
    sampling_ratio: float = 0.4
    importance_ratio: float = 0.7


#: small preset for random-init tests: same structure (7 stages, SE,
#: stride pattern, taps, 3 refinement levels), tiny widths/depths
NNET_TINY = NormalBaeConfig(
    stem_channels=8,
    stages=(
        (1, 3, 1, 8, 1),
        (6, 3, 2, 12, 1),
        (6, 5, 2, 16, 2),
        (6, 3, 2, 24, 1),
        (6, 5, 1, 32, 1),
        (6, 5, 2, 40, 1),
        (6, 3, 1, 48, 1),
    ),
    head_channels=64,
    decoder_features=(48, 32, 16, 8),
    mlp_hidden=16,
)


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------


def _conv(p, x, stride=1, groups=1, padding="SAME"):
    """Conv (NHWC, HWIO, TF-SAME padded) + folded-BN per-channel affine
    (``scale``/``bias``; absent keys mean identity/zero)."""
    y = lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if "scale" in p:
        y = y * p["scale"].astype(jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _pointwise(p, x):
    """1x1 "conv1d" as a channel matmul: kernel (I, O) + bias (O,)."""
    y = jnp.dot(x, p["kernel"].astype(x.dtype),
                preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _se(p, x):
    """Squeeze-excitation: mean-pool -> reduce conv + SiLU -> expand conv
    -> sigmoid gate (timm SqueezeExcite with SiLU act)."""
    s = x.mean(axis=(1, 2), keepdims=True)
    s = _silu(_conv(p["reduce"], s))
    return x * jax.nn.sigmoid(_conv(p["expand"], s).astype(x.dtype))


def norm_normalize(x):
    """Upstream utils.norm_normalize: unit-normalize the xyz channels,
    kappa -> elu(kappa) + 1.01 (last dim = [nx, ny, nz, kappa])."""
    n = x[..., :3].astype(jnp.float32)
    kappa = x[..., 3:].astype(jnp.float32)
    mag = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True)) + 1e-10
    kappa = jax.nn.elu(kappa) + 1.0 + 0.01
    return jnp.concatenate([n / mag, kappa], axis=-1).astype(x.dtype)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _cbn_init(key, in_c, out_c, k, dtype, bias=True, scale=True):
    fan = in_c * k * k
    p = {"kernel": (jax.random.normal(key, (k, k, in_c, out_c), jnp.float32)
                    / math.sqrt(fan)).astype(dtype)}
    if scale:
        p["scale"] = jnp.ones((out_c,), dtype)
    if bias:
        p["bias"] = jnp.zeros((out_c,), dtype)
    return p


def _pw_init(key, in_c, out_c, dtype):
    return {
        "kernel": (jax.random.normal(key, (in_c, out_c), jnp.float32)
                   / math.sqrt(in_c)).astype(dtype),
        "bias": jnp.zeros((out_c,), dtype),
    }


def _block_init(key, in_c, cfg_stage, dtype):
    e, k, _s, out_c, _r = cfg_stage
    hidden = in_c * e
    rd = max(1, int(in_c * 0.25))
    ks = iter(jax.random.split(key, 5))
    blk: Dict[str, Any] = {}
    if e != 1:
        blk["pw"] = _cbn_init(next(ks), in_c, hidden, 1, dtype)
    blk["dw"] = _cbn_init(next(ks), 1, hidden, k, dtype)
    blk["se"] = {
        "reduce": _cbn_init(next(ks), hidden, rd, 1, dtype, scale=False),
        "expand": _cbn_init(next(ks), rd, hidden, 1, dtype, scale=False),
    }
    blk["pwl"] = _cbn_init(next(ks), hidden, out_c, 1, dtype)
    return blk


def nnet_init(key, cfg: NormalBaeConfig = NormalBaeConfig(),
              dtype=jnp.float32) -> Dict[str, Any]:
    n_blocks = sum(s[4] for s in cfg.stages)
    ks = iter(jax.random.split(key, n_blocks + 32))
    params: Dict[str, Any] = {
        "stem": _cbn_init(next(ks), 3, cfg.stem_channels, 3, dtype),
    }
    stages: List[List[Dict[str, Any]]] = []
    in_c = cfg.stem_channels
    for st in cfg.stages:
        blocks = []
        for i in range(st[4]):
            blocks.append(_block_init(
                next(ks), in_c, st if i == 0 else (st[0], st[1], 1, st[3],
                                                   st[4]), dtype))
            in_c = st[3]
        stages.append(blocks)
    params["stages"] = stages
    params["head"] = _cbn_init(next(ks), in_c, cfg.head_channels, 1, dtype,
                               bias=False, scale=False)

    taps = [cfg.stages[i][3] for i in cfg.tap_stages]  # 1/2..1/16 widths
    f1, f2, f3, f4 = cfg.decoder_features
    dec: Dict[str, Any] = {
        "conv2": _cbn_init(next(ks), cfg.head_channels, cfg.head_channels,
                           1, dtype, scale=False),
    }
    ups = [
        (cfg.head_channels + taps[3], f1),
        (f1 + taps[2], f2),
        (f2 + taps[1], f3),
        (f3 + taps[0], f4),
    ]
    for i, (ic, oc) in enumerate(ups, 1):
        dec[f"up{i}"] = {
            "conv1": _cbn_init(next(ks), ic, oc, 3, dtype),
            "conv2": _cbn_init(next(ks), oc, oc, 3, dtype),
        }
    dec["out8"] = _cbn_init(next(ks), f2, 4, 3, dtype, scale=False)
    for name, width in (("mlp4", f2), ("mlp2", f3), ("mlp1", f4)):
        h = cfg.mlp_hidden
        dec[name] = [
            _pw_init(next(ks), width + 4, h, dtype),
            _pw_init(next(ks), h, h, dtype),
            _pw_init(next(ks), h, h, dtype),
            _pw_init(next(ks), h, 4, dtype),
        ]
    params["decoder"] = dec
    return params


# ---------------------------------------------------------------------------
# Converter (scannet.pt layout: encoder.original_model.* + decoder.*)
# ---------------------------------------------------------------------------


def _fold(sd, conv_key, bn_key, dtype, eps):
    kernel = np.asarray(sd.get(f"{conv_key}.weight"), np.float32)
    kernel = kernel.transpose(2, 3, 1, 0)  # OIHW -> HWIO; dw: (k,k,1,C)
    conv_bias = (np.asarray(sd.get(f"{conv_key}.bias"), np.float32)
                 if f"{conv_key}.bias" in sd.tensors else
                 np.zeros((kernel.shape[-1],), np.float32))
    p = {"kernel": jnp.asarray(kernel, dtype)}
    if bn_key is None:
        p["bias"] = jnp.asarray(conv_bias, dtype)
        return p
    gamma = np.asarray(sd.get(f"{bn_key}.weight"), np.float32)
    beta = np.asarray(sd.get(f"{bn_key}.bias"), np.float32)
    mean = np.asarray(sd.get(f"{bn_key}.running_mean"), np.float32)
    var = np.asarray(sd.get(f"{bn_key}.running_var"), np.float32)
    scale = gamma / np.sqrt(var + eps)
    p["scale"] = jnp.asarray(scale, dtype)
    p["bias"] = jnp.asarray(beta + scale * (conv_bias - mean), dtype)
    return p


def _conv1x1_as_pw(sd, key, dtype):
    w = np.asarray(sd.get(f"{key}.weight"), np.float32)  # (O, I, 1)
    return {
        "kernel": jnp.asarray(w[:, :, 0].T, dtype),
        "bias": jnp.asarray(np.asarray(sd.get(f"{key}.bias"), np.float32),
                            dtype),
    }


def convert_nnet(sd, cfg: NormalBaeConfig = NormalBaeConfig(),
                 dtype=jnp.float32) -> Dict[str, Any]:
    """``sd``: convert.hf.StateDict over the NNET checkpoint (keys already
    stripped of any ``module.`` prefix). Encoder BN eps = 1e-3 (tf port),
    decoder BN eps = 1e-5 (plain nn.BatchNorm2d)."""
    enc = "encoder.original_model"
    params: Dict[str, Any] = {
        "stem": _fold(sd, f"{enc}.conv_stem", f"{enc}.bn1", dtype, 1e-3),
    }
    stages: List[List[Dict[str, Any]]] = []
    for s, st in enumerate(cfg.stages):
        e = st[0]
        blocks = []
        for i in range(st[4]):
            b = f"{enc}.blocks.{s}.{i}"
            blk: Dict[str, Any] = {}
            if e != 1:
                blk["pw"] = _fold(sd, f"{b}.conv_pw", f"{b}.bn1", dtype,
                                  1e-3)
                blk["dw"] = _fold(sd, f"{b}.conv_dw", f"{b}.bn2", dtype,
                                  1e-3)
                blk["pwl"] = _fold(sd, f"{b}.conv_pwl", f"{b}.bn3", dtype,
                                   1e-3)
            else:
                blk["dw"] = _fold(sd, f"{b}.conv_dw", f"{b}.bn1", dtype,
                                  1e-3)
                blk["pwl"] = _fold(sd, f"{b}.conv_pw", f"{b}.bn2", dtype,
                                   1e-3)
            blk["se"] = {
                "reduce": _fold(sd, f"{b}.se.conv_reduce", None, dtype,
                                1e-3),
                "expand": _fold(sd, f"{b}.se.conv_expand", None, dtype,
                                1e-3),
            }
            blocks.append(blk)
        stages.append(blocks)
    params["stages"] = stages
    params["head"] = {"kernel": jnp.asarray(
        np.asarray(sd.get(f"{enc}.conv_head.weight"),
                   np.float32).transpose(2, 3, 1, 0), dtype)}

    dec: Dict[str, Any] = {
        "conv2": _fold(sd, "decoder.conv2", None, dtype, 1e-5),
    }
    for i in range(1, 5):
        dec[f"up{i}"] = {
            "conv1": _fold(sd, f"decoder.up{i}._net.0",
                           f"decoder.up{i}._net.1", dtype, 1e-5),
            "conv2": _fold(sd, f"decoder.up{i}._net.3",
                           f"decoder.up{i}._net.4", dtype, 1e-5),
        }
    dec["out8"] = _fold(sd, "decoder.out_conv_res8", None, dtype, 1e-5)
    for name, res in (("mlp4", 4), ("mlp2", 2), ("mlp1", 1)):
        dec[name] = [
            _conv1x1_as_pw(sd, f"decoder.out_conv_res{res}.{j}", dtype)
            for j in (0, 2, 4, 6)
        ]
    params["decoder"] = dec
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _block_apply(blk, x, stride, in_c, out_c):
    h = x
    if "pw" in blk:  # InvertedResidual
        h = _silu(_conv(blk["pw"], h))
    g = h.shape[-1]
    h = _silu(_conv(blk["dw"], h, stride=stride, groups=g))
    h = _se(blk["se"], h)
    h = _conv(blk["pwl"], h)
    if stride == 1 and in_c == out_c:
        h = h + x
    return h


def _encoder(params, cfg: NormalBaeConfig, pixels):
    """pixels (B, H, W, 3) ImageNet-normalized, H/W multiples of 32 ->
    [tap 1/2, tap 1/4, tap 1/8, tap 1/16, head 1/32] features (the
    upstream Encoder's features[4], [5], [6], [8], [11])."""
    x = _silu(_conv(params["stem"], pixels, stride=2))
    in_c = cfg.stem_channels
    stage_out = []
    for st, blocks in zip(cfg.stages, params["stages"]):
        for i, blk in enumerate(blocks):
            stride = st[2] if i == 0 else 1
            x = _block_apply(blk, x, stride, in_c, st[3])
            in_c = st[3]
        stage_out.append(x)
    head = _conv(params["head"], x)  # raw conv_head output (no bn2/act2)
    return [stage_out[i] for i in cfg.tap_stages] + [head]


def _upsample_fuse(p, x, skip):
    """UpSampleBN: align_corners=True upsample to the skip's spatial size,
    concat, two conv/foldedBN/LeakyReLU(0.01)."""
    up = _resize_ac(x, skip.shape[1], skip.shape[2])
    h = jnp.concatenate([up, skip.astype(up.dtype)], axis=-1)
    h = jax.nn.leaky_relu(_conv(p["conv1"], h), 0.01)
    return jax.nn.leaky_relu(_conv(p["conv2"], h), 0.01)


def _mlp(layers, x):
    for i, layer in enumerate(layers):
        x = _pointwise(layer, x)
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
    return x


def _topk_mask(scores, k):
    """(B, M) scores -> bool (B, M) mask of the top-k per row."""
    _, idx = lax.top_k(scores, k)
    m = jnp.zeros(scores.shape, bool)
    return m.at[jnp.arange(scores.shape[0])[:, None], idx].set(True)


def _refine(mlp_params, feat_src, out_prev, ratio, beta, key):
    """One uncertainty-guided refinement level (upstream decoder.py test
    branch): align-corners 2x upsample of the feature map and previous
    prediction, dense pointwise MLP + norm_normalize, adopted at the
    int(ratio*H*W) selected pixels — top int(beta*N) by uncertainty
    (-kappa) plus a random coverage subset of the rest."""
    b, h, w, _ = out_prev.shape
    H, W = h * 2, w * 2
    feat = _resize_ac(feat_src, H, W)
    init = _resize_ac(out_prev, H, W)
    refined = norm_normalize(_mlp(mlp_params,
                                  jnp.concatenate([feat, init], axis=-1)))

    n = int(ratio * H * W)
    n_imp = int(beta * n)
    n_cov = n - n_imp
    unc = -init[..., 3].astype(jnp.float32).reshape(b, H * W)
    sel = _topk_mask(unc, n_imp) if n_imp > 0 else jnp.zeros(
        (b, H * W), bool)
    if n_cov > 0:
        r = jax.random.uniform(key, (b, H * W))
        r = jnp.where(sel, -1.0, r)
        sel = sel | _topk_mask(r, n_cov)
    sel = sel.reshape(b, H, W, 1)
    return jnp.where(sel, refined, init)


def nnet_apply(params, cfg: NormalBaeConfig, pixels, rng=None):
    """pixels (B, H, W, 3) ImageNet-normalized (H, W multiples of 32) ->
    final full-res prediction (B, H, W, 4) = [normal xyz, kappa] (the
    upstream norm_out_list[-1]). ``rng`` drives the random coverage
    sampling of the refinement levels (upstream: torch.randperm)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    t2, t4, t8, t16, head = _encoder(params, cfg, pixels)
    d = params["decoder"]
    x_d0 = _conv(d["conv2"], head)
    x_d1 = _upsample_fuse(d["up1"], x_d0, t16)
    x_d2 = _upsample_fuse(d["up2"], x_d1, t8)
    x_d3 = _upsample_fuse(d["up3"], x_d2, t4)
    x_d4 = _upsample_fuse(d["up4"], x_d3, t2)

    out8 = norm_normalize(_conv(d["out8"], x_d2, padding="SAME"))
    k4, k2, k1 = jax.random.split(rng, 3)
    out4 = _refine(d["mlp4"], x_d2, out8, cfg.sampling_ratio,
                   cfg.importance_ratio, k4)
    out2 = _refine(d["mlp2"], x_d3, out4, cfg.sampling_ratio,
                   cfg.importance_ratio, k2)
    out1 = _refine(d["mlp1"], x_d4, out2, cfg.sampling_ratio,
                   cfg.importance_ratio, k1)
    return out1


# ---------------------------------------------------------------------------
# Detector wrapper
# ---------------------------------------------------------------------------

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# module-level jit: cfg is a frozen (hashable) dataclass, so repeated
# detector calls at the same resolution hit the trace cache instead of
# re-wrapping (and thus retracing) per image
_nnet_apply_jit = jax.jit(nnet_apply, static_argnums=1)


def detect_normalbae(params, image: np.ndarray,
                     cfg: NormalBaeConfig = NormalBaeConfig(),
                     detect_res: int = 512, seed: int = 0) -> np.ndarray:
    """NormalBaeDetector contract: RGB image -> (H, W, 3) float [0, 1]
    normal map ((n + 1) / 2 per channel). The input is resized so its
    short side is ``detect_res`` with both sides rounded to multiples of
    64 (controlnet_aux resize_image), run through NNET, and the map is
    resized back to the input size."""
    img = np.asarray(image)
    if img.dtype != np.uint8 and img.max() <= 1.0:
        img = img * 255.0
    img = img.astype(np.float32)
    h, w = img.shape[:2]
    k = detect_res / min(h, w)
    th = int(np.round(h * k / 64.0)) * 64
    tw = int(np.round(w * k / 64.0)) * 64
    th, tw = max(th, 64), max(tw, 64)
    small = np.asarray(jax.image.resize(jnp.asarray(img), (th, tw, 3),
                                        "bilinear"))
    norm = (small / 255.0 - _IMAGENET_MEAN) / _IMAGENET_STD
    out = _nnet_apply_jit(params, cfg, jnp.asarray(norm)[None],
                          jax.random.PRNGKey(seed))
    normal = np.asarray(out[0, :, :, :3], np.float32)
    normal = ((normal + 1.0) * 0.5).clip(0.0, 1.0)
    return np.asarray(jax.image.resize(jnp.asarray(normal), (h, w, 3),
                                       "bilinear")).clip(0.0, 1.0)

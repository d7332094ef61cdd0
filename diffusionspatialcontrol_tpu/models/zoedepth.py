"""ZoeDepth metric depth estimator (BEiT-L backbone + metric-bins heads).

The reference's "Zoedepth" T2I-Adapter preprocessor runs controlnet_aux's
ZoeDetector with the ``zoed_nk`` checkpoint (reference: source/app.py:683-684
— the NYU+KITTI dual-head model routed by a patch-transformer domain
classifier). This is the TPU-native equivalent, formula-matched against
transformers' torch implementation (transformers/models/zoedepth/
modeling_zoedepth.py, which hosts the same weights as
``Intel/zoedepth-nyu-kitti``):

  * BEiT backbone: patch-16 ViT with per-layer relative position bias
    (MiDaS-3.1 arbitrary-window interpolation, quirks preserved) and
    layer-scale, features tapped at layers {6, 12, 18, 24};
  * DPT-style neck: readout-projected reassembly at factors {4, 2, 1, 0.5}
    + feature fusion pyramid (align_corners=True doubling);
  * relative depth head + metric bins: seed bin regressor (softplus),
    4 attractor refinement stages (inv-attractor with the upstream repo's
    effective alpha=300/gamma=2 — the config values are unused in the
    torch forward, reproduced faithfully), conditional log-binomial
    softmax over bin centers;
  * NK router: patch transformer + MLP classifier picks the NYU or KITTI
    bin head per image batch (both heads are evaluated and selected with
    jnp.where — XLA-friendly, heads are tiny next to the backbone).

Everything is NHWC / (B, L, C) tokens; one XLA program per image size.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.resize import resize_bilinear_align_corners as _resize_ac


@dataclasses.dataclass(frozen=True)
class ZoeBinConfig:
    name: str = "nyu"
    n_bins: int = 64
    min_depth: float = 1e-3
    max_depth: float = 10.0


@dataclasses.dataclass(frozen=True)
class ZoeDepthConfig:
    # BEiT backbone
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 16
    pretrain_window: int = 24  # image_size 384 / patch 16
    layer_scale_init: float = 0.1
    out_layers: Tuple[int, ...] = (6, 12, 18, 24)
    # neck
    neck_hidden_sizes: Tuple[int, ...] = (256, 512, 1024, 1024)
    reassemble_factors: Tuple[float, ...] = (4.0, 2.0, 1.0, 0.5)
    fusion_hidden_size: int = 256
    # heads
    num_relative_features: int = 32
    bottleneck_features: int = 256
    bin_embedding_dim: int = 128
    num_attractors: Tuple[int, ...] = (16, 8, 4, 1)
    min_temp: float = 0.0212
    max_temp: float = 50.0
    bin_configurations: Tuple[ZoeBinConfig, ...] = (
        ZoeBinConfig("nyu", 64, 1e-3, 10.0),
        ZoeBinConfig("kitti", 64, 1e-3, 80.0),
    )
    # patch transformer router (only used with >1 bin configuration)
    patch_transformer_layers: int = 4
    patch_transformer_hidden: int = 128
    patch_transformer_heads: int = 4
    patch_transformer_intermediate: int = 1024

    @property
    def multi_head(self) -> bool:
        return len(self.bin_configurations) > 1


#: small preset for random-init tests (same structure, fast on CPU)
ZOE_TINY = ZoeDepthConfig(
    hidden_size=64, num_layers=4, num_heads=4, intermediate_size=128,
    pretrain_window=4, out_layers=(1, 2, 3, 4),
    neck_hidden_sizes=(16, 24, 32, 32), fusion_hidden_size=32,
    num_relative_features=8, bottleneck_features=32, bin_embedding_dim=16,
    num_attractors=(4, 2, 2, 1),
    bin_configurations=(ZoeBinConfig("nyu", 8, 1e-3, 10.0),
                        ZoeBinConfig("kitti", 8, 1e-3, 80.0)),
    # the HF patch-transformer forward hardcodes 4 layers and a 128-wide
    # router classifier (modeling_zoedepth.py:943, :986), so smaller values
    # are not weight-compatible
    patch_transformer_layers=4, patch_transformer_hidden=128,
    patch_transformer_heads=2, patch_transformer_intermediate=32,
)


# ---------------------------------------------------------------------------
# Parameter init / conversion helpers
# ---------------------------------------------------------------------------


def _lin_init(key, din, dout, dtype, bias=True):
    p = {"kernel": (jax.random.normal(key, (din, dout), jnp.float32)
                    / math.sqrt(din)).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((dout,), dtype)
    return p


def _conv_init(key, din, dout, k, dtype, bias=True):
    p = {"kernel": (jax.random.normal(key, (k, k, din, dout), jnp.float32)
                    / math.sqrt(din * k * k)).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((dout,), dtype)
    return p


def _ln_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _linear(p, x):
    y = jnp.dot(x, p["kernel"].astype(x.dtype),
                preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _conv2d(p, x, stride=1):
    k = p["kernel"]
    pad = (k.shape[0] - 1) // 2
    y = lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _layer_norm(p, x, eps=1e-12):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    out = (xf - mean) * lax.rsqrt(var + eps)
    out = out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def _resize_half_pixel(x, out_h, out_w):
    """torch F.interpolate(..., align_corners=False) == jax.image bilinear."""
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    return jax.image.resize(x, (b, out_h, out_w, c), "bilinear")


# ---------------------------------------------------------------------------
# BEiT backbone
# ---------------------------------------------------------------------------


def _beit_layer_init(key, cfg: ZoeDepthConfig, dtype):
    ks = iter(jax.random.split(key, 8))
    c = cfg.hidden_size
    w = cfg.pretrain_window
    n_rel = (2 * w - 1) * (2 * w - 1) + 3
    return {
        "ln1": _ln_init(c, dtype),
        "q": _lin_init(next(ks), c, c, dtype),
        "k": _lin_init(next(ks), c, c, dtype, bias=False),
        "v": _lin_init(next(ks), c, c, dtype),
        "proj": _lin_init(next(ks), c, c, dtype),
        "rel_bias_table": (jax.random.normal(next(ks), (n_rel, cfg.num_heads),
                                             jnp.float32) * 0.02
                           ).astype(dtype),
        "lambda_1": jnp.full((c,), cfg.layer_scale_init, dtype),
        "lambda_2": jnp.full((c,), cfg.layer_scale_init, dtype),
        "ln2": _ln_init(c, dtype),
        "fc1": _lin_init(next(ks), c, cfg.intermediate_size, dtype),
        "fc2": _lin_init(next(ks), cfg.intermediate_size, c, dtype),
    }


def _rel_position_index(window: Tuple[int, int]) -> np.ndarray:
    """transformers BeitRelativePositionBias.generate_relative_position_index
    (static numpy; MiDaS-3.1 arbitrary-window variant)."""
    wh, ww = window
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij"))  # 2, wh, ww
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    area = wh * ww
    index = np.zeros((area + 1, area + 1), np.int64)
    index[1:, 1:] = rel.sum(-1)
    index[0, :] = num_rel - 3
    index[:, 0] = num_rel - 2
    index[0, 0] = num_rel - 1
    return index


def _rel_position_bias(table, pretrain_window: int,
                       window: Tuple[int, int]) -> jnp.ndarray:
    """Table (+3 special rows) -> (heads, N+1, N+1) bias for an arbitrary
    window, replicating the HF interpolation exactly (including its
    width/height reshape quirk, inert for the square pretrained window)."""
    old = 2 * pretrain_window - 1
    new_h, new_w = 2 * window[0] - 1, 2 * window[1] - 1
    heads = table.shape[-1]
    sub = table[: old * old].astype(jnp.float32)
    if (new_h, new_w) != (old, old):
        sub = sub.reshape(1, old, old, heads)  # HF: (1, old_w, old_h, -1)
        sub = jax.image.resize(sub, (1, new_h, new_w, heads), "bilinear")
    sub = sub.reshape(new_h * new_w, heads)
    full = jnp.concatenate([sub, table[old * old:].astype(jnp.float32)], 0)
    index = _rel_position_index(window)
    bias = full[index.reshape(-1)].reshape(index.shape + (heads,))
    return bias.transpose(2, 0, 1)


def _beit_attention(p, x, heads, bias):
    b, n, c = x.shape
    d = c // heads
    q = _linear(p["q"], x).reshape(b, n, heads, d).transpose(0, 2, 1, 3)
    k = _linear(p["k"], x).reshape(b, n, heads, d).transpose(0, 2, 1, 3)
    v = _linear(p["v"], x).reshape(b, n, heads, d).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(d) + bias[None].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    return _linear(p["proj"], out)


def _beit_backbone_apply(params, cfg: ZoeDepthConfig, pixels: jnp.ndarray):
    """pixels (B, H, W, 3) normalized -> list of (B, N+1, C) hidden states at
    cfg.out_layers, plus the patch grid (ph, pw)."""
    b, h, w, _ = pixels.shape
    ph, pw = h // cfg.patch_size, w // cfg.patch_size
    x = lax.conv_general_dilated(
        pixels, params["patch_embed"]["kernel"].astype(pixels.dtype),
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(pixels.dtype)
    x = x + params["patch_embed"]["bias"].astype(x.dtype)
    x = x.reshape(b, ph * pw, cfg.hidden_size)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                           (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)

    taps = []
    for i, layer in enumerate(params["layers"], start=1):
        bias = _rel_position_bias(layer["rel_bias_table"],
                                  cfg.pretrain_window, (ph, pw))
        att = _beit_attention(layer, _layer_norm(layer["ln1"], x),
                              cfg.num_heads, bias)
        x = (x + att * layer["lambda_1"].astype(jnp.float32)).astype(x.dtype)
        y = _layer_norm(layer["ln2"], x)
        y = _linear(layer["fc2"], jax.nn.gelu(_linear(layer["fc1"], y),
                                              approximate=False))
        x = (x + y * layer["lambda_2"].astype(jnp.float32)).astype(x.dtype)
        if i in cfg.out_layers:
            taps.append(x)
    return taps, (ph, pw)


# ---------------------------------------------------------------------------
# Neck (reassemble + fusion)
# ---------------------------------------------------------------------------


def _conv_transpose_same_stride(p, x, k):
    """ConvTranspose2d(kernel=k, stride=k, padding=0): each input pixel
    expands into a k x k block — an einsum + reshape, exact and MXU-shaped.
    Kernel stored torch-style (in, out, k, k)."""
    b, h, w, cin = x.shape
    kern = p["kernel"].astype(x.dtype)  # (in, out, k, k)
    y = jnp.einsum("bhwi,iokl->bhkwlo", x, kern,
                   preferred_element_type=jnp.float32)
    y = y.reshape(b, h * k, w * k, kern.shape[1])
    return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _reassemble_apply(params, cfg: ZoeDepthConfig, taps, grid):
    ph, pw = grid
    out = []
    for i, (tap, factor) in enumerate(zip(taps, cfg.reassemble_factors)):
        st = params["reassemble"][i]
        cls_tok, tokens = tap[:, :1], tap[:, 1:]
        readout = jnp.broadcast_to(cls_tok, tokens.shape)
        proj = _linear(st["readout"],
                       jnp.concatenate([tokens, readout], -1))
        proj = jax.nn.gelu(proj, approximate=False)
        fm = proj.reshape(tap.shape[0], ph, pw, cfg.hidden_size)
        fm = _linear(st["projection"], fm)  # 1x1 conv
        if factor > 1:
            fm = _conv_transpose_same_stride(st["resize"], fm, int(factor))
        elif factor < 1:
            fm = _conv2d(st["resize"], fm, stride=int(round(1 / factor)))
        out.append(fm)
    return out


def _preact_residual(p, x):
    y = _conv2d(p["conv1"], jax.nn.relu(x))
    y = _conv2d(p["conv2"], jax.nn.relu(y))
    return x + y


def _fusion_apply(params, feats):
    """DPT feature fusion: deepest first, x2 align-corners upsampling."""
    fused = None
    out = []
    for p, feat in zip(params["fusion"], feats[::-1]):
        if fused is None:
            fused = feat
        else:
            res = feat
            if res.shape[1:3] != fused.shape[1:3]:
                res = _resize_half_pixel(res, fused.shape[1], fused.shape[2])
            fused = fused + _preact_residual(p["res1"], res)
        fused = _preact_residual(p["res2"], fused)
        fused = _resize_ac(fused, fused.shape[1] * 2, fused.shape[2] * 2)
        fused = _linear(p["projection"], fused)
        out.append(fused)
    return out


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------


def _relative_head_apply(p, feat):
    x = _conv2d(p["conv1"], feat)
    x = _resize_ac(x, x.shape[1] * 2, x.shape[2] * 2)
    x = jax.nn.relu(_conv2d(p["conv2"], x))
    features = x
    depth = jax.nn.relu(_linear(p["conv3"], x))[..., 0]
    return depth, features


def _projector_apply(p, x):
    return _linear(p["conv2"], jax.nn.relu(_linear(p["conv1"], x)))


def _inv_attractor(dx, alpha=300.0, gamma=2):
    # NOTE: the torch forward never passes the config alpha/gamma to
    # inv_attractor, so the released checkpoints run with the defaults
    # (modeling_zoedepth.py:649, 734). Reproduced for weight-compatibility.
    return dx / (1.0 + alpha * dx**gamma)


def _attractor_unnormed_apply(p, n_attractors, x, prev_bin,
                              prev_bin_embedding):
    if prev_bin_embedding is not None:
        prev_bin_embedding = _resize_ac(prev_bin_embedding, x.shape[1],
                                        x.shape[2])
        x = x + prev_bin_embedding
    att = jax.nn.softplus(
        _linear(p["conv2"], jax.nn.relu(_linear(p["conv1"], x))))
    bin_centers = _resize_ac(prev_bin, x.shape[1], x.shape[2])
    # channels-last: (B, H, W, A, 1) vs (B, H, W, 1, n_bins)
    delta = _inv_attractor(att[..., :, None] - bin_centers[..., None, :])
    delta = delta.mean(axis=-2)
    new_centers = bin_centers + delta
    return new_centers, new_centers


def _seed_bin_regressor_apply(p, x):
    y = _linear(p["conv2"], jax.nn.relu(_linear(p["conv1"], x)))
    centers = jax.nn.softplus(y)
    return centers, centers


def _log_binomial(probs, temperature, n_classes):
    """LogBinomialSoftmax (channels-last: bins on the last axis). The
    Stirling log-binomial row is static per n_classes, so it is computed
    host-side in float32 (identical to the torch runtime value — and XLA
    constant-folding of the 0*log(0) corner produces NaN otherwise)."""
    eps = 1e-4
    e = np.float32(1e-7)
    k_idx = np.arange(n_classes, dtype=np.float32)
    n = np.float32(n_classes - 1) + e
    k = k_idx + e
    log_binom_row = (n * np.log(n) - k * np.log(k)
                     - (n - k) * np.log(np.maximum(n - k, 0) + e))
    k_idx_j = jnp.asarray(k_idx)
    p = jnp.clip(probs, eps, 1.0)[..., None]
    omp = jnp.clip(1.0 - probs, eps, 1.0)[..., None]
    y = (jnp.asarray(log_binom_row) + k_idx_j * jnp.log(p)
         + (np.float32(n_classes - 1) - k_idx_j) * jnp.log(omp))
    return jax.nn.softmax(y / temperature[..., None], axis=-1)


def _conditional_log_binomial_apply(p, cfg, main, condition, n_bins):
    x = jnp.concatenate([main, condition], axis=-1)
    pt = jax.nn.softplus(_linear(p["mlp2"], jax.nn.gelu(
        _linear(p["mlp1"], x), approximate=False)))
    pt = pt + 1e-4
    prob = pt[..., 0] / (pt[..., 0] + pt[..., 1])
    temp = pt[..., 2] / (pt[..., 2] + pt[..., 3])
    temp = (cfg.max_temp - cfg.min_temp) * temp + cfg.min_temp
    return _log_binomial(prob, temp, n_bins)


def _patch_transformer_apply(p, cfg: ZoeDepthConfig, x):
    """ViT-like router encoder over bottleneck patches; returns CLS."""
    b, h, w, _ = x.shape
    emb = _linear(p["embed"], x).reshape(b, h * w, -1)
    # zero CLS prepended, then 1d sin/cos positional encoding (halves, not
    # interleaved — replicates positional_encoding_1d)
    emb = jnp.concatenate(
        [jnp.zeros((b, 1, emb.shape[-1]), emb.dtype), emb], axis=1)
    n, c = emb.shape[1], emb.shape[2]
    position = np.arange(n, dtype=np.float32)[:, None]
    index = np.arange(0, c, 2, dtype=np.float32)[None, :]
    div = np.exp(index * (-math.log(10000.0) / c))
    pe = position * div
    pe = np.concatenate([np.sin(pe), np.cos(pe)], axis=1)
    emb = emb + jnp.asarray(pe, emb.dtype)[None]

    heads = cfg.patch_transformer_heads
    d = cfg.patch_transformer_hidden // heads
    for layer in p["layers"]:
        q = _linear(layer["q"], emb).reshape(b, n, heads, d)
        k = _linear(layer["k"], emb).reshape(b, n, heads, d)
        v = _linear(layer["v"], emb).reshape(b, n, heads, d)
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits / math.sqrt(d), -1).astype(emb.dtype)
        att = jnp.einsum("bhnm,bmhd->bnhd", probs, v,
                         preferred_element_type=jnp.float32)
        att = _linear(layer["out"], att.reshape(b, n, -1).astype(emb.dtype))
        emb = _layer_norm(layer["norm1"], emb + att, eps=1e-5)
        y = _linear(layer["fc2"], jax.nn.relu(_linear(layer["fc1"], emb)))
        emb = _layer_norm(layer["norm2"], emb + y, eps=1e-5)
    return emb[:, 0]


def _metric_bins_apply(params, cfg: ZoeDepthConfig, bin_cfg: ZoeBinConfig,
                       bottleneck_x, feature_blocks, last, multi: bool):
    """One bin head: seed regressor -> 4 attractor stages -> conditional
    log-binomial expectation over bin centers. Returns (B, H, W) depth."""
    _, seed_centers = _seed_bin_regressor_apply(params["seed"], bottleneck_x)
    prev_bin = seed_centers  # softplus centers: unnormed path
    prev_emb = _projector_apply(params["seed_projector"], bottleneck_x)
    bin_centers = prev_bin
    bin_embedding = prev_emb
    for proj_p, attr_p, n_att, feat in zip(
            params["projectors"], params["attractors"], cfg.num_attractors,
            feature_blocks):
        bin_embedding = _projector_apply(proj_p, feat)
        prev_bin, bin_centers = _attractor_unnormed_apply(
            attr_p, n_att, bin_embedding, prev_bin, prev_emb)
        prev_emb = bin_embedding

    bin_centers = _resize_ac(bin_centers, last.shape[1], last.shape[2])
    bin_embedding = _resize_ac(bin_embedding, last.shape[1], last.shape[2])
    probs = _conditional_log_binomial_apply(
        params["clb"], cfg, last, bin_embedding, bin_cfg.n_bins)
    return jnp.sum(probs * bin_centers, axis=-1)


def zoedepth_apply(params, cfg: ZoeDepthConfig, pixels: jnp.ndarray):
    """pixels (B, H, W, 3), H/W multiples of 32, normalized (x-0.5)/0.5.
    Returns (metric_depth (B, H/2*?, W), domain_logits or None). The output
    depth map is at the relative-head resolution (half input)."""
    taps, grid = _beit_backbone_apply(params["backbone"], cfg, pixels)
    feats = _reassemble_apply(params["neck"], cfg, taps, grid)
    feats = [_conv2d(c, f) for c, f in zip(params["neck"]["convs"], feats)]
    bottleneck = feats[-1]
    fused = _fusion_apply(params["neck"], feats)

    relative_depth, rel_features = _relative_head_apply(
        params["relative_head"], fused[-1])

    mh = params["metric_head"]
    x = _linear(mh["conv2"], bottleneck)

    if cfg.multi_head:
        emb = _patch_transformer_apply(mh["patch_transformer"], cfg, x)
        h1 = jax.nn.relu(_linear(mh["classifier1"], emb))
        domain_logits = _linear(mh["classifier2"], h1)
        vote = jax.nn.softmax(domain_logits.sum(0), -1)
        idx = jnp.argmax(vote)
        last = rel_features
        depths = []
        for bin_cfg in cfg.bin_configurations:
            d = _metric_bins_apply(mh["bins"][bin_cfg.name], cfg, bin_cfg,
                                   x, fused, last, multi=True)
            depths.append(d)
        metric = jnp.where(idx == 0, depths[0],
                           depths[1] if len(depths) > 1 else depths[0])
        return metric, domain_logits
    else:
        bin_cfg = cfg.bin_configurations[0]
        rel = _resize_ac(relative_depth[..., None], rel_features.shape[1],
                         rel_features.shape[2])
        last = jnp.concatenate([rel_features, rel], axis=-1)
        metric = _metric_bins_apply(mh["bins"][bin_cfg.name], cfg, bin_cfg,
                                    x, fused, last, multi=False)
        return metric, None


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def zoedepth_init(key, cfg: ZoeDepthConfig = ZoeDepthConfig(),
                  dtype=jnp.float32) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 256))
    c = cfg.hidden_size
    backbone = {
        "cls_token": jnp.zeros((1, c), dtype),
        "patch_embed": {
            "kernel": (jax.random.normal(
                next(ks), (cfg.patch_size, cfg.patch_size, 3, c),
                jnp.float32) * 0.02).astype(dtype),
            "bias": jnp.zeros((c,), dtype),
        },
        "layers": [_beit_layer_init(next(ks), cfg, dtype)
                   for _ in range(cfg.num_layers)],
    }

    reassemble = []
    for nh, factor in zip(cfg.neck_hidden_sizes, cfg.reassemble_factors):
        st = {
            "readout": _lin_init(next(ks), 2 * c, c, dtype),
            "projection": _lin_init(next(ks), c, nh, dtype),
        }
        if factor > 1:
            st["resize"] = {
                "kernel": (jax.random.normal(
                    next(ks), (nh, nh, int(factor), int(factor)),
                    jnp.float32) * 0.02).astype(dtype),
                "bias": jnp.zeros((nh,), dtype),
            }
        elif factor < 1:
            st["resize"] = _conv_init(next(ks), nh, nh, 3, dtype)
        reassemble.append(st)

    f = cfg.fusion_hidden_size
    fusion = [{
        "projection": _lin_init(next(ks), f, f, dtype),
        "res1": {"conv1": _conv_init(next(ks), f, f, 3, dtype),
                 "conv2": _conv_init(next(ks), f, f, 3, dtype)},
        "res2": {"conv1": _conv_init(next(ks), f, f, 3, dtype),
                 "conv2": _conv_init(next(ks), f, f, 3, dtype)},
    } for _ in cfg.neck_hidden_sizes]
    neck = {
        "reassemble": reassemble,
        "convs": [_conv_init(next(ks), nh, f, 3, dtype, bias=False)
                  for nh in cfg.neck_hidden_sizes],
        "fusion": fusion,
    }

    relative_head = {
        "conv1": _conv_init(next(ks), f, f // 2, 3, dtype),
        "conv2": _conv_init(next(ks), f // 2, cfg.num_relative_features, 3,
                            dtype),
        "conv3": _lin_init(next(ks), cfg.num_relative_features, 1, dtype),
    }

    multi = cfg.multi_head
    be = cfg.bin_embedding_dim
    mlp_dim = be // 2 if multi else 256
    proj_dim = be // 2 if multi else 128
    bf = cfg.bottleneck_features

    def bin_head(bin_cfg: ZoeBinConfig):
        last_in = cfg.num_relative_features + (0 if multi else 1)
        bottleneck_clb = ((last_in + be) // 4 if multi
                          else (last_in + be) // 2)
        return {
            "seed": {"conv1": _lin_init(next(ks), bf, mlp_dim, dtype),
                     "conv2": _lin_init(next(ks), mlp_dim, bin_cfg.n_bins,
                                        dtype)},
            "seed_projector": {
                "conv1": _lin_init(next(ks), bf, proj_dim, dtype),
                "conv2": _lin_init(next(ks), proj_dim, be, dtype)},
            "projectors": [
                {"conv1": _lin_init(next(ks), f, proj_dim, dtype),
                 "conv2": _lin_init(next(ks), proj_dim, be, dtype)}
                for _ in cfg.num_attractors],
            "attractors": [
                {"conv1": _lin_init(next(ks), be, be, dtype),
                 "conv2": _lin_init(next(ks), be, n_att, dtype)}
                for n_att in cfg.num_attractors],
            "clb": {"mlp1": _lin_init(next(ks), last_in + be,
                                      bottleneck_clb, dtype),
                    "mlp2": _lin_init(next(ks), bottleneck_clb, 4, dtype)},
        }

    metric_head: Dict[str, Any] = {
        "conv2": _lin_init(next(ks), bf, bf, dtype),
        "bins": {bc.name: bin_head(bc) for bc in cfg.bin_configurations},
    }
    if multi:
        pt_c = cfg.patch_transformer_hidden
        metric_head["patch_transformer"] = {
            "embed": _lin_init(next(ks), bf, pt_c, dtype),
            "layers": [{
                "q": _lin_init(next(ks), pt_c, pt_c, dtype),
                "k": _lin_init(next(ks), pt_c, pt_c, dtype),
                "v": _lin_init(next(ks), pt_c, pt_c, dtype),
                "out": _lin_init(next(ks), pt_c, pt_c, dtype),
                "norm1": _ln_init(pt_c, dtype),
                "norm2": _ln_init(pt_c, dtype),
                "fc1": _lin_init(next(ks), pt_c,
                                 cfg.patch_transformer_intermediate, dtype),
                "fc2": _lin_init(next(ks),
                                 cfg.patch_transformer_intermediate, pt_c,
                                 dtype),
            } for _ in range(cfg.patch_transformer_layers)],
        }
        metric_head["classifier1"] = _lin_init(next(ks), pt_c, pt_c, dtype)
        metric_head["classifier2"] = _lin_init(next(ks), pt_c, 2, dtype)

    # note: seed_bin_regressor/projector mlp dims differ between single and
    # multi head in HF; bin_head above already encodes that via mlp_dim.
    return {
        "backbone": backbone,
        "neck": neck,
        "relative_head": relative_head,
        "metric_head": metric_head,
    }


# ---------------------------------------------------------------------------
# HF converter (Intel/zoedepth-nyu-kitti layout)
# ---------------------------------------------------------------------------


def _t_lin(sd, key, dtype, bias=True):
    p = {"kernel": jnp.asarray(np.asarray(sd.get(f"{key}.weight")).T, dtype)}
    if bias and f"{key}.bias" in sd.tensors:
        p["bias"] = jnp.asarray(sd.get(f"{key}.bias"), dtype)
    return p


def _t_conv(sd, key, dtype, bias=True):
    w = np.asarray(sd.get(f"{key}.weight"))
    if w.shape[-2:] == (1, 1):
        # 1x1 conv -> linear (in, out)
        p = {"kernel": jnp.asarray(w[:, :, 0, 0].T, dtype)}
    else:
        p = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0), dtype)}
    if bias and f"{key}.bias" in sd.tensors:
        p["bias"] = jnp.asarray(sd.get(f"{key}.bias"), dtype)
    return p


def _t_ln(sd, key, dtype):
    return {"scale": jnp.asarray(sd.get(f"{key}.weight"), dtype),
            "bias": jnp.asarray(sd.get(f"{key}.bias"), dtype)}


def convert_zoedepth(sd, cfg: ZoeDepthConfig = ZoeDepthConfig(),
                     dtype=jnp.float32) -> Dict[str, Any]:
    """``sd``: convert.hf.StateDict over the transformers ZoeDepth layout
    (Intel/zoedepth-nyu-kitti; modeling_zoedepth.py module names)."""
    layers = []
    for i in range(cfg.num_layers):
        b = f"backbone.encoder.layer.{i}"
        a = f"{b}.attention.attention"
        layers.append({
            "ln1": _t_ln(sd, f"{b}.layernorm_before", dtype),
            "q": _t_lin(sd, f"{a}.query", dtype),
            "k": _t_lin(sd, f"{a}.key", dtype, bias=False),
            "v": _t_lin(sd, f"{a}.value", dtype),
            "proj": _t_lin(sd, f"{b}.attention.output.dense", dtype),
            "rel_bias_table": jnp.asarray(
                sd.get(f"{a}.relative_position_bias"
                       ".relative_position_bias_table"), dtype),
            "lambda_1": jnp.asarray(sd.get(f"{b}.lambda_1"), dtype),
            "lambda_2": jnp.asarray(sd.get(f"{b}.lambda_2"), dtype),
            "ln2": _t_ln(sd, f"{b}.layernorm_after", dtype),
            "fc1": _t_lin(sd, f"{b}.intermediate.dense", dtype),
            "fc2": _t_lin(sd, f"{b}.output.dense", dtype),
        })
    pe = np.asarray(sd.get("backbone.embeddings.patch_embeddings"
                           ".projection.weight"))
    backbone = {
        "cls_token": jnp.asarray(
            np.asarray(sd.get("backbone.embeddings.cls_token"))[0], dtype),
        "patch_embed": {
            "kernel": jnp.asarray(pe.transpose(2, 3, 1, 0), dtype),
            "bias": jnp.asarray(sd.get("backbone.embeddings"
                                       ".patch_embeddings.projection.bias"),
                                dtype),
        },
        "layers": layers,
    }

    reassemble = []
    for i, factor in enumerate(cfg.reassemble_factors):
        base = f"neck.reassemble_stage.layers.{i}"
        st = {
            "readout": _t_lin(
                sd, f"neck.reassemble_stage.readout_projects.{i}.0", dtype),
            "projection": _t_conv(sd, f"{base}.projection", dtype),
        }
        if factor > 1:
            # ConvTranspose2d weight (in, out, k, k) stays torch-layout
            st["resize"] = {
                "kernel": jnp.asarray(sd.get(f"{base}.resize.weight"),
                                      dtype),
                "bias": jnp.asarray(sd.get(f"{base}.resize.bias"), dtype),
            }
        elif factor < 1:
            st["resize"] = _t_conv(sd, f"{base}.resize", dtype)
        reassemble.append(st)

    fusion = []
    for i in range(len(cfg.neck_hidden_sizes)):
        base = f"neck.fusion_stage.layers.{i}"
        fusion.append({
            "projection": _t_conv(sd, f"{base}.projection", dtype),
            "res1": {
                "conv1": _t_conv(sd, f"{base}.residual_layer1.convolution1",
                                 dtype),
                "conv2": _t_conv(sd, f"{base}.residual_layer1.convolution2",
                                 dtype)},
            "res2": {
                "conv1": _t_conv(sd, f"{base}.residual_layer2.convolution1",
                                 dtype),
                "conv2": _t_conv(sd, f"{base}.residual_layer2.convolution2",
                                 dtype)},
        })
    neck = {
        "reassemble": reassemble,
        "convs": [_t_conv(sd, f"neck.convs.{i}", dtype, bias=False)
                  for i in range(len(cfg.neck_hidden_sizes))],
        "fusion": fusion,
    }

    relative_head = {
        "conv1": _t_conv(sd, "relative_head.conv1", dtype),
        "conv2": _t_conv(sd, "relative_head.conv2", dtype),
        "conv3": _t_conv(sd, "relative_head.conv3", dtype),
    }

    multi = cfg.multi_head

    def bin_head(name: str):
        if multi:
            seed_base = f"metric_head.seed_bin_regressors.{name}"
            attr_base = f"metric_head.attractors.{name}"
            clb_base = f"metric_head.conditional_log_binomial.{name}"
        else:
            seed_base = "metric_head.seed_bin_regressor"
            attr_base = "metric_head.attractors"
            clb_base = "metric_head.conditional_log_binomial"
        return {
            "seed": {"conv1": _t_conv(sd, f"{seed_base}.conv1", dtype),
                     "conv2": _t_conv(sd, f"{seed_base}.conv2", dtype)},
            "seed_projector": {
                "conv1": _t_conv(sd, "metric_head.seed_projector.conv1",
                                 dtype),
                "conv2": _t_conv(sd, "metric_head.seed_projector.conv2",
                                 dtype)},
            "projectors": [
                {"conv1": _t_conv(sd, f"metric_head.projectors.{i}.conv1",
                                  dtype),
                 "conv2": _t_conv(sd, f"metric_head.projectors.{i}.conv2",
                                  dtype)}
                for i in range(len(cfg.num_attractors))],
            "attractors": [
                {"conv1": _t_conv(sd, f"{attr_base}.{i}.conv1", dtype),
                 "conv2": _t_conv(sd, f"{attr_base}.{i}.conv2", dtype)}
                for i in range(len(cfg.num_attractors))],
            "clb": {"mlp1": _t_conv(sd, f"{clb_base}.mlp.0", dtype),
                    "mlp2": _t_conv(sd, f"{clb_base}.mlp.2", dtype)},
        }

    metric_head: Dict[str, Any] = {
        "conv2": _t_conv(sd, "metric_head.conv2", dtype),
        "bins": {bc.name: bin_head(bc.name)
                 for bc in cfg.bin_configurations},
    }
    if multi:
        pt = "metric_head.patch_transformer"
        metric_head["patch_transformer"] = {
            "embed": _t_conv(sd, f"{pt}.embedding_convPxP", dtype),
            "layers": [{
                "q": _t_lin(sd, f"{pt}.transformer_encoder.{i}"
                                ".self_attn.query", dtype),
                "k": _t_lin(sd, f"{pt}.transformer_encoder.{i}"
                                ".self_attn.key", dtype),
                "v": _t_lin(sd, f"{pt}.transformer_encoder.{i}"
                                ".self_attn.value", dtype),
                "out": _t_lin(sd, f"{pt}.transformer_encoder.{i}"
                                  ".self_attn.out_proj", dtype),
                "norm1": _t_ln(sd, f"{pt}.transformer_encoder.{i}.norm1",
                               dtype),
                "norm2": _t_ln(sd, f"{pt}.transformer_encoder.{i}.norm2",
                               dtype),
                "fc1": _t_lin(sd, f"{pt}.transformer_encoder.{i}.linear1",
                              dtype),
                "fc2": _t_lin(sd, f"{pt}.transformer_encoder.{i}.linear2",
                              dtype),
            } for i in range(cfg.patch_transformer_layers)],
        }
        metric_head["classifier1"] = _t_lin(
            sd, "metric_head.mlp_classifier.linear1", dtype)
        metric_head["classifier2"] = _t_lin(
            sd, "metric_head.mlp_classifier.linear2", dtype)

    return {
        "backbone": backbone,
        "neck": neck,
        "relative_head": relative_head,
        "metric_head": metric_head,
    }


# ---------------------------------------------------------------------------
# Detector
# ---------------------------------------------------------------------------


def detect_zoedepth(params, image: np.ndarray,
                    cfg: ZoeDepthConfig = ZoeDepthConfig(),
                    target: Tuple[int, int] = (384, 512),
                    flip_aug: bool = True) -> np.ndarray:
    """Full detector (controlnet_aux ZoeDetector contract): RGB image ->
    (H, W, 3) float [0, 1] inverted-depth control image (2/85 percentile
    normalization, reference detector post-processing)."""
    img = np.asarray(image, np.float32)
    if img.max() > 1.0:
        img = img / 255.0
    h, w = img.shape[:2]
    th = max(32, int(round(target[0] / 32)) * 32)
    tw = max(32, int(round(target[1] / 32)) * 32)
    x = np.asarray(jax.image.resize(jnp.asarray(img), (th, tw, 3),
                                    "bilinear"))
    x = (x - 0.5) / 0.5

    @jax.jit
    def run(p, xin):
        d, _ = zoedepth_apply(p, cfg, xin)
        if flip_aug:
            d2, _ = zoedepth_apply(p, cfg, xin[:, :, ::-1])
            d = 0.5 * (d + d2[:, :, ::-1])
        return d

    depth = np.asarray(run(params, jnp.asarray(x)[None])[0], np.float32)
    depth = np.asarray(jax.image.resize(jnp.asarray(depth), (h, w),
                                        "bilinear"))
    vmin, vmax = np.percentile(depth, 2), np.percentile(depth, 85)
    depth = (depth - vmin) / max(vmax - vmin, 1e-8)
    depth = 1.0 - depth
    return np.stack([depth.clip(0.0, 1.0)] * 3, -1)

"""Functional UNet2DCondition for the SD1.x/2.x family, TPU-first.

Capability-parity with the reference's vendored diffusers UNet
(reference: source/modules/u_net_condition_modify.py:70-1315) but written from
scratch as a pure function over a params pytree, NHWC layout, with:

  * region-biased cross-attention plumbed structurally (not via processor
    monkey-patching): every cross-attn layer statically knows its resolution
    level and selects the matching precomputed region-bias tensor
    (reference keys biases by runtime seq-len, attention_modify.py:167);
  * ControlNet additive residuals (down skips + mid) and T2I-Adapter
    intrablock residuals (reference: u_net_condition_modify.py:1216-1270);
  * IP-Adapter decoupled image-token attention with per-adapter scales and
    optional spatial gating masks (reference: attention_modify.py:658-685);
  * FreeU (reference keeps diffusers' enable_freeu,
    u_net_condition_modify.py:835);
  * optional DAAM-style cross-attention heatmap accumulation.

Everything here traces to a single XLA program; no data-dependent Python
control flow.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import UNetConfig
from ..ops import attention as attn_ops
from .layers import (
    conv2d,
    conv_init,
    group_norm,
    layer_norm,
    linear,
    linear_init,
    norm_init,
    silu,
    timestep_embedding,
)


# ---------------------------------------------------------------------------
# Region-bias + conditioning containers
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class RegionState:
    """Precomputed region-bias tensors per resolution level plus the current
    noise sigma. ``biases[i]`` has shape (B, H/8/2^i * W/8/2^i, S_text) and is
    selected statically by each attention layer's level."""

    def __init__(self, biases: Tuple[jnp.ndarray, ...], sigma: jnp.ndarray):
        self.biases = tuple(biases)
        self.sigma = sigma

    def tree_flatten(self):
        return (self.biases, self.sigma), len(self.biases)

    @classmethod
    def tree_unflatten(cls, aux, children):
        biases, sigma = children
        return cls(tuple(biases), sigma)


@dataclasses.dataclass
class UNetCond:
    """All conditioning inputs of one UNet forward (a pytree via dataclass
    fields being arrays/None). Static structure selects the traced program."""

    context: jnp.ndarray  # (B, S, cross_dim) text embeddings
    region: Optional[RegionState] = None
    # ControlNet: 12 down residuals + 1 mid (NHWC), already scaled.
    controlnet_down: Optional[Tuple[jnp.ndarray, ...]] = None
    controlnet_mid: Optional[jnp.ndarray] = None
    # T2I-Adapter: one per level, NHWC.
    t2i_residuals: Optional[Tuple[jnp.ndarray, ...]] = None
    # IP-Adapter: tuple of (B, n_tokens, cross_dim) image-token embeddings.
    ip_tokens: Optional[Tuple[jnp.ndarray, ...]] = None
    ip_scales: Optional[Tuple[float, ...]] = None
    # Per-adapter spatial masks (B, Hm, Wm) in [0,1]; gated on attn output.
    ip_masks: Optional[Tuple[Optional[jnp.ndarray], ...]] = None


jax.tree_util.register_dataclass(
    UNetCond,
    data_fields=[
        "context",
        "region",
        "controlnet_down",
        "controlnet_mid",
        "t2i_residuals",
        "ip_tokens",
        "ip_masks",
    ],
    meta_fields=["ip_scales"],
)


@dataclasses.dataclass(frozen=True)
class FreeUParams:
    """FreeU backbone/skip rescaling (capability parity with
    u_net_condition_modify.py:835 enable_freeu). SD1.5 recommended values."""

    b1: float = 1.5
    b2: float = 1.6
    s1: float = 0.9
    s2: float = 0.2


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _resnet_init(key, in_c, out_c, temb_dim, dtype):
    k = jax.random.split(key, 4)
    p = {
        "norm1": norm_init(in_c, dtype),
        "conv1": conv_init(k[0], in_c, out_c, 3, dtype),
        "time_emb_proj": linear_init(k[1], temb_dim, out_c, dtype=dtype),
        "norm2": norm_init(out_c, dtype),
        "conv2": conv_init(k[2], out_c, out_c, 3, dtype),
    }
    if in_c != out_c:
        p["conv_shortcut"] = conv_init(k[3], in_c, out_c, 1, dtype)
    return p


def _attention_init(key, query_dim, context_dim, heads, dtype):
    inner = query_dim
    k = jax.random.split(key, 4)
    return {
        "to_q": linear_init(k[0], query_dim, inner, bias=False, dtype=dtype),
        "to_k": linear_init(k[1], context_dim, inner, bias=False, dtype=dtype),
        "to_v": linear_init(k[2], context_dim, inner, bias=False, dtype=dtype),
        "to_out": linear_init(k[3], inner, query_dim, dtype=dtype),
    }


def _transformer_block_init(key, dim, context_dim, heads, dtype):
    k = jax.random.split(key, 5)
    return {
        "norm1": norm_init(dim, dtype),
        "attn1": _attention_init(k[0], dim, dim, heads, dtype),
        "norm2": norm_init(dim, dtype),
        "attn2": _attention_init(k[1], dim, context_dim, heads, dtype),
        "norm3": norm_init(dim, dtype),
        "ff": {
            "proj_in": linear_init(k[2], dim, dim * 8, dtype=dtype),  # GEGLU
            "proj_out": linear_init(k[3], dim * 4, dim, dtype=dtype),
        },
    }


def _transformer_init(key, cfg: UNetConfig, channels, heads, dtype):
    k = jax.random.split(key, 3 + cfg.transformer_layers_per_block)
    if cfg.use_linear_projection:
        proj_in = linear_init(k[0], channels, channels, dtype=dtype)
        proj_out = linear_init(k[1], channels, channels, dtype=dtype)
    else:
        proj_in = conv_init(k[0], channels, channels, 1, dtype)
        proj_out = conv_init(k[1], channels, channels, 1, dtype)
    return {
        "norm": norm_init(channels, dtype),
        "proj_in": proj_in,
        "blocks": [
            _transformer_block_init(
                k[3 + i], channels, cfg.cross_attention_dim, heads, dtype
            )
            for i in range(cfg.transformer_layers_per_block)
        ],
        "proj_out": proj_out,
    }


def unet_init(key, cfg: UNetConfig, dtype=jnp.bfloat16) -> Dict[str, Any]:
    keys = jax.random.split(key, 64)
    ki = iter(keys)
    temb_dim = cfg.time_embed_dim
    b0 = cfg.block_out_channels[0]

    params: Dict[str, Any] = {
        "conv_in": conv_init(next(ki), cfg.in_channels, b0, 3, dtype),
        "time_embedding": {
            "linear_1": linear_init(next(ki), b0, temb_dim, dtype=dtype),
            "linear_2": linear_init(next(ki), temb_dim, temb_dim, dtype=dtype),
        },
    }

    # Down blocks
    down = []
    in_c = b0
    for level, out_c in enumerate(cfg.block_out_channels):
        block = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block):
            block["resnets"].append(
                _resnet_init(next(ki), in_c if j == 0 else out_c, out_c,
                             temb_dim, dtype)
            )
            if cfg.attn_levels[level]:
                block["attentions"].append(
                    _transformer_init(next(ki), cfg, out_c,
                                      cfg.heads_at(level), dtype)
                )
        if level < cfg.num_levels - 1:
            block["downsample"] = conv_init(next(ki), out_c, out_c, 3, dtype)
        down.append(block)
        in_c = out_c
    params["down_blocks"] = down

    # Mid block
    mid_c = cfg.block_out_channels[-1]
    params["mid_block"] = {
        "resnet1": _resnet_init(next(ki), mid_c, mid_c, temb_dim, dtype),
        "attention": _transformer_init(
            next(ki), cfg, mid_c, cfg.heads_at(cfg.num_levels - 1), dtype
        ),
        "resnet2": _resnet_init(next(ki), mid_c, mid_c, temb_dim, dtype),
    }

    # Up blocks (mirror of down, one extra resnet per block)
    up = []
    rev_channels = list(reversed(cfg.block_out_channels))
    for i, out_c in enumerate(rev_channels):
        level = cfg.num_levels - 1 - i
        prev_c = rev_channels[max(i - 1, 0)]
        skip_cs = _up_skip_channels(cfg, level)
        block = {"resnets": [], "attentions": []}
        res_in = [prev_c if j == 0 else out_c for j in range(cfg.layers_per_block + 1)]
        for j in range(cfg.layers_per_block + 1):
            block["resnets"].append(
                _resnet_init(next(ki), res_in[j] + skip_cs[j], out_c,
                             temb_dim, dtype)
            )
            if cfg.attn_levels[level]:
                block["attentions"].append(
                    _transformer_init(next(ki), cfg, out_c,
                                      cfg.heads_at(level), dtype)
                )
        if i < cfg.num_levels - 1:
            block["upsample"] = conv_init(next(ki), out_c, out_c, 3, dtype)
        up.append(block)
    params["up_blocks"] = up

    params["conv_norm_out"] = norm_init(b0, dtype)
    params["conv_out"] = conv_init(next(ki), b0, cfg.out_channels, 3, dtype)
    return params


def _up_skip_channels(cfg: UNetConfig, level: int) -> List[int]:
    """Channels of the skip connections consumed by up-block ``level``, in
    consumption order (LIFO from the down path)."""
    # Down path pushes: conv_in (b0), then per level: layers_per_block resnet
    # outputs (out_c each) + downsample output (out_c) except last level.
    stack: List[int] = [cfg.block_out_channels[0]]
    for lv, out_c in enumerate(cfg.block_out_channels):
        stack.extend([out_c] * cfg.layers_per_block)
        if lv < cfg.num_levels - 1:
            stack.append(out_c)
    # Up block at `level` pops layers_per_block+1 skips.
    n_before = 0
    for lv in range(cfg.num_levels - 1, level, -1):
        n_before += cfg.layers_per_block + 1
    start = len(stack) - n_before - (cfg.layers_per_block + 1)
    popped = stack[start : start + cfg.layers_per_block + 1]
    return list(reversed(popped))


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _temb_projections(resnets, temb):
    """Per-resnet ``linear(time_emb_proj, silu(temb))`` for every resnet in
    ``resnets``, computed as ONE fused GEMM: the kernels are concatenated on
    the output dim (loop-invariant, so XLA hoists the concat out of the
    sampling scan) and the result is sliced back per resnet. Column j of the
    fused product contracts exactly the same K=temb_dim vector as the
    per-resnet dot, so this is the same math batched on N — it replaces
    ~22 M=batch GEMMs + SiLUs per UNet step with one of each."""
    st = silu(temb)
    ks = [r["time_emb_proj"]["kernel"] for r in resnets]
    wcat = jnp.concatenate(ks, axis=1)
    bcat = jnp.concatenate(
        [r["time_emb_proj"]["bias"] for r in resnets], axis=0)
    t_all = linear({"kernel": wcat, "bias": bcat}, st)
    out, off = [], 0
    for k in ks:
        n = k.shape[1]
        out.append(t_all[:, off:off + n])
        off += n
    return out


def _resnet_apply(p, x, temb, groups, eps, conv_impl: str = "xla", t=None):
    if t is None:
        t = linear(p["time_emb_proj"], silu(temb))
    if conv_impl in ("pallas", "pallas2"):
        # Fused one-HBM-pass branch: GN stats are a cheap XLA reduction,
        # folded into a per-(batch, channel) affine; normalize+SiLU+conv3x3
        # (+temb / +skip) run inside one Pallas kernel (ops/pallas/
        # conv_fused.py; "pallas2" selects the shift-free implicit-GEMM
        # variant). Falls back to the XLA path per-resnet when the
        # working set exceeds VMEM (very large latents).
        from ..ops.pallas.conv_fused import (
            fold_group_norm,
            gn_silu_conv3x3,
            gn_silu_conv3x3_v2,
        )

        fused = gn_silu_conv3x3_v2 if conv_impl == "pallas2" else \
            gn_silu_conv3x3
        try:
            s1, b1 = fold_group_norm(p["norm1"], x, groups, eps)
            h = fused(
                x, s1, b1, p["conv1"]["kernel"].astype(x.dtype),
                p["conv1"]["bias"], channel_bias=t.astype(jnp.float32),
            )
            s2, b2 = fold_group_norm(p["norm2"], h, groups, eps)
            if "conv_shortcut" in p:
                sc = conv2d(p["conv_shortcut"], x, padding="VALID")
            else:
                sc = x
            return fused(
                h, s2, b2, p["conv2"]["kernel"].astype(h.dtype),
                p["conv2"]["bias"], skip=sc,
            )
        except ValueError:
            pass
    # "xla_bf16": request the conv output in the compute dtype instead of
    # fp32 — one extra rounding before the (fp32-stats) GroupNorm, same as
    # the reference's fp16 autocast behavior. A/B: benchmarks/ab_conv_dtype.
    pref = None if conv_impl == "xla_bf16" else jnp.float32
    h = group_norm(p["norm1"], x, groups, eps)
    h = silu(h)
    h = conv2d(p["conv1"], h, preferred=pref)
    h = h + t[:, None, None, :].astype(h.dtype)
    h = group_norm(p["norm2"], h, groups, eps)
    h = silu(h)
    h = conv2d(p["conv2"], h, preferred=pref)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding="VALID", preferred=pref)
    return x + h


def _heads_split(x, heads):
    """(B, L, H*D) -> (B, L, H, D): a pure reshape — the BTNH layout flows
    through every attention path untransposed (BHLD round trips showed up
    as ~2.4 ms/step of data formatting in profiles)."""
    b, l, d = x.shape
    return x.reshape(b, l, heads, d // heads)


def _heads_merge(x):
    b, l, h, d = x.shape
    return x.reshape(b, l, h * d)


def _flash_opts(attn_impl: str) -> dict:
    """Kernel-variant suffixes: ``attn_impl="pallas+exp2+qkbf16+pvbf16"``
    selects the flash-kernel MXU/VPU variants (flash_attention docs);
    plain "pallas" is the validated default."""
    opts = attn_impl.split("+")[1:]
    return {"qk_bf16": "qkbf16" in opts, "pv_bf16": "pvbf16" in opts,
            "use_exp2": "exp2" in opts}


def _self_attention(p, x, heads, attn_impl):
    q = _heads_split(linear(p["to_q"], x), heads)
    k = _heads_split(linear(p["to_k"], x), heads)
    v = _heads_split(linear(p["to_v"], x), heads)
    if attn_impl.startswith("pallas"):
        from ..ops.pallas.flash_attention import flash_attention_nlhd

        out = flash_attention_nlhd(q, k, v, **_flash_opts(attn_impl))
    else:
        out = attn_ops.attention_nlhd(q, k, v)
    return linear(p["to_out"], _heads_merge(out))


def _cross_attention(p, x, cond: UNetCond, level: int, heads, attn_impl,
                     heatmaps: Optional[list], axis_name: Optional[str] = None):
    q = _heads_split(linear(p["to_q"], x), heads)
    k = _heads_split(linear(p["to_k"], cond.context), heads)
    v = _heads_split(linear(p["to_v"], cond.context), heads)

    if cond.region is not None:
        bias = cond.region.biases[level]
        if attn_impl.startswith("pallas"):
            from ..ops.pallas.region_attention import region_attention_nlhd

            out = region_attention_nlhd(q, k, v, bias, cond.region.sigma,
                                        axis_name=axis_name)
        else:
            out = attn_ops.region_attention_nlhd(q, k, v, bias,
                                                 cond.region.sigma,
                                                 axis_name=axis_name)
    else:
        if attn_impl.startswith("pallas"):
            from ..ops.pallas.flash_attention import flash_attention_nlhd

            out = flash_attention_nlhd(q, k, v, **_flash_opts(attn_impl))
        else:
            out = attn_ops.attention_nlhd(q, k, v)

    if heatmaps is not None:
        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        if cond.region is not None:
            probs = attn_ops.attention_probs(
                qt, kt, cond.region.biases[level], cond.region.sigma
            )
        else:
            probs = attn_ops.attention_probs(qt, kt)
        heatmaps.append((level, probs.sum(axis=1)))  # (B, L, S)

    out_h = _heads_merge(out)

    # IP-Adapter decoupled attention (reference: attention_modify.py:658-685).
    if cond.ip_tokens is not None and "ip" in p:
        for i, (ip_tok, ip_p) in enumerate(zip(cond.ip_tokens, p["ip"])):
            ip_k = _heads_split(linear(ip_p["to_k"], ip_tok), heads)
            ip_v = _heads_split(linear(ip_p["to_v"], ip_tok), heads)
            ip_out = _heads_merge(attn_ops.attention_nlhd(q, ip_k, ip_v))
            scale = 1.0 if cond.ip_scales is None else cond.ip_scales[i]
            if cond.ip_masks is not None and cond.ip_masks[i] is not None:
                mask = _downsample_mask(cond.ip_masks[i], x.shape[1])
                ip_out = ip_out * mask[..., None].astype(ip_out.dtype)
            out_h = out_h + scale * ip_out

    return linear(p["to_out"], out_h)


def _downsample_mask(mask: jnp.ndarray, seq_len: int) -> jnp.ndarray:
    """Downsample a (B, Hm, Wm) mask to a flattened length-``seq_len`` gate,
    mirroring diffusers' IPAdapterMaskProcessor.downsample used at
    attention_modify.py:377-383 (aspect-preserving bilinear resize)."""
    b, hm, wm = mask.shape
    ratio = (hm * wm / seq_len) ** 0.5
    h = max(int(round(hm / ratio)), 1)
    w = max(seq_len // h, 1)
    m = jax.image.resize(mask.astype(jnp.float32), (b, h, w), "bilinear")
    m = m.reshape(b, h * w)
    if h * w < seq_len:
        m = jnp.pad(m, ((0, 0), (0, seq_len - h * w)))
    return m[:, :seq_len]


def _geglu_ff(p, x):
    h = linear(p["proj_in"], x)
    val, gate = jnp.split(h, 2, axis=-1)
    h = val * jax.nn.gelu(gate, approximate=False)
    return linear(p["proj_out"], h)


def _transformer_apply(p, cfg: UNetConfig, x, cond: UNetCond, level: int,
                       heads, attn_impl, heatmaps,
                       axis_name: Optional[str] = None,
                       xattn_cache: Optional[list] = None,
                       xattn_out: Optional[list] = None):
    b, hh, ww, c = x.shape
    residual = x
    h = group_norm(p["norm"], x, cfg.norm_num_groups, 1e-6)
    if cfg.use_linear_projection:
        h = h.reshape(b, hh * ww, c)
        h = linear(p["proj_in"], h)
    else:
        h = conv2d(p["proj_in"], h, padding="VALID")
        h = h.reshape(b, hh * ww, c)

    for bp in p["blocks"]:
        h = h + _self_attention(bp["attn1"], layer_norm(bp["norm1"], h), heads,
                                attn_impl)
        if xattn_cache is not None:
            # TGATE tail: frozen cross-attention output (PAPERS.md
            # "Faster Diffusion via Temporal Attention Decomposition");
            # the norm2 layer_norm and all q/k/v work are skipped too
            xo = xattn_cache.pop(0)
        else:
            xo = _cross_attention(bp["attn2"], layer_norm(bp["norm2"], h),
                                  cond, level, heads, attn_impl, heatmaps,
                                  axis_name=axis_name)
        if xattn_out is not None:
            xattn_out.append(xo)
        h = h + xo.astype(h.dtype)
        h = h + _geglu_ff(bp["ff"], layer_norm(bp["norm3"], h))

    if cfg.use_linear_projection:
        h = linear(p["proj_out"], h)
        h = h.reshape(b, hh, ww, c)
    else:
        h = h.reshape(b, hh, ww, c)
        h = conv2d(p["proj_out"], h, padding="VALID")
    return h + residual


def _freeu_filter(skip: jnp.ndarray, scale: float, threshold: int = 1):
    """FreeU Fourier gating of skip features (low-freq box scaled by s)."""
    xf = jnp.fft.fftn(skip.astype(jnp.float32), axes=(1, 2))
    xf = jnp.fft.fftshift(xf, axes=(1, 2))
    b, h, w, c = skip.shape
    ch, cw = h // 2, w // 2
    rows = jnp.abs(jnp.arange(h) - ch)[:, None] <= threshold
    cols = jnp.abs(jnp.arange(w) - cw)[None, :] <= threshold
    box = (rows & cols)[None, :, :, None]
    xf = jnp.where(box, xf * scale, xf)
    xf = jnp.fft.ifftshift(xf, axes=(1, 2))
    out = jnp.fft.ifftn(xf, axes=(1, 2)).real
    return out.astype(skip.dtype)


def unet_apply(
    params: Dict[str, Any],
    cfg: UNetConfig,
    sample: jnp.ndarray,  # (B, H, W, C) latents, NHWC
    timesteps: jnp.ndarray,  # (B,) possibly fractional
    cond: UNetCond,
    attn_impl: str = "xla",
    freeu: Optional[FreeUParams] = None,
    collect_heatmaps: bool = False,
    axis_name: Optional[str] = None,
    conv_impl: Optional[str] = None,
    xattn_cache: Optional[Tuple[jnp.ndarray, ...]] = None,
    collect_xattn: bool = False,
):
    """UNet forward. Returns eps/v prediction (B, H, W, out_channels); with
    ``collect_heatmaps`` also returns a list of (level, (B, L, S)) cross-attn
    probability sums for DAAM-style introspection.

    ``conv_impl`` selects the resnet conv path ("pallas" = fused
    GN+SiLU+conv kernel, "xla" = lax.conv chain). Default "xla": the
    round-3 A/B showed XLA's conv pipeline beats the fused kernel at the
    hot shapes (PERF.md "Round 3"); pallas attention remains the winner
    and is selected independently via ``attn_impl``.

    TGATE-style cross-attention freezing (opt-in, PAPERS.md "Faster
    Diffusion via Temporal Attention Decomposition"): ``collect_xattn``
    returns ``(out, xattn_outputs)`` — the output of every cross-attention
    call in traversal order; ``xattn_cache`` (the same tuple) substitutes
    those values and skips all cross-attention compute. Mutually exclusive
    with each other and with ``collect_heatmaps``."""
    if collect_xattn and (xattn_cache is not None or collect_heatmaps):
        raise ValueError("collect_xattn is exclusive with xattn_cache / "
                         "collect_heatmaps")
    if xattn_cache is not None and collect_heatmaps:
        raise ValueError("heatmap introspection needs live cross-attention "
                         "(xattn_cache skips it)")
    heatmaps: Optional[list] = [] if collect_heatmaps else None
    xa_in = list(xattn_cache) if xattn_cache is not None else None
    xa_out: Optional[list] = [] if collect_xattn else None
    groups, eps_ = cfg.norm_num_groups, cfg.norm_eps
    conv_impl = "xla" if conv_impl is None else conv_impl

    temb = timestep_embedding(
        timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos,
        cfg.freq_shift
    )
    temb = linear(params["time_embedding"]["linear_1"],
                  temb.astype(sample.dtype))
    temb = linear(params["time_embedding"]["linear_2"], silu(temb))

    # One fused GEMM for every resnet's time projection, consumed in
    # traversal order (down -> mid -> up) below.
    res_order = [r for blk in params["down_blocks"] for r in blk["resnets"]]
    res_order += [params["mid_block"]["resnet1"],
                  params["mid_block"]["resnet2"]]
    res_order += [r for blk in params["up_blocks"] for r in blk["resnets"]]
    t_it = iter(_temb_projections(res_order, temb))

    h = conv2d(params["conv_in"], sample)
    skips = [h]

    # T2I-Adapter intrablock residuals are consumed one per down block
    # (reference: u_net_condition_modify.py:1216-1232).
    t2i = list(cond.t2i_residuals) if cond.t2i_residuals is not None else None

    for level, block in enumerate(params["down_blocks"]):
        n_res = len(block["resnets"])
        for j in range(n_res):
            h = _resnet_apply(block["resnets"][j], h, temb, groups, eps_,
                              conv_impl, t=next(t_it))
            if block["attentions"]:
                h = _transformer_apply(block["attentions"][j], cfg, h, cond,
                                       level, cfg.heads_at(level), attn_impl,
                                       heatmaps, axis_name=axis_name,
                                       xattn_cache=xa_in, xattn_out=xa_out)
            if j == n_res - 1 and t2i:
                h = h + t2i.pop(0).astype(h.dtype)
            skips.append(h)
        if "downsample" in block:
            h = conv2d(block["downsample"], h, stride=2)
            skips.append(h)

    # ControlNet residual merge on the skip stack + mid
    # (reference: u_net_condition_modify.py:1236-1245, 1269-1270).
    if cond.controlnet_down is not None:
        skips = [s + r.astype(s.dtype)
                 for s, r in zip(skips, cond.controlnet_down)]

    mid = params["mid_block"]
    h = _resnet_apply(mid["resnet1"], h, temb, groups, eps_, conv_impl,
                      t=next(t_it))
    h = _transformer_apply(mid["attention"], cfg, h, cond, cfg.num_levels - 1,
                           cfg.heads_at(cfg.num_levels - 1), attn_impl,
                           heatmaps, axis_name=axis_name,
                           xattn_cache=xa_in, xattn_out=xa_out)
    h = _resnet_apply(mid["resnet2"], h, temb, groups, eps_, conv_impl,
                      t=next(t_it))
    if cond.controlnet_mid is not None:
        h = h + cond.controlnet_mid.astype(h.dtype)

    for i, block in enumerate(params["up_blocks"]):
        level = cfg.num_levels - 1 - i
        for j in range(len(block["resnets"])):
            skip = skips.pop()
            if freeu is not None and i in (0, 1):
                b_scale = freeu.b1 if i == 0 else freeu.b2
                s_scale = freeu.s1 if i == 0 else freeu.s2
                c_half = h.shape[-1] // 2
                h = h.at[..., :c_half].multiply(b_scale)
                skip = _freeu_filter(skip, s_scale)
            h = jnp.concatenate([h, skip], axis=-1)
            h = _resnet_apply(block["resnets"][j], h, temb, groups, eps_,
                              conv_impl, t=next(t_it))
            if block["attentions"]:
                h = _transformer_apply(block["attentions"][j], cfg, h, cond,
                                       level, cfg.heads_at(level), attn_impl,
                                       heatmaps, axis_name=axis_name,
                                       xattn_cache=xa_in, xattn_out=xa_out)
        if "upsample" in block:
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
            h = conv2d(block["upsample"], h)

    h = group_norm(params["conv_norm_out"], h, groups, eps_)
    h = silu(h)
    out = conv2d(params["conv_out"], h)
    if xa_in is not None and xa_in:
        raise ValueError(
            f"xattn_cache has {len(xa_in)} unconsumed entries — it must "
            f"hold exactly one output per cross-attention call"
        )
    if collect_xattn:
        return out, tuple(xa_out)
    if collect_heatmaps:
        return out, heatmaps
    return out


def deepcache_shape(cfg: UNetConfig, batch: int, lat_h: int,
                    lat_w: int) -> Tuple[int, int, int, int]:
    """Shape of the deep-feature cache: the next-to-last up block's output
    (back at full latent resolution, level-1 channel width)."""
    return (batch, lat_h, lat_w, cfg.block_out_channels[1])


def unet_apply_deepcache(
    params: Dict[str, Any],
    cfg: UNetConfig,
    sample: jnp.ndarray,
    timesteps: jnp.ndarray,
    cond: UNetCond,
    cache: jnp.ndarray,  # deepcache_shape(...); zeros before the 1st step
    use_cache,  # traced scalar; >0.5 reuses `cache`, else recomputes it
    attn_impl: str = "xla",
    freeu: Optional[FreeUParams] = None,
    axis_name: Optional[str] = None,
    conv_impl: Optional[str] = None,
):
    """UNet forward with a DeepCache-style deep/shallow split.

    The network is cut between the level-0 down block and everything
    deeper: ``deep`` = down blocks 1.., mid, and all up blocks except the
    last — the branch whose features change slowly across adjacent solver
    steps (DeepCache, Ma et al. 2024; PAPERS.md). On a reuse step
    (``use_cache`` set) the deep branch is skipped entirely and its output
    is taken from ``cache``; the shallow layers (conv_in, down block 0,
    the final up block, conv_out) always run with the current latents and
    timestep. Returns ``(out, new_cache)``.

    The split reproduces :func:`unet_apply`'s skip bookkeeping exactly:
    the final up block consumes the level-0 skips
    ``[conv_in, d0_res...]`` and the deep branch consumes every deeper
    skip internally, so ``use_cache=0`` matches ``unet_apply`` to fusion
    tolerance. Conditioning that injects into the deep branch between
    full steps cannot be cached consistently — ControlNet / T2I-Adapter
    residuals are rejected; context/region/IP attention conditioning
    flows through both branches (frozen inside ``cache`` between full
    steps, like every other deep feature).

    No reference counterpart (the reference always runs the full UNet);
    an opt-in acceleration mode, excluded from headline benchmarks.
    """
    if cond.controlnet_down is not None or cond.t2i_residuals is not None:
        raise ValueError(
            "deepcache does not support ControlNet/T2I-Adapter residuals "
            "(they inject into the cached deep branch)"
        )
    groups, eps_ = cfg.norm_num_groups, cfg.norm_eps
    conv_impl = "xla" if conv_impl is None else conv_impl

    temb = timestep_embedding(
        timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos,
        cfg.freq_shift
    )
    temb = linear(params["time_embedding"]["linear_1"],
                  temb.astype(sample.dtype))
    temb = linear(params["time_embedding"]["linear_2"], silu(temb))

    h = conv2d(params["conv_in"], sample)
    skips = [h]

    block0 = params["down_blocks"][0]
    for j in range(len(block0["resnets"])):
        h = _resnet_apply(block0["resnets"][j], h, temb, groups, eps_,
                          conv_impl)
        if block0["attentions"]:
            h = _transformer_apply(block0["attentions"][j], cfg, h, cond,
                                   0, cfg.heads_at(0), attn_impl, None,
                                   axis_name=axis_name)
        skips.append(h)
    h_ds = conv2d(block0["downsample"], h, stride=2)

    def deep_fn(h_in):
        hh = h_in
        dskips = [h_in]
        for level in range(1, cfg.num_levels):
            block = params["down_blocks"][level]
            for j in range(len(block["resnets"])):
                hh = _resnet_apply(block["resnets"][j], hh, temb, groups,
                                   eps_, conv_impl)
                if block["attentions"]:
                    hh = _transformer_apply(
                        block["attentions"][j], cfg, hh, cond, level,
                        cfg.heads_at(level), attn_impl, None,
                        axis_name=axis_name)
                dskips.append(hh)
            if "downsample" in block:
                hh = conv2d(block["downsample"], hh, stride=2)
                dskips.append(hh)

        mid = params["mid_block"]
        hh = _resnet_apply(mid["resnet1"], hh, temb, groups, eps_, conv_impl)
        hh = _transformer_apply(mid["attention"], cfg, hh, cond,
                                cfg.num_levels - 1,
                                cfg.heads_at(cfg.num_levels - 1), attn_impl,
                                None, axis_name=axis_name)
        hh = _resnet_apply(mid["resnet2"], hh, temb, groups, eps_, conv_impl)

        for i, block in enumerate(params["up_blocks"][:-1]):
            level = cfg.num_levels - 1 - i
            for j in range(len(block["resnets"])):
                skip = dskips.pop()
                if freeu is not None and i in (0, 1):
                    b_scale = freeu.b1 if i == 0 else freeu.b2
                    s_scale = freeu.s1 if i == 0 else freeu.s2
                    c_half = hh.shape[-1] // 2
                    hh = hh.at[..., :c_half].multiply(b_scale)
                    skip = _freeu_filter(skip, s_scale)
                hh = jnp.concatenate([hh, skip], axis=-1)
                hh = _resnet_apply(block["resnets"][j], hh, temb, groups,
                                   eps_, conv_impl)
                if block["attentions"]:
                    hh = _transformer_apply(
                        block["attentions"][j], cfg, hh, cond, level,
                        cfg.heads_at(level), attn_impl, None,
                        axis_name=axis_name)
            if "upsample" in block:
                b, sh, sw, c = hh.shape
                hh = jax.image.resize(hh, (b, sh * 2, sw * 2, c), "nearest")
                hh = conv2d(block["upsample"], hh)
        assert not dskips
        return hh

    new_cache = jax.lax.cond(
        use_cache > 0.5, lambda op: cache, deep_fn, h_ds
    )

    h = new_cache
    block = params["up_blocks"][-1]
    for j in range(len(block["resnets"])):
        skip = skips.pop()
        h = jnp.concatenate([h, skip], axis=-1)
        h = _resnet_apply(block["resnets"][j], h, temb, groups, eps_,
                          conv_impl)
        if block["attentions"]:
            h = _transformer_apply(block["attentions"][j], cfg, h, cond,
                                   0, cfg.heads_at(0), attn_impl, None,
                                   axis_name=axis_name)
    assert not skips

    h = group_norm(params["conv_norm_out"], h, groups, eps_)
    h = silu(h)
    out = conv2d(params["conv_out"], h)
    return out, new_cache

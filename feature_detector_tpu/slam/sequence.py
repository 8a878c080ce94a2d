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
    """[..., 3, 3] rotation → [..., 4] quaternion (x, y, z, w)."""
    r = np.asarray(r, np.float64)
    t = np.trace(r, axis1=-2, axis2=-1)
    w = np.sqrt(np.maximum(1.0 + t, 1e-12)) / 2.0
    x = (r[..., 2, 1] - r[..., 1, 2]) / (4.0 * w)
    y = (r[..., 0, 2] - r[..., 2, 0]) / (4.0 * w)
    z = (r[..., 1, 0] - r[..., 0, 1]) / (4.0 * w)
    return np.stack([x, y, z, w], axis=-1).astype(np.float32)


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
) -> SyntheticSequence:
    """Render a camera arc over a random landmark field as real uint8 images.

    Each landmark is drawn as a per-landmark random texture patch (a fixed
    high-contrast pattern, identical in every frame), so FAST fires on it and
    BRIEF descriptors are distinctive enough for reliable cross-frame
    matching.  The arc baseline is a few tenths of the scene depth so the
    two-view geometry is well conditioned.
    """
    rng = np.random.default_rng(seed)
    cam = Pinhole(
        fx=0.9 * cols, fy=0.9 * cols, cx=cols / 2.0, cy=rows / 2.0
    )
    pts = np.empty((n_landmarks, 3), np.float32)
    pts[:, 0] = rng.uniform(-2.6, 2.6, n_landmarks)
    pts[:, 1] = rng.uniform(-1.8, 1.8, n_landmarks)
    pts[:, 2] = rng.uniform(5.0, 9.0, n_landmarks)

    rots, trans = [], []
    for i in range(n_frames):
        angle = 0.05 * (i - n_frames / 2)
        r = np.asarray(lie.so3_exp(jnp.asarray([0.0, angle, 0.0])), np.float32)
        center = np.array(
            [6.0 * np.sin(angle), 0.05 * i, 1.2 - 1.2 * np.cos(angle)], np.float32
        )
        rots.append(r)
        trans.append(-r @ center)
    rots = np.stack(rots)
    trans = np.stack(trans)

    # Low-frequency background texture (shared across frames; keeps BRIEF
    # patches distinctive without creating spurious FAST corners).
    yy, xx = np.mgrid[0:rows, 0:cols]
    background = (
        28.0
        + 10.0 * np.sin(xx / 23.0)
        + 10.0 * np.cos(yy / 31.0)
    )

    # Per-landmark texture stamp: bright core with a unique binary pattern.
    stamp_size = 2 * blob_radius + 3
    stamps = rng.uniform(0, 1, (n_landmarks, stamp_size, stamp_size))
    stamps = np.where(stamps > 0.45, rng.uniform(150, 255, stamps.shape), 40.0)
    half = stamp_size // 2
    images = np.empty((n_frames, rows, cols), np.uint8)
    for f in range(n_frames):
        img = background.copy()
        pc = pts @ rots[f].T + trans[f]
        z = pc[:, 2]
        u = cam.fx * pc[:, 0] / z + cam.cx
        v = cam.fy * pc[:, 1] / z + cam.cy
        vis = (
            (z > 0.1)
            & (u >= half + 1)
            & (u < cols - half - 1)
            & (v >= half + 1)
            & (v < rows - half - 1)
        )
        for l in np.nonzero(vis)[0]:
            ui, vi = int(round(u[l])), int(round(v[l]))
            img[vi - half : vi + half + 1, ui - half : ui + half + 1] = stamps[l]
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


def _build_tracks(
    match_idx: List[np.ndarray], num_feats: List[int], min_length: int = 2
) -> List[List[Tuple[int, int]]]:
    """Chain per-pair matches into feature tracks.

    match_idx[f][i] = index in frame f+1 matched to feature i of frame f (or
    -1).  Host-side bookkeeping — inherently sequential, tiny (≤ a few
    hundred features per frame), and runs once per sequence.
    """
    track_of = [np.full(n, -1, np.int64) for n in num_feats]
    tracks: List[List[Tuple[int, int]]] = []
    for f, idx in enumerate(match_idx):
        for i, j in enumerate(idx):
            if j < 0:
                continue
            t = track_of[f][i]
            if t < 0:
                t = len(tracks)
                tracks.append([(f, i)])
                track_of[f][i] = t
            if track_of[f + 1][j] < 0:
                tracks[t].append((f + 1, int(j)))
                track_of[f + 1][j] = t
    return [t for t in tracks if len(t) >= min_length]


def run_visual_odometry(
    images: np.ndarray,
    cam: Pinhole,
    detector_kind: str = "fast",
    needed_features: int = 200,
    det_opts: Optional[DetectorOptions] = None,
    brief_opts: BriefOptions = BriefOptions(),
    match_opts: MatcherOptions = MatcherOptions(),
    ba_opts: BAOptions = BAOptions(max_iterations=12),
    mesh=None,
    max_track_obs: int = 6,
) -> VOResult:
    """Monocular VO over a frame stack: the full configs[4] pipeline.

    1. detect + describe every frame (one vmapped jit over the stack);
    2. Hamming-match consecutive frames (MXU XOR-popcount);
    3. two-view init (IRLS 8-point) for frames 0-1, scale-gauged;
    4. chain matches into tracks, triangulate each track's first pair;
    5. per-frame pose registration (vectorized PnP Gauss-Newton);
    6. global Schur-complement BA (landmark-sharded over ``mesh`` if given).
    """
    from ..frontend.detector import detect_good_features
    from ..kernels.brief import brief_compute
    from ..match.hamming import match_hamming

    if det_opts is None:
        det_opts = DetectorOptions(
            min_feature_distance=10, min_valid_response=10.0, max_features=256
        )
    imgs = jnp.asarray(images)
    n_frames = len(images)

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

    feats, words, dvalid = frontend(imgs)

    @jax.jit
    def match_pairs(words, dvalid):
        return jax.vmap(
            lambda wa, va, wb, vb: match_hamming(wa, va, wb, vb, match_opts)
        )(words[:-1], dvalid[:-1], words[1:], dvalid[1:])

    matches = match_pairs(words, dvalid)
    uv_np = np.asarray(feats.uv)
    valid_np = np.asarray(feats.valid)
    midx = np.asarray(matches.index)
    mvalid = np.asarray(matches.valid)
    midx = np.where(mvalid, midx, -1)

    # --- two-view initialization on frames (0, 1) ---
    i0 = midx[0]
    uv_a = jnp.asarray(uv_np[0])
    sel = np.clip(i0, 0, None)
    uv_b = jnp.asarray(uv_np[1][sel])
    pair_valid = jnp.asarray((i0 >= 0) & valid_np[0])
    r01, t01, _, _ = geometry.two_view_init(uv_a, uv_b, pair_valid, cam)

    rots = [np.eye(3, dtype=np.float32), np.asarray(r01, np.float32)]
    trans = [np.zeros(3, np.float32), np.asarray(t01, np.float32)]

    # --- tracks + triangulation from the first two frames they appear in ---
    tracks = _build_tracks(
        [midx[f] for f in range(n_frames - 1)],
        [det_opts.max_features] * n_frames,
    )

    # --- sequential pose registration + incremental triangulation ---
    track_pt = np.full((len(tracks), 3), np.nan, np.float32)
    obs_by_frame: List[List[Tuple[int, np.ndarray]]] = [[] for _ in range(n_frames)]
    for t_id, tr in enumerate(tracks):
        for f, i in tr:
            obs_by_frame[f].append((t_id, uv_np[f, i]))

    def triangulate_frame_pair(fa, fb, pairs):
        if not pairs:
            return
        uva = jnp.asarray(np.stack([p[1] for p in pairs]))
        uvb = jnp.asarray(np.stack([p[2] for p in pairs]))
        pts, ok = geometry.triangulate(
            jnp.asarray(rots[fa]),
            jnp.asarray(trans[fa]),
            jnp.asarray(rots[fb]),
            jnp.asarray(trans[fb]),
            uva,
            uvb,
            cam,
        )
        pts = np.asarray(pts)
        ok = np.asarray(ok)
        for k, (t_id, _, _) in enumerate(pairs):
            if ok[k] and np.isnan(track_pt[t_id, 0]):
                track_pt[t_id] = pts[k]

    # Seed points from frames (0, 1).
    first_pairs = []
    for t_id, tr in enumerate(tracks):
        fr = dict(tr)
        if 0 in fr and 1 in fr:
            first_pairs.append((t_id, uv_np[0, fr[0]], uv_np[1, fr[1]]))
    triangulate_frame_pair(0, 1, first_pairs)

    for f in range(2, n_frames):
        # Register frame f against known track points (PnP refinement from the
        # previous pose, few Gauss-Newton steps).
        known = [
            (t_id, uv)
            for t_id, uv in obs_by_frame[f]
            if not np.isnan(track_pt[t_id, 0])
        ]
        r, t = jnp.asarray(rots[f - 1]), jnp.asarray(trans[f - 1])
        if known:
            pts = jnp.asarray(np.stack([track_pt[t_id] for t_id, _ in known]))
            uvs = jnp.asarray(np.stack([uv for _, uv in known]))
            w = jnp.ones(len(known))
            for _ in range(5):
                r, t = geometry.pnp_refine(r, t, pts, uvs, w, cam)
        rots.append(np.asarray(r, np.float32))
        trans.append(np.asarray(t, np.float32))

        # Triangulate tracks first seen at (f-1, f).
        new_pairs = []
        for t_id, tr in enumerate(tracks):
            fr = dict(tr)
            if np.isnan(track_pt[t_id, 0]) and (f - 1) in fr and f in fr:
                new_pairs.append((t_id, uv_np[f - 1, fr[f - 1]], uv_np[f, fr[f]]))
        triangulate_frame_pair(f - 1, f, new_pairs)

    rots_np = np.stack(rots)
    trans_np = np.stack(trans)

    # --- global BA over all tracks with ≥2 obs and a 3D point ---
    good = [
        (t_id, tr)
        for t_id, tr in enumerate(tracks)
        if not np.isnan(track_pt[t_id, 0])
    ]
    if good:
        n_pts = len(good)
        deg = max_track_obs
        obs_cam = np.full((n_pts, deg), -1, np.int32)
        obs_uv = np.zeros((n_pts, deg, 2), np.float32)
        pts0 = np.zeros((n_pts, 3), np.float32)
        for k, (t_id, tr) in enumerate(good):
            pts0[k] = track_pt[t_id]
            for d, (f, i) in enumerate(tr[:deg]):
                obs_cam[k, d] = f
                obs_uv[k, d] = uv_np[f, i]
        # Pad unused slots by repeating the first observation with itself —
        # BAProblem treats obs_cam < 0 as masked.
        problem = BAProblem(
            rot=jnp.asarray(rots_np),
            trans=jnp.asarray(trans_np),
            points=jnp.asarray(pts0),
            obs_cam=jnp.asarray(obs_cam),
            obs_uv=jnp.asarray(obs_uv),
        )
        if mesh is not None:
            solve = make_distributed_ba(mesh, cam, ba_opts)
            solved = solve(problem)
        else:
            solved = ba_solve(problem, cam, ba_opts)
        rots_np = np.asarray(solved.rot)
        trans_np = np.asarray(solved.trans)
        points = np.asarray(solved.points)
    else:
        points = np.zeros((0, 3), np.float32)

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
    )

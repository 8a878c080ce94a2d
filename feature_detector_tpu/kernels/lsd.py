"""LSD line-segment detection as data-parallel label propagation.

TPU-first redesign of FeatureLineDetector (feature_line_detector.cpp:12-228).
The reference grows regions sequentially by BFS from gradient-sorted seeds
with a running circular-mean angle gate (SURVEY.md §3.4).  That algorithm is
inherently seed-order-dependent; the TPU formulation (SURVEY.md H2) replaces
it with:

1. the exact gradient / level-line angle map (feature_line_detector.cpp:56-97),
2. angle-gated 8-neighbor connected components via iterative min-label
   propagation (pairwise |angle_i - angle_j| <= tol edges) — a `while_loop`
   of shifted min reductions that converges in O(longest line) steps,
3. per-component gradient-weighted inertia rectangle fit via `segment_sum`
   reductions, reproducing ConvertRegionToRectangle arithmetic exactly
   (feature_line_detector.cpp:163-228),
4. the NFA-style min-region-size, length and inlier-ratio filters
   (feature_line_detector.cpp:17-20,40).

Region membership can differ from the reference near angle-drifting contours;
parity is asserted on output line segments within tolerance (SURVEY.md H2),
not on region identity.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.config import LineDetectorOptions


def line_level_angle_map(
    image: jnp.ndarray, opts: LineDetectorOptions
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gradient norm / level-line angle / validity on the (rows-1, cols-1)
    grid; valid region rows/cols in [1, dim-3] (feature_line_detector.cpp:56-97)."""
    img = image.astype(jnp.float32)
    rows, cols = image.shape
    ad = img[1:, 1:] - img[:-1, :-1]
    bc = img[:-1, 1:] - img[1:, :-1]
    gx = (ad + bc) * 0.5
    gy = (ad - bc) * 0.5
    norm = jnp.sqrt(gx * gx + gy * gy)

    g_rows, g_cols = rows - 1, cols - 1
    rr = jax.lax.broadcasted_iota(jnp.int32, (g_rows, g_cols), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (g_rows, g_cols), 1)
    interior = (rr >= 1) & (rr < rows - 2) & (cc >= 1) & (cc < cols - 2)
    valid = interior & (norm > opts.min_valid_gradient_norm)
    angle = jnp.where(valid, jnp.arctan2(gx, -gy), 0.0)
    norm = jnp.where(interior, norm, 0.0)
    return norm, angle, valid


def min_region_size(rows: int, cols: int, opts: LineDetectorOptions) -> int:
    """NFA-style minimum region size (feature_line_detector.cpp:17-20)."""
    p = opts.min_tolerance_angle_residual_in_rad / math.pi
    log_nt = (
        5.0 * (math.log10(float(cols)) + math.log10(float(rows))) / 2.0
        + math.log10(11.0)
    )
    return int(-log_nt / math.log10(p))


_SHIFTS = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))


def _shift(x: jnp.ndarray, dr: int, dc: int, fill):
    """Shift so out[r, c] = x[r+dr, c+dc], padding with `fill`."""
    rows, cols = x.shape
    padded = jnp.pad(x, ((1, 1), (1, 1)), constant_values=fill)
    return padded[1 + dr : 1 + dr + rows, 1 + dc : 1 + dc + cols]


def _angle_diff(a, b):
    d = a - b
    d = jnp.where(d > jnp.pi, d - 2 * jnp.pi, d)
    d = jnp.where(d < -jnp.pi, d + 2 * jnp.pi, d)
    return d


def propagate_labels_meanangle(
    norm: jnp.ndarray, angle: jnp.ndarray, valid: jnp.ndarray, opts: LineDetectorOptions
) -> jnp.ndarray:
    """Seeded region growing with RUNNING-MEAN angle acceptance.

    The reference grows regions by BFS from gradient-sorted seeds, admitting a
    pixel iff its level-line angle is within tol of the region's running
    circular-mean angle (feature_line_detector.cpp:27-46, 128-135).  A
    pairwise |angle_i - angle_j| <= tol CC is NOT equivalent: members at
    mean±tol pass the reference's gate but fail the 2·tol pairwise edge
    (observed: straight 29-px bars split 21+8), and long drift chains merge
    regions the running mean would reject.

    Parallel formulation with the same semantics:
    - every valid pixel starts as its own seed (label = flat index);
    - each sweep recomputes every component's circular-mean angle
      (`segment_sum`) and lets each pixel adopt the 8-neighborhood component
      whose mean accepts the pixel's angle, preferring the component with the
      STRONGEST seed (the pixel whose flat index is the label) — mirroring
      the reference's descending-gradient-norm seed priority;
    - components therefore coalesce around local gradient maxima exactly like
      the sequential grower's first-come-by-strength ordering.

    Returns int32 labels (seed flat index; -1 where invalid), converged when
    no label changes, capped at opts.propagation_steps sweeps.
    """
    g_rows, g_cols = angle.shape
    n_seg = g_rows * g_cols
    tol = opts.min_tolerance_angle_residual_in_rad
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (g_rows, g_cols), 0) * g_cols
        + jax.lax.broadcasted_iota(jnp.int32, (g_rows, g_cols), 1)
    )
    big = jnp.int32(n_seg + 1)
    init = jnp.where(valid, flat, big)
    flat_norm = norm.reshape(-1)
    cos_a = jnp.where(valid, jnp.cos(angle), 0.0).reshape(-1)
    sin_a = jnp.where(valid, jnp.sin(angle), 0.0).reshape(-1)

    def seed_priority(labels):
        """Gradient norm of each pixel's component seed; -inf where invalid."""
        pri = jnp.take(flat_norm, jnp.clip(labels, 0, n_seg - 1).reshape(-1)).reshape(labels.shape)
        return jnp.where(labels < big, pri, -1.0)

    inner_sweeps = 4
    outer_steps = (opts.propagation_steps + inner_sweeps - 1) // inner_sweeps

    def cond(state):
        labels, changed, it = state
        return changed & (it < outer_steps)

    def body(state):
        labels, _, it = state
        # Component means recompute once per OUTER iteration; the
        # ``inner_sweeps`` adoption sweeps below reuse them.  segment_sum is
        # a scatter — the one op TPUs hate — and per-sweep recomputation made
        # the whole detector scatter-bound (measured 1.9 s/frame on-chip);
        # means drift slowly, so 4-sweep-stale means cost nothing in recall.
        ids = jnp.clip(labels, 0, n_seg).reshape(-1)
        mean = jnp.arctan2(
            jax.ops.segment_sum(sin_a, ids, num_segments=n_seg + 1),
            jax.ops.segment_sum(cos_a, ids, num_segments=n_seg + 1),
        )

        def sweep(_, labels):
            best_label = labels
            best_pri = seed_priority(labels)
            for dr, dc in _SHIFTS:
                n_label = _shift(labels, dr, dc, big)
                n_mean = jnp.take(mean, jnp.clip(n_label, 0, n_seg).reshape(-1)).reshape(labels.shape)
                gate = (
                    valid
                    & (n_label < big)
                    & (jnp.abs(_angle_diff(angle, n_mean)) <= tol)
                )
                n_pri = jnp.where(gate, seed_priority(n_label), -jnp.inf)
                # Lexicographic (norm desc, seed index asc) priority:
                # constant-brightness bars give every edge pixel an identical
                # norm, and a strict > alone would never coalesce them
                # (observed: all regions stayed singletons).  Deterministic
                # index tie-break, quirk-Q2 style.
                better = (n_pri > best_pri) | (gate & (n_pri == best_pri) & (n_label < best_label))
                best_label = jnp.where(better, n_label, best_label)
                best_pri = jnp.where(better, n_pri, best_pri)
            # Whole-component absorption (pointer jumping): when a component's
            # SEED pixel itself adopts a stronger neighbor, every member
            # follows next sweep — the reference's strongest-seed-takes-the-
            # whole-line behavior (feature_line_detector.cpp:27-46) without
            # O(line length) sweeps...
            jumped = jnp.take(
                best_label.reshape(-1), jnp.clip(best_label, 0, n_seg - 1).reshape(-1)
            ).reshape(best_label.shape)
            # ... but only members the TARGET component's mean angle accepts
            # may follow (un-gated absorption over-merges: a seed on a contour
            # corner drags its whole differently-angled region along).
            j_mean = jnp.take(mean, jnp.clip(jumped, 0, n_seg).reshape(-1)).reshape(jumped.shape)
            ok_jump = jnp.abs(_angle_diff(angle, j_mean)) <= tol
            return jnp.where((best_label < big) & ok_jump, jumped, best_label)

        new = jax.lax.fori_loop(0, inner_sweeps, sweep, labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (init, jnp.array(True), jnp.int32(0)))
    return jnp.where(valid, labels, -1)


def propagate_labels(
    angle: jnp.ndarray, valid: jnp.ndarray, opts: LineDetectorOptions
) -> jnp.ndarray:
    """Angle-gated 8-neighbor connected components (pairwise gate).

    Returns int32 labels (min member flat index per component; -1 where
    invalid).  Converges when no label changes, capped at
    opts.propagation_steps sweeps.
    """
    g_rows, g_cols = angle.shape
    tol = opts.min_tolerance_angle_residual_in_rad
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (g_rows, g_cols), 0) * g_cols
        + jax.lax.broadcasted_iota(jnp.int32, (g_rows, g_cols), 1)
    )
    big = jnp.int32(g_rows * g_cols + 1)
    init = jnp.where(valid, flat, big)

    # Precompute the 8 edge masks once.
    edges = []
    for dr, dc in _SHIFTS:
        n_valid = _shift(valid, dr, dc, False)
        n_angle = _shift(angle, dr, dc, 0.0)
        edges.append(valid & n_valid & (jnp.abs(_angle_diff(angle, n_angle)) <= tol))
    edges = jnp.stack(edges)

    def step(labels):
        new = labels
        for k, (dr, dc) in enumerate(_SHIFTS):
            n_label = _shift(labels, dr, dc, big)
            new = jnp.minimum(new, jnp.where(edges[k], n_label, big))
        return new

    def cond(state):
        labels, changed, it = state
        return changed & (it < opts.propagation_steps)

    def body(state):
        labels, _, it = state
        new = step(labels)
        # Pointer-jumping acceleration: labels index into the grid, so jump
        # to the label of your label (doubles effective propagation speed).
        jumped = jnp.take(new.reshape(-1), jnp.clip(new, 0, big - 2).reshape(-1)).reshape(
            new.shape
        )
        jumped = jnp.where(new < big, jnp.minimum(new, jumped), big)
        return jumped, jnp.any(jumped != labels), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (init, jnp.array(True), jnp.int32(0)))
    return jnp.where(valid, labels, -1)


def _lines_impl(
    norm: jnp.ndarray,
    angle: jnp.ndarray,
    valid: jnp.ndarray,
    image_shape: Tuple[int, int],
    opts: LineDetectorOptions,
):
    """Components -> rectangles -> filtered line segments (fixed capacity).

    Returns (endpoints[max_lines, 4], line_valid[max_lines], labels grid,
    rectangles dict) sorted by descending region weight.
    """
    rows, cols = image_shape
    g_rows, g_cols = norm.shape
    n_seg = g_rows * g_cols
    # Running-mean-gated seeded growing (the reference's acceptance rule);
    # no re-gate pass is needed — the mean-angle gate is inherent.
    labels = propagate_labels_meanangle(norm, angle, valid, opts)

    seg_ids = jnp.where(labels >= 0, labels, n_seg).reshape(-1)
    w = jnp.where(valid, norm, 0.0).reshape(-1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (g_rows, g_cols), 1).reshape(-1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (g_rows, g_cols), 0).reshape(-1)

    def seg_sum(vals):
        return jax.ops.segment_sum(vals, seg_ids, num_segments=n_seg + 1)[:-1]

    cnt = seg_sum(jnp.where(valid.reshape(-1), 1.0, 0.0))
    sum_w = seg_sum(w)
    cx = seg_sum(w * xs) / jnp.maximum(sum_w, 1e-12)
    cy = seg_sum(w * ys) / jnp.maximum(sum_w, 1e-12)

    # Centered second moments (two-pass for f32 accuracy).
    dx = xs - jnp.take(cx, seg_ids)
    dy = ys - jnp.take(cy, seg_ids)
    ixx = seg_sum(w * dy * dy)
    iyy = seg_sum(w * dx * dx)
    ixy = -seg_sum(w * dx * dy)

    # Region circular-mean angle (feature_line_detector.cpp:133-135).
    sum_cos = seg_sum(jnp.where(valid, jnp.cos(angle), 0.0).reshape(-1))
    sum_sin = seg_sum(jnp.where(valid, jnp.sin(angle), 0.0).reshape(-1))
    region_angle = jnp.arctan2(sum_sin, sum_cos)

    # Inertia axis (feature_line_detector.cpp:178-198).
    smallest = 0.5 * (ixx + iyy - jnp.sqrt((ixx - iyy) ** 2 + 4.0 * ixy * ixy))
    rect_angle = jnp.where(
        jnp.abs(ixx) > jnp.abs(iyy),
        jnp.arctan2(smallest - ixx, ixy),
        jnp.arctan2(ixy, smallest - iyy),
    )
    flip = jnp.abs(_angle_diff(rect_angle, region_angle)) > opts.min_tolerance_angle_residual_in_rad
    flipped = rect_angle + jnp.pi
    flipped = jnp.where(flipped >= jnp.pi, flipped - 2 * jnp.pi, flipped)
    rect_angle = jnp.where(flip, flipped, rect_angle)
    dvx = jnp.cos(rect_angle)
    dvy = jnp.sin(rect_angle)

    # Extent projections, ranges including 0 (feature_line_detector.cpp:204-217).
    proj_l = dx * jnp.take(dvx, seg_ids) + dy * jnp.take(dvy, seg_ids)
    proj_w = -dx * jnp.take(dvy, seg_ids) + dy * jnp.take(dvx, seg_ids)
    neg_inf = jnp.float32(-3e38)
    occupied = valid.reshape(-1)

    def seg_max(vals):
        return jax.ops.segment_max(
            jnp.where(occupied, vals, neg_inf), seg_ids, num_segments=n_seg + 1
        )[:-1]

    lmax = jnp.maximum(seg_max(proj_l), 0.0)
    lmin = -jnp.maximum(seg_max(-proj_l), 0.0)
    wmax = jnp.maximum(seg_max(proj_w), 0.0)
    wmin = -jnp.maximum(seg_max(-proj_w), 0.0)

    raw_length = lmax - lmin
    length = jnp.maximum(raw_length, 1.0)
    width = jnp.maximum(wmax - wmin, 1.0)
    area = raw_length * width
    inlier_ratio = cnt / jnp.maximum(area, 1e-12)

    # Filters (feature_line_detector.cpp:17-20,40) + degenerate-moment rule Q6.
    msize = min_region_size(rows, cols, opts)
    ok = (
        (cnt >= msize)
        & (sum_w > 0)
        & (ixx != 0)
        & (iyy != 0)
        & (ixy != 0)
        & (length >= opts.min_valid_line_length_in_pixel)
        & (inlier_ratio >= opts.max_tolerance_inlier_ratio)
    )

    score = jnp.where(ok, sum_w, -1.0)
    top_score, top_idx = jax.lax.top_k(score, opts.max_lines)
    line_valid = top_score > 0

    sx = cx + lmin * dvx + 0.5
    sy = cy + lmin * dvy + 0.5
    ex = cx + lmax * dvx + 0.5
    ey = cy + lmax * dvy + 0.5
    endpoints = jnp.stack(
        [
            jnp.take(sx, top_idx),
            jnp.take(sy, top_idx),
            jnp.take(ex, top_idx),
            jnp.take(ey, top_idx),
        ],
        axis=-1,
    )
    endpoints = jnp.where(line_valid[:, None], endpoints, 0.0)

    # Introspection analogue of FeatureLineDetector::rectangles()
    # (feature_line_detector.h:54-63, RectangleParam at .h:27-38): per
    # selected line, the fitted rectangle's center/angle/length/width/
    # inlier-ratio plus its region label and pixel count.
    rectangles = {
        "center": jnp.stack([jnp.take(cx, top_idx), jnp.take(cy, top_idx)], -1),
        "angle": jnp.take(rect_angle, top_idx),
        "length": jnp.take(length, top_idx),
        "width": jnp.take(width, top_idx),
        "inlier_ratio": jnp.take(inlier_ratio, top_idx),
        "pixel_count": jnp.take(cnt, top_idx),
        "label": top_idx.astype(jnp.int32),
        "valid": line_valid,
    }
    return endpoints, line_valid, labels, rectangles


@functools.partial(jax.jit, static_argnames=("opts", "image_shape"))
def detect_lines_from_maps(
    norm: jnp.ndarray,
    angle: jnp.ndarray,
    valid: jnp.ndarray,
    image_shape: Tuple[int, int],
    opts: LineDetectorOptions,
):
    """(endpoints[max_lines, 4], line_valid[max_lines]) — the detection path."""
    endpoints, line_valid, _, _ = _lines_impl(norm, angle, valid, image_shape, opts)
    return endpoints, line_valid


@functools.partial(jax.jit, static_argnames=("opts", "image_shape"))
def detect_lines_with_state(
    norm: jnp.ndarray,
    angle: jnp.ndarray,
    valid: jnp.ndarray,
    image_shape: Tuple[int, int],
    opts: LineDetectorOptions,
):
    """Full-introspection path: (endpoints, line_valid, labels, rectangles)."""
    return _lines_impl(norm, angle, valid, image_shape, opts)

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
    norm: jnp.ndarray,
    angle: jnp.ndarray,
    valid: jnp.ndarray,
    opts: LineDetectorOptions,
    schedule: Tuple = None,
) -> jnp.ndarray:
    """Seeded region growing as a gather-free SEED-ANGLE priority flood.

    The reference grows regions by BFS from gradient-sorted seeds, admitting a
    pixel iff its level-line angle is within tol of the region's running
    circular-mean angle (feature_line_detector.cpp:27-46, 128-135).  For the
    straight segments the downstream filters keep, the running mean stays
    within ulp-noise of the SEED's angle, so the acceptance rule here gates
    against the carried seed angle — which makes every sweep a pure 8-shift
    STENCIL with three carried fields (seed priority, seed index, seed angle)
    and ZERO gathers/scatters.  The round-3 formulation recomputed component
    circular means with `segment_sum` and fetched them with `jnp.take` inside
    every sweep: ~64 gathers x ~30 outer iterations = 1.95 s/frame on-chip
    (BENCH_r03); a gather costs 3.7 ms at this grid size, a fused stencil
    sweep 0.3 ms.

    Propagation schedule: 5 blocks of S stencil sweeps with a GATED pointer
    jump between blocks (seed <- seed-of-seed, accepted only if the pixel's
    angle passes the new seed's gate).  Reach after block k is ~2^k·S, so the
    default budget covers ~500 px lines — beyond the longest contour in
    either example image — at 4 jumps (2 gathers each) total.

    Priority is lexicographic (seed gradient norm desc, seed index asc):
    constant-brightness bars give every edge pixel an identical norm, and a
    strict > alone would never coalesce them; deterministic index tie-break,
    quirk-Q2 style.

    Returns int32 labels (seed flat index; -1 where invalid).
    """
    g_rows, g_cols = angle.shape
    n_seg = g_rows * g_cols
    tol = opts.min_tolerance_angle_residual_in_rad
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (g_rows, g_cols), 0) * g_cols
        + jax.lax.broadcasted_iota(jnp.int32, (g_rows, g_cols), 1)
    )
    big = jnp.int32(n_seg + 1)
    seed0 = jnp.where(valid, flat, big)
    pri0 = jnp.where(valid, norm, -1.0)
    gang0 = jnp.where(valid, angle, 0.0)
    # (angle, norm) per potential seed, for the jump refresh: one packed
    # 2-field gather instead of two scalar gathers.
    seed_table = jnp.stack([gang0.reshape(-1), pri0.reshape(-1)], axis=-1)

    def sweep(_, state):
        pri, seed, gang = state
        best_p, best_s, best_g = pri, seed, gang
        for dr, dc in _SHIFTS:
            n_pri = _shift(pri, dr, dc, -1.0)
            n_seed = _shift(seed, dr, dc, big)
            n_gang = _shift(gang, dr, dc, 0.0)
            gate = (
                valid
                & (n_seed < big)
                & (jnp.abs(_angle_diff(angle, n_gang)) <= tol)
            )
            better = gate & (
                (n_pri > best_p) | ((n_pri == best_p) & (n_seed < best_s))
            )
            best_p = jnp.where(better, n_pri, best_p)
            best_s = jnp.where(better, n_seed, best_s)
            best_g = jnp.where(better, n_gang, best_g)
        return best_p, best_s, best_g

    def sweep_running(_, state):
        """Stencil sweep with PATH-RUNNING-MEAN gate angle.

        On adoption, the carried gate angle incrementally averages the new
        member's level-line angle — mean_m = mean_{m-1} + dtheta/m, with m
        counting the adoption-path length — so the gate follows slowly
        drifting contours exactly like the reference's running region mean
        (feature_line_detector.cpp:133-135) and stiffens with region growth.
        Pure elementwise stencil: zero gathers/scatters, Pallas-friendly.
        """
        pri, seed, gang, cnt = state
        best = state
        for dr, dc in _SHIFTS:
            n_pri = _shift(pri, dr, dc, -1.0)
            n_seed = _shift(seed, dr, dc, big)
            n_gang = _shift(gang, dr, dc, 0.0)
            n_cnt = _shift(cnt, dr, dc, 1.0)
            d = _angle_diff(angle, n_gang)
            gate = valid & (n_seed < big) & (jnp.abs(d) <= tol)
            better = gate & (
                (n_pri > best[0]) | ((n_pri == best[0]) & (n_seed < best[1]))
            )
            m = n_cnt + 1.0
            g_new = n_gang + d / m
            g_new = jnp.where(g_new > jnp.pi, g_new - 2 * jnp.pi, g_new)
            g_new = jnp.where(g_new < -jnp.pi, g_new + 2 * jnp.pi, g_new)
            best = (
                jnp.where(better, n_pri, best[0]),
                jnp.where(better, n_seed, best[1]),
                jnp.where(better, g_new, best[2]),
                jnp.where(better, m, best[3]),
            )
        return best

    def jump(state):
        """seed <- seed[seed]: whole-component absorption when a component's
        root itself adopted a stronger seed (the reference's strongest-seed-
        takes-the-whole-line behavior, feature_line_detector.cpp:27-46),
        gated by the NEW seed's angle so absorption never drags a
        differently-angled region along."""
        pri, seed, gang = state
        idx = jnp.clip(seed, 0, n_seg - 1).reshape(-1)
        s2 = jnp.take(seed.reshape(-1), idx).reshape(seed.shape)
        s2 = jnp.where(seed < big, s2, big)
        tab = jnp.take(seed_table, jnp.clip(s2, 0, n_seg - 1).reshape(-1), axis=0)
        g2 = tab[:, 0].reshape(seed.shape)
        p2 = tab[:, 1].reshape(seed.shape)
        ok = (s2 < big) & (jnp.abs(_angle_diff(angle, g2)) <= tol)
        return (
            jnp.where(ok, p2, pri),
            jnp.where(ok, s2, seed),
            jnp.where(ok, g2, gang),
        )

    def jump_lite(state):
        """Ungated pointer doubling (1 gather): seed <- seed[seed], carried
        priority/gate-angle left STALE.  Used for the bulk reach-doubling
        chain where the carried gate angle barely moves along a straight
        line; the mean-refinement rounds re-derive both fields anyway."""
        pri, seed, gang = state
        idx = jnp.clip(seed, 0, n_seg - 1).reshape(-1)
        s2 = jnp.take(seed.reshape(-1), idx).reshape(seed.shape)
        return pri, jnp.where((seed < big) & (s2 < big), s2, seed), gang

    cos_f = jnp.where(valid, jnp.cos(angle), 0.0).reshape(-1)
    sin_f = jnp.where(valid, jnp.sin(angle), 0.0).reshape(-1)
    cs = jnp.stack([cos_f, sin_f], axis=-1)

    def refresh_mean(state):
        """Swap the carried gate angle for the component's circular MEAN —
        the reference's actual acceptance statistic
        (feature_line_detector.cpp:133-135).  One packed segment_sum + one
        gather per refresh: the seed-angle gate truncates slowly-drifting
        contours that the running mean follows (measured: a 114-px contour
        stopped 21 px short under pure seed gating)."""
        pri, seed, gang = state
        ids = jnp.where(seed < big, seed, n_seg).reshape(-1)
        sums = jax.ops.segment_sum(cs, ids, num_segments=n_seg + 1)
        mean = jnp.arctan2(sums[:, 1], sums[:, 0])
        m = jnp.take(mean, jnp.clip(seed, 0, n_seg - 1).reshape(-1)).reshape(seed.shape)
        return pri, seed, jnp.where(seed < big, m, gang)

    # Schedule: bulk seed-gated flood (cheap stencil blocks + pointer jumps,
    # reach ~2^k·S), then mean-gated refinement rounds that re-run sweeps
    # against refreshed component means (running-mean semantics at the
    # region margins).
    # Schedule: ("S", n) = n seed-angle stencil sweeps, ("R", n) = n
    # path-running-mean stencil sweeps, ("J",) = gated absorption jump,
    # ("L",) = ungated lite jump, ("M",) = component-mean gate refresh.
    # Default: pure running-mean flood — measured recall 0.95/0.90 @ 4 px on
    # the two example images (vs 0.925/0.804 for seed-gate + jump + mean
    # refinement), with ZERO gathers or segment reductions, so the whole
    # propagation is VMEM-resident stencil work on TPU.
    if schedule is None:
        schedule = (("R", opts.propagation_steps),)
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:  # pragma: no cover
            on_tpu = False
        if on_tpu:
            # VMEM-resident Mosaic flood (identical math; parity-tested).
            from .lsd_pallas import propagate_running_pallas

            return propagate_running_pallas(
                norm, angle, valid, opts.propagation_steps,
                opts.min_tolerance_angle_residual_in_rad,
            )
    state = (pri0, seed0, gang0)
    for step in schedule:
        if step[0] == "S":
            state = jax.lax.fori_loop(0, step[1], sweep, state)
        elif step[0] == "R":
            # Running-mean sweeps carry a 4th path-length field.
            st4 = state + (jnp.ones_like(pri0),)
            st4 = jax.lax.fori_loop(0, step[1], sweep_running, st4)
            state = st4[:3]
        elif step[0] == "J":
            state = jump(state)
        elif step[0] == "L":
            state = jump_lite(state)
        elif step[0] == "M":
            state = refresh_mean(state)
        else:  # pragma: no cover
            raise ValueError(f"unknown schedule step {step!r}")
    _, seed, _ = state
    return jnp.where(valid & (seed < big), seed, -1)


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
    labels = propagate_labels_meanangle(norm, angle, valid, opts)

    # ---- Candidate selection (one segment reduction for the whole fit) ----
    # Per-label (pixel count, gradient weight) in a single packed segment_sum;
    # components are then RANKED and the top K become fit candidates.  The
    # round-3 formulation ran ~13 full-grid segment reductions (7 ms each
    # on-chip) — everything below replaces them with one segment_sum, one
    # top_k, and MXU-friendly dense [K, N] reductions.  K = 2·max_lines
    # (>= 256) comfortably exceeds the number of min-region-size components
    # in either example image; anything beyond K would rank below every
    # returned line anyway (selection is by descending weight in both
    # stages), so the cap drops no reportable line.
    # ---- Valid-pixel compaction -----------------------------------------
    # Only 3-9% of the grid carries a valid gradient on real images
    # (measured: 10k/360k on image.png, 32k on image2.png), yet every fit
    # reduction below would otherwise stream the FULL grid per candidate
    # ([K, N] one-hot + extent passes were ~16 ms of the 28 ms LSD frame).
    # A cumsum-scatter compaction packs the valid pixels into a fixed
    # ``opts.max_fit_pixels`` buffer.  CAPACITY BOUND (like max_lines):
    # valid pixels beyond the cap — raster order — vanish from everything
    # downstream of the flood (candidate counts, moments, extents), so an
    # overflowing image loses detections in its lower rows.  The default
    # carries 2-6x headroom at the reference's maximum image size
    # (480x752, nn_feature_point_detector.h:25-26); raise it for larger
    # frames.
    seg_full = jnp.where(labels >= 0, labels, n_seg).reshape(-1)
    occupied_full = (labels >= 0).reshape(-1)
    Mcap = int(opts.max_fit_pixels)
    pos = jnp.cumsum(occupied_full.astype(jnp.int32)) - 1
    slot = jnp.where(occupied_full & (pos < Mcap), pos, Mcap)
    iota_n = jnp.arange(n_seg, dtype=jnp.int32)
    cidx = jnp.zeros(Mcap + 1, jnp.int32).at[slot].set(iota_n)[:Mcap]
    n_compact = jnp.minimum(pos[-1] + 1, Mcap)
    cvalid = jnp.arange(Mcap, dtype=jnp.int32) < n_compact

    w_full = jnp.where(valid, norm, 0.0).reshape(-1)
    seg_ids = jnp.where(cvalid, jnp.take(seg_full, cidx), n_seg)      # [M]
    w_flat = jnp.where(cvalid, jnp.take(w_full, cidx), 0.0)           # [M]
    occupied = cvalid

    packed = jnp.stack([occupied.astype(jnp.float32), w_flat], axis=-1)
    sums = jax.ops.segment_sum(packed, seg_ids, num_segments=n_seg + 1)[:-1]
    cnt_full, sumw_full = sums[:, 0], sums[:, 1]

    msize = min_region_size(rows, cols, opts)
    K = min(n_seg, max(256, 2 * opts.max_lines))
    cand_score = jnp.where(cnt_full >= msize, sumw_full, -1.0)
    cand_w, cand = jax.lax.top_k(cand_score, K)          # cand: label values
    cand_live = cand_w > 0

    # ---- Moments via one-hot matmul (MXU, true-f32 accumulation) ----
    # Coordinates centered on the image midpoint: halves the dynamic range
    # of the second-moment sums, keeping the centered-moment subtraction
    # well-conditioned in f32.
    x0, y0 = 0.5 * (g_cols - 1), 0.5 * (g_rows - 1)
    # Compacted per-pixel geometry (see the compaction block above).
    xs = jnp.where(cvalid, (cidx % g_cols).astype(jnp.float32) - x0, 0.0)
    ys = jnp.where(cvalid, (cidx // g_cols).astype(jnp.float32) - y0, 0.0)
    ang_c = jnp.take(angle.reshape(-1), cidx)
    cos_f = jnp.where(cvalid, jnp.cos(ang_c), 0.0)
    sin_f = jnp.where(cvalid, jnp.sin(ang_c), 0.0)
    feats = jnp.stack(
        [
            w_flat,
            w_flat * xs,
            w_flat * ys,
            w_flat * xs * xs,
            w_flat * ys * ys,
            w_flat * xs * ys,
            cos_f,
            sin_f,
        ],
        axis=-1,
    )                                                      # [N, 8]
    onehot = (seg_ids[None, :] == cand[:, None]).astype(jnp.float32)  # [K, N]
    S = jax.lax.dot(
        onehot, feats, precision=jax.lax.Precision.HIGHEST
    )                                                      # [K, 8]
    sum_w = S[:, 0]
    inv_w = 1.0 / jnp.maximum(sum_w, 1e-12)
    cx = S[:, 1] * inv_w                                   # centered coords
    cy = S[:, 2] * inv_w
    # Centered second moments by the shift theorem (coordinates are already
    # image-centered, so the cancellation is benign).
    ixx = S[:, 4] - sum_w * cy * cy
    iyy = S[:, 3] - sum_w * cx * cx
    ixy = -(S[:, 5] - sum_w * cx * cy)
    # Region circular-mean angle (feature_line_detector.cpp:133-135).
    region_angle = jnp.arctan2(S[:, 7], S[:, 6])
    cnt = jnp.take(cnt_full, cand)

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

    # Extent projections per candidate, ranges including 0
    # (feature_line_detector.cpp:204-217): dense [K, N] masked reductions.
    dxk = xs[None, :] - cx[:, None]                        # [K, N]
    dyk = ys[None, :] - cy[:, None]
    proj_l = dxk * dvx[:, None] + dyk * dvy[:, None]
    proj_w = -dxk * dvy[:, None] + dyk * dvx[:, None]
    member = onehot > 0
    neg_inf = jnp.float32(-3e38)

    def masked_max(vals):
        return jnp.max(jnp.where(member, vals, neg_inf), axis=1)

    lmax = jnp.maximum(masked_max(proj_l), 0.0)
    lmin = -jnp.maximum(masked_max(-proj_l), 0.0)
    wmax = jnp.maximum(masked_max(proj_w), 0.0)
    wmin = -jnp.maximum(masked_max(-proj_w), 0.0)

    raw_length = lmax - lmin
    length = jnp.maximum(raw_length, 1.0)
    width = jnp.maximum(wmax - wmin, 1.0)
    area = raw_length * width
    inlier_ratio = cnt / jnp.maximum(area, 1e-12)

    # Filters (feature_line_detector.cpp:17-20,40) + degenerate-moment rule Q6.
    ok = (
        cand_live
        & (cnt >= msize)
        & (sum_w > 0)
        & (ixx != 0)
        & (iyy != 0)
        & (ixy != 0)
        & (length >= opts.min_valid_line_length_in_pixel)
        & (inlier_ratio >= opts.max_tolerance_inlier_ratio)
    )

    score = jnp.where(ok, sum_w, -1.0)
    top_score, top_k_idx = jax.lax.top_k(score, opts.max_lines)
    line_valid = top_score > 0
    top_label = jnp.take(cand, top_k_idx).astype(jnp.int32)

    # Back to pixel coordinates (+ the reference's +0.5 px offset).
    sx = jnp.take(cx + lmin * dvx, top_k_idx) + x0 + 0.5
    sy = jnp.take(cy + lmin * dvy, top_k_idx) + y0 + 0.5
    ex = jnp.take(cx + lmax * dvx, top_k_idx) + x0 + 0.5
    ey = jnp.take(cy + lmax * dvy, top_k_idx) + y0 + 0.5
    endpoints = jnp.stack([sx, sy, ex, ey], axis=-1)
    endpoints = jnp.where(line_valid[:, None], endpoints, 0.0)

    # Introspection analogue of FeatureLineDetector::rectangles()
    # (feature_line_detector.h:54-63, RectangleParam at .h:27-38): per
    # selected line, the fitted rectangle's center/angle/length/width/
    # inlier-ratio plus its region label and pixel count.
    rectangles = {
        "center": jnp.stack(
            [jnp.take(cx, top_k_idx) + x0, jnp.take(cy, top_k_idx) + y0], -1
        ),
        "angle": jnp.take(rect_angle, top_k_idx),
        "length": jnp.take(length, top_k_idx),
        "width": jnp.take(width, top_k_idx),
        "inlier_ratio": jnp.take(inlier_ratio, top_k_idx),
        "pixel_count": jnp.take(cnt, top_k_idx),
        "label": top_label,
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

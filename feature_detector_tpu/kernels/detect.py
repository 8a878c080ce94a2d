"""JAX/XLA kernels for classical corner detection.

TPU-first redesign of the reference's per-pixel C++ loops (SURVEY.md §3.1-3.2):
the response maps are whole-image vector ops that XLA fuses into a handful of
VPU passes (the reference's hand-rolled cache-friendly sliding windows,
feature_point_harris_detector.cpp:17-118, collapse into `reduce_window` box
sums), and the inherently sequential greedy suppression
(feature_point_detector.cpp:54-74) becomes a fixed-trip-count `fori_loop` of
argmax + square-suppression steps over the candidate map (SURVEY.md H1); a
VMEM-resident Pallas variant lives in `greedy_pallas.py`.

Semantics are tested bit-for-bit against the NumPy oracle
(feature_detector_tpu/oracle/detectors.py), which cites the reference per line.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import DetectorOptions, FastOptions, HarrisOptions, ShiTomasiOptions

# FAST circle offsets (dcol, drow), feature_point_fast_detector.cpp:7-8.
_FAST_CIRCLE = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)


def box_sum(x: jnp.ndarray, half: int) -> jnp.ndarray:
    """(2*half+1)^2 zero-padded box sum via reduce_window (maps to a fused
    separable window reduction on the VPU)."""
    patch = 2 * half + 1
    return jax.lax.reduce_window(
        x,
        jnp.zeros((), x.dtype),
        jax.lax.add,
        window_dimensions=(patch, patch),
        window_strides=(1, 1),
        padding=((half, half), (half, half)),
    )


def central_gradients(image_f32: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradients, zero on the 1-px border (equivalent to the
    reference only writing interior rows/cols, feature_point_harris_detector.cpp:36-37)."""
    img = image_f32
    ix = jnp.zeros_like(img)
    iy = jnp.zeros_like(img)
    ix = ix.at[1:-1, 1:-1].set(img[1:-1, 2:] - img[1:-1, :-2])
    iy = iy.at[1:-1, 1:-1].set(img[2:, 1:-1] - img[:-2, 1:-1])
    return ix, iy


def _interior_mask(shape, bound: int, dtype=bool) -> np.ndarray:
    m = np.zeros(shape, dtype=dtype)
    m[bound : shape[0] - bound, bound : shape[1] - bound] = True
    return m


def harris_response_raw(img_f32: jnp.ndarray, sub: HarrisOptions) -> jnp.ndarray:
    """Pure-stencil Harris response (no border/threshold/mask gating) — the
    shift-invariant part, reusable under spatial row sharding (parallel/halo.py)."""
    half = sub.half_patch_size
    patch = 2 * half + 1
    inv_cnt2 = jnp.float32((1.0 / (patch * patch)) ** 2)
    ix, iy = central_gradients(img_f32)
    sxx = box_sum(ix * ix, half)
    syy = box_sum(iy * iy, half)
    sxy = box_sum(ix * iy, half)
    tr = sxx + syy
    return (sxx * syy - sxy * sxy - jnp.float32(sub.alpha) * tr * tr) * inv_cnt2


def shi_tomasi_response_raw(img_f32: jnp.ndarray, sub: ShiTomasiOptions) -> jnp.ndarray:
    """Pure-stencil largest-eigenvalue response (quirk Q3 preserved)."""
    half = sub.half_patch_size
    patch = 2 * half + 1
    inv_cnt = jnp.float32(1.0 / (patch * patch))
    ix, iy = central_gradients(img_f32)
    a = box_sum(ix * ix, half) * inv_cnt
    c = box_sum(iy * iy, half) * inv_cnt
    b = box_sum(ix * iy, half) * inv_cnt
    common = jnp.sqrt((a - c) * (a - c) + 4.0 * b * b)
    return (a + c + common) * 0.5


@functools.partial(jax.jit, static_argnames=("opts", "sub"))
def harris_response(
    image: jnp.ndarray,
    mask: jnp.ndarray,
    opts: DetectorOptions = DetectorOptions(),
    sub: HarrisOptions = HarrisOptions(),
) -> jnp.ndarray:
    """Harris response map with threshold/mask gating
    (feature_point_harris_detector.cpp:66-118; the redundant trace pre-check is
    folded away — see oracle docstring)."""
    res = harris_response_raw(image.astype(jnp.float32), sub)
    region = jnp.asarray(_interior_mask(image.shape, sub.half_patch_size + 1))
    keep = region & (mask != 0) & (res > opts.min_valid_response)
    return jnp.where(keep, res, 0.0)


@functools.partial(jax.jit, static_argnames=("opts", "sub"))
def shi_tomasi_response(
    image: jnp.ndarray,
    mask: jnp.ndarray,
    opts: DetectorOptions = DetectorOptions(),
    sub: ShiTomasiOptions = ShiTomasiOptions(),
) -> jnp.ndarray:
    """Largest-eigenvalue response map
    (feature_point_shi_tomas_detector.cpp:66-118, quirk Q3 preserved)."""
    res = shi_tomasi_response_raw(image.astype(jnp.float32), sub)
    region = jnp.asarray(_interior_mask(image.shape, sub.half_patch_size + 1))
    keep = region & (mask != 0) & (res > opts.min_valid_response)
    return jnp.where(keep, res, 0.0)


@functools.partial(jax.jit, static_argnames=("sub",))
def fast_response(
    image: jnp.ndarray,
    mask: jnp.ndarray,
    sub: FastOptions = FastOptions(),
) -> jnp.ndarray:
    """FAST segment-test arc length per pixel (feature_point_fast_detector.cpp:11-81)
    as 16 shifted comparisons + a vectorized doubled-ring run scan; the
    reference's scan-order tie-break offset is intentionally dropped (Q2)."""
    img = image.astype(jnp.int32)
    rows, cols = img.shape
    bound = 3

    # Bitpacked formulation: ring classification packs into one uint32 mask
    # per sign per pixel, and the max consecutive arc comes from the classic
    # run-length bit trick (x &= x << 1 survives exactly max-run-1 rounds).
    # The round-3 version stacked a [16, H, W] int8 ring and ran a 64-step
    # scan over [H, W] temporaries — ~360 MB of HBM traffic per frame that
    # XLA cannot fuse through the stack (measured 0.31 ms/frame on v5e);
    # this chain is pure elementwise u32 ops that fuse into a handful of
    # passes.
    pad = jnp.pad(img, bound)
    hi = img + sub.min_pixel_diff_value
    lo = img - sub.min_pixel_diff_value
    b_pos = jnp.zeros((rows, cols), jnp.uint32)
    b_neg = jnp.zeros((rows, cols), jnp.uint32)
    for k, (dc, dr) in enumerate(_FAST_CIRCLE):
        ring_k = pad[bound + dr : bound + dr + rows, bound + dc : bound + dc + cols]
        b_pos = b_pos | ((ring_k > hi).astype(jnp.uint32) << k)
        b_neg = b_neg | ((ring_k < lo).astype(jnp.uint32) << k)

    # Pre-check: final-count semantics — compass indices 4, 8, 12 share a sign
    # (feature_point_fast_detector.cpp:20-42; see oracle note).
    if sub.n >= 12:
        compass = jnp.uint32((1 << 4) | (1 << 8) | (1 << 12))
        precheck = ((b_pos & compass) == compass) | ((b_neg & compass) == compass)
    else:
        precheck = jnp.ones((rows, cols), bool)

    def max_run(b16):
        # Doubled ring (circular runs), capped at 16: double the 16-bit
        # pattern into 32 bits, then count how many x &= x << 1 rounds
        # survive.
        x = b16 | (b16 << 16)
        n = jnp.zeros((rows, cols), jnp.int32)
        for _ in range(16):
            n = jnp.where(x != 0, n + 1, n)
            x = x & (x << 1)
        return n

    best = jnp.maximum(max_run(b_pos), max_run(b_neg))

    region = jnp.asarray(_interior_mask(image.shape, bound))
    keep = region & precheck & (mask != 0)
    return jnp.where(keep, best, 0).astype(jnp.float32)


def nms4(response: jnp.ndarray, threshold: float, bound: int) -> jnp.ndarray:
    """Strict 4-neighbor NMS candidate map
    (feature_point_harris_detector.cpp:120-137): returns response where the
    pixel survives, 0 elsewhere."""
    res = response
    up = jnp.pad(res, ((1, 0), (0, 0)))[:-1, :]
    down = jnp.pad(res, ((0, 1), (0, 0)))[1:, :]
    left = jnp.pad(res, ((0, 0), (1, 0)))[:, :-1]
    right = jnp.pad(res, ((0, 0), (0, 1)))[:, 1:]
    keep = (
        (res > threshold) & (res > up) & (res > down) & (res > left) & (res > right)
    )
    keep &= jnp.asarray(_interior_mask(res.shape, bound))
    return jnp.where(keep, res, 0.0)


def fast_candidates(response: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """FAST candidate map: response >= threshold (inclusive, divergence Q2)."""
    return jnp.where((response >= threshold) & (response > 0), response, 0.0)


def make_suppression_mask(
    shape: Tuple[int, int],
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    radius: int,
) -> jnp.ndarray:
    """Mask that is 0 inside the clamped (2r+1)^2 square around each valid
    feature and 1 elsewhere (feature_point_detector.cpp:76-98).

    TPU-native formulation: scatter feature indicators, then dilate with a
    max reduce_window — O(HW) regardless of feature count.
    """
    rows, cols = shape
    y = jnp.clip(uv[:, 1].astype(jnp.int32), 0, rows - 1)
    x = jnp.clip(uv[:, 0].astype(jnp.int32), 0, cols - 1)
    indicator = jnp.zeros(shape, jnp.int32).at[y, x].max(valid.astype(jnp.int32))
    hit = jax.lax.reduce_window(
        indicator,
        jnp.int32(0),
        jax.lax.max,
        window_dimensions=(2 * radius + 1, 2 * radius + 1),
        window_strides=(1, 1),
        padding=((radius, radius), (radius, radius)),
    )
    return (1 - hit).astype(jnp.int32)


def greedy_select_lax(
    cand_map: jnp.ndarray,
    max_picks: int,
    n_stop: jnp.ndarray,
    radius: int,
):
    """Greedy response-ordered selection with square suppression, pure-lax
    version (semantics of feature_point_detector.cpp:54-74; SURVEY.md H1).

    Args:
      cand_map: [H, W] candidate responses (0 = not a candidate); existing
        features' suppression squares must already be zeroed.
      max_picks: static trip count (capacity).
      n_stop: dynamic number of picks still wanted (needed - existing count).
      radius: suppression half-size (kMinFeatureDistance).

    Returns (uv[max_picks, 2] f32, resp[max_picks] f32, valid[max_picks] bool);
    valid slots form a prefix, ordered by descending response with row-major
    tie-break (argmax picks the first maximum in row-major order, matching the
    oracle's stable desc sort).
    """
    rows, cols = cand_map.shape
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)

    def body(i, state):
        resp_map, uv, resp, valid = state
        flat = jnp.argmax(resp_map)
        val = jnp.reshape(resp_map, (-1,))[flat]
        y = (flat // cols).astype(jnp.int32)
        x = (flat % cols).astype(jnp.int32)
        take = (val > 0) & (i < n_stop)
        uv = uv.at[i].set(jnp.where(take, jnp.array([x, y], jnp.float32), uv[i]))
        resp = resp.at[i].set(jnp.where(take, val, resp[i]))
        valid = valid.at[i].set(take)
        in_square = (jnp.abs(row_idx - y) <= radius) & (jnp.abs(col_idx - x) <= radius)
        resp_map = jnp.where(take & in_square, 0.0, resp_map)
        return resp_map, uv, resp, valid

    init = (
        cand_map,
        jnp.zeros((max_picks, 2), jnp.float32),
        jnp.zeros((max_picks,), jnp.float32),
        jnp.zeros((max_picks,), bool),
    )
    _, uv, resp, valid = jax.lax.fori_loop(0, max_picks, body, init)
    return uv, resp, valid


def subpixel_refine(
    response: jnp.ndarray, uv: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Subpixel corner localization: 2D quadratic fit of the response map.

    No reference counterpart (the reference emits integer candidate pixels);
    this is the standard corner-refinement step (cf. OpenCV cornerSubPix /
    SIFT's quadratic peak interpolation) that drops localization error from
    ~0.5 px (integer grid) to ~0.1 px, which dominates the triangulation
    error budget of the VO pipeline.

    Args:
      response: [H, W] raw detector response (pre-NMS).
      uv: [N, 2] integer-valued (x, y) picks.
      valid: [N] bool.
    Returns refined uv [N, 2] f32; invalid slots and non-concave fits keep
    their integer position.
    """
    rows, cols = response.shape
    x = jnp.clip(uv[:, 0].astype(jnp.int32), 1, cols - 2)
    y = jnp.clip(uv[:, 1].astype(jnp.int32), 1, rows - 2)
    win = jax.vmap(
        lambda yy, xx: jax.lax.dynamic_slice(response, (yy - 1, xx - 1), (3, 3))
    )(y, x)  # [N, 3, 3]

    gx = (win[:, 1, 2] - win[:, 1, 0]) * 0.5
    gy = (win[:, 2, 1] - win[:, 0, 1]) * 0.5
    hxx = win[:, 1, 2] + win[:, 1, 0] - 2.0 * win[:, 1, 1]
    hyy = win[:, 2, 1] + win[:, 0, 1] - 2.0 * win[:, 1, 1]
    hxy = (win[:, 2, 2] - win[:, 2, 0] - win[:, 0, 2] + win[:, 0, 0]) * 0.25
    det = hxx * hyy - hxy * hxy
    safe = jnp.abs(det) > 1e-12
    det_s = jnp.where(safe, det, 1.0)
    dx = -(hyy * gx - hxy * gy) / det_s
    dy = -(hxx * gy - hxy * gx) / det_s
    # Accept only local-maximum-shaped fits with a sane offset.
    ok = valid & safe & (hxx < 0) & (det > 0) & (jnp.abs(dx) <= 0.75) & (jnp.abs(dy) <= 0.75)
    out_x = uv[:, 0] + jnp.where(ok, dx, 0.0)
    out_y = uv[:, 1] + jnp.where(ok, dy, 0.0)
    return jnp.stack([out_x, out_y], axis=1)

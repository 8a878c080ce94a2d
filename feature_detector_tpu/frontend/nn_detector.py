"""NN feature-point detector front-end (SuperPoint / DISK).

TPU-native replacement of NNFeaturePointDetector
(nn_feature_point_detector.h:37-39, .cpp:10-230): the ONNX Runtime session
becomes a jitted Flax apply, and the CPU-side post-processing (heatmap
candidate selection, mask NMS, bilinear descriptor sampling) becomes in-graph
kernels — i.e. the "NMS model" variants' fused behavior is native here for
all model types.

Post-processing semantics mirrored exactly:
- CreateMask: 3-px invalid boundary + existing-feature suppression squares
  (nn_feature_point_detector.cpp:59-89).
- candidate threshold kMinResponse, greedy desc-score mask-NMS selection
  capped at kMaxNumberOfDetectedFeatures (nn_feature_point_detector.cpp:128-155)
  — same greedy argmax+suppress loop as the classical path (SURVEY.md H1),
  with row-major tie-break (Q10).
- descriptor bilinear sampling at (u/8, v/8) on the stride-8 descriptor map
  with zero fill at the map border (nn_feature_point_detector.cpp:162-193).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import NNDetectorOptions, NNModelType
from ..core.types import Features
from ..kernels.detect import greedy_select_lax, make_suppression_mask


def create_nn_mask(
    shape: Tuple[int, int],
    existing_uv: jnp.ndarray,
    existing_valid: jnp.ndarray,
    opts: NNDetectorOptions,
) -> jnp.ndarray:
    """CreateMask (nn_feature_point_detector.cpp:59-89)."""
    rows, cols = shape
    mask = make_suppression_mask(shape, existing_uv, existing_valid, opts.min_feature_distance)
    b = opts.invalid_boundary
    if b:
        rr = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        border = (rr < b) | (rr >= rows - b) | (cc < b) | (cc >= cols - b)
        mask = jnp.where(border, 0, mask)
    return mask


def sample_descriptor_grid(
    desc_map: jnp.ndarray, uv: jnp.ndarray, stride: int = 8
) -> jnp.ndarray:
    """Bilinear descriptor sampling at (u/stride, v/stride)
    (nn_feature_point_detector.cpp:162-193): rows/cols outside
    [0, map_dim - 2] yield zeros, truncation semantics match the int casts.

    desc_map: [Hc, Wc, D]; uv: [N, 2] -> [N, D] float32.
    """
    hc, wc, ddim = desc_map.shape
    row = uv[:, 1] / float(stride)
    col = uv[:, 0] / float(stride)
    int_row = row.astype(jnp.int32)
    int_col = col.astype(jnp.int32)
    sub_row = row - jnp.floor(row)
    sub_col = col - jnp.floor(col)
    w00 = (1 - sub_col) * (1 - sub_row)
    w01 = sub_col * (1 - sub_row)
    w10 = (1 - sub_col) * sub_row
    w11 = sub_col * sub_row

    ok = (int_row >= 0) & (int_row < hc - 1) & (int_col >= 0) & (int_col < wc - 1)
    r0 = jnp.clip(int_row, 0, hc - 2)
    c0 = jnp.clip(int_col, 0, wc - 2)
    flat = desc_map.reshape(-1, ddim)
    base = r0 * wc + c0
    v = (
        w00[:, None] * jnp.take(flat, base, axis=0)
        + w01[:, None] * jnp.take(flat, base + 1, axis=0)
        + w10[:, None] * jnp.take(flat, base + wc, axis=0)
        + w11[:, None] * jnp.take(flat, base + wc + 1, axis=0)
    )
    return jnp.where(ok[:, None], v, 0.0)


@functools.partial(jax.jit, static_argnames=("opts",))
def select_features_from_heatmap(
    heatmap: jnp.ndarray,
    existing: Features,
    opts: NNDetectorOptions,
) -> Features:
    """Candidate threshold + greedy desc-score mask-NMS, appending to
    ``existing`` (nn_feature_point_detector.cpp:128-155; incremental Q9)."""
    capacity = opts.max_number_of_detected_features
    assert existing.capacity == capacity
    mask = create_nn_mask(heatmap.shape, existing.uv, existing.valid, opts)
    cand = jnp.where((heatmap > opts.min_response) & (mask != 0), heatmap, 0.0)

    n_existing = existing.count
    n_stop = jnp.maximum(capacity - n_existing, 0)
    new_uv, new_resp, new_valid = greedy_select_lax(
        cand, capacity, n_stop, opts.min_feature_distance
    )

    idx = jnp.arange(capacity)
    src = jnp.clip(idx - n_existing, 0, capacity - 1)
    src_ok = (idx - n_existing) < capacity
    from_new = idx >= n_existing
    return Features(
        uv=jnp.where(from_new[:, None], new_uv[src], existing.uv),
        response=jnp.where(from_new & src_ok, new_resp[src], existing.response),
        valid=jnp.where(from_new, new_valid[src] & src_ok, existing.valid),
    )


@functools.partial(jax.jit, static_argnames=("opts", "rows", "cols"))
def directly_select_features(
    kpts: jnp.ndarray,
    scores: jnp.ndarray,
    descs: jnp.ndarray,
    existing: Features,
    opts: NNDetectorOptions,
    rows: int,
    cols: int,
) -> Tuple[Features, jnp.ndarray]:
    """NMS-model path: greedy mask-NMS over the model's own sorted keypoint
    list (DirectlySelectGoodFeaturesWithDescriptors,
    nn_feature_point_detector.cpp:203-230 + superpoint.cpp:106-112's ArgSort
    — ``nms_head`` already emits descending-score order).

    Suppression is Chebyshev distance to every previously accepted feature
    (equivalent to the reference's DrawRectangleInMask squares for in-bounds
    candidates), seeded by ``existing`` (incremental Q9) plus the
    invalid-boundary band.  Existing slots keep zero descriptors — the
    reference's API likewise returns descriptors only for the features the
    NMS model emitted.

    Returns (Features [capacity], descriptors [capacity, D]).
    """
    capacity = opts.max_number_of_detected_features
    assert existing.capacity == capacity
    r = opts.min_feature_distance
    b = opts.invalid_boundary
    ddim = descs.shape[-1]
    k = kpts.shape[0]

    uv0 = existing.uv
    resp0 = existing.response
    val0 = existing.valid
    dout0 = jnp.zeros((capacity, ddim), descs.dtype)
    cnt0 = existing.count

    def body(i, st):
        uv, resp, val, dout, cnt = st
        u = kpts[i, 0].astype(jnp.float32)
        v = kpts[i, 1].astype(jnp.float32)
        s = scores[i]
        inb = (u >= b) & (u < cols - b) & (v >= b) & (v < rows - b)
        conflict = jnp.any(
            val & (jnp.abs(uv[:, 0] - u) <= r) & (jnp.abs(uv[:, 1] - v) <= r)
        )
        take = (s > 0) & inb & ~conflict & (cnt < capacity)
        slot = jnp.clip(cnt, 0, capacity - 1)
        uv = uv.at[slot].set(jnp.where(take, jnp.stack([u, v]), uv[slot]))
        resp = resp.at[slot].set(jnp.where(take, s, resp[slot]))
        val = val.at[slot].set(jnp.where(take, True, val[slot]))
        dout = dout.at[slot].set(jnp.where(take, descs[i], dout[slot]))
        return uv, resp, val, dout, cnt + take.astype(cnt.dtype)

    uv, resp, val, dout, _ = jax.lax.fori_loop(
        0, k, body, (uv0, resp0, val0, dout0, cnt0)
    )
    return Features(uv=uv, response=resp, valid=val), dout


@functools.partial(jax.jit, static_argnames=("opts", "stride"))
def detect_with_descriptors(
    heatmap: jnp.ndarray,
    desc_map: jnp.ndarray,
    existing: Features,
    opts: NNDetectorOptions,
    stride: int = 8,
):
    """Full heatmap-path post-processing: select features, then sample
    descriptors for every (existing + new) valid feature.  Returns
    (Features, descriptors [capacity, D])."""
    feats = select_features_from_heatmap(heatmap, existing, opts)
    desc = sample_descriptor_grid(desc_map, feats.uv, stride)
    desc = desc * feats.valid[:, None].astype(desc.dtype)
    return feats, desc


class NNFeaturePointDetector:
    """Session-like wrapper mirroring NNFeaturePointDetector (C8).

    ``initialize()`` builds the Flax model and parameters (random init or an
    orbax/converted checkpoint — SURVEY.md H4: the reference's ONNX blobs are
    absent from its snapshot; public checkpoints convert via models/convert.py)
    and warms up compilation at (kMaxImageRows, kMaxImageCols), mirroring the
    reference's warm-up inference (nn_feature_point_detector.cpp:52-54).
    """

    def __init__(self, opts: NNDetectorOptions = NNDetectorOptions()):
        self.opts = opts
        self.model = None
        self.params = None
        self._apply = None
        self._nms_head = None

    def initialize(self, params=None, rng: Optional[jax.Array] = None) -> bool:
        from .. import models as M

        opts = self.opts
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rows, cols = opts.max_image_rows, opts.max_image_cols
        if opts.model_type in (NNModelType.SUPERPOINT_HEATMAP, NNModelType.SUPERPOINT_NMS):
            from ..models.superpoint import SuperPoint, preprocess_gray

            self.model = SuperPoint()
            self._pre = preprocess_gray
            dummy = jnp.zeros((1, rows, cols, 1), jnp.float32)
            if params is None:
                # Packaged trained checkpoint (models/weights.py) — the
                # session-load analogue of nn_feature_point_detector.cpp:10-31.
                from ..models.weights import load_default_superpoint

                params = load_default_superpoint()
        else:
            from ..models.disk import Disk, preprocess_gray_rgb

            self.model = Disk()
            self._pre = preprocess_gray_rgb
            dummy = jnp.zeros((1, rows, cols, 3), jnp.float32)
            if params is None:
                # Packaged trained checkpoint (models/weights.py) — the
                # session-load analogue of nn_feature_point_detector.cpp:10-31
                # for disk.onnx / disk_nms.onnx.
                from ..models.weights import load_default_disk

                params = load_default_disk()
        self.params = params if params is not None else self.model.init(rng, dummy)
        self._apply = jax.jit(self.model.apply)
        # One jitted NMS-head wrapper per session (not per detect() call):
        # a fresh jax.jit wrapper carries a fresh trace cache, so wrapping
        # inside detect() would silently retrace every *_NMS frame.
        from ..models.superpoint import nms_head

        self._nms_head = jax.jit(nms_head, static_argnames=("k", "min_response"))
        # Warm-up at max image size (compile once up front).
        heat, desc = self._apply(self.params, dummy)
        jax.block_until_ready(heat)
        return True

    def detect(self, image_u8: jnp.ndarray, existing: Optional[Features] = None):
        """DetectGoodFeaturesWithDescriptor (nn_feature_point_detector.h:37-39).

        Returns (Features, descriptors [capacity, D]).

        - *_HEATMAP types: the 2-output path — heatmap candidate threshold +
          greedy mask-NMS + bilinear descriptor sampling
          (nn_feature_point_detector.cpp:128-193).
        - *_NMS types: the 3-output path — the model's fused in-graph top-K
          head (``models.superpoint.nms_head``) returning (keypoints int32,
          scores, descriptors), consumed by ArgSort-order greedy mask-NMS
          (nn_feature_point_detector.cpp:203-230, superpoint.cpp:76-112).
        """
        opts = self.opts
        if existing is None:
            existing = Features.empty(opts.max_number_of_detected_features)
        x = self._pre(image_u8)
        heat, desc = self._apply(self.params, x)
        heatmap = heat[0]
        desc_map = desc[0]
        if desc_map.shape[0] == image_u8.shape[0]:
            # Full-resolution descriptor map (DISK): sample at stride 8 like
            # the reference's shared extractor by average-pooling to 1/8.
            desc_map = jax.lax.reduce_window(
                desc_map,
                0.0,
                jax.lax.add,
                window_dimensions=(8, 8, 1),
                window_strides=(8, 8, 1),
                padding="VALID",
            ) / 64.0
        if opts.model_type in (NNModelType.SUPERPOINT_NMS, NNModelType.DISK_NMS):
            kpts, scores, descs = self._nms_head(
                heatmap, desc_map, min_response=opts.min_response
            )
            rows, cols = int(image_u8.shape[0]), int(image_u8.shape[1])
            return directly_select_features(
                kpts, scores, descs, existing, opts, rows, cols
            )
        return detect_with_descriptors(heatmap, desc_map, existing, opts)

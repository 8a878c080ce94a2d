"""Multi-device front-end: frame-parallel (DP) and row-sharded (spatial)
execution of the detectors (SURVEY.md §2 parallelism table).

Frame parallelism: `vmap` the single-frame pipeline and shard the frame axis
over the ``data`` mesh axis — XLA partitions every per-frame kernel with zero
communication.  Spatial parallelism: one large image's rows shard over the
``space`` axis with ppermute halo exchange (parallel/halo.py) for the
response-map stage; candidate selection gathers the full map (selection is
global by nature: the greedy suppression square can cross slab borders).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.config import (
    BriefOptions,
    DetectorOptions,
    FastOptions,
    HarrisOptions,
    MatcherOptions,
    ShiTomasiOptions,
)
from ..core.types import Descriptors, Features, Matches
from ..frontend.detector import detect_good_features
from ..kernels.brief import brief_compute
from ..kernels import detect as K
from ..match.hamming import match_hamming
from .halo import exchange_halo


def make_batched_frontend(
    mesh: Mesh,
    kind: str = "harris",
    needed_num: int = 200,
    opts: DetectorOptions = DetectorOptions(),
    sub=None,
    brief_opts: BriefOptions = BriefOptions(),
    data_axis: str = "data",
):
    """Build a jitted frame-parallel detect+describe function.

    Returns fn(images [B, H, W] u8) -> (Features batched, words [B, N, W],
    desc_valid [B, N]), with B sharded over ``data_axis``.
    """

    def single(image):
        feats = detect_good_features(
            image, Features.empty(opts.max_features), kind, needed_num, opts, sub
        )
        words, dvalid = brief_compute(image, feats.uv, feats.valid, brief_opts)
        return feats, words, dvalid

    batched = jax.vmap(single)
    img_sharding = NamedSharding(mesh, P(data_axis, None, None))

    @functools.partial(jax.jit, in_shardings=(img_sharding,))
    def run(images):
        return batched(images)

    return run


def make_row_sharded_response(
    mesh: Mesh,
    kind: str = "harris",
    opts: DetectorOptions = DetectorOptions(),
    sub=None,
    space_axis: str = "space",
):
    """Build fn(image [H, W] u8, mask [H, W] i32) -> gated response [H, W],
    with rows sharded over ``space_axis`` and halo exchanged over ICI.

    Matches the single-device `harris_response`/`shi_tomasi_response` exactly
    (the interior/border gating is applied with global row indices).
    """
    if kind == "harris":
        sub = sub or HarrisOptions()
        raw = lambda img: K.harris_response_raw(img, sub)
        bound = sub.half_patch_size + 1
    elif kind == "shi_tomasi":
        sub = sub or ShiTomasiOptions()
        raw = lambda img: K.shi_tomasi_response_raw(img, sub)
        bound = sub.half_patch_size + 1
    else:
        raise ValueError(kind)
    halo = bound + 1  # gradient radius 1 + box radius + slack

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(space_axis, None), P(space_axis, None)),
        out_specs=P(space_axis, None),
        check_vma=False,
    )
    def sharded(local_img, local_mask):
        rows_local, cols = local_img.shape
        n = jax.lax.axis_size(space_axis)
        idx = jax.lax.axis_index(space_axis)
        padded = exchange_halo(local_img.astype(jnp.float32), halo, space_axis)
        res = raw(padded)[halo:-halo]
        # Global gating.
        g_row = idx * rows_local + jax.lax.broadcasted_iota(
            jnp.int32, (rows_local, cols), 0
        )
        g_col = jax.lax.broadcasted_iota(jnp.int32, (rows_local, cols), 1)
        total_rows = n * rows_local
        region = (
            (g_row >= bound)
            & (g_row < total_rows - bound)
            & (g_col >= bound)
            & (g_col < cols - bound)
        )
        keep = region & (local_mask != 0) & (res > opts.min_valid_response)
        return jnp.where(keep, res, 0.0)

    return jax.jit(sharded)


def make_two_frame_matcher(
    mesh: Mesh,
    kind: str = "fast",
    needed_num: int = 200,
    opts: DetectorOptions = DetectorOptions(),
    sub=None,
    brief_opts: BriefOptions = BriefOptions(),
    matcher_opts: MatcherOptions = MatcherOptions(),
    data_axis: str = "data",
):
    """Frame-pair pipeline: detect+describe both frames of each pair, then
    Hamming-match (BASELINE.json configs[1]); pairs shard over ``data_axis``.

    Returns fn(images_a [B, H, W], images_b [B, H, W]) -> Matches (batched).
    """

    def single(image_a, image_b):
        fa = detect_good_features(
            image_a, Features.empty(opts.max_features), kind, needed_num, opts, sub
        )
        fb = detect_good_features(
            image_b, Features.empty(opts.max_features), kind, needed_num, opts, sub
        )
        wa, va = brief_compute(image_a, fa.uv, fa.valid, brief_opts)
        wb, vb = brief_compute(image_b, fb.uv, fb.valid, brief_opts)
        return fa, fb, match_hamming(wa, va, wb, vb, matcher_opts)

    batched = jax.vmap(single)
    img_sharding = NamedSharding(mesh, P(data_axis, None, None))

    @functools.partial(jax.jit, in_shardings=(img_sharding, img_sharding))
    def run(images_a, images_b):
        return batched(images_a, images_b)

    return run

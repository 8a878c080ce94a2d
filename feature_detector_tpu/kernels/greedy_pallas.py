"""Pallas TPU kernel for greedy response-ordered feature selection.

VMEM-resident variant of `kernels.detect.greedy_select_lax` (the semantics of
FeaturePointDetector::SelectGoodFeatures, feature_point_detector.cpp:54-74;
SURVEY.md hard part H1): the candidate map is copied to VMEM once and the
whole argmax + square-suppression loop runs on-chip, so no per-iteration HBM
round trips and no per-iteration kernel launches.

The loop is a `lax.while_loop` that exits as soon as the map is exhausted or
the pick budget is met, so sparse images pay only for the picks they produce.

TPU layout rules honored here (Mosaic rejects anything else):
- every dynamic row slice of a f32 VMEM buffer starts on a sublane (8-row)
  boundary and spans a multiple of 8 rows — the suppression band is widened
  to the enclosing 8-aligned window and the winning row is read as its
  8-row sublane group;
- per-pick scalar results (x, y, response, taken) go to SMEM, where scalar
  stores have no alignment constraints.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(n_stop_ref, cand_ref, out_ref, work_ref, rowmax_ref, radius: int):
    rows, cols = work_ref.shape
    max_picks = out_ref.shape[0]
    # Suppression band height: an 8-aligned band start can sit up to 7 rows
    # above y-radius, so cover 2*radius+8, rounded up to a sublane multiple.
    S = min(_round_up(2 * radius + 8, 8), rows)

    work_ref[:] = cand_ref[:]
    rowmax_ref[:] = jnp.max(cand_ref[:], axis=1, keepdims=True)
    for k in range(4):
        out_ref[0, k] = 0.0

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (8, cols), 1)
    win_row_iota = jax.lax.broadcasted_iota(jnp.int32, (8, cols), 0)
    blk_row_iota = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    blk_col_iota = jax.lax.broadcasted_iota(jnp.int32, (S, cols), 1)
    n_stop = n_stop_ref[0]

    def cond(state):
        i, cont = state
        return (i < max_picks) & cont

    def body(state):
        i, _ = state
        # Hierarchical argmax: cached per-row maxima -> winning row -> column.
        # First maximum in row-major order (first max row, then first max
        # column), matching the lax version's flat argmax tie-break.
        rmax = rowmax_ref[:]
        val = jnp.max(rmax)
        y = jnp.min(jnp.where(rmax == val, row_iota, rows))
        # Read the winning row via its 8-aligned sublane group.
        y8 = pl.multiple_of((y // 8) * 8, 8)
        group = work_ref[pl.ds(y8, 8), :]
        in_win_row = win_row_iota == (y - y8)
        x = jnp.min(jnp.where(in_win_row & (group == val), col_iota, cols))
        take = (val > 0.0) & (i < n_stop)

        # Scalar results to SMEM (no alignment constraints on scalar stores).
        out_ref[i, 0] = jnp.where(take, x, 0).astype(jnp.float32)
        out_ref[i, 1] = jnp.where(take, y, 0).astype(jnp.float32)
        out_ref[i, 2] = jnp.where(take, val, 0.0)
        out_ref[i, 3] = take.astype(jnp.float32)

        # Suppress the (2r+1)^2 square: only the 8-aligned S-row band around y
        # is rewritten and its row maxima recomputed.
        y0 = jnp.clip(((y - radius) // 8) * 8, 0, rows - S)
        y0 = pl.multiple_of(y0, 8)
        band = work_ref[pl.ds(y0, S), :]
        in_rows = jnp.abs(blk_row_iota + y0 - y) <= radius
        in_cols = jnp.abs(blk_col_iota - x) <= radius
        band = jnp.where(take & in_rows & in_cols, 0.0, band)
        work_ref[pl.ds(y0, S), :] = band
        rowmax_ref[pl.ds(y0, S), :] = jnp.max(band, axis=1, keepdims=True)
        return i + 1, take

    i_final, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(True)))

    # Zero the tail so early exit leaves no stale slots.
    def clear(i, _):
        @pl.when(i >= i_final)
        def _():
            for k in range(4):
                out_ref[i, k] = 0.0

        return 0

    jax.lax.fori_loop(0, max_picks, clear, 0)


@functools.partial(jax.jit, static_argnames=("max_picks", "radius", "interpret"))
def _greedy_pallas(cand_map, max_picks: int, n_stop, radius: int, interpret: bool):
    rows, cols = cand_map.shape
    rows_p = _round_up(rows, 8)
    cols_p = _round_up(cols, 128)
    padded = jnp.pad(
        cand_map.astype(jnp.float32), ((0, rows_p - rows), (0, cols_p - cols))
    )
    out = pl.pallas_call(
        functools.partial(_kernel, radius=radius),
        out_shape=jax.ShapeDtypeStruct((max_picks, 4), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((rows_p, cols_p), jnp.float32),
            pltpu.VMEM((rows_p, 1), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(n_stop, jnp.int32).reshape(1), padded)

    uv = out[:, 0:2]
    resp = out[:, 2]
    valid = out[:, 3] > 0.5
    return uv, resp, valid


def greedy_select_pallas(cand_map, max_picks: int, n_stop, radius: int):
    """Drop-in replacement for `greedy_select_lax` running fully in VMEM.

    Args/returns identical to `kernels.detect.greedy_select_lax`; falls back
    to the Pallas interpreter off-TPU so tests exercise identical code paths
    on the CPU mesh.
    """
    interpret = jax.devices()[0].platform != "tpu"
    return _greedy_pallas(cand_map, max_picks, n_stop, radius, interpret)


def _kernel_batched(n_stop_ref, cand_ref, out_ref, work_ref, rowmax_ref,
                    radius: int, n_frames: int):
    """F frames per program: one shared pick loop whose per-frame argmax/
    suppress chains are data-independent, so Mosaic interleaves them and the
    ~1.5 us latency chain of a pick amortizes across frames (the per-frame
    kernel pays it F times serially; measured 141 us/frame at batch 64)."""
    _, rows, cols = work_ref.shape
    max_picks = out_ref.shape[1]
    S = min(_round_up(2 * radius + 8, 8), rows)

    work_ref[:] = cand_ref[:]
    rowmax_ref[:] = jnp.max(cand_ref[:], axis=2, keepdims=True)
    for f in range(n_frames):
        for k in range(4):
            out_ref[f, 0, k] = 0.0

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (8, cols), 1)
    win_row_iota = jax.lax.broadcasted_iota(jnp.int32, (8, cols), 0)
    blk_row_iota = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    blk_col_iota = jax.lax.broadcasted_iota(jnp.int32, (S, cols), 1)
    all_done = jnp.int32((1 << n_frames) - 1)

    def cond(state):
        i, done = state
        return (i < max_picks) & (done != all_done)

    def body(state):
        i, done = state
        new_done = done
        for f in range(n_frames):
            rmax = rowmax_ref[f]
            val = jnp.max(rmax)
            y = jnp.min(jnp.where(rmax == val, row_iota, rows))
            y8 = pl.multiple_of((y // 8) * 8, 8)
            group = work_ref[f, pl.ds(y8, 8), :]
            in_win_row = win_row_iota == (y - y8)
            x = jnp.min(jnp.where(in_win_row & (group == val), col_iota, cols))
            take = (val > 0.0) & (i < n_stop_ref[f]) & (((done >> f) & 1) == 0)

            out_ref[f, i, 0] = jnp.where(take, x, 0).astype(jnp.float32)
            out_ref[f, i, 1] = jnp.where(take, y, 0).astype(jnp.float32)
            out_ref[f, i, 2] = jnp.where(take, val, 0.0)
            out_ref[f, i, 3] = take.astype(jnp.float32)

            y0 = jnp.clip(((y - radius) // 8) * 8, 0, rows - S)
            y0 = pl.multiple_of(y0, 8)
            band = work_ref[f, pl.ds(y0, S), :]
            in_rows = jnp.abs(blk_row_iota + y0 - y) <= radius
            in_cols = jnp.abs(blk_col_iota - x) <= radius
            band = jnp.where(take & in_rows & in_cols, 0.0, band)
            work_ref[f, pl.ds(y0, S), :] = band
            rowmax_ref[f, pl.ds(y0, S), :] = jnp.max(band, axis=1, keepdims=True)
            new_done = jnp.where(take, new_done, new_done | (1 << f))
        return i + 1, new_done

    i_final, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))

    # Zero every slot at/after each frame's last pick (a frame that went
    # "done" before i_final has stale garbage only at its own done slot,
    # which the take flag already zeroed; the shared tail still needs
    # clearing).
    def clear(i, _):
        @pl.when(i >= i_final)
        def _():
            for f in range(n_frames):
                for k in range(4):
                    out_ref[f, i, k] = 0.0

        return 0

    jax.lax.fori_loop(0, max_picks, clear, 0)


@functools.partial(
    jax.jit, static_argnames=("max_picks", "radius", "interpret", "chunk")
)
def _greedy_pallas_batch(cand_maps, max_picks: int, n_stop, radius: int,
                         interpret: bool, chunk: int):
    B, rows, cols = cand_maps.shape
    rows_p = _round_up(rows, 8)
    cols_p = _round_up(cols, 128)
    pad_b = (-B) % chunk
    padded = jnp.pad(
        cand_maps.astype(jnp.float32),
        ((0, pad_b), (0, rows_p - rows), (0, cols_p - cols)),
    )
    n_stop_v = jnp.broadcast_to(jnp.asarray(n_stop, jnp.int32), (B,))
    n_stop_v = jnp.pad(n_stop_v, (0, pad_b))
    call = pl.pallas_call(
        functools.partial(_kernel_batched, radius=radius, n_frames=chunk),
        out_shape=jax.ShapeDtypeStruct((chunk, max_picks, 4), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((chunk, rows_p, cols_p), jnp.float32),
            pltpu.VMEM((chunk, rows_p, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    outs = []
    for c in range((B + pad_b) // chunk):
        outs.append(
            call(
                jax.lax.dynamic_slice_in_dim(n_stop_v, c * chunk, chunk),
                jax.lax.dynamic_slice_in_dim(padded, c * chunk, chunk),
            )
        )
    out = jnp.concatenate(outs, axis=0)[:B]
    uv = out[..., 0:2]
    resp = out[..., 2]
    valid = out[..., 3] > 0.5
    return uv, resp, valid


def greedy_select_pallas_batch(cand_maps, max_picks: int, n_stop, radius: int,
                               chunk: int = 4):
    """Batched greedy selection over [B, H, W] candidate maps.

    Same per-frame semantics as `greedy_select_pallas` (asserted by tests);
    `n_stop` may be a scalar or a [B] vector.  Returns (uv [B, max_picks, 2],
    resp [B, max_picks], valid [B, max_picks]).
    """
    interpret = jax.devices()[0].platform != "tpu"
    return _greedy_pallas_batch(cand_maps, max_picks, n_stop, radius,
                                interpret, chunk)

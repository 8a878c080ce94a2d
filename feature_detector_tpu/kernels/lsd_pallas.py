"""Mosaic (Pallas) kernel for the LSD path-running-mean region flood.

TPU fast path for `kernels.lsd.propagate_labels_meanangle`'s default
("R", n) schedule: the whole (grid + sentinel pad) state — seed priority,
seed index, running-mean gate angle, path length — lives in VMEM for a block
of stencil sweeps, so a sweep costs VPU time only instead of an HBM
round-trip per XLA op.  Measured on v5e: the XLA formulation's 320 sweeps
dominate the 82 ms LSD frame; this kernel runs the same math from VMEM.

Semantics are IDENTICAL to `lsd.propagate_labels_meanangle`'s sweep_running
(same adoption rule, same tie-breaks); a parity test asserts label-map
equality against the XLA path on the example images (tests/test_lsd.py).

Layout: arrays are padded to (ceil((R+2)/8)·8, ceil((C+2)/128)·128) with a
sentinel band (valid=0, seed=big) around the logical grid at offset (1, 1).
Neighbor access is `pltpu.roll` — circular, but every interior pixel's
8-neighborhood stays inside {interior ∪ sentinel band}, so wraparound only
ever routes sentinels to sentinels.

Reference behavior being reproduced: BFS region growing under a running
circular-mean angle gate, feature_line_detector.cpp:99-154.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SHIFTS = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _wrap(d):
    d = jnp.where(d > math.pi, d - 2 * math.pi, d)
    return jnp.where(d < -math.pi, d + 2 * math.pi, d)


def _roll2(x, dr: int, dc: int):
    """out[r, c] = x[r + dr, c + dc] (circular; pltpu.roll needs shift >= 0)."""
    rows, cols = x.shape
    if dr:
        x = pltpu.roll(x, (-dr) % rows, 0)
    if dc:
        x = pltpu.roll(x, (-dc) % cols, 1)
    return x


def _sweep_kernel(angle_ref, valid_ref, pri_ref, seed_ref, gang_ref, cnt_ref,
                  pri_out, seed_out, gang_out, cnt_out,
                  *, n_sweeps: int, tol: float, big: int):
    angle = angle_ref[:]
    valid = valid_ref[:] > 0.0

    def body(_, st):
        best = st
        pri, seed, gang, cnt = st
        for dr, dc in _SHIFTS:
            n_pri = _roll2(pri, dr, dc)
            n_seed = _roll2(seed, dr, dc)
            n_gang = _roll2(gang, dr, dc)
            n_cnt = _roll2(cnt, dr, dc)
            d = _wrap(angle - n_gang)
            gate = valid & (n_seed < big) & (jnp.abs(d) <= tol)
            better = gate & (
                (n_pri > best[0]) | ((n_pri == best[0]) & (n_seed < best[1]))
            )
            m = n_cnt + 1.0
            g_new = _wrap(n_gang + d / m)
            best = (
                jnp.where(better, n_pri, best[0]),
                jnp.where(better, n_seed, best[1]),
                jnp.where(better, g_new, best[2]),
                jnp.where(better, m, best[3]),
            )
        return best

    pri, seed, gang, cnt = jax.lax.fori_loop(
        0, n_sweeps, body, (pri_ref[:], seed_ref[:], gang_ref[:], cnt_ref[:])
    )
    pri_out[:] = pri
    seed_out[:] = seed
    gang_out[:] = gang
    cnt_out[:] = cnt


@functools.partial(
    jax.jit, static_argnames=("total_sweeps", "tol", "chunk")
)
def propagate_running_pallas(
    norm: jnp.ndarray,
    angle: jnp.ndarray,
    valid: jnp.ndarray,
    total_sweeps: int,
    tol: float,
    chunk: int = 32,
) -> jnp.ndarray:
    """Run the path-running-mean flood on TPU via the Mosaic kernel.

    Returns int32 labels in ORIGINAL grid flat indexing (-1 where invalid),
    drop-in equal to the XLA path's output.  `chunk` sweeps run per
    pallas_call (state round-trips HBM between chunks — a few MB, ~us — so
    VMEM only ever holds one chunk's working set).
    """
    g_rows, g_cols = angle.shape
    rp = _round_up(g_rows + 2, 8)
    cp = _round_up(g_cols + 2, 128)
    big = rp * cp  # sentinel label (any value > every padded flat index)

    def pad(x, fill):
        return jnp.pad(
            x,
            ((1, rp - g_rows - 1), (1, cp - g_cols - 1)),
            constant_values=fill,
        )

    validf = pad(valid.astype(jnp.float32), 0.0)
    angle_p = pad(jnp.where(valid, angle, 0.0), 0.0)
    flat_p = (
        jax.lax.broadcasted_iota(jnp.int32, (rp, cp), 0) * cp
        + jax.lax.broadcasted_iota(jnp.int32, (rp, cp), 1)
    )
    seed = jnp.where(validf > 0, flat_p, jnp.int32(big))
    pri = jnp.where(validf > 0, pad(norm, 0.0), -1.0)
    gang = angle_p
    cnt = jnp.ones((rp, cp), jnp.float32)

    shapes = [
        jax.ShapeDtypeStruct((rp, cp), jnp.float32),
        jax.ShapeDtypeStruct((rp, cp), jnp.int32),
        jax.ShapeDtypeStruct((rp, cp), jnp.float32),
        jax.ShapeDtypeStruct((rp, cp), jnp.float32),
    ]
    # Exactly ``total_sweeps`` in chunk-sized calls plus one remainder call —
    # ceil-division per_call would OVERSHOOT when chunk does not divide the
    # total (e.g. 330 -> 352 sweeps), breaking the label-for-label parity
    # contract with the XLA path.  At most two distinct kernel shapes compile.
    def _make_call(n_sweeps: int):
        return pl.pallas_call(
            functools.partial(_sweep_kernel, n_sweeps=n_sweeps, tol=tol, big=big),
            out_shape=shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3},
            compiler_params=pltpu.CompilerParams(
                # 6 persistent (488, 768) f32 planes + the 8-direction rolled
                # temporaries peak ~40 MB — above the 16 MB default scoped-vmem
                # cap but well inside v5e's physical VMEM.
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )

    full, rem = divmod(total_sweeps, chunk)
    call = _make_call(chunk) if full else None
    for _ in range(full):
        pri, seed, gang, cnt = call(angle_p, validf, pri, seed, gang, cnt)
    if rem:
        pri, seed, gang, cnt = _make_call(rem)(
            angle_p, validf, pri, seed, gang, cnt
        )

    # Back to original-grid flat labels.
    core = seed[1 : 1 + g_rows, 1 : 1 + g_cols]
    r = core // cp - 1
    c = core % cp - 1
    labels = r * g_cols + c
    return jnp.where(valid & (core < big), labels, -1)

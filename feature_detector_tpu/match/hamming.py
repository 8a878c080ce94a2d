"""Bitpacked Hamming matcher: XOR + popcount over uint32 descriptor words.

New capability mandated by BASELINE.json configs[1] — the reference has no
matcher (SURVEY.md §3.3 note).  Matching policy follows standard ORB practice:
nearest neighbor by Hamming distance with optional mutual cross-check, Lowe
ratio test, and a maximum-distance gate; all over fixed-capacity sets with
validity masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.config import MatcherOptions
from ..core.types import Matches

# Sentinel distance for invalid entries.  MUST stay a Python int: a
# module-level `jnp.int32` constant lives on the default device, and on a
# tunneled TPU platform embedding it during tracing stalls the FIRST
# `jit.lower()` that touches it for ~7 minutes (measured 402 s — the
# "698 s matcher compile" of BENCH_r01 was this, not XLA compile time).
_BIG = 1 << 20


def _unpack_pm1(words: jnp.ndarray) -> jnp.ndarray:
    """[N, W] uint32 -> [N, 32*W] bfloat16 in {-1, +1} (bit j of word w maps
    to column 32*w + j, the brief_compute packing order)."""
    n, w = words.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (words[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return (bits.reshape(n, 32 * w).astype(jnp.float32) * 2.0 - 1.0).astype(jnp.bfloat16)


def hamming_distance_matrix(
    words_a: jnp.ndarray, words_b: jnp.ndarray,
    valid_a: jnp.ndarray, valid_b: jnp.ndarray,
) -> jnp.ndarray:
    """[Na, W] x [Nb, W] -> [Na, Nb] int32; invalid rows/cols get a large
    sentinel distance.

    TPU-native formulation: XOR-popcount re-expressed as an MXU matmul over
    +/-1 vectors — dist = (L - a.b) / 2, exact in f32 accumulation (L <= 2048
    << 2^24).  Integer popcount is emulated (slow) on the VPU; the MXU does
    the whole [Na, Nb] panel in microseconds.
    """
    length = 32 * words_a.shape[-1]
    a = _unpack_pm1(words_a)
    b = _unpack_pm1(words_b)
    dot = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    d = ((length - dot) * 0.5).astype(jnp.int32)
    d = jnp.where(valid_a[:, None] & valid_b[None, :], d, _BIG)
    return d


@functools.partial(jax.jit, static_argnames=("opts",))
def match_hamming(
    words_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    words_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    opts: MatcherOptions = MatcherOptions(),
) -> Matches:
    """Match descriptor set A against B.  Returns per-A-slot best B index."""
    d = hamming_distance_matrix(words_a, words_b, valid_a, valid_b)

    # Argmin-free formulation: min + first-index-achieving-the-min via a
    # masked iota min.  TPU argmin lowers to an index-packing reduction that
    # measured 1.9 ms slower per 32-frame batch than these plain min
    # reductions (and the cross-check gather becomes a one-hot matmul).
    na, nb = d.shape
    iota_b = jnp.arange(nb, dtype=jnp.int32)
    best = jnp.min(d, axis=1)
    best_j = jnp.min(
        jnp.where(d == best[:, None], iota_b[None, :], nb), axis=1
    ).astype(jnp.int32)
    # Second best for the ratio test (one-hot mask instead of scatter: scatters
    # under vmap explode TPU compile time).
    is_best = iota_b[None, :] == best_j[:, None]
    second = jnp.min(jnp.where(is_best, _BIG, d), axis=1)

    ok = valid_a & (best <= opts.max_distance)
    if opts.ratio < 1.0:
        ok &= best.astype(jnp.float32) < opts.ratio * second.astype(jnp.float32)
    if opts.cross_check:
        bi = jnp.min(d, axis=0)
        best_i_for_b = jnp.min(
            jnp.where(d == bi[None, :], jnp.arange(na, dtype=jnp.int32)[:, None], na),
            axis=0,
        ).astype(jnp.int32)
        # best_i_for_b[best_j] without a gather: one-hot contraction.  MUST
        # run at HIGHEST precision: the TPU default routes f32 matmuls
        # through bf16 passes, whose 8-bit mantissa makes integer indices
        # above 256 inexact — the cross-check would silently corrupt for
        # max_features > 256.
        bi_of_bj = (
            jnp.dot(
                is_best.astype(jnp.float32),
                best_i_for_b.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
            )
        ).astype(jnp.int32)
        ok &= bi_of_bj == jnp.arange(na, dtype=jnp.int32)

    return Matches(
        index=jnp.where(ok, best_j, -1),
        distance=jnp.where(ok, best, _BIG),
        valid=ok,
    )

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

_BIG = jnp.int32(1 << 20)


def hamming_distance_matrix(
    words_a: jnp.ndarray, words_b: jnp.ndarray,
    valid_a: jnp.ndarray, valid_b: jnp.ndarray,
) -> jnp.ndarray:
    """[Na, W] x [Nb, W] -> [Na, Nb] int32; invalid rows/cols get a large
    sentinel distance."""
    x = words_a[:, None, :] ^ words_b[None, :, :]
    d = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
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

    best_j = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.min(d, axis=1)
    # Second best for the ratio test.
    na = d.shape[0]
    d2 = d.at[jnp.arange(na), best_j].set(_BIG)
    second = jnp.min(d2, axis=1)

    ok = valid_a & (best <= opts.max_distance)
    if opts.ratio < 1.0:
        ok &= best.astype(jnp.float32) < opts.ratio * second.astype(jnp.float32)
    if opts.cross_check:
        best_i_for_b = jnp.argmin(d, axis=0).astype(jnp.int32)
        ok &= best_i_for_b[best_j] == jnp.arange(na, dtype=jnp.int32)

    return Matches(
        index=jnp.where(ok, best_j, -1),
        distance=jnp.where(ok, best, _BIG),
        valid=ok,
    )

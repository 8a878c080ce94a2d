"""Dense float-descriptor matcher (L2 / cosine) for the NN detectors.

The reference computes SuperPoint/DISK descriptors but never matches them
(SURVEY.md §3.3: "no matching step anywhere in the repo"); matching is part of
this framework's mandated capability surface (BASELINE.json configs[1,4]).

TPU-native design: the full [Na, Nb] similarity matrix is ONE bf16 matmul on
the MXU (descriptors are unit-normalized, so L2² = 2 − 2·cosine and both
metrics share the kernel); mutual-best cross-check and Lowe ratio test are
row/column reductions fused by XLA. No reference counterpart to cite beyond
the descriptor layout (256-d SuperPoint, nn_feature_point_detector.cpp:179;
128-d DISK).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..core.types import Matches


@dataclasses.dataclass(frozen=True)
class FloatMatcherOptions:
    """Matching thresholds for float descriptors (no reference counterpart;
    values follow standard SuperPoint/DISK matching practice)."""

    metric: str = "cosine"  # "cosine" | "l2"
    min_similarity: float = 0.0  # cosine floor; ignored for "l2"
    max_distance: float = float("inf")  # L2 ceiling; ignored for "cosine"
    cross_check: bool = True
    ratio: float = 1.0  # Lowe ratio on L2 distances; 1.0 disables.


@functools.partial(jax.jit, static_argnames=("opts",))
def match_float(
    desc_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    opts: FloatMatcherOptions = FloatMatcherOptions(),
) -> Matches:
    """Match descriptor set A against B; returns per-A-slot best B index.

    Args:
      desc_a: [Na, D] float descriptors (need not be pre-normalized).
      valid_a: [Na] bool.
      desc_b: [Nb, D], valid_b: [Nb].
    """
    a = desc_a / jnp.maximum(jnp.linalg.norm(desc_a, axis=-1, keepdims=True), 1e-12)
    b = desc_b / jnp.maximum(jnp.linalg.norm(desc_b, axis=-1, keepdims=True), 1e-12)
    # One MXU matmul. HIGHEST precision (bf16 multi-pass) keeps f32-quality
    # cosines — plain bf16 inputs perturb distances by ~0.05, which matters
    # for the ratio/threshold tests downstream; descriptor matrices are tiny
    # (≤ ~1k × 256) so the extra passes are free in practice.
    sim = jnp.dot(a, b.T, precision=jax.lax.Precision.HIGHEST)
    pair_ok = valid_a[:, None] & valid_b[None, :]
    sim = jnp.where(pair_ok, sim, -jnp.inf)

    na, nb = sim.shape
    best_j = jnp.argmax(sim, axis=1).astype(jnp.int32)
    best = jnp.max(sim, axis=1)

    # Second best for the ratio test (one-hot mask, not scatter — see
    # match/hamming.py for the vmap/TPU rationale).
    is_best = jnp.arange(nb, dtype=jnp.int32)[None, :] == best_j[:, None]
    second = jnp.max(jnp.where(is_best, -jnp.inf, sim), axis=1)

    ok = valid_a & jnp.isfinite(best)
    if opts.metric == "cosine":
        ok &= best >= opts.min_similarity
        dist = jnp.sqrt(jnp.maximum(2.0 - 2.0 * best, 0.0))
    elif opts.metric == "l2":
        dist = jnp.sqrt(jnp.maximum(2.0 - 2.0 * best, 0.0))
        ok &= dist <= opts.max_distance
    else:
        raise ValueError(f"unknown metric: {opts.metric}")

    if opts.ratio < 1.0:
        d1 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * best, 0.0))
        d2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * second, 0.0))
        ok &= d1 <= opts.ratio * jnp.where(jnp.isfinite(d2), d2, jnp.inf)

    if opts.cross_check:
        best_i = jnp.argmax(sim, axis=0).astype(jnp.int32)  # per-B best A
        mutual = best_i[best_j] == jnp.arange(na, dtype=jnp.int32)
        ok &= mutual

    return Matches(
        index=jnp.where(ok, best_j, -1),
        distance=jnp.where(ok, dist, jnp.inf).astype(jnp.float32),
        valid=ok,
    )

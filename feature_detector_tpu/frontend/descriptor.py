"""Descriptor front-end: detect -> describe -> match convenience API.

Mirrors the reference's Descriptor<BriefType>::Compute batch entry point
(descriptor.h:19-20) plus the matcher the reference lacks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.config import BriefOptions, MatcherOptions
from ..core.types import Descriptors, Features, Matches
from ..kernels.brief import brief_compute
from ..match.hamming import match_hamming


@functools.partial(jax.jit, static_argnames=("opts",))
def compute_descriptors(
    image: jnp.ndarray, features: Features, opts: BriefOptions = BriefOptions()
) -> Descriptors:
    words, valid = brief_compute(image, features.uv, features.valid, opts)
    return Descriptors(words=words, valid=valid)


@functools.partial(jax.jit, static_argnames=("opts",))
def compute_descriptors_float(
    image: jnp.ndarray, features: Features, opts: BriefOptions = BriefOptions()
) -> jnp.ndarray:
    """Dense float overload (descriptor.h:43-62): bool bits map to ±1.0.

    Returns [capacity, kLength] float32; border-failed features keep all-zero
    rows — the reference's silent-zero behavior (quirk Q5: the bool path's
    failed rows are zero, and setZero precedes the bit writes).
    """
    words, valid = brief_compute(image, features.uv, features.valid, opts)
    n, w = words.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (words[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    pm1 = bits.reshape(n, 32 * w).astype(jnp.float32) * 2.0 - 1.0
    pm1 = pm1[:, : opts.length]
    return jnp.where(valid[:, None], pm1, 0.0)


@functools.partial(jax.jit, static_argnames=("brief_opts", "matcher_opts"))
def describe_and_match(
    image_a: jnp.ndarray,
    features_a: Features,
    image_b: jnp.ndarray,
    features_b: Features,
    brief_opts: BriefOptions = BriefOptions(),
    matcher_opts: MatcherOptions = MatcherOptions(),
) -> Matches:
    """Describe both feature sets and Hamming-match A against B."""
    da = compute_descriptors(image_a, features_a, brief_opts)
    db = compute_descriptors(image_b, features_b, brief_opts)
    return match_hamming(da.words, da.valid, db.words, db.valid, matcher_opts)

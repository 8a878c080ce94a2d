"""Steered-BRIEF descriptor as batched JAX gathers.

TPU-first redesign of BriefDescriptor::ComputeForOneFeature
(descriptor_brief.cpp:8-50): instead of a per-feature scalar loop, all N
features compute their intensity-centroid orientation and all 2*length rotated
pattern samples as one batched bilinear gather, and bits pack into uint32
words for the XOR-popcount matcher.  Semantics pinned to the NumPy oracle
(feature_detector_tpu/oracle/brief.py); float-coordinate reads are bilinear
(decision Q1), border failures yield all-zero descriptors with valid=False
(quirk Q5 made explicit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import BriefOptions
from ..oracle.brief_pattern import BRIEF_PATTERN

K_ZERO_FLOAT = 1e-10


def bilinear_sample(image_f32: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample at float (row, col) coordinates; callers guarantee
    in-bounds (the 19-px BRIEF border), indices are clipped defensively."""
    rows, cols = image_f32.shape
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, rows - 2)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, cols - 2)
    wy = ys - y0.astype(jnp.float32)
    wx = xs - x0.astype(jnp.float32)
    flat = image_f32.reshape(-1)
    base = y0 * cols + x0
    v00 = jnp.take(flat, base)
    v01 = jnp.take(flat, base + 1)
    v10 = jnp.take(flat, base + cols)
    v11 = jnp.take(flat, base + cols + 1)
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


@functools.partial(jax.jit, static_argnames=("opts",))
def brief_compute(
    image: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    opts: BriefOptions = BriefOptions(),
):
    """Compute packed steered-BRIEF descriptors for a fixed-capacity feature set.

    Args:
      image: [H, W] uint8.
      uv: [N, 2] float32 (x, y).
      valid: [N] bool slot occupancy.

    Returns (words[N, opts.words] uint32, desc_valid[N] bool).  desc_valid is
    False for empty slots, out-of-border features, and zero-moment patches;
    their descriptors are all-zero (matching the reference's silent behavior).
    """
    img = image.astype(jnp.float32)
    rows, cols = image.shape
    n = uv.shape[0]
    length = opts.length
    half = opts.half_patch_size

    x = uv[:, 0]
    y = uv[:, 1]
    max_bound = max(19.0, 2.0 * half)
    in_border = (
        (x >= max_bound) & (x <= cols - max_bound) & (y >= max_bound) & (y <= rows - max_bound)
    )
    # Clamp centers so gathers for rejected features stay in bounds.
    xs = jnp.clip(x, max_bound, cols - max_bound)
    ys = jnp.clip(y, max_bound, rows - max_bound)

    # Intensity-centroid orientation over the (2*half+1)^2 patch
    # (descriptor_brief.cpp:20-35).
    d = np.arange(-half, half + 1, dtype=np.float32)
    dxg, dyg = np.meshgrid(d, d, indexing="xy")
    dxg = jnp.asarray(dxg.reshape(-1))
    dyg = jnp.asarray(dyg.reshape(-1))
    patch = bilinear_sample(img, ys[:, None] + dyg[None, :], xs[:, None] + dxg[None, :])
    m10 = jnp.sum(dxg[None, :] * patch, axis=1)
    m01 = jnp.sum(dyg[None, :] * patch, axis=1)
    m = jnp.sqrt(m01 * m01 + m10 * m10)
    ok_moment = m >= K_ZERO_FLOAT
    m_safe = jnp.where(ok_moment, m, 1.0)
    sin_t = m01 / m_safe
    cos_t = m10 / m_safe

    # Rotate the test pairs and sample (descriptor_brief.cpp:38-47).
    pat = jnp.asarray(BRIEF_PATTERN[:length].astype(np.float32))
    p1x = cos_t[:, None] * pat[None, :, 0] - sin_t[:, None] * pat[None, :, 1] + xs[:, None]
    p1y = sin_t[:, None] * pat[None, :, 0] + cos_t[:, None] * pat[None, :, 1] + ys[:, None]
    p2x = cos_t[:, None] * pat[None, :, 2] - sin_t[:, None] * pat[None, :, 3] + xs[:, None]
    p2y = sin_t[:, None] * pat[None, :, 2] + cos_t[:, None] * pat[None, :, 3] + ys[:, None]
    v1 = bilinear_sample(img, p1y, p1x)
    v2 = bilinear_sample(img, p2y, p2x)
    bits = (v1 < v2).astype(jnp.uint32)

    desc_valid = valid & in_border & ok_moment
    bits = bits * desc_valid[:, None].astype(jnp.uint32)

    # Pack: bit j of word w = test 32*w + j.
    words = opts.words
    padded = jnp.zeros((n, words * 32), jnp.uint32).at[:, :length].set(bits)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    packed = jnp.sum(padded.reshape(n, words, 32) << shifts[None, None, :], axis=-1)
    return packed.astype(jnp.uint32), desc_valid

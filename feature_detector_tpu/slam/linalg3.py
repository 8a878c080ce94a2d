"""Closed-form 3x3 linear algebra (batched, elementwise).

XLA:TPU lowers batched ``jnp.linalg.inv``/``solve``/``svd`` on tiny
matrices to per-matrix LU/QR loops that run ~1000x below the VPU's
elementwise rate — a microbenchmark of the fused VO chunk stage measured
the batched 3x3 solves and 4x4 SVDs as ~90% of its wall clock.  Cofactor
(adjugate) inverses are a handful of fused multiplies per matrix and
exactly as accurate for the well-conditioned damped systems used here.
"""

from __future__ import annotations

import jax.numpy as jnp


def det3(m: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [...] determinant."""
    return (
        m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
        - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
        + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0])
    )


def adjugate3(m: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] adjugate (transposed cofactor matrix)."""
    c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
    c01 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
    c02 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
    c10 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
    c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
    c12 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
    c20 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
    c21 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
    c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    return jnp.stack(
        [
            jnp.stack([c00, c01, c02], -1),
            jnp.stack([c10, c11, c12], -1),
            jnp.stack([c20, c21, c22], -1),
        ],
        -2,
    )


def inv3(m: jnp.ndarray, eps: float = 1e-30) -> jnp.ndarray:
    """[..., 3, 3] inverse via adjugate/determinant (callers damp m)."""
    d = det3(m)
    d = jnp.where(jnp.abs(d) < eps, jnp.where(d < 0, -eps, eps), d)
    return adjugate3(m) / d[..., None, None]


def solve3(m: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-30) -> jnp.ndarray:
    """Solve m x = b for [..., 3, 3] m and [..., 3] b (Cramer via adjugate)."""
    d = det3(m)
    d = jnp.where(jnp.abs(d) < eps, jnp.where(d < 0, -eps, eps), d)
    return jnp.einsum("...ij,...j->...i", adjugate3(m), b) / d[..., None]

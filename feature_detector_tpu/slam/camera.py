"""Pinhole camera model + reprojection residual/Jacobians for BA."""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class Pinhole(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float


def project(p_cam: jnp.ndarray, cam: Pinhole) -> jnp.ndarray:
    """[..., 3] camera-frame points -> [..., 2] pixels."""
    z = jnp.maximum(p_cam[..., 2], 1e-6)
    return jnp.stack(
        [
            cam.fx * p_cam[..., 0] / z + cam.cx,
            cam.fy * p_cam[..., 1] / z + cam.cy,
        ],
        -1,
    )


def projection_jacobian(p_cam: jnp.ndarray, cam: Pinhole) -> jnp.ndarray:
    """d pixel / d p_cam: [..., 2, 3]."""
    x, y = p_cam[..., 0], p_cam[..., 1]
    z = jnp.maximum(p_cam[..., 2], 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    zr = jnp.zeros_like(z)
    row0 = jnp.stack([cam.fx * iz, zr, -cam.fx * x * iz2], -1)
    row1 = jnp.stack([zr, cam.fy * iz, -cam.fy * y * iz2], -1)
    return jnp.stack([row0, row1], -2)


def huber_weight(r2: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight for the Huber loss given squared residual norm."""
    r = jnp.sqrt(jnp.maximum(r2, 1e-12))
    return jnp.where(r <= delta, 1.0, delta / r)

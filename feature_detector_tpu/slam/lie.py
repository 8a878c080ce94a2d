"""SO(3)/SE(3) operations in JAX (new subsystem — the reference has no
back-end; required by BASELINE.json configs[4]).

Rotations are 3x3 matrices; minimal updates are axis-angle left
perturbations.  All ops are batched-friendly (leading axes broadcast).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], -1),
            jnp.stack([wz, z, -wx], -1),
            jnp.stack([-wy, wx, z], -1),
        ],
        -2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: [..., 3] axis-angle -> [..., 3, 3] rotation."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, _EPS)
    axis = w / theta
    k = hat(axis)
    th = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    r = eye + jnp.sin(th) * k + (1.0 - jnp.cos(th)) * (k @ k)
    small = jnp.linalg.norm(w, axis=-1)[..., None, None] < 1e-7
    return jnp.where(small, eye + hat(w), r)


def so3_log(r: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 3] axis-angle."""
    tr = jnp.trace(r, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos)
    sin = jnp.sin(theta)
    w_hat = (r - jnp.swapaxes(r, -1, -2)) * 0.5
    vee = jnp.stack([w_hat[..., 2, 1], w_hat[..., 0, 2], w_hat[..., 1, 0]], -1)
    scale = jnp.where(jnp.abs(sin) < _EPS, 1.0, theta / jnp.maximum(sin, _EPS))
    return vee * scale[..., None]


def se3_apply(rot: jnp.ndarray, trans: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """p = R x + t, batched."""
    return jnp.einsum("...ij,...j->...i", rot, x) + trans


def se3_update(rot, trans, delta):
    """Left-perturbation update: R <- exp(dtheta) R, t <- t + dt.
    delta: [..., 6] = (dtheta, dt)."""
    dr = so3_exp(delta[..., :3])
    return dr @ rot, trans + delta[..., 3:]


def se3_inverse(rot, trans):
    rt = jnp.swapaxes(rot, -1, -2)
    return rt, -jnp.einsum("...ij,...j->...i", rt, trans)


def se3_compose(r1, t1, r2, t2):
    """(R1, t1) * (R2, t2): first apply 2, then 1."""
    return r1 @ r2, jnp.einsum("...ij,...j->...i", r1, t2) + t1


def se3_log(rot, trans):
    """[..., 6] = (log R, t) — chordal-style residual used by the pose graph
    (translation left un-warped by V^-1; adequate for small residuals)."""
    return jnp.concatenate([so3_log(rot), trans], axis=-1)

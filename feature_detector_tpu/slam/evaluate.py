"""Trajectory evaluation: ATE / RPE with Umeyama alignment.

The reference has no evaluation layer; BASELINE.json's north star requires
"trajectory within the ATE bound on benchmark sequences", so this module
implements the standard TUM-RGBD evaluation protocol (Sturm et al., IROS'12):
SE(3)/Sim(3) Umeyama alignment of the estimate onto ground truth, then
RMSE over translational residuals (ATE) and relative-pose deltas (RPE).

Pure jax.numpy on [N, 3] / [N, 3, 3] stacked trajectories — the whole
evaluation jits to a handful of fused reductions.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Alignment(NamedTuple):
    rotation: jnp.ndarray  # [3, 3]
    translation: jnp.ndarray  # [3]
    scale: jnp.ndarray  # [] float


@functools.partial(jax.jit, static_argnames=("with_scale",))
def umeyama_alignment(
    source: jnp.ndarray, target: jnp.ndarray, with_scale: bool = False
) -> Alignment:
    """Least-squares rigid (or similarity) transform aligning source→target.

    Args: source, target: [N, 3] corresponding point sets.
    Returns (R, t, s) minimizing ||target − (s·R·source + t)||².
    """
    mu_s = jnp.mean(source, axis=0)
    mu_t = jnp.mean(target, axis=0)
    xs = source - mu_s
    xt = target - mu_t
    cov = xt.T @ xs / source.shape[0]
    u, d, vt = jnp.linalg.svd(cov)
    s_fix = jnp.where(jnp.linalg.det(u) * jnp.linalg.det(vt) < 0, -1.0, 1.0)
    diag = jnp.array([1.0, 1.0, 1.0]).at[2].set(s_fix)
    rot = (u * diag[None, :]) @ vt
    if with_scale:
        var_s = jnp.mean(jnp.sum(xs * xs, axis=1))
        scale = jnp.sum(d * diag) / jnp.maximum(var_s, 1e-12)
    else:
        scale = jnp.float32(1.0)
    trans = mu_t - scale * rot @ mu_s
    return Alignment(rotation=rot, translation=trans, scale=scale)


@functools.partial(jax.jit, static_argnames=("align", "with_scale"))
def ate_rmse(
    estimate_t: jnp.ndarray,
    groundtruth_t: jnp.ndarray,
    align: bool = True,
    with_scale: bool = False,
) -> jnp.ndarray:
    """Absolute trajectory error (RMSE, meters) over [N, 3] positions."""
    est = estimate_t
    if align:
        a = umeyama_alignment(estimate_t, groundtruth_t, with_scale=with_scale)
        est = a.scale * estimate_t @ a.rotation.T + a.translation
    err = est - groundtruth_t
    return jnp.sqrt(jnp.mean(jnp.sum(err * err, axis=1)))


@functools.partial(jax.jit, static_argnames=("delta",))
def rpe_rmse(
    est_rot: jnp.ndarray,
    est_t: jnp.ndarray,
    gt_rot: jnp.ndarray,
    gt_t: jnp.ndarray,
    delta: int = 1,
):
    """Relative pose error over pose pairs (i, i+delta).

    Args: est_rot/gt_rot [N, 3, 3] world-from-camera rotations, est_t/gt_t
    [N, 3] positions.  Returns (trans_rmse, rot_rmse_rad).
    """

    def rel(rot, t):
        r_i, r_j = rot[:-delta], rot[delta:]
        t_i, t_j = t[:-delta], t[delta:]
        # T_i^-1 * T_j
        r_rel = jnp.einsum("nba,nbc->nac", r_i, r_j)
        t_rel = jnp.einsum("nba,nb->na", r_i, t_j - t_i)
        return r_rel, t_rel

    er, et = rel(est_rot, est_t)
    gr, gt_ = rel(gt_rot, gt_t)
    dt = et - gt_
    trans_rmse = jnp.sqrt(jnp.mean(jnp.sum(dt * dt, axis=1)))
    dr = jnp.einsum("nba,nbc->nac", gr, er)
    cos = jnp.clip((jnp.trace(dr, axis1=1, axis2=2) - 1.0) / 2.0, -1.0, 1.0)
    rot_rmse = jnp.sqrt(jnp.mean(jnp.arccos(cos) ** 2))
    return trans_rmse, rot_rmse

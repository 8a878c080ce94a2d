"""Distributed Schur-complement bundle adjustment.

New subsystem mandated by BASELINE.json (north_star, configs[4]) — the
reference has no back-end.  TPU-native design (SURVEY.md §2 parallelism
table):

- Fixed-shape problem layout: landmarks carry up to ``D`` observations each
  (``obs_cam [L, D]`` int32 camera index with -1 padding, ``obs_uv [L, D, 2]``)
  — the block-sparse Hessian's sparsity pattern becomes a static gather/
  scatter pattern that XLA tiles onto the MXU.
- Landmarks shard over the mesh's ``data`` axis (`shard_map`); each device
  eliminates its own landmarks (3x3 closed-form inverses) and computes its
  partial camera Hessian H_cc, RHS b_c, and Schur contributions; the reduced
  camera system S (6C x 6C, dense) is `psum`-reduced over ICI and solved with
  a replicated dense Cholesky; landmark back-substitution is local again.
- Robust Huber IRLS weights; Levenberg-style diagonal damping; gauge fixed by
  freezing camera 0.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.config import BAOptions
from .camera import Pinhole, huber_weight, project, projection_jacobian
from .lie import hat, se3_apply, se3_update


class BAProblem(NamedTuple):
    """Fixed-shape BA problem.

    rot:      [C, 3, 3]  world->camera rotations
    trans:    [C, 3]     world->camera translations
    points:   [L, 3]     landmark positions (world)
    obs_cam:  [L, D]     int32 camera index per observation slot, -1 = empty
    obs_uv:   [L, D, 2]  observed pixels
    """

    rot: jnp.ndarray
    trans: jnp.ndarray
    points: jnp.ndarray
    obs_cam: jnp.ndarray
    obs_uv: jnp.ndarray


def _per_landmark_blocks(rot, trans, points, obs_cam, obs_uv, cam: Pinhole, opts: BAOptions):
    """Per-landmark residuals and Jacobian blocks.

    Returns (valid [L, D], r [L, D, 2], Jc [L, D, 2, 6], Jp [L, D, 2, 3], w [L, D]).
    """
    L, D = obs_cam.shape
    valid = obs_cam >= 0
    cam_idx = jnp.clip(obs_cam, 0, rot.shape[0] - 1)
    R = rot[cam_idx]          # [L, D, 3, 3]
    t = trans[cam_idx]        # [L, D, 3]
    X = points[:, None, :]    # [L, 1, 3]
    p = jnp.einsum("ldij,ldj->ldi", R, jnp.broadcast_to(X, (L, D, 3))) + t

    r = project(p, cam) - obs_uv                     # [L, D, 2]
    Jpi = projection_jacobian(p, cam)                # [L, D, 2, 3]
    # Left perturbation: dp/dtheta = -[p]x, dp/dt = I, dp/dX = R.
    Jc = jnp.concatenate([-Jpi @ hat(p), Jpi], axis=-1)   # [L, D, 2, 6]
    Jp = Jpi @ R                                          # [L, D, 2, 3]

    w = huber_weight(jnp.sum(r * r, -1), opts.huber_delta) * valid
    return valid, r, Jc, Jp, w


def _assemble(rot, trans, points, obs_cam, obs_uv, cam, opts, n_cams):
    """Partial normal equations from a landmark shard.

    Returns (S [6C, 6C] Schur-reduced camera system contribution,
             b [6C] reduced RHS contribution,
             Hpp_inv [L, 3, 3], b_p [L, 3], Y-related terms for back-subst).
    """
    L, D = obs_cam.shape
    valid, r, Jc, Jp, w = _per_landmark_blocks(rot, trans, points, obs_cam, obs_uv, cam, opts)
    sw = jnp.sqrt(w)[..., None, None]
    Jc = Jc * sw
    Jp = Jp * sw
    rw = r * jnp.sqrt(w)[..., None]

    # Landmark blocks; trace-relative damping keeps outlier-downweighted
    # landmarks (near-zero Huber weight) from producing exploding inverses.
    Hpp = jnp.einsum("ldki,ldkj->lij", Jp, Jp)            # [L, 3, 3]
    tr = jnp.trace(Hpp, axis1=-2, axis2=-1)[:, None, None]
    Hpp = Hpp + (opts.damping * tr + 1e-5) * jnp.eye(3)
    bp = -jnp.einsum("ldki,ldk->li", Jp, rw)              # [L, 3]
    Hpp_inv = jnp.linalg.inv(Hpp)

    # Camera blocks per observation.
    Hcc_blk = jnp.einsum("ldki,ldkj->ldij", Jc, Jc)       # [L, D, 6, 6]
    bc_blk = -jnp.einsum("ldki,ldk->ldi", Jc, rw)         # [L, D, 6]
    W = jnp.einsum("ldki,ldkj->ldij", Jc, Jp)             # [L, D, 6, 3] = Jc^T Jp
    Y = jnp.einsum("ldij,ljk->ldik", W, Hpp_inv)          # [L, D, 6, 3]

    cam_idx = jnp.clip(obs_cam, 0, n_cams - 1)

    # Dense reduced system S = Hcc - Y W^T (per landmark, all observer pairs).
    S = jnp.zeros((n_cams, 6, n_cams, 6))
    S = S.at[cam_idx, :, cam_idx, :].add(Hcc_blk * valid[..., None, None])
    pair = jnp.einsum("ldij,lekj->ldeik", Y, W)           # [L, D, D, 6, 6]
    pair_valid = (valid[:, :, None] & valid[:, None, :])[..., None, None]
    d_idx = jnp.broadcast_to(cam_idx[:, :, None], (L, D, D))
    e_idx = jnp.broadcast_to(cam_idx[:, None, :], (L, D, D))
    S = S.at[d_idx, :, e_idx, :].add(-pair * pair_valid)

    b = jnp.zeros((n_cams, 6))
    b = b.at[cam_idx].add(bc_blk * valid[..., None])
    b = b.at[cam_idx].add(-jnp.einsum("ldij,lj->ldi", Y, bp) * valid[..., None])

    return S.reshape(6 * n_cams, 6 * n_cams), b.reshape(-1), Hpp_inv, bp, W, valid, cam_idx


def _solve_and_update(rot, trans, points, S, b, Hpp_inv, bp, W, valid, cam_idx, opts, lam):
    n_cams = rot.shape[0]
    # Gauge fix: freeze the first num_fixed_cameras by replacing their blocks
    # with identity (keeps the system well-scaled in f32).
    k = 6 * max(1, min(opts.num_fixed_cameras, n_cams))
    S = S.at[:k, :].set(0.0).at[:, :k].set(0.0)
    S = S.at[jnp.arange(k), jnp.arange(k)].set(1.0)
    b = b.at[:k].set(0.0)
    # Levenberg-Marquardt diagonal-relative damping + absolute jitter.
    diag = jnp.diagonal(S)
    S = S + jnp.diag(lam * diag + 1e-6)

    dx_cam = jax.scipy.linalg.solve(S, b).reshape(n_cams, 6)
    rot2, trans2 = se3_update(rot, trans, dx_cam)

    # Back-substitute landmarks: dp = Hpp^-1 (bp - W^T dx_cam(observers)).
    dxc = dx_cam[cam_idx]                                  # [L, D, 6]
    wtd = jnp.einsum("ldij,ldi->lj", W * valid[..., None, None], dxc)
    dp = jnp.einsum("lij,lj->li", Hpp_inv, bp - wtd)
    return rot2, trans2, points + dp, dx_cam


def reprojection_cost(problem: BAProblem, cam: Pinhole, opts: BAOptions) -> jnp.ndarray:
    valid, r, _, _, w = _per_landmark_blocks(
        problem.rot, problem.trans, problem.points, problem.obs_cam, problem.obs_uv, cam, opts
    )
    return jnp.sum(jnp.sum(r * r, -1) * w) / jnp.maximum(jnp.sum(valid), 1)


def _cost(rot, trans, points, obs_cam, obs_uv, cam, opts):
    valid, r, _, _, w = _per_landmark_blocks(rot, trans, points, obs_cam, obs_uv, cam, opts)
    return jnp.sum(jnp.sum(r * r, -1) * w)


@functools.partial(jax.jit, static_argnames=("cam", "opts"))
def ba_solve(problem: BAProblem, cam: Pinhole, opts: BAOptions = BAOptions()) -> BAProblem:
    """Single-device Levenberg-Marquardt loop: fixed trip count, accept/reject
    steps with adaptive damping (rejected steps raise lambda and retry)."""

    def body(_, state):
        rot, trans, points, lam, cost = state
        out = _assemble(
            rot, trans, points, problem.obs_cam, problem.obs_uv, cam, opts, rot.shape[0]
        )
        rot2, trans2, points2, _ = _solve_and_update(rot, trans, points, *out, opts, lam)
        new_cost = _cost(rot2, trans2, points2, problem.obs_cam, problem.obs_uv, cam, opts)
        accept = new_cost < cost
        rot = jnp.where(accept, rot2, rot)
        trans = jnp.where(accept, trans2, trans)
        points = jnp.where(accept, points2, points)
        lam = jnp.where(accept, lam * opts.damping_down, lam * opts.damping_up)
        lam = jnp.clip(lam, 1e-9, 1e3)
        cost = jnp.where(accept, new_cost, cost)
        return rot, trans, points, lam, cost

    cost0 = _cost(
        problem.rot, problem.trans, problem.points, problem.obs_cam, problem.obs_uv, cam, opts
    )
    rot, trans, points, _, _ = jax.lax.fori_loop(
        0,
        opts.max_iterations,
        body,
        (problem.rot, problem.trans, problem.points, jnp.float32(opts.damping), cost0),
    )
    return problem._replace(rot=rot, trans=trans, points=points)


def make_distributed_ba(mesh: Mesh, cam: Pinhole, opts: BAOptions = BAOptions(), axis: str = "data"):
    """Landmark-sharded BA: each device eliminates its landmark shard, the
    reduced camera system is psum-reduced over ICI, poses update replicated,
    landmarks update locally.

    Returns a jitted fn(problem) -> problem with ``points``/``obs_*`` sharded
    on their leading (landmark) axis over ``axis`` and poses replicated.
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P(axis)),
        check_vma=False,
    )
    def step_sharded(rot, trans, points, obs_cam, obs_uv):
        n_cams = rot.shape[0]

        def cost_fn(rot, trans, points):
            return jax.lax.psum(_cost(rot, trans, points, obs_cam, obs_uv, cam, opts), axis)

        def body(_, state):
            rot, trans, points, lam, cost = state
            S, b, Hpp_inv, bp, W, valid, cam_idx = _assemble(
                rot, trans, points, obs_cam, obs_uv, cam, opts, n_cams
            )
            # Reduce the camera system over all landmark shards (ICI psum).
            S = jax.lax.psum(S, axis)
            b = jax.lax.psum(b, axis)
            rot2, trans2, points2, _ = _solve_and_update(
                rot, trans, points, S, b, Hpp_inv, bp, W, valid, cam_idx, opts, lam
            )
            new_cost = cost_fn(rot2, trans2, points2)
            accept = new_cost < cost
            rot = jnp.where(accept, rot2, rot)
            trans = jnp.where(accept, trans2, trans)
            points = jnp.where(accept, points2, points)
            lam = jnp.where(accept, lam * opts.damping_down, lam * opts.damping_up)
            lam = jnp.clip(lam, 1e-9, 1e3)
            cost = jnp.where(accept, new_cost, cost)
            return rot, trans, points, lam, cost

        rot, trans, points, _, _ = jax.lax.fori_loop(
            0,
            opts.max_iterations,
            body,
            (rot, trans, points, jnp.float32(opts.damping), cost_fn(rot, trans, points)),
        )
        return rot, trans, points

    n_shards = mesh.shape[axis]

    @jax.jit
    def run(problem: BAProblem) -> BAProblem:
        # Pad the landmark axis to a multiple of the mesh axis; padded slots
        # carry obs_cam = -1 and so contribute nothing to any reduction.
        L = problem.points.shape[0]
        pad = (-L) % n_shards
        points = jnp.pad(problem.points, ((0, pad), (0, 0)))
        obs_cam = jnp.pad(problem.obs_cam, ((0, pad), (0, 0)), constant_values=-1)
        obs_uv = jnp.pad(problem.obs_uv, ((0, pad), (0, 0), (0, 0)))
        rot, trans, points = step_sharded(
            problem.rot, problem.trans, points, obs_cam, obs_uv
        )
        return problem._replace(rot=rot, trans=trans, points=points[:L])

    return run

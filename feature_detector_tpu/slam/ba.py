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


def _per_landmark_blocks(
    rot, trans, points, obs_cam, obs_uv, cam: Pinhole, opts: BAOptions, obs_w=None
):
    """Per-landmark residuals and Jacobian blocks.

    ``obs_w`` is an optional [L, D] extra weight (0/1 gate mask from outlier
    rejection rounds); it multiplies into the IRLS weight.

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
    if obs_w is not None:
        w = w * obs_w
    return valid, r, Jc, Jp, w


def _assemble(rot, trans, points, obs_cam, obs_uv, cam, opts, n_cams, obs_w=None):
    """Partial normal equations from a landmark shard.

    Returns (S [6C, 6C] Schur-reduced camera system contribution,
             b [6C] reduced RHS contribution,
             Hpp_inv [L, 3, 3], b_p [L, 3], Y-related terms for back-subst).
    """
    L, D = obs_cam.shape
    valid, r, Jc, Jp, w = _per_landmark_blocks(
        rot, trans, points, obs_cam, obs_uv, cam, opts, obs_w
    )
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


def _cost(rot, trans, points, obs_cam, obs_uv, cam, opts, obs_w=None):
    """TRUE Huber objective (the function the IRLS step minimizes).

    The round-1 merit function was Σ w·r² = δ·‖r‖ on outliers, which is NOT
    the Huber loss the IRLS weights descend (ρ = 2δ‖r‖ − δ² there) — the
    accept/reject test then compares a different objective than the step
    optimizer's, causing false rejections and a visible convergence crawl.
    """
    valid, r, _, _, _ = _per_landmark_blocks(
        rot, trans, points, obs_cam, obs_uv, cam, opts, obs_w
    )
    r2 = jnp.sum(r * r, -1)
    rn = jnp.sqrt(jnp.maximum(r2, 1e-12))
    d = opts.huber_delta
    rho = jnp.where(rn <= d, r2, 2.0 * d * rn - d * d)
    mask = (obs_cam >= 0).astype(rho.dtype)
    if obs_w is not None:
        mask = mask * obs_w
    return jnp.sum(rho * mask)


def _residual_norms(rot, trans, points, obs_cam, obs_uv, cam, opts):
    valid, r, _, _, _ = _per_landmark_blocks(
        rot, trans, points, obs_cam, obs_uv, cam, opts
    )
    return jnp.sqrt(jnp.maximum(jnp.sum(r * r, -1), 1e-12)), valid


def _relandmark(rot, trans, points, obs_cam, obs_uv, cam: Pinhole, gate_px: float):
    """Per-landmark consensus re-estimation + observation gating.

    Residual gating alone cannot reject an outlier that the landmark's 3D
    point has ABSORBED (the point collapses onto the outlier ray: the
    outlier's residual goes to ~0 while the clean siblings' residuals blow
    up — observed on the synthetic outlier test).  With cameras already
    well-constrained by the clean landmarks, each landmark is re-estimated
    independently by a mini-RANSAC over its observation pairs:

    1. hypothesize a 3D point from every observation pair via closed-form
       midpoint triangulation (3x3 solve — no SVD, vmaps over [L, D, D]);
    2. score every hypothesis (plus the current point) by how many of the
       landmark's observations reproject within ``gate_px``;
    3. keep the best-supported point and gate the observations outside its
       consensus set.

    Returns (new_points [L, 3], obs_w [L, D] 0/1 gate mask).
    """
    L, D = obs_cam.shape
    n_cams = rot.shape[0]
    valid = obs_cam >= 0
    cam_idx = jnp.clip(obs_cam, 0, n_cams - 1)
    R = rot[cam_idx]                                     # [L, D, 3, 3]
    t = trans[cam_idx]                                   # [L, D, 3]
    centers = -jnp.einsum("ldji,ldj->ldi", R, t)         # [L, D, 3]

    # World-frame viewing rays.
    rx = (obs_uv[..., 0] - cam.cx) / cam.fx
    ry = (obs_uv[..., 1] - cam.cy) / cam.fy
    rays_c = jnp.stack([rx, ry, jnp.ones_like(rx)], -1)  # [L, D, 3]
    rays_w = jnp.einsum("ldji,ldj->ldi", R, rays_c)
    rays_w = rays_w / jnp.linalg.norm(rays_w, axis=-1, keepdims=True)

    # Midpoint triangulation: sum over the pair of (I - d dᵀ) x = (I - d dᵀ) c.
    eye = jnp.eye(3)
    M = eye - rays_w[..., :, None] * rays_w[..., None, :]   # [L, D, 3, 3]
    Mc = jnp.einsum("ldij,ldj->ldi", M, centers)            # [L, D, 3]
    A = M[:, :, None] + M[:, None, :]                       # [L, D, D, 3, 3]
    rhs = Mc[:, :, None] + Mc[:, None, :]                   # [L, D, D, 3]
    A = A + 1e-6 * eye
    hyp = jnp.linalg.solve(A, rhs[..., None])[..., 0]       # [L, D, D, 3]

    # Candidate set: all pairs + the current point.
    hyp = jnp.concatenate(
        [hyp.reshape(L, D * D, 3), points[:, None, :]], axis=1
    )                                                        # [L, H, 3]
    pair_ok = (valid[:, :, None] & valid[:, None, :]
               & ~jnp.eye(D, dtype=bool)[None]).reshape(L, D * D)
    hyp_ok = jnp.concatenate([pair_ok, jnp.ones((L, 1), bool)], axis=1)

    # Score: reproject every hypothesis into every observing camera.
    pc = jnp.einsum("ldij,lhj->lhdi", R, hyp) + t[:, None]   # [L, H, D, 3]
    z = jnp.maximum(pc[..., 2], 1e-6)
    u = cam.fx * pc[..., 0] / z + cam.cx
    v = cam.fy * pc[..., 1] / z + cam.cy
    du = u - obs_uv[:, None, :, 0]
    dv = v - obs_uv[:, None, :, 1]
    rn = jnp.sqrt(du * du + dv * dv + 1e-12)                 # [L, H, D]
    inl = (rn < gate_px) & valid[:, None, :] & (pc[..., 2] > 1e-6)
    support = jnp.sum(inl, -1) - 1e-3 * jnp.clip(
        jnp.mean(jnp.where(inl, rn, 0.0), -1), 0.0, 1e3
    )                                                        # [L, H]
    support = jnp.where(hyp_ok, support, -1.0)
    best = jnp.argmax(support, axis=1)                       # [L]
    new_pts = jnp.take_along_axis(hyp, best[:, None, None], 1)[:, 0]
    obs_w = jnp.take_along_axis(inl, best[:, None, None], 1)[:, 0]
    # A landmark with <2 consensus obs is unconstrained: freeze it (weight 0
    # everywhere keeps its point out of the camera system entirely).
    enough = jnp.sum(obs_w, -1) >= 2
    obs_w = obs_w & enough[:, None]
    new_pts = jnp.where(enough[:, None], new_pts, points)
    return new_pts, obs_w.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cam", "opts"))
def ba_solve(problem: BAProblem, cam: Pinhole, opts: BAOptions = BAOptions()) -> BAProblem:
    """Levenberg-Marquardt with chi²-style outlier gating rounds.

    Each round runs ``max_iterations`` fixed-trip LM iterations
    (accept/reject on the true Huber objective; rejected steps raise
    lambda), then — when ``gate_px > 0`` — re-classifies every observation
    by its residual norm and HARD-EXCLUDES those beyond the gate before
    the next round (ORB-SLAM-style).  Gating is essential for gross
    outliers: Huber alone leaves an L1-like constant pull that biases the
    optimum (a handful of 80 px mismatches measurably bends the whole
    trajectory; observed: clean-landmark residuals stuck at ~1.4 px rms
    with pure Huber, sub-0.1 px with gating).
    """
    obs_cam, obs_uv = problem.obs_cam, problem.obs_uv

    def lm_round(rot, trans, points, obs_w):
        def body(_, state):
            rot, trans, points, lam, cost = state
            out = _assemble(
                rot, trans, points, obs_cam, obs_uv, cam, opts, rot.shape[0], obs_w
            )
            rot2, trans2, points2, _ = _solve_and_update(rot, trans, points, *out, opts, lam)
            new_cost = _cost(rot2, trans2, points2, obs_cam, obs_uv, cam, opts, obs_w)
            accept = new_cost < cost
            rot = jnp.where(accept, rot2, rot)
            trans = jnp.where(accept, trans2, trans)
            points = jnp.where(accept, points2, points)
            lam = jnp.where(accept, lam * opts.damping_down, lam * opts.damping_up)
            lam = jnp.clip(lam, 1e-9, 1e3)
            cost = jnp.where(accept, new_cost, cost)
            return rot, trans, points, lam, cost

        cost0 = _cost(rot, trans, points, obs_cam, obs_uv, cam, opts, obs_w)
        rot, trans, points, _, _ = jax.lax.fori_loop(
            0, opts.max_iterations, body,
            (rot, trans, points, jnp.float32(opts.damping), cost0),
        )
        return rot, trans, points

    rot, trans, points = problem.rot, problem.trans, problem.points
    obs_w = jnp.ones(obs_cam.shape, jnp.float32)
    rot, trans, points = lm_round(rot, trans, points, obs_w)
    if opts.gate_px > 0:
        for _ in range(opts.gate_rounds):
            points, obs_w = _relandmark(
                rot, trans, points, obs_cam, obs_uv, cam, opts.gate_px
            )
            rot, trans, points = lm_round(rot, trans, points, obs_w)
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

        def cost_fn(rot, trans, points, obs_w):
            return jax.lax.psum(
                _cost(rot, trans, points, obs_cam, obs_uv, cam, opts, obs_w), axis
            )

        def lm_round(rot, trans, points, obs_w):
            def body(_, state):
                rot, trans, points, lam, cost = state
                S, b, Hpp_inv, bp, W, valid, cam_idx = _assemble(
                    rot, trans, points, obs_cam, obs_uv, cam, opts, n_cams, obs_w
                )
                # Reduce the camera system over all landmark shards (ICI psum).
                S = jax.lax.psum(S, axis)
                b = jax.lax.psum(b, axis)
                rot2, trans2, points2, _ = _solve_and_update(
                    rot, trans, points, S, b, Hpp_inv, bp, W, valid, cam_idx, opts, lam
                )
                new_cost = cost_fn(rot2, trans2, points2, obs_w)
                accept = new_cost < cost
                rot = jnp.where(accept, rot2, rot)
                trans = jnp.where(accept, trans2, trans)
                points = jnp.where(accept, points2, points)
                lam = jnp.where(accept, lam * opts.damping_down, lam * opts.damping_up)
                lam = jnp.clip(lam, 1e-9, 1e3)
                cost = jnp.where(accept, new_cost, cost)
                return rot, trans, points, lam, cost

            rot, trans, points, _, _ = jax.lax.fori_loop(
                0, opts.max_iterations, body,
                (rot, trans, points, jnp.float32(opts.damping),
                 cost_fn(rot, trans, points, obs_w)),
            )
            return rot, trans, points

        # Gating rounds (see ba_solve): the consensus re-triangulation is
        # per-landmark, so it runs on the local landmark shard — no
        # collective needed, each observation lives with its landmark's
        # owner device.
        obs_w = jnp.ones(obs_cam.shape, jnp.float32)
        rot, trans, points = lm_round(rot, trans, points, obs_w)
        if opts.gate_px > 0:
            for _ in range(opts.gate_rounds):
                points, obs_w = _relandmark(
                    rot, trans, points, obs_cam, obs_uv, cam, opts.gate_px
                )
                rot, trans, points = lm_round(rot, trans, points, obs_w)
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

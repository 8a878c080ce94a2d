"""Multi-view geometry: triangulation and two-view pose initialization.

New capability layer (the reference stops at detection; SURVEY.md §0: "no
matcher, no distributed code"): these are the minimal geometric solvers the
sequence driver needs between matching and bundle adjustment.

All solvers are fixed-shape and jittable: DLT triangulation is a batched 4×4
SVD (vmapped, runs across landmarks in parallel), the essential matrix is the
normalized 8-point system solved via SVD on a 9×9 normal matrix (works with
any N ≥ 8 matches under a weight mask), and cheirality disambiguation scores
all four (R, t) decompositions with masked reductions instead of branching.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .camera import Pinhole


def backproject(uv: jnp.ndarray, cam: Pinhole) -> jnp.ndarray:
    """Pixel → normalized camera ray (z=1). uv [..., 2] → [..., 3]."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


@jax.jit
def triangulate(
    rot_a: jnp.ndarray,
    trans_a: jnp.ndarray,
    rot_b: jnp.ndarray,
    trans_b: jnp.ndarray,
    uv_a: jnp.ndarray,
    uv_b: jnp.ndarray,
    cam: Pinhole,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linear (DLT) two-view triangulation, batched over matches.

    Poses are world→camera: p_cam = R · p_world + t.
    Args: rot_* [3,3], trans_* [3], uv_* [N, 2] pixel coords.
    Returns (points [N, 3] world, depths_ok [N] bool cheirality mask).
    """
    ray_a = backproject(uv_a, cam)  # [N, 3]
    ray_b = backproject(uv_b, cam)

    pa = jnp.concatenate([rot_a, trans_a[:, None]], axis=1)  # [3, 4]
    pb = jnp.concatenate([rot_b, trans_b[:, None]], axis=1)

    def one(ra, rb):
        a = jnp.stack(
            [
                ra[0] * pa[2] - pa[0],
                ra[1] * pa[2] - pa[1],
                rb[0] * pb[2] - pb[0],
                rb[1] * pb[2] - pb[1],
            ]
        )  # [4, 4]
        # Inhomogeneous DLT (w = 1): solve the 4x3 least squares via the
        # closed-form 3x3 normal equations.  The homogeneous route needs a
        # per-point 4x4 SVD, which XLA:TPU runs ~1000x slower than these
        # fused multiplies (measured: the batched SVDs were ~4 s of every
        # fused-VO chunk dispatch); for finite-depth points the
        # inhomogeneous solution is the same minimizer up to the (benign)
        # row normalization, and degenerate/at-infinity rays blow up into
        # points the callers' cheirality + reprojection gates discard.
        M = a[:, :3]
        c = a[:, 3]
        AtA = M.T @ M
        tr = AtA[0, 0] + AtA[1, 1] + AtA[2, 2]
        AtA = AtA + (1e-9 * tr + 1e-20) * jnp.eye(3, dtype=a.dtype)
        # Scale-normalize before the Cramer solve: far-outlier projections
        # (e.g. behind-camera points fed by the cheirality test) reach
        # |AtA| ~ 1e13, whose determinant overflows f32; dividing both
        # sides by max|AtA| leaves the solution exactly unchanged.
        s = jnp.maximum(jnp.max(jnp.abs(AtA)), 1e-20)
        from .linalg3 import solve3

        return -solve3(AtA / s, (M.T @ c) / s)

    pts = jax.vmap(one)(ray_a, ray_b)  # [N, 3]
    za = (pts @ rot_a.T + trans_a)[:, 2]
    zb = (pts @ rot_b.T + trans_b)[:, 2]
    return pts, (za > 1e-6) & (zb > 1e-6)


@jax.jit
def essential_from_matches(
    uv_a: jnp.ndarray,
    uv_b: jnp.ndarray,
    weight: jnp.ndarray,
    cam: Pinhole,
) -> jnp.ndarray:
    """Weighted normalized 8-point essential matrix.

    Solves min ||A e|| over the [N, 9] epipolar design matrix via the smallest
    eigenvector of AᵀWA (9×9 — shape-independent of N), then projects to the
    essential manifold (two equal singular values, third zero).
    """
    xa = backproject(uv_a, cam)
    xb = backproject(uv_b, cam)
    # Epipolar constraint xbᵀ E xa = 0; row = kron(xb, xa).
    a = (xb[:, :, None] * xa[:, None, :]).reshape(-1, 9)  # [N, 9]
    ata = (a * weight[:, None]).T @ a  # [9, 9]
    _, vecs = jnp.linalg.eigh(ata)
    e = vecs[:, 0].reshape(3, 3)
    u, s, vt = jnp.linalg.svd(e)
    sigma = (s[0] + s[1]) / 2.0
    return u @ jnp.diag(jnp.array([1.0, 1.0, 0.0]) * sigma) @ vt


@jax.jit
def decompose_essential(
    e: jnp.ndarray,
    uv_a: jnp.ndarray,
    uv_b: jnp.ndarray,
    weight: jnp.ndarray,
    cam: Pinhole,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Recover the relative pose (R, t) of camera B w.r.t. camera A from E.

    Camera A is taken as identity; returns world→camera-B (R, t) with ||t||=1
    (monocular scale gauge).  The winner among the 4 decompositions is the one
    with the most weighted points passing cheirality in BOTH views — evaluated
    with masked sums, no data-dependent branching.
    """
    u, _, vt = jnp.linalg.svd(e)
    # Enforce proper rotations.
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    w = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    r1 = u @ w @ vt
    r2 = u @ w.T @ vt
    t = u[:, 2]

    eye = jnp.eye(3)
    zero = jnp.zeros(3)

    def score(rot, trans):
        pts, ok = triangulate(eye, zero, rot, trans, uv_a, uv_b, cam)
        return jnp.sum(ok * weight)

    cands_r = jnp.stack([r1, r1, r2, r2])
    cands_t = jnp.stack([t, -t, t, -t])
    scores = jax.vmap(score)(cands_r, cands_t)
    best = jnp.argmax(scores)
    return cands_r[best], cands_t[best]


def _sampson_d2(e: jnp.ndarray, xa: jnp.ndarray, xb: jnp.ndarray) -> jnp.ndarray:
    """Squared Sampson epipolar distance in normalized coordinates."""
    exa = xa @ e.T  # [N, 3] = E xa
    etxb = xb @ e  # [N, 3] = Eᵀ xb
    num = jnp.square(jnp.sum(xb * exa, axis=1))
    den = exa[:, 0] ** 2 + exa[:, 1] ** 2 + etxb[:, 0] ** 2 + etxb[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def _tangent_basis(t: jnp.ndarray) -> jnp.ndarray:
    """[3, 2] orthonormal basis of the plane orthogonal to unit vector t."""
    # Pick the axis least aligned with t to seed Gram-Schmidt (branch-free).
    seed = jnp.eye(3)[jnp.argmin(jnp.abs(t))]
    b1 = seed - t * jnp.dot(seed, t)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-12)
    b2 = jnp.cross(t, b1)
    return jnp.stack([b1, b2], axis=1)


def refine_relative_pose(
    rot: jnp.ndarray,
    trans: jnp.ndarray,
    uv_a: jnp.ndarray,
    uv_b: jnp.ndarray,
    weight: jnp.ndarray,
    cam: Pinhole,
    iterations: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gauss-Newton refinement of (R, t) on SO(3)×S² minimizing weighted
    Sampson error.  The linear 8-point solution collapses toward identity for
    small-baseline pairs under pixel noise; this nonlinear polish restores
    accuracy (standard two-view practice, e.g. ORB-SLAM init)."""
    from .lie import hat, so3_exp

    xa = backproject(uv_a, cam)
    xb = backproject(uv_b, cam)

    def step(_, state):
        r, t = state
        basis = _tangent_basis(t)

        def residual(delta):
            r2 = so3_exp(delta[:3]) @ r
            t2 = t + basis @ delta[3:5]
            t2 = t2 / jnp.maximum(jnp.linalg.norm(t2), 1e-12)
            e = hat(t2) @ r2
            # Signed first-order (Sampson) residual — smooth at zero, unlike
            # sqrt(d²) whose derivative blows up on noiseless data.
            exa = xa @ e.T
            etxb = xb @ e
            den = (
                exa[:, 0] ** 2
                + exa[:, 1] ** 2
                + etxb[:, 0] ** 2
                + etxb[:, 1] ** 2
            )
            s = jnp.sum(xb * exa, axis=1) * jax.lax.rsqrt(den + 1e-18)
            # Huber clip (robustness to remaining outliers).
            sigma = 2.0 / cam.fx
            hub = jnp.minimum(1.0, sigma / jnp.maximum(jnp.abs(s), 1e-12))
            return s * jnp.sqrt(hub) * weight

        j = jax.jacfwd(residual)(jnp.zeros(5))  # [N, 5]
        r0 = residual(jnp.zeros(5))
        h = j.T @ j + 1e-9 * jnp.eye(5)
        delta = -jnp.linalg.solve(h, j.T @ r0)
        r_new = so3_exp(delta[:3]) @ r
        t_new = t + basis @ delta[3:5]
        t_new = t_new / jnp.maximum(jnp.linalg.norm(t_new), 1e-12)
        return r_new, t_new

    return jax.lax.fori_loop(0, iterations, step, (rot, trans))


def refine_relative_pose_reproj(
    rot: jnp.ndarray,
    trans: jnp.ndarray,
    uv_a: jnp.ndarray,
    uv_b: jnp.ndarray,
    weight: jnp.ndarray,
    cam: Pinhole,
    iterations: int = 15,
    sigma_px: float = 2.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Robust two-view bundle: refine (R, t∈S²) + per-point log-depths by
    Cauchy-weighted REPROJECTION error (view B; view A is exact by the
    inverse-depth parameterization along the A rays).

    Why not stop at the Sampson polish: on low-parallax pairs the epipolar
    cost surface is nearly degenerate — measured on the synthetic arc, a
    pose 12° wrong held every correspondence within a 6 px Sampson gate,
    and even refinement STARTED AT GROUND TRUTH walked 20° away.  The
    reprojection objective keeps the depth dimension and has a single
    sharp minimum there (both the wrong linear init and ground truth
    converged to 0.5° once the one gross outlier was down-weighted).

    The normal system is [[A (5×5), B], [Bᵀ, D (diagonal per-point)]];
    depths are Schur-eliminated in closed form, so each LM iteration is
    O(N·25).  Fixed trip count; jittable; masked by ``weight``.
    """
    from .lie import so3_exp

    n = uv_a.shape[0]
    xa = backproject(uv_a, cam)                     # [N, 3] rays in A (z=1)
    s2 = sigma_px * sigma_px

    pts, _ = triangulate(jnp.eye(3), jnp.zeros(3), rot, trans, uv_a, uv_b, cam)
    logz0 = jnp.log(jnp.clip(pts[:, 2], 1e-2, 1e4))

    def residuals(r, t, logz):
        z = jnp.exp(jnp.clip(logz, -6.0, 10.0))
        pc = (xa * z[:, None]) @ r.T + t            # points in cam B
        zz = jnp.maximum(pc[:, 2], 1e-6)
        u = cam.fx * pc[:, 0] / zz + cam.cx
        v = cam.fy * pc[:, 1] / zz + cam.cy
        return jnp.stack([u, v], 1) - uv_b          # [N, 2]

    def robust_cost(r, t, logz):
        res = residuals(r, t, logz)
        e2 = jnp.sum(res * res, 1)
        return jnp.sum(weight * s2 * jnp.log1p(e2 / s2))

    def step(state):
        r, t, logz, lam, cost = state
        basis = _tangent_basis(t)                   # [3, 2]

        def res_param(dp, dz):
            r2 = so3_exp(dp[:3]) @ r
            t2 = t + basis @ dp[3:5]
            t2 = t2 / jnp.maximum(jnp.linalg.norm(t2), 1e-12)
            return residuals(r2, t2, logz + dz)

        # Jacobians: pose block [N, 2, 5] via jacfwd on the 5-vector, depth
        # block [N, 2] via jvp along each point's own dz (diagonal).
        jp = jax.jacfwd(lambda dp: res_param(dp, jnp.zeros(n)))(jnp.zeros(5))
        jz = jax.jvp(lambda dz: res_param(jnp.zeros(5), dz),
                     (jnp.zeros(n),), (jnp.ones(n),))[1]  # [N, 2]
        r0 = res_param(jnp.zeros(5), jnp.zeros(n))
        e2 = jnp.sum(r0 * r0, 1)
        w = weight / (1.0 + e2 / s2)                # Cauchy IRLS weights

        # Schur-eliminate the diagonal depth block.
        A = jnp.einsum("nki,n,nkj->ij", jp, w, jp)          # [5, 5]
        Bv = jnp.einsum("nki,n,nk->ni", jp, w, jz)          # [N, 5]
        Dv = jnp.einsum("nk,n,nk->n", jz, w, jz) + lam + 1e-8   # [N]
        ga = jnp.einsum("nki,n,nk->i", jp, w, r0)           # [5]
        gz = jnp.einsum("nk,n,nk->n", jz, w, r0)            # [N]
        S = A + lam * jnp.eye(5) - jnp.einsum("ni,n,nj->ij", Bv, 1.0 / Dv, Bv)
        rhs = -(ga - jnp.einsum("ni,n,n->i", Bv, 1.0 / Dv, gz))
        dp = jnp.linalg.solve(S, rhs)
        dz = -(gz + Bv @ dp) / Dv

        r2 = so3_exp(dp[:3]) @ r
        t2 = t + basis @ dp[3:5]
        t2 = t2 / jnp.maximum(jnp.linalg.norm(t2), 1e-12)
        lz2 = logz + dz
        c2 = robust_cost(r2, t2, lz2)
        ok = jnp.isfinite(c2) & (c2 < cost)
        return (
            jnp.where(ok, r2, r),
            jnp.where(ok, t2, t),
            jnp.where(ok, lz2, logz),
            jnp.clip(jnp.where(ok, lam * 0.3, lam * 5.0), 1e-8, 1e6),
            jnp.where(ok, c2, cost),
        )

    state = (rot, trans, logz0, jnp.float32(1e-3), robust_cost(rot, trans, logz0))
    state = jax.lax.fori_loop(0, iterations, lambda _, s: step(s), state)
    return state[0], state[1]


@functools.partial(
    jax.jit, static_argnames=("iterations", "ransac_rounds", "cheirality_gate")
)
def two_view_init(
    uv_a: jnp.ndarray,
    uv_b: jnp.ndarray,
    valid: jnp.ndarray,
    cam: Pinhole,
    iterations: int = 3,
    ransac_rounds: int = 64,
    seed: int = 0,
    cheirality_gate: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two-view relative pose + structure with RANSAC outlier rejection.

    TPU-native RANSAC: a FIXED number of 8-point hypotheses are solved in one
    vmap (each a 9×9 eigendecomposition — trivially parallel), scored by
    Sampson-inlier count, and the winner's inlier set seeds a reweighted
    (Cauchy IRLS) 8-point refit.  No data-dependent trip counts anywhere.
    The linear estimate is then polished by Gauss-Newton on SO(3)×S²
    (`refine_relative_pose`), which is what actually nails small-baseline
    pairs.  A pure-IRLS loop (no hypothesis sampling) was tried first and
    cannot escape a gross-outlier-corrupted initial least-squares fit.

    Returns (rot_b, trans_b, points [N, 3], inlier [N] bool).
    """
    n = uv_a.shape[0]
    xa = backproject(uv_a, cam)
    xb = backproject(uv_b, cam)
    sigma2 = (2.0 / cam.fx) ** 2  # ~2px kernel width in normalized coords
    tau = 9.0 * sigma2  # RANSAC inlier gate (~6px)

    # --- hypothesis sampling: gumbel top-8 over valid slots (w/o replacement)
    logits = jnp.where(valid, 0.0, -jnp.inf)
    keys = jax.random.split(jax.random.PRNGKey(seed), ransac_rounds)

    def one_round(key):
        g = jax.random.gumbel(key, (n,)) + logits
        sel = jnp.argsort(-g)[:8]
        w = jnp.zeros(n).at[sel].set(1.0)
        e = essential_from_matches(uv_a, uv_b, w, cam)
        d2 = _sampson_d2(e, xa, xb)
        # MLESAC truncated-quadratic score, NOT an inlier count: on
        # low-parallax pairs the epipolar cost is soft enough that a pose
        # 10°+ wrong can hold every match inside the gate — including a
        # gross wrong match that happens to lie near an epipolar line —
        # and a count then PREFERS the wrong pose (26 sloppy inliers beat
        # 25 tight ones; observed on the synthetic arc, where it sent the
        # whole trajectory into a wrong basin).  The truncated quadratic
        # rewards tight consensus and is standard RANSAC practice.
        score = jnp.sum(jnp.where(valid, jnp.maximum(0.0, 1.0 - d2 / tau), 0.0))
        return score, d2

    scores, d2_all = jax.lax.map(one_round, keys, batch_size=ransac_rounds)

    # --- refine the TOP-K hypotheses, not just the winner ----------------
    # Epipolar scoring alone cannot reliably rank basins on low-parallax
    # pairs (see the MLESAC note above — and even MLESAC mis-ranks when a
    # wrong match sits near an epipolar line of a wrong pose).  So: carry
    # the K best consensus sets through the full chain (IRLS essential →
    # decomposition → Sampson GN → robust REPROJECTION bundle), then pick
    # by the robust reprojection cost over ALL valid matches — the one
    # objective measured to separate right from wrong basins sharply
    # (2.1 vs ~900 on the synthetic arc).
    K = 8
    sigma2_px = 4.0  # (2 px)² Cauchy scale of the selection objective

    top = jnp.argsort(-scores)[:K]

    def refine_candidate(round_idx):
        weight = (valid & (d2_all[round_idx] < tau)).astype(jnp.float32)

        def body(_, weight):
            e = essential_from_matches(uv_a, uv_b, weight, cam)
            d2 = _sampson_d2(e, xa, xb)
            return jnp.where(
                valid & (d2 < 4.0 * tau), 1.0 / (1.0 + d2 / sigma2), 0.0
            )

        weight = jax.lax.fori_loop(0, iterations, body, weight)
        e = essential_from_matches(uv_a, uv_b, weight, cam)
        r_c, t_c = decompose_essential(e, uv_a, uv_b, weight, cam)
        r_c, t_c = refine_relative_pose(r_c, t_c, uv_a, uv_b, weight, cam)
        r_c, t_c = refine_relative_pose_reproj(r_c, t_c, uv_a, uv_b, weight, cam)
        # Common scoring objective: robust (Cauchy) reprojection cost over
        # every valid match with per-candidate refit depths.
        pts_c, _ = triangulate(
            jnp.eye(3), jnp.zeros(3), r_c, t_c, uv_a, uv_b, cam
        )
        pc = pts_c @ r_c.T + t_c
        zz = jnp.maximum(pc[:, 2], 1e-6)
        res = jnp.stack(
            [cam.fx * pc[:, 0] / zz + cam.cx, cam.fy * pc[:, 1] / zz + cam.cy], 1
        ) - uv_b
        e2 = jnp.sum(res * res, 1)
        score = jnp.sum(jnp.where(valid, sigma2_px * jnp.log1p(e2 / sigma2_px), 0.0))
        return r_c, t_c, score

    # NB deliberately a SEQUENTIAL lax.map: batch_size=K (vmap) was tried
    # for latency and changes eigh/svd numerics enough to flip fragile
    # basin choices (the 16-frame arc regression), while under the fused
    # VO's chunk vmap the sequentiality is already amortized across chunks
    # — measured zero on-chip speedup.
    cand_r, cand_t, cand_cost = jax.lax.map(refine_candidate, top)
    best = jnp.argmin(cand_cost)
    rot_b, trans_b = cand_r[best], cand_t[best]
    # Re-derive weights/inliers against the chosen pose.
    from .lie import hat as _hat

    e_ref = _hat(trans_b) @ rot_b
    d2 = _sampson_d2(e_ref, xa, xb)
    pts, cheir = triangulate(
        jnp.eye(3), jnp.zeros(3), rot_b, trans_b, uv_a, uv_b, cam
    )
    inlier = valid & (d2 < 9.0 * sigma2)
    if cheirality_gate:
        # Meaningful only with real parallax: on near-zero-baseline pairs the
        # triangulated depth SIGN is noise, and gating on it throws away half
        # the true matches.  Callers filtering adjacent-frame matches should
        # pass cheirality_gate=False.
        inlier = inlier & cheir
    return rot_b, trans_b, pts, inlier


@functools.partial(jax.jit, static_argnames=("ransac_rounds",))
def epipolar_inlier_gate(
    uv_a: jnp.ndarray,
    uv_b: jnp.ndarray,
    valid: jnp.ndarray,
    cam: Pinhole,
    ransac_rounds: int = 48,
    seed: int = 0,
) -> jnp.ndarray:
    """Cheap epipolar RANSAC inlier mask (no pose recovery).

    `two_view_init` spends ~95% of its time in the K-candidate refinement
    chain (Sampson GN + robust reprojection bundles) needed to recover an
    accurate POSE — but match gating only needs the best hypothesis's
    Sampson-inlier set.  This gate runs the same gumbel-top-8 hypothesis
    sampling and MLESAC scoring, then one IRLS refit of the winner, and
    returns its inlier mask: ~50x cheaper under vmap over hundreds of frame
    pairs (the fused VO's per-offset gating dispatches).

    Batched over leading axes by vmap at the call site; fixed shapes.
    """
    n = uv_a.shape[0]
    xa = backproject(uv_a, cam)
    xb = backproject(uv_b, cam)
    sigma2 = (2.0 / cam.fx) ** 2
    tau = 9.0 * sigma2

    logits = jnp.where(valid, 0.0, -jnp.inf)
    keys = jax.random.split(jax.random.PRNGKey(seed), ransac_rounds)

    def one_round(key):
        g = jax.random.gumbel(key, (n,)) + logits
        sel = jnp.argsort(-g)[:8]
        w = jnp.zeros(n).at[sel].set(1.0)
        e = essential_from_matches(uv_a, uv_b, w, cam)
        d2 = _sampson_d2(e, xa, xb)
        score = jnp.sum(jnp.where(valid, jnp.maximum(0.0, 1.0 - d2 / tau), 0.0))
        return score, d2

    scores, d2_all = jax.lax.map(one_round, keys, batch_size=ransac_rounds)
    best = jnp.argmax(scores)
    weight = (valid & (d2_all[best] < tau)).astype(jnp.float32)
    # One reweighted refit sharpens the consensus set.
    e = essential_from_matches(uv_a, uv_b, weight, cam)
    d2 = _sampson_d2(e, xa, xb)
    weight = jnp.where(valid & (d2 < 4.0 * tau), 1.0 / (1.0 + d2 / sigma2), 0.0)
    e = essential_from_matches(uv_a, uv_b, weight, cam)
    d2 = _sampson_d2(e, xa, xb)
    return valid & (d2 < tau)


@jax.jit
def pnp_refine(
    rot: jnp.ndarray,
    trans: jnp.ndarray,
    points: jnp.ndarray,
    uv: jnp.ndarray,
    weight: jnp.ndarray,
    cam: Pinhole,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One Gauss-Newton step of pose-only refinement (motion-only BA).

    Used by the sequence driver to register each new frame against the map
    before full BA.  6-dof update on SE(3); weight masks invalid points.
    """
    from . import lie

    def residuals(delta):
        r = lie.so3_exp(delta[:3]) @ rot
        t = trans + delta[3:]
        pc = points @ r.T + t
        z = jnp.maximum(pc[:, 2], 1e-6)
        u = cam.fx * pc[:, 0] / z + cam.cx
        v = cam.fy * pc[:, 1] / z + cam.cy
        return (jnp.stack([u, v], axis=1) - uv) * weight[:, None]

    j = jax.jacfwd(residuals)(jnp.zeros(6))  # [N, 2, 6]
    r0 = residuals(jnp.zeros(6))
    jf = j.reshape(-1, 6)
    rf = r0.reshape(-1)
    h = jf.T @ jf + 1e-6 * jnp.eye(6)
    delta = -jnp.linalg.solve(h, jf.T @ rf)
    from . import lie as _lie

    return _lie.so3_exp(delta[:3]) @ rot, trans + delta[3:]


@functools.partial(jax.jit, static_argnames=("iters",))
def pnp_solve(
    rot0: jnp.ndarray,
    trans0: jnp.ndarray,
    points: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    cam: Pinhole,
    *,
    iters: int = 20,
    gate_px: float = 3.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Robust pose-only solve (motion-only BA): damped LM + Cauchy IRLS.

    A single unweighted Gauss-Newton step from the motion prior lets ONE
    gross-outlier observation yank the pose into the small-motion
    rotation/translation-ambiguity valley, after which local IRLS cannot
    recover (observed on the synthetic VO arc: a 75 px mismatch among 16
    points collapsed the whole trajectory).  So:

    1. gate against the PRIOR's residuals — anything beyond
       max(10 px, 3x the prior median) is excluded outright (the motion
       prior is the only consensus available before the solve);
    2. run ``iters`` Levenberg iterations; each evaluates Cauchy IRLS
       weights at scale ``gate_px``, solves the damped 6x6 normal system,
       and accepts/rejects on the robust cost (reject raises lambda).

    Fixed-shape and jittable: pad ``points``/``uv`` and mask via ``valid``.
    """
    from .camera import projection_jacobian
    from .lie import hat, so3_exp

    n = uv.shape[0]
    vf = valid.astype(jnp.float32)

    def errs(rot, trans):
        pc = points @ rot.T + trans
        z = jnp.maximum(pc[:, 2], 1e-6)
        u = cam.fx * pc[:, 0] / z + cam.cx
        v = cam.fy * pc[:, 1] / z + cam.cy
        r = jnp.stack([u, v], 1) - uv
        return r, jnp.sqrt(jnp.sum(r * r, 1) + 1e-12)

    _, e0 = errs(rot0, trans0)
    srt = jnp.sort(jnp.where(valid, e0, jnp.inf))
    cnt = jnp.sum(valid).astype(jnp.int32)
    med = jnp.where(cnt > 0, srt[jnp.clip(cnt // 2, 0, n - 1)], 0.0)
    keep = vf * (e0 < jnp.maximum(10.0, 3.0 * med)).astype(jnp.float32)

    s2 = gate_px * gate_px

    def rho_cost(en):
        return jnp.sum(keep * s2 * jnp.log1p(en * en / s2))

    def lm_step(rot, trans, lam):
        r, en = errs(rot, trans)
        w = keep / (1.0 + en * en / s2)
        pc = points @ rot.T + trans
        jpi = projection_jacobian(pc, cam)                       # [N, 2, 3]
        jc = jnp.concatenate([-jpi @ hat(pc), jpi], axis=-1)     # [N, 2, 6]
        jw = jc * w[:, None, None]
        h = jnp.einsum("nki,nkj->ij", jw, jc)
        g = jnp.einsum("nki,nk->i", jw, r)
        h = h + lam * jnp.diag(jnp.diagonal(h)) + 1e-6 * jnp.eye(6)
        delta = -jnp.linalg.solve(h, g)
        return so3_exp(delta[:3]) @ rot, trans + delta[3:]

    def body(_, st):
        rot, trans, lam, cost = st
        rot2, trans2 = lm_step(rot, trans, lam)
        _, en2 = errs(rot2, trans2)
        c2 = rho_cost(en2)
        ok = jnp.isfinite(c2) & (c2 < cost)
        rot = jnp.where(ok, rot2, rot)
        trans = jnp.where(ok, trans2, trans)
        lam = jnp.clip(jnp.where(ok, lam * 0.3, lam * 5.0), 1e-8, 1e4)
        cost = jnp.where(ok, c2, cost)
        return rot, trans, lam, cost

    _, e_init = errs(rot0, trans0)
    st = (rot0, trans0, jnp.float32(1e-3), rho_cost(e_init))
    rot, trans, _, _ = jax.lax.fori_loop(0, iters, body, st)
    return rot, trans

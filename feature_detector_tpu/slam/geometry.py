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
        _, _, vt = jnp.linalg.svd(a)
        x = vt[-1]
        return x[:3] / jnp.where(jnp.abs(x[3]) < 1e-12, 1e-12, x[3])

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
        score = jnp.sum(valid & (d2 < tau))
        return score, d2

    scores, d2_all = jax.lax.map(one_round, keys, batch_size=ransac_rounds)
    best_round = jnp.argmax(scores)
    weight = (valid & (d2_all[best_round] < tau)).astype(jnp.float32)

    # --- IRLS polish of the winning consensus set (Cauchy kernel) ---
    def body(_, weight):
        e = essential_from_matches(uv_a, uv_b, weight, cam)
        d2 = _sampson_d2(e, xa, xb)
        return jnp.where(
            valid & (d2 < 4.0 * tau), 1.0 / (1.0 + d2 / sigma2), 0.0
        )

    weight = jax.lax.fori_loop(0, iterations, body, weight)
    e = essential_from_matches(uv_a, uv_b, weight, cam)
    rot_b, trans_b = decompose_essential(e, uv_a, uv_b, weight, cam)
    rot_b, trans_b = refine_relative_pose(
        rot_b, trans_b, uv_a, uv_b, weight, cam
    )
    # Re-derive weights/inliers against the refined pose.
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

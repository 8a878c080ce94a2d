"""Track-quality diagnosis: triangulate each track at GT poses; clean tracks
(a physical patch corner) give sub-pixel residuals; merged/wrong tracks don't.
Then measure how much the bad fraction pulls GT-init BA."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from feature_detector_tpu.slam import evaluate
from feature_detector_tpu.slam.ba import ba_solve, BAProblem
from feature_detector_tpu.slam.sequence import make_synthetic_sequence, run_visual_odometry
from feature_detector_tpu.core.config import BAOptions


def ate_of(rots_np, trans_np, gt_pos):
    centers = -np.einsum("fji,fj->fi", rots_np, trans_np)
    return float(evaluate.ate_rmse(jnp.asarray(centers), jnp.asarray(gt_pos), with_scale=True))


def tri_dlt(Rs, ts, uvs, cam):
    """DLT triangulation of one track at given poses; returns point + residuals."""
    A = []
    for (R, t, uv) in zip(Rs, ts, uvs):
        P = np.hstack([R, t[:, None]])
        P = np.diag([cam.fx, cam.fy, 1.0]) @ P
        P[0] += cam.cx * P[2]
        P[1] += cam.cy * P[2]
        A.append(uv[0] * P[2] - P[0])
        A.append(uv[1] * P[2] - P[1])
    A = np.stack(A)
    _, _, vt = np.linalg.svd(np.hstack([A[:, :3], A[:, 3:]]))
    x = vt[-1]
    p = x[:3] / (x[3] if abs(x[3]) > 1e-12 else 1e-12)
    res = []
    for (R, t, uv) in zip(Rs, ts, uvs):
        pc = R @ p + t
        z = max(pc[2], 1e-9)
        res.append(np.hypot(cam.fx * pc[0] / z + cam.cx - uv[0],
                            cam.fy * pc[1] / z + cam.cy - uv[1]))
    return p, np.asarray(res)


for seed in (23, 7, 11):
    seq = make_synthetic_sequence(n_frames=5, n_landmarks=140, seed=seed)
    res = run_visual_odometry(seq.images, seq.cam)
    prob = res.problem
    oc, ouv = np.asarray(prob.obs_cam), np.asarray(prob.obs_uv)
    L, D = oc.shape
    max_res = np.zeros(L)
    nobs = np.zeros(L, int)
    for l in range(L):
        m = oc[l] >= 0
        fs = oc[l][m]
        nobs[l] = m.sum()
        p, r = tri_dlt(seq.rotations_wc[fs], seq.translations_wc[fs], ouv[l][m], seq.cam)
        max_res[l] = r.max()
    clean = max_res < 1.0
    print(f"seed={seed}: L={L} clean(max<1px)={clean.sum()} "
          f"dirty={np.sort(max_res[~clean])[:8].round(2)}... n_dirty={(~clean).sum()}")
    print(f"  obs-count dist of dirty tracks: {np.bincount(nobs[~clean], minlength=7)}")
    print(f"  max_res dist: med={np.median(max_res):.3f} p90={np.percentile(max_res,90):.2f}")
    # GT-init BA restricted to clean tracks:
    opts = BAOptions(max_iterations=12, huber_delta=2.0, gate_px=3.0, gate_rounds=2)
    pc_ = BAProblem(
        rot=jnp.asarray(seq.rotations_wc), trans=jnp.asarray(seq.translations_wc),
        points=prob.points[clean], obs_cam=prob.obs_cam[clean], obs_uv=prob.obs_uv[clean],
    )
    s1 = ba_solve(pc_, seq.cam, opts)
    print(f"  GT-init clean-only BA ATE={ate_of(np.asarray(s1.rot), np.asarray(s1.trans), seq.trajectory.positions):.4f}")
    # VO-init BA restricted to clean tracks:
    pv = BAProblem(
        rot=prob.rot, trans=prob.trans,
        points=prob.points[clean], obs_cam=prob.obs_cam[clean], obs_uv=prob.obs_uv[clean],
    )
    s2 = ba_solve(pv, seq.cam, opts)
    print(f"  VO-init clean-only BA ATE={ate_of(np.asarray(s2.rot), np.asarray(s2.trans), seq.trajectory.positions):.4f}")

"""Debug harness for the VO pipeline ATE failure: per-frame pose error,
BA residual statistics, and a GT-initialized BA control experiment."""
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
from feature_detector_tpu.slam.ba import ba_solve
from feature_detector_tpu.slam.sequence import make_synthetic_sequence, run_visual_odometry
from feature_detector_tpu.core.config import BAOptions


def resid_stats(prob, cam, tag):
    rot, trans, pts = np.asarray(prob.rot), np.asarray(prob.trans), np.asarray(prob.points)
    oc, ouv = np.asarray(prob.obs_cam), np.asarray(prob.obs_uv)
    valid = oc >= 0
    ci = np.clip(oc, 0, len(rot) - 1)
    pc = np.einsum("ldij,lj->ldi", rot[ci], pts) + trans[ci]
    z = np.maximum(pc[..., 2], 1e-6)
    u = cam.fx * pc[..., 0] / z + cam.cx
    v = cam.fy * pc[..., 1] / z + cam.cy
    e = np.hypot(u - ouv[..., 0], v - ouv[..., 1])
    ev = e[valid]
    print(f"  {tag}: obs={valid.sum()} med={np.median(ev):.3f}px mean={ev.mean():.3f} "
          f"p90={np.percentile(ev,90):.2f} max={ev.max():.1f} frac>3px={(ev>3).mean():.3f}")
    return e, valid


def ate_of(rots_np, trans_np, gt_pos):
    centers = -np.einsum("fji,fj->fi", rots_np, trans_np)
    return float(evaluate.ate_rmse(jnp.asarray(centers), jnp.asarray(gt_pos), with_scale=True))


for seed in (7, 11, 23):
    seq = make_synthetic_sequence(n_frames=5, n_landmarks=140, seed=seed)
    res = run_visual_odometry(seq.images, seq.cam)
    ate = ate_of(res.rotations_wc, res.translations_wc, seq.trajectory.positions)
    print(f"seed={seed} ATE={ate:.4f} tracks={res.num_tracks} pts={len(res.points)}")
    cam = seq.cam
    resid_stats(res.problem, cam, "pre-BA ")
    resid_stats(res.solved, cam, "post-BA")

    # Control: same observations, GT camera poses, points triangulated from GT.
    prob = res.problem
    gt_prob = prob._replace(
        rot=jnp.asarray(seq.rotations_wc), trans=jnp.asarray(seq.translations_wc)
    )
    opts = BAOptions(max_iterations=12, huber_delta=2.0, gate_px=3.0, gate_rounds=2)
    solved_gt = ba_solve(gt_prob, cam, opts)
    e, valid = resid_stats(solved_gt, cam, "GT-init post-BA")
    ate_gt = ate_of(np.asarray(solved_gt.rot), np.asarray(solved_gt.trans), seq.trajectory.positions)
    print(f"  GT-init BA ATE={ate_gt:.4f}")
    # And: solve the VO problem with many more iterations from the VO init.
    opts2 = BAOptions(max_iterations=40, huber_delta=2.0, gate_px=3.0, gate_rounds=3)
    solved2 = ba_solve(prob, cam, opts2)
    resid_stats(solved2, cam, "VO-init 40it")
    ate2 = ate_of(np.asarray(solved2.rot), np.asarray(solved2.trans), seq.trajectory.positions)
    print(f"  VO-init 40-iter BA ATE={ate2:.4f}")

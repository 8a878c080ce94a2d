"""Seed-7 deep dive: per-frame error, track length histogram, and what breaks
the basin — try alternating BA/re-association rounds and report."""
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
from feature_detector_tpu.slam.sequence import make_synthetic_sequence, run_visual_odometry

seq = make_synthetic_sequence(n_frames=5, n_landmarks=140, seed=7)
res = run_visual_odometry(seq.images, seq.cam)
prob = res.solved
oc = np.asarray(prob.obs_cam)
nobs = (oc >= 0).sum(1)
print("track length hist:", np.bincount(nobs, minlength=7))
a = evaluate.umeyama_alignment(
    jnp.asarray(res.trajectory.positions),
    jnp.asarray(seq.trajectory.positions), with_scale=True,
)
est_al = float(a.scale) * res.trajectory.positions @ np.asarray(a.rotation).T + np.asarray(a.translation)
err = np.linalg.norm(est_al - seq.trajectory.positions, axis=1)
print("per-frame err:", err.round(4))
print("est:", est_al.round(3))
print("gt :", seq.trajectory.positions.round(3))
# obs per frame
cnt = np.bincount(oc[oc >= 0], minlength=5)
print("obs per frame:", cnt)

"""Scaling benchmark: DP front-end + landmark-sharded BA at 1 vs N devices.

Measures the multi-chip code paths (parallel/frontend.py `shard_map`-style DP,
slam/ba.py psum-reduced Schur BA) on a FORCED N-virtual-device CPU mesh — the
no-hardware multi-chip harness (SURVEY.md §4).

Honest efficiency on shared cores: virtual CPU devices all share the host's
physical cores, so the 1-device baseline must be pinned to ONE core and the
N-device run to N cores (`taskset`), with N = min(8, nproc).  Efficiency =
fps_N / (N * fps_1core).  This validates the sharding mechanism + collective
overhead; ICI-bandwidth scaling needs a real pod slice (same code path).

Prints ONE JSON line; invoked standalone or by bench.py as a subprocess.
Worker roles (internal): --role fe|ba --devices K, pinned by the parent.
"""

import argparse
import json
import os
import subprocess
import sys
import time


def _worker(role: str, n_dev: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_dev}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from feature_detector_tpu.core.config import BAOptions, BriefOptions, DetectorOptions
    from feature_detector_tpu.io.images import load_gray
    from feature_detector_tpu.parallel.frontend import make_batched_frontend
    from feature_detector_tpu.parallel.mesh import make_mesh
    from feature_detector_tpu.slam.ba import ba_solve, make_distributed_ba
    from tests.test_slam import CAM, perturb, synthetic_ba

    mesh = make_mesh((n_dev,), ("data",))

    if role == "fe":
        img = load_gray("/root/reference/examples/image.png")
        opts = DetectorOptions(min_feature_distance=20, min_valid_response=10.0, max_features=256)
        fe = make_batched_frontend(mesh, "fast", 200, opts, brief_opts=BriefOptions())
        batch = n_dev * 2
        frames = jnp.asarray(np.stack([np.roll(img, i, 0) for i in range(batch)]))
        jax.block_until_ready(fe(frames))
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fe(frames)
        jax.block_until_ready(out)
        value = batch * iters / (time.perf_counter() - t0)  # frames/s
    else:
        rng = np.random.default_rng(0)
        # WEAK scaling: the production regime is "map grows with the fleet" —
        # per-device landmark count stays fixed (8192/dev) and efficiency is
        # t_1(L) / t_N(N*L).  (Strong scaling is meaningless for this solver
        # on CPU: the LM loop's small-kernel dispatch chain doesn't
        # multithread, so even the single-device program cannot use a second
        # core — measured 6.35/s on 1 core vs 5.4/s on 2.)
        # 16k landmarks per device: per-iteration LOCAL work must dominate
        # the 2 collective rendezvous per LM iteration for weak scaling to
        # be observable at all on a shared-core virtual mesh (a collectives
        # microbenchmark with ideal embarrassingly-parallel local work tops
        # out at ~0.64 efficiency on this 2-core host — see PERF.md).
        gt = synthetic_ba(rng, n_cams=8, n_pts=16384 * n_dev, deg=4)
        noisy = perturb(gt, rng)
        ba_opts = BAOptions(max_iterations=10, damping=1e-6, huber_delta=1e9)
        solver = (
            (lambda p: ba_solve(p, CAM, ba_opts))
            if n_dev == 1
            else make_distributed_ba(mesh, CAM, ba_opts)
        )
        jax.block_until_ready(solver(noisy).points)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = solver(noisy)
        jax.block_until_ready(out.points)
        value = iters / (time.perf_counter() - t0)  # solves/s
    print(json.dumps({"value": value}))


def _spawn(role: str, n_dev: int, cores: str) -> float:
    cmd = ["taskset", "-c", cores, sys.executable, os.path.abspath(__file__),
           "--role", role, "--devices", str(n_dev)]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=900)
    if out.returncode != 0:
        raise RuntimeError(f"{role}@{n_dev} failed: {out.stderr[-500:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])["value"]


def main():
    n = min(8, os.cpu_count() or 1)
    cores_n = ",".join(str(i) for i in range(n))
    fe1 = _spawn("fe", 1, "0")
    fen = _spawn("fe", n, cores_n)
    ba1 = _spawn("ba", 1, "0")
    ban = _spawn("ba", n, cores_n)
    print(json.dumps({
        "devices": n,
        "frontend_fps_1dev_1core": round(fe1, 2),
        "frontend_fps_Ndev_Ncore": round(fen, 2),
        "frontend_scaling_efficiency": round(fen / (n * fe1), 3),
        "ba_solves_s_1dev_8k_landmarks": round(ba1, 2),
        "ba_solves_s_Ndev_8k_per_dev": round(ban, 2),
        "ba_weak_scaling_efficiency": round(ban / ba1, 3),
    }))


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", choices=["fe", "ba"], default=None)
    ap.add_argument("--devices", type=int, default=1)
    args = ap.parse_args()
    if args.role:
        _worker(args.role, args.devices)
    else:
        main()

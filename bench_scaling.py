"""Scaling benchmark: DP front-end + landmark-sharded BA + camera-sharded BA
at 1 vs N devices, with the harness's own collective-rendezvous ceiling.

Measures the multi-chip code paths (parallel/frontend.py `shard_map`-style DP,
slam/ba.py psum-reduced Schur BA, camera-axis reduce-scatter + distributed CG)
on a FORCED N-virtual-device CPU mesh — the no-hardware multi-chip harness
(SURVEY.md §4).

Honest efficiency on shared cores: virtual CPU devices all share the host's
physical cores, so the 1-device baseline is pinned to ONE core and the
N-device run to N cores (`taskset`), with N = min(8, nproc).  Efficiency =
rate_N / rate_1 at fixed per-device load (weak scaling).

The CEILING row calibrates the harness itself (VERDICT r4 weak #3): ideal
embarrassingly-parallel local work plus 10 tiny psums per iteration — the
best any per-iteration-collective solver can possibly scale on this host.
BA efficiencies should be read against that ceiling, not against 1.0; on
real ICI the collective:compute ratio is ~400x more favorable (PERF.md).

Measurement protocol (VERDICT r4 weak #3a): every role runs its solve loop
in BLOCKS and reports the min/median block rate, so run-to-run spread is in
the JSON where the driver can audit it.

Prints ONE JSON line; invoked standalone or by bench.py as a subprocess.
Worker roles (internal): --role fe|ba|camba|ceil --devices K.
"""

import argparse
import json
import os
import subprocess
import sys
import time


def _block_rates(fn, ready, unit_per_call: float, blocks: int, calls_per_block: int):
    """Rate (units/s) per timed block; fn() dispatches one call."""
    ready(fn())  # warm-up / compile
    rates = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        out = None
        for _ in range(calls_per_block):
            out = fn()
        ready(out)
        dt = time.perf_counter() - t0
        rates.append(unit_per_call * calls_per_block / dt)
    return rates


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
        rates = _block_rates(
            lambda: fe(frames), jax.block_until_ready,
            unit_per_call=batch, blocks=5, calls_per_block=3,
        )  # frames/s
    elif role == "ceil":
        # Harness-ceiling probe: ideal embarrassingly-parallel local work
        # (per-device matmul chain, zero cross-device data dependence) plus
        # 10 tiny psums per iteration — the rendezvous pattern of one
        # BA LM iteration, with NOTHING else that could limit scaling.
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        @jax.jit
        @functools_partial_shard_map(mesh)
        def step(x):
            for _ in range(10):
                x = jnp.tanh(x @ x)
                s = jax.lax.psum(jnp.sum(x[:2, :2]), "data")
                x = x + 1e-12 * s
            return x

        # Local-work size calibrated to one BA LM iteration (~35 ms on one
        # pinned core at 16k landmarks/dev) so the probe's rendezvous:compute
        # ratio matches the solver it calibrates.
        x = jnp.zeros((n_dev, 640, 640), jnp.float32) + 0.01
        rates = _block_rates(
            lambda: step(x), jax.block_until_ready,
            unit_per_call=1.0, blocks=5, calls_per_block=5,
        )  # iterations/s
    else:
        rng = np.random.default_rng(0)
        # WEAK scaling: per-device landmark count fixed (16k/dev), efficiency
        # = rate_N / rate_1.  (Strong scaling is meaningless for this solver
        # on CPU: the LM loop's small-kernel dispatch chain doesn't
        # multithread — measured 6.35/s on 1 core vs 5.4/s on 2.)
        if role == "ba":
            gt = synthetic_ba(rng, n_cams=8, n_pts=16384 * n_dev, deg=4)
            ba_opts = BAOptions(max_iterations=10, damping=1e-6, huber_delta=1e9)
            solver = (
                (lambda p: ba_solve(p, CAM, ba_opts))
                if n_dev == 1
                else make_distributed_ba(mesh, CAM, ba_opts)
            )
        else:  # camba: camera-axis partitioning (reduce-scatter + CG) at C=128
            gt = synthetic_ba(rng, n_cams=128, n_pts=4096 * n_dev, deg=4)
            ba_opts = BAOptions(max_iterations=10, damping=1e-6, huber_delta=1e9)
            solver = make_distributed_ba(
                mesh, CAM, ba_opts, camera_shard=True, cg_iterations=96
            )
        noisy = perturb(gt, rng)
        # ba: 50 solves (VERDICT r4 weak #3a: >=50 per role); camba's CG-heavy
        # solve is ~5x slower per call, so 10 solves keep the wall bounded.
        cpb = 10 if role == "ba" else 2
        rates = _block_rates(
            lambda: solver(noisy),
            lambda out: jax.block_until_ready(out.points),
            unit_per_call=1.0, blocks=5, calls_per_block=cpb,
        )  # solves/s
    print(json.dumps({"rates": rates}))


def functools_partial_shard_map(mesh):
    """shard_map decorator over the data axis (module-level helper so the
    ceiling probe reads cleanly above)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def deco(f):
        return shard_map(
            f, mesh=mesh, in_specs=(P("data"),), out_specs=P("data"),
            check_vma=False,
        )

    return deco


def _spawn(role: str, n_dev: int, cores: str):
    cmd = ["taskset", "-c", cores, sys.executable, os.path.abspath(__file__),
           "--role", role, "--devices", str(n_dev)]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=900)
    if out.returncode != 0:
        raise RuntimeError(f"{role}@{n_dev} failed: {out.stderr[-500:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])["rates"]


def _spawn_concurrent(role: str, n: int):
    """n INDEPENDENT 1-device workers pinned to distinct cores, running
    simultaneously: the zero-collective ceiling.  Per-process rate divided by
    the solo rate isolates what the shared memory system (not rendezvous)
    costs — BA's working set streams from RAM, which the compute-bound
    rendezvous probe cannot capture."""
    procs = []
    try:
        for i in range(n):
            cmd = ["taskset", "-c", str(i), sys.executable,
                   os.path.abspath(__file__), "--role", role, "--devices", "1"]
            procs.append(subprocess.Popen(
                cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True
            ))
        rates = []
        for p in procs:
            out, err = p.communicate(timeout=900)
            if p.returncode != 0:
                raise RuntimeError(f"concurrent {role} failed: {err[-500:]}")
            rates.extend(json.loads(out.strip().splitlines()[-1])["rates"])
        return rates
    finally:
        # Never leak pinned workers when a sibling fails or times out.
        for p in procs:
            if p.poll() is None:
                p.kill()


def _stats(rates):
    s = sorted(rates)
    return {
        "median": round(s[len(s) // 2], 3),
        "min": round(s[0], 3),
        "max": round(s[-1], 3),
    }


def main():
    n = min(8, os.cpu_count() or 1)
    cores_n = ",".join(str(i) for i in range(n))
    out = {"devices": n}
    med = {}
    for role in ("fe", "ba", "camba", "ceil"):
        r1 = _spawn(role, 1, "0")
        rn = _spawn(role, n, cores_n)
        med[role] = (sorted(r1)[len(r1) // 2], sorted(rn)[len(rn) // 2])
        out[f"{role}_1dev"] = _stats(r1)
        out[f"{role}_Ndev"] = _stats(rn)
    # Weak-scaling efficiencies on median block rates (per-device load fixed,
    # so efficiency = rate_N / rate_1 directly).
    out["frontend_scaling_efficiency"] = round(med["fe"][1] / (n * med["fe"][0]), 3)
    out["ba_weak_scaling_efficiency"] = round(med["ba"][1] / med["ba"][0], 3)
    out["camba_weak_scaling_efficiency"] = round(med["camba"][1] / med["camba"][0], 3)
    out["harness_ceiling_efficiency"] = round(med["ceil"][1] / med["ceil"][0], 3)
    # Zero-collective ceiling: n independent solo BA processes on n cores.
    try:
        conc = _spawn_concurrent("ba", n)
        conc_med = sorted(conc)[len(conc) // 2]
        out["ba_concurrent_solo"] = _stats(conc)
        out["ba_membw_ceiling_efficiency"] = round(conc_med / med["ba"][0], 3)
        ceiling = out["harness_ceiling_efficiency"] * out["ba_membw_ceiling_efficiency"]
    except Exception as e:  # pragma: no cover
        out["ba_membw_ceiling_error"] = str(e)[:200]
        ceiling = out["harness_ceiling_efficiency"]
    out["ba_efficiency_vs_ceiling"] = round(
        out["ba_weak_scaling_efficiency"] / max(ceiling, 1e-9), 3
    )
    # Convenience scalar keys (median rates; the workload is 16384
    # landmarks per device — keys renamed when the load doubled so r<=4
    # dashboards don't read a 2x-slower solve as a regression).
    out["frontend_fps_1dev_1core"] = round(med["fe"][0], 2)
    out["frontend_fps_Ndev_Ncore"] = round(med["fe"][1], 2)
    out["ba_solves_s_1dev_16k_landmarks"] = round(med["ba"][0], 2)
    out["ba_solves_s_Ndev_16k_per_dev"] = round(med["ba"][1], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", choices=["fe", "ba", "camba", "ceil"], default=None)
    ap.add_argument("--devices", type=int, default=1)
    args = ap.parse_args()
    if args.role:
        _worker(args.role, args.devices)
    else:
        main()

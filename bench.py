"""Headline benchmark: detect + describe + match frames/s per chip, plus the
full BASELINE.md metric table.

Pipeline under test (BASELINE.json metric: "keypoints/s/chip
(detect+describe+match)"): FAST corner detection (greedy mask-NMS, 200
features) + steered BRIEF (256 bit) + cross-checked Hamming matching on
752x480 frame pairs, batched across frames on one chip.

Baseline (BASELINE.md protocol): the same reference-semantics pipeline run
single-threaded on this machine's CPU (the native C++ engine at -O3, same
algorithms as the reference; NumPy-oracle fallback), measured at bench time.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "table"}.
The table mirrors the reference demos' measurement points
(test_feature_point_detector.cpp:35-41, test_feature_line_detector.cpp:103-106,
test_nn_feature_point_detector.cpp:47,66) plus keypoints/s/chip, per-stage
breakdown, and the 1-vs-N-device scaling run (bench_scaling.py subprocess on
the forced CPU mesh)."""

import json
import os
import sys
import time

import numpy as np


def cpu_baseline_seconds(img_a, img_b, reps=3):
    """Single-thread CPU reference pipeline per frame-pair: the native C++
    engine (same algorithms as the reference's -O3 C++; native/fd_host.cpp),
    falling back to the NumPy oracle if the library is unavailable."""
    from feature_detector_tpu.io import native

    if native.available():
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            uva, ra = native.fast_detect(img_a, 200, min_response=10.0, min_distance=20)
            uvb, rb = native.fast_detect(img_b, 200, min_response=10.0, min_distance=20)
            wa, va = native.brief_compute(img_a, uva)
            wb, vb = native.brief_compute(img_b, uvb)
            native.hamming_match(wa, va, wb, vb)
            best = min(best, time.perf_counter() - t0)
        return best

    from feature_detector_tpu.core.config import BriefOptions, DetectorOptions
    from feature_detector_tpu.oracle import brief as obrief
    from feature_detector_tpu.oracle import detectors as odet

    opts = DetectorOptions(min_feature_distance=20, min_valid_response=10.0, max_features=256)
    bopts = BriefOptions()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fa = odet.detect_good_features(img_a, 200, "fast", opts)
        fb = odet.detect_good_features(img_b, 200, "fast", opts)
        da, va = obrief.compute(img_a, fa, bopts)
        db, vb = obrief.compute(img_b, fb, bopts)
        pa, pb = obrief.pack_bits(da), obrief.pack_bits(db)
        d = obrief.hamming_distance(pa, pb)
        _ = d.argmin(axis=1)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    # HONEST-TIMING GUARD: under the axon remote-TPU client, dispatches are
    # fire-and-forget until the process performs its first device-to-host
    # copy — block_until_ready returns without waiting, so any timing taken
    # before that point is bogus (verified: a 4096x4096 f32 matmul "measured"
    # 0.03 ms pre-D2H vs 2.18 ms — the hardware-correct number — after).
    # One tiny D2H up front flips the client into the mode where async
    # dispatch pipelines properly AND block_until_ready really blocks.
    _ = np.asarray(jax.jit(lambda: jnp.zeros(8))()[0])

    from feature_detector_tpu.core.config import (
        BriefOptions,
        DetectorOptions,
        MatcherOptions,
    )
    from feature_detector_tpu.core.types import Features
    from feature_detector_tpu.frontend.detector import detect_good_features
    from feature_detector_tpu.io.images import load_gray
    from feature_detector_tpu.kernels.brief import brief_compute
    from feature_detector_tpu.match.hamming import match_hamming

    img_a = load_gray("/root/reference/examples/image.png")  # 752x480
    img_b = np.roll(img_a, 3, axis=1)

    # Capacity 200 = the demo's budget (test_feature_point_detector.cpp:87):
    # every per-feature stage (selection, BRIEF one-hot extraction) scales
    # with capacity, so padding to 256 was pure waste.  Batch 64 amortizes
    # the latency-bound pick loop and fixed dispatch overheads — throughput
    # is the metric (BASELINE.json: frames/s per chip).
    opts = DetectorOptions(min_feature_distance=20, min_valid_response=10.0, max_features=200)
    batch = 64
    frames_a = np.stack([np.roll(img_a, i, axis=0) for i in range(batch)])
    frames_b = np.stack([np.roll(img_b, i, axis=0) for i in range(batch)])

    # Staged jits (compile each stage once; one detect executable serves both
    # frame stacks — a single fused two-frame program compiles pathologically
    # slowly on the remote TPU toolchain).
    from feature_detector_tpu.frontend.detector import detect_good_features_batch

    det = jax.jit(lambda f: detect_good_features_batch(f, "fast", 200, opts))
    br = jax.jit(
        jax.vmap(lambda im, f: brief_compute(im, f.uv, f.valid, BriefOptions()))
    )
    mt = jax.jit(
        jax.vmap(
            lambda wa, va, wb, vb: match_hamming(wa, va, wb, vb, MatcherOptions())
        )
    )

    def pipeline(ja, jb):
        fa = det(ja)
        fb = det(jb)
        wa, va = br(ja, fa)
        wb, vb = br(jb, fb)
        return mt(wa, va, wb, vb)

    ja, jb = jnp.asarray(frames_a), jnp.asarray(frames_b)
    # Warm-up / compile, stage by stage (progress to stderr).
    t = time.perf_counter()
    fa = jax.block_until_ready(det(ja))
    print(f"# det compiled {time.perf_counter()-t:.1f}s", file=sys.stderr, flush=True)
    t = time.perf_counter()
    wa, va = jax.block_until_ready(br(ja, fa))
    print(f"# brief compiled {time.perf_counter()-t:.1f}s", file=sys.stderr, flush=True)
    t = time.perf_counter()
    out = jax.block_until_ready(mt(wa, va, wa, va))
    print(f"# match compiled {time.perf_counter()-t:.1f}s", file=sys.stderr, flush=True)
    out = pipeline(ja, jb)
    jax.block_until_ready(out)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(ja, jb)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    frames = 2 * batch * iters
    fps_chip = frames / dt / len(jax.devices())

    # Per-stage steady-state breakdown (ms per frame at batch=8).
    def stage_ms(fn, *args, iters=20):
        jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters / batch * 1e3

    stage = {
        "detect_ms_per_frame": round(stage_ms(det, ja), 4),
        "describe_ms_per_frame": round(stage_ms(br, ja, fa), 4),
        "match_ms_per_frame": round(stage_ms(mt, wa, va, wa, va), 4),
    }
    n_kp = float(np.asarray(fa.valid).sum(-1).mean())
    kps_chip = fps_chip * n_kp

    # Per-detector / LSD / NN latency rows (single frame, steady state) —
    # the reference demos' TickTock measurement points.
    table = dict(stage)
    table["keypoints_per_s_per_chip"] = round(kps_chip, 1)
    table["mean_keypoints_per_frame"] = round(n_kp, 1)
    for kind, resp in (("harris", 30.0), ("shi_tomasi", 40.0)):
        o = DetectorOptions(min_feature_distance=20, min_valid_response=resp, max_features=256)
        f1 = jax.jit(
            lambda im, o=o, kind=kind: detect_good_features(
                im, Features.empty(o.max_features), kind, 200, o
            )
        )
        im0 = jnp.asarray(img_a)
        jax.block_until_ready(f1(im0))
        t0 = time.perf_counter()
        for _ in range(20):
            r = f1(im0)
        jax.block_until_ready(r)
        table[f"{kind}_detect_ms"] = round((time.perf_counter() - t0) / 20 * 1e3, 3)

    from feature_detector_tpu.frontend.line_detector import detect_good_lines

    # Device-resident input, like every other row.
    im_l = jnp.asarray(img_a)
    jax.block_until_ready(detect_good_lines(im_l, 100).endpoints)
    t0 = time.perf_counter()
    for _ in range(30):
        r = detect_good_lines(im_l, 100)
    jax.block_until_ready(r.endpoints)
    table["lsd_detect_ms"] = round((time.perf_counter() - t0) / 30 * 1e3, 3)
    table["lsd_n_lines"] = int(np.asarray(r.valid).sum())

    # Single-thread CPU LSD baseline (native C++ engine, same semantics as
    # the oracle/reference; VERDICT r4 weak #6 asked for the explicit ratio).
    try:
        from feature_detector_tpu.io import native as _native

        if _native.available():
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                _native.lsd_detect(img_a)
                best = min(best, time.perf_counter() - t0)
            table["lsd_cpu_ms"] = round(best * 1e3, 3)
            table["lsd_vs_cpu"] = round(best * 1e3 / table["lsd_detect_ms"], 3)
    except Exception as e:  # pragma: no cover
        table["lsd_cpu_error"] = str(e)[:200]

    try:
        from feature_detector_tpu.core.config import NNDetectorOptions, NNModelType
        from feature_detector_tpu.frontend.nn_detector import NNFeaturePointDetector

        nn_img = load_gray("/root/reference/examples/image2.png")  # 640x480
        nn = NNFeaturePointDetector(
            NNDetectorOptions(model_type=NNModelType.SUPERPOINT_HEATMAP,
                              max_image_rows=480, max_image_cols=640)
        )
        nn.initialize()
        im_nn = jnp.asarray(nn_img)  # device-resident (see LSD row note)
        feats, desc = nn.detect(im_nn)
        jax.block_until_ready(feats.uv)
        t0 = time.perf_counter()
        for _ in range(20):
            feats, desc = nn.detect(im_nn)
        jax.block_until_ready(feats.uv)
        table["superpoint_e2e_ms"] = round((time.perf_counter() - t0) / 20 * 1e3, 3)
        table["superpoint_n_features"] = int(np.asarray(feats.valid).sum())

        # The other three model paths (reference run.sh demo parity:
        # superpoint_nms / disk / disk_nms, nn_feature_point_detector.cpp:11-31).
        for mt, key in (
            (NNModelType.SUPERPOINT_NMS, "superpoint_nms_e2e_ms"),
            (NNModelType.DISK_HEATMAP, "disk_e2e_ms"),
            (NNModelType.DISK_NMS, "disk_nms_e2e_ms"),
        ):
            nn = NNFeaturePointDetector(
                NNDetectorOptions(model_type=mt, max_image_rows=480, max_image_cols=640)
            )
            nn.initialize()
            feats, _ = nn.detect(im_nn)
            jax.block_until_ready(feats.uv)
            t0 = time.perf_counter()
            for _ in range(10):
                feats, _ = nn.detect(im_nn)
            jax.block_until_ready(feats.uv)
            table[key] = round((time.perf_counter() - t0) / 10 * 1e3, 3)
            table[key.replace("_e2e_ms", "_n_features")] = int(np.asarray(feats.valid).sum())
    except Exception as e:  # pragma: no cover — NN row is best-effort
        table["superpoint_error"] = str(e)[:200]

    # Flagship VO at sequence scale (BASELINE.json configs[4]): a 120-frame
    # synthetic lateral sequence whose ground truth round-trips through BOTH
    # standard trajectory formats (TUM txt and EuRoC ASL csv), solved by the
    # fused chunked VO pipeline (slam/vo_fused.py: one-dispatch scan
    # front-end, vmapped chunk solves, pose graph, global BA).
    try:
        import tempfile

        from feature_detector_tpu.slam import evaluate
        from feature_detector_tpu.slam.sequence import (
            load_euroc_groundtruth,
            load_tum_trajectory,
            make_synthetic_sequence,
            run_visual_odometry_chunked,
            save_euroc_groundtruth,
            save_tum_trajectory,
        )

        seq = make_synthetic_sequence(
            n_frames=120, n_landmarks=900, seed=7, motion="lateral", angle_step=0.03
        )
        with tempfile.NamedTemporaryFile(suffix=".txt", mode="w", delete=False) as f:
            gt_path = f.name
        with tempfile.NamedTemporaryFile(suffix=".csv", mode="w", delete=False) as f:
            gt_csv = f.name
        save_tum_trajectory(gt_path, seq.trajectory)
        save_euroc_groundtruth(gt_csv, seq.trajectory)
        gt = load_tum_trajectory(gt_path)
        gt_e = load_euroc_groundtruth(gt_csv)
        table["gt_format_agreement_m"] = round(
            float(np.abs(gt.positions - gt_e.positions).max()), 6
        )

        # First run includes jit compiles; the steady-state rate (compiled,
        # like every other row here) is the honest throughput number and is
        # reported alongside the cold wall.
        t0 = time.perf_counter()
        vo = run_visual_odometry_chunked(seq.images, seq.cam)
        vo_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        vo = run_visual_odometry_chunked(seq.images, seq.cam)
        vo_dt = time.perf_counter() - t0
        ate = float(
            evaluate.ate_rmse(
                vo.trajectory.positions, gt.positions, with_scale=True
            )
        )
        table["vo_frames_per_s"] = round(len(seq.images) / vo_dt, 2)
        table["vo_cold_frames_per_s"] = round(len(seq.images) / vo_cold, 2)
        table["vo_ate_m"] = round(ate, 4) if np.isfinite(ate) else -1.0
        table["vo_span_m"] = round(
            float(np.linalg.norm(gt.positions.max(0) - gt.positions.min(0))), 2
        )
        table["vo_ate_pct_of_span"] = round(100.0 * table["vo_ate_m"] / table["vo_span_m"], 2)
        table["vo_n_frames"] = len(seq.images)
    except Exception as e:  # pragma: no cover — VO row is best-effort
        table["vo_error"] = str(e)[:200]

    # Scaling run (separate process: needs a fresh CPU backend with forced
    # device count; never touches the TPU).
    try:
        import subprocess

        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_scaling.py")],
            capture_output=True, text=True, timeout=2400,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        table["scaling"] = json.loads(out.stdout.strip().splitlines()[-1])
    except Exception as e:  # pragma: no cover
        table["scaling_error"] = str(e)[:200]

    cpu_pair_s = cpu_baseline_seconds(img_a, img_b)
    fps_cpu = 2.0 / cpu_pair_s

    print(
        json.dumps(
            {
                "metric": "detect+describe+match frames/s/chip (FAST+BRIEF+Hamming, 752x480, 200 feats)",
                "value": round(fps_chip, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps_chip / fps_cpu, 2),
                "table": table,
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()

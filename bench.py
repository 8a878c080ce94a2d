"""Headline benchmark: detect + describe + match frames/s per chip.

Pipeline under test (BASELINE.json metric: "keypoints/s/chip
(detect+describe+match)"): FAST corner detection (greedy mask-NMS, 200
features) + steered BRIEF (256 bit) + cross-checked Hamming matching on
752x480 frame pairs, batched across frames on one chip.

Baseline (BASELINE.md protocol): the same reference-semantics pipeline run
single-threaded on this machine's CPU (the NumPy oracle, which encodes the
reference's exact algorithms), measured here at bench time.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
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

    opts = DetectorOptions(min_feature_distance=20, min_valid_response=10.0, max_features=256)
    batch = 8
    frames_a = np.stack([np.roll(img_a, i, axis=0) for i in range(batch)])
    frames_b = np.stack([np.roll(img_b, i, axis=0) for i in range(batch)])

    # Staged jits (compile each stage once; one detect executable serves both
    # frame stacks — a single fused two-frame program compiles pathologically
    # slowly on the remote TPU toolchain).
    det = jax.jit(
        jax.vmap(
            lambda im: detect_good_features(
                im, Features.empty(opts.max_features), "fast", 200, opts
            )
        )
    )
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

    cpu_pair_s = cpu_baseline_seconds(img_a, img_b)
    fps_cpu = 2.0 / cpu_pair_s

    print(
        json.dumps(
            {
                "metric": "detect+describe+match frames/s/chip (FAST+BRIEF+Hamming, 752x480, 200 feats)",
                "value": round(fps_chip, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps_chip / fps_cpu, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()

"""Headless demo drivers reproducing the reference's run.sh executables
(SURVEY.md §3): detect x3 + incremental re-detect, detect+describe (+match,
new), LSD lines, NN detect — each draws results to PNG and prints counts and
timings, mirroring the demos' TickTock measurement points
(test_feature_point_detector.cpp:35-41 etc.).

Usage:
    python -m feature_detector_tpu.app.demo [--out DIR] [--image PATH]
        [--image2 PATH] [--cpu] [--demo all|points|descriptor|lines|nn]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def _timed(fn, *args, **kw):
    import jax

    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args, **kw))
    return out, (time.perf_counter() - t0) * 1e3


def demo_points(img, out_dir):
    """test_feature_point_detector.cpp flow: FAST/Harris/Shi-Tomasi at the
    demo configs + incremental re-detection with a 9x9 seeded grid."""
    import jax.numpy as jnp

    from ..core.config import DetectorOptions
    from ..core.types import Features
    from ..frontend.detector import detect_good_features
    from ..io.images import CYAN, GREEN, draw_solid_circle, save_image, to_rgb

    jimg = jnp.asarray(img)
    for kind, resp in (("fast", 10.0), ("harris", 30.0), ("shi_tomasi", 40.0)):
        opts = DetectorOptions(
            min_feature_distance=20, min_valid_response=resp, max_features=256
        )
        fn = lambda: detect_good_features(jimg, Features.empty(256), kind, 200, opts)
        fn()  # compile
        feats, ms = _timed(fn)
        uv, _ = feats.to_numpy()
        print(f"{kind} detected {len(uv)} | time cost {ms:.2f} ms")
        rgb = to_rgb(img)
        for x, y in uv:
            draw_solid_circle(rgb, int(x), int(y), 4, CYAN)
        save_image(os.path.join(out_dir, f"{kind}_features.png"), rgb)

    # Incremental re-detection (test_feature_point_detector.cpp:44-65).
    opts = DetectorOptions(min_feature_distance=20, min_valid_response=30.0, max_features=256)
    seed = np.array(
        [[i * 15.0, j * 15.0] for i in range(1, 10) for j in range(1, 10)], np.float32
    )
    existing = Features.from_numpy(seed, 256)
    fn = lambda: detect_good_features(jimg, existing, "harris", 200, opts)
    fn()
    feats, ms = _timed(fn)
    uv, _ = feats.to_numpy()
    print(f"harris incremental: {len(seed)} seeded -> {len(uv)} total | {ms:.2f} ms")
    rgb = to_rgb(img)
    for x, y in uv[: len(seed)]:
        draw_solid_circle(rgb, int(x), int(y), 4, GREEN)
    for x, y in uv[len(seed):]:
        draw_solid_circle(rgb, int(x), int(y), 4, CYAN)
    save_image(os.path.join(out_dir, "harris_incremental.png"), rgb)


def demo_descriptor(img, img2, out_dir):
    """test_feature_descriptor.cpp flow (Harris + BRIEF-128) plus the matcher
    the reference lacks, run on a same-scene shifted pair."""
    import jax.numpy as jnp

    from ..core.config import BriefOptions, DetectorOptions, MatcherOptions
    from ..core.types import Features
    from ..frontend.descriptor import compute_descriptors
    from ..frontend.detector import detect_good_features
    from ..io.images import RED, YELLOW, draw_line, draw_solid_circle, save_image, to_rgb
    from ..match.hamming import match_hamming

    opts = DetectorOptions(min_feature_distance=20, min_valid_response=20.0, max_features=64)
    bopts = BriefOptions(length=128)
    jimg = jnp.asarray(img)
    feats = detect_good_features(jimg, Features.empty(64), "harris", 10, opts)
    fn = lambda: compute_descriptors(jimg, feats, bopts)
    fn()
    desc, ms = _timed(fn)
    uv, _ = feats.to_numpy()
    print(f"brief: {len(uv)} features described | time cost {ms:.2f} ms")

    # Match against a shifted copy (demonstrates the Hamming matcher).
    shifted = np.roll(img, 4, axis=1)
    jsh = jnp.asarray(shifted)
    feats2 = detect_good_features(jsh, Features.empty(64), "harris", 10, opts)
    desc2 = compute_descriptors(jsh, feats2, bopts)
    m = match_hamming(desc.words, desc.valid, desc2.words, desc2.valid, MatcherOptions())
    uv2, _ = feats2.to_numpy()
    print(f"matcher: {int(m.count)} cross-checked matches")
    rgb = to_rgb(img)
    idx = np.asarray(m.index)
    for i, (x, y) in enumerate(uv):
        draw_solid_circle(rgb, int(x), int(y), 4, RED)
        j = idx[i] if i < len(idx) else -1
        if j >= 0 and j < len(uv2):
            draw_line(rgb, x, y, uv2[j][0], uv2[j][1], YELLOW)
    save_image(os.path.join(out_dir, "brief_matches.png"), rgb)


def demo_lines(img, out_dir):
    """test_feature_line_detector.cpp flow, incl. the five intermediate-state
    visualizations the reference demo opens (gradient-norm, validity, angle,
    region/used-pixels, fitted rectangles — test_feature_line_detector.cpp:15-85)."""
    import jax.numpy as jnp

    from ..frontend.line_detector import detect_good_lines, detect_good_lines_with_state
    from ..io.images import GREEN, RED, draw_line, save_image, to_rgb

    jimg = jnp.asarray(img)
    fn = lambda: detect_good_lines(jimg, 100)
    fn()
    lines, ms = _timed(fn)
    segs = lines.to_numpy()
    print(f"lsd detected {len(segs)} lines | time cost {ms:.2f} ms")
    rgb = to_rgb(img)
    for x1, y1, x2, y2 in segs:
        draw_line(rgb, x1, y1, x2, y2, GREEN)
    save_image(os.path.join(out_dir, "lsd_lines.png"), rgb)

    # Intermediate maps (FeatureLineDetector::pixels()/rectangles() analogue).
    state = detect_good_lines_with_state(jimg)
    norm = np.asarray(state.norm)
    save_image(os.path.join(out_dir, "lsd_norm.png"),
               (255.0 * norm / max(norm.max(), 1e-6)).astype(np.uint8))
    save_image(os.path.join(out_dir, "lsd_validity.png"),
               (np.asarray(state.valid) * 255).astype(np.uint8))
    angle = np.asarray(state.angle)
    save_image(os.path.join(out_dir, "lsd_angle.png"),
               ((angle + np.pi) * (255.0 / (2 * np.pi))).astype(np.uint8))
    labels = np.asarray(state.labels)
    # Region map: hash labels into gray levels, invalid black.
    lab_vis = np.where(
        labels >= 0, (labels.astype(np.int64) * 2654435761) % 200 + 55, 0
    ).astype(np.uint8)
    save_image(os.path.join(out_dir, "lsd_regions.png"), lab_vis)
    rects = {k: np.asarray(v) for k, v in state.rectangles().items()}
    rect_rgb = to_rgb(img)
    for i in np.nonzero(rects["valid"])[0]:
        cx, cy = rects["center"][i]
        a, l, w = rects["angle"][i], rects["length"][i], rects["width"][i]
        du, dv = np.cos(a), np.sin(a)
        nu, nv = -dv, du
        corners = [
            (cx - 0.5 * l * du - 0.5 * w * nu, cy - 0.5 * l * dv - 0.5 * w * nv),
            (cx + 0.5 * l * du - 0.5 * w * nu, cy + 0.5 * l * dv - 0.5 * w * nv),
            (cx + 0.5 * l * du + 0.5 * w * nu, cy + 0.5 * l * dv + 0.5 * w * nv),
            (cx - 0.5 * l * du + 0.5 * w * nu, cy - 0.5 * l * dv + 0.5 * w * nv),
        ]
        for j in range(4):
            x1, y1 = corners[j]
            x2, y2 = corners[(j + 1) % 4]
            draw_line(rect_rgb, x1, y1, x2, y2, RED)
    save_image(os.path.join(out_dir, "lsd_rectangles.png"), rect_rgb)


def demo_nn(img2, out_dir):
    """test_nn_feature_point_detector.cpp flow.  Both models serve TRAINED
    in-repo checkpoints by default (superpoint_synth.npz / disk_synth.npz,
    models/train_superpoint.py / models/train_disk.py); public upstream
    checkpoints convert via models/convert.py when available (SURVEY.md H4)."""
    import jax.numpy as jnp

    from ..core.config import NNDetectorOptions, NNModelType
    from ..core.types import Features
    from ..frontend.nn_detector import NNFeaturePointDetector
    from ..io.images import CYAN, draw_solid_circle, save_image, to_rgb

    # 16-divisible crop: SuperPoint needs /8, the DISK U-Net /16.
    rows = (img2.shape[0] // 16) * 16
    cols = (img2.shape[1] // 16) * 16
    img2 = img2[:rows, :cols]
    for mt in (NNModelType.SUPERPOINT_HEATMAP, NNModelType.DISK_HEATMAP):
        opts = NNDetectorOptions(
            max_image_rows=rows, max_image_cols=cols, model_type=mt
        )
        det = NNFeaturePointDetector(opts)
        det.initialize()
        # Pre-seed a 4x4 grid of existing features
        # (test_nn_feature_point_detector.cpp:28-34).
        seed = np.array(
            [[100.0 * i + 50, 100.0 * j + 50] for i in range(4) for j in range(4)],
            np.float32,
        )
        seed = seed[(seed[:, 0] < cols - 1) & (seed[:, 1] < rows - 1)]
        existing = Features.from_numpy(seed, opts.max_number_of_detected_features)
        t0 = time.perf_counter()
        feats, desc = det.detect(jnp.asarray(img2), existing)
        import jax

        jax.block_until_ready(desc)
        ms = (time.perf_counter() - t0) * 1e3
        uv, _ = feats.to_numpy()
        print(f"{mt.name.lower()} detected {len(uv)} | time cost {ms:.2f} ms")
        rgb = to_rgb(img2)
        for x, y in uv:
            draw_solid_circle(rgb, int(x), int(y), 4, CYAN)
        save_image(os.path.join(out_dir, f"{mt.name.lower()}_features.png"), rgb)


def demo_vo(out_dir, n_frames=30, seed=3):
    """Monocular VO demo: fused chunked pipeline on a synthetic lateral
    sequence, top-down trajectory plot (estimate vs ground truth) + ATE."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..io.images import CYAN, GREEN, draw_line, draw_solid_circle, save_image
    from ..slam import evaluate
    from ..slam.sequence import make_synthetic_sequence, run_visual_odometry_chunked

    seq = make_synthetic_sequence(
        n_frames=n_frames, n_landmarks=500, seed=seed, motion="lateral",
        angle_step=0.03,
    )
    t0 = time.perf_counter()
    res = run_visual_odometry_chunked(seq.images, seq.cam)
    wall = time.perf_counter() - t0
    gt = seq.trajectory.positions
    a = evaluate.umeyama_alignment(
        jnp.asarray(res.trajectory.positions), jnp.asarray(gt), with_scale=True
    )
    est = (
        float(a.scale) * res.trajectory.positions @ np.asarray(a.rotation).T
        + np.asarray(a.translation)
    )
    ate = float(np.sqrt(np.mean(np.sum((est - gt) ** 2, axis=1))))
    span = float(np.linalg.norm(gt.max(0) - gt.min(0)))
    print(
        f"vo: {n_frames} frames in {wall:.1f} s ({n_frames / wall:.1f} fps) | "
        f"ATE {ate:.3f} m ({100 * ate / span:.2f}% of {span:.1f} m span) | "
        f"{res.num_tracks} tracks"
    )

    # Top-down (x, z) plot: ground truth green, estimate cyan.
    h, w = 480, 640
    canvas = np.full((h, w, 3), 24, np.uint8)
    allp = np.concatenate([gt, est])
    lo, hi = allp.min(0), allp.max(0)
    scale = 0.9 * min(w / max(hi[0] - lo[0], 1e-6), h / max(hi[2] - lo[2] + 1.0, 1e-6))

    def to_px(p):
        return (
            int((p[0] - lo[0]) * scale + 0.05 * w),
            int((p[2] - lo[2]) * scale + 0.5 * h),
        )

    for traj, color in ((gt, GREEN), (est, CYAN)):
        for i in range(len(traj) - 1):
            x0, y0 = to_px(traj[i])
            x1, y1 = to_px(traj[i + 1])
            draw_line(canvas, x0, y0, x1, y1, color)
        for i in range(len(traj)):
            x0, y0 = to_px(traj[i])
            draw_solid_circle(canvas, x0, y0, 2, color)
    save_image(os.path.join(out_dir, "vo_trajectory.png"), canvas)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="/tmp/fd_demo")
    parser.add_argument("--image", default="/root/reference/examples/image.png")
    parser.add_argument("--image2", default="/root/reference/examples/image2.png")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument(
        "--demo", default="all",
        choices=["all", "points", "descriptor", "lines", "nn", "vo"],
    )
    parser.add_argument(
        "--show", action="store_true",
        help="open interactive windows for every output and block on a "
        "keypress, like the reference demos (Visualizor2D ShowImage + "
        "WaitKey(0), test_feature_point_detector.cpp:104-111); headless "
        "hosts fall back to the PNG dumps",
    )
    args = parser.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..io.images import load_gray

    os.makedirs(args.out, exist_ok=True)
    img = load_gray(args.image)
    img2 = load_gray(args.image2)
    print(f"devices: {jax.devices()}")
    if args.demo in ("all", "points"):
        demo_points(img, args.out)
    if args.demo in ("all", "descriptor"):
        demo_descriptor(img, img2, args.out)
    if args.demo in ("all", "lines"):
        demo_lines(img, args.out)
    if args.demo in ("all", "nn"):
        demo_nn(img2, args.out)
    if args.demo in ("all", "vo"):
        demo_vo(args.out)
    print(f"outputs in {args.out}")
    if args.show:
        from ..io.images import load_rgb
        from ..io.visualize import interactive_available, show_image, wait_key

        for name in sorted(os.listdir(args.out)):
            if name.endswith(".png"):
                show_image(name[:-4].replace("_", " "), load_rgb(os.path.join(args.out, name)))
        if interactive_available():
            print("press any key in a window to exit (WaitKey(0))")
        wait_key(0)


if __name__ == "__main__":
    main()

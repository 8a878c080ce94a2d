"""LSD kernels: gradient/angle map bit-exact vs oracle; line outputs within
tolerance (SURVEY.md H2: region identity is seed-order-dependent in the
reference, so parity is asserted on output segments)."""

import numpy as np
import jax.numpy as jnp

from feature_detector_tpu.core.config import LineDetectorOptions
from feature_detector_tpu.frontend.line_detector import detect_good_lines
from feature_detector_tpu.kernels import lsd as K
from feature_detector_tpu.oracle import lsd as oracle


def synthetic_lines_image(h=120, w=160):
    """Clean dark background with bright straight bars -> unambiguous lines."""
    img = np.full((h, w), 30, np.uint8)
    img[20:24, 10:150] = 220          # horizontal bar
    img[40:110, 80:84] = 220          # vertical bar
    for i in range(60):               # diagonal bar
        img[30 + i, 10 + i : 14 + i] = 220
    return img


def endpoint_set_distance(a, b):
    """Min over endpoint orderings of max endpoint distance."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    d1 = max(np.hypot(*(a[:2] - b[:2])), np.hypot(*(a[2:] - b[2:])))
    d2 = max(np.hypot(*(a[:2] - b[2:])), np.hypot(*(a[2:] - b[:2])))
    return min(d1, d2)


class TestAngleMap:
    def test_matches_oracle(self, small_image):
        opts = LineDetectorOptions()
        wn, wa, wv = oracle.line_level_angle_map(small_image, opts)
        gn, ga, gv = K.line_level_angle_map(jnp.asarray(small_image), opts)
        np.testing.assert_array_equal(np.asarray(gv), wv)
        np.testing.assert_allclose(np.asarray(gn)[wv], wn[wv], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ga)[wv], wa[wv], rtol=1e-4, atol=1e-5)

    def test_min_region_size_formula(self):
        opts = LineDetectorOptions()
        assert K.min_region_size(480, 752, opts) == oracle.min_region_size(480, 752, opts)
        assert K.min_region_size(120, 160, opts) == oracle.min_region_size(120, 160, opts)


class TestLineDetection:
    def test_synthetic_bars_match_oracle(self):
        img = synthetic_lines_image()
        opts = LineDetectorOptions()
        want = oracle.detect_lines(img, opts)
        got = detect_good_lines(jnp.asarray(img), 10, opts)
        segs = got.to_numpy()
        assert len(want) > 0
        # Every oracle line must have a detected counterpart within 4 px.
        for wline in want:
            dists = [endpoint_set_distance(wline, g) for g in segs]
            assert min(dists) < 4.0, (wline, segs)
        # Line count within ±50%.
        assert 0.5 * len(want) <= len(segs) <= 2.0 * len(want) + 1

    def test_real_image_tolerance(self, image):
        # Seeded mean-angle growing (kernels/lsd.py propagate_labels_meanangle)
        # reproduces the reference's running-mean acceptance; measured recall
        # 0.95 @ 4 px on image.png (38/40 oracle lines).
        opts = LineDetectorOptions()
        want = oracle.detect_lines(image, opts)
        got = detect_good_lines(jnp.asarray(image), 100, opts)
        segs = got.to_numpy()
        assert len(want) > 0
        matched = sum(
            1 for wline in want
            if segs.size and min(endpoint_set_distance(wline, g) for g in segs) < 4.0
        )
        recall = matched / len(want)
        assert recall >= 0.9, f"recall {recall:.2f} ({matched}/{len(want)}, got {len(segs)})"
        # Count parity within ±30%.
        assert 0.7 * len(want) <= len(segs) <= 1.3 * len(want), (len(want), len(segs))

    def test_second_image_tolerance(self, image2):
        # image2 (640x480, denser scene): 0.85 @ 4 px measured — the residual
        # gap is seed-order-dependent region identity on parallel multi-line
        # clusters (SURVEY.md H2), asserted at >= 0.8.
        opts = LineDetectorOptions(max_lines=256)
        want = oracle.detect_lines(image2, opts)
        got = detect_good_lines(jnp.asarray(image2), 100, opts)
        segs = got.to_numpy()
        assert len(want) > 50
        matched = sum(
            1 for wline in want
            if segs.size and min(endpoint_set_distance(wline, g) for g in segs) < 4.0
        )
        recall = matched / len(want)
        assert recall >= 0.8, f"recall {recall:.2f} ({matched}/{len(want)}, got {len(segs)})"

    def test_zero_budget_returns_empty(self, small_image):
        got = detect_good_lines(jnp.asarray(small_image), 0)
        assert int(got.count) == 0


class TestIntrospection:
    def test_state_maps_and_rectangles(self):
        from feature_detector_tpu.frontend.line_detector import detect_good_lines_with_state

        img = synthetic_lines_image()
        opts = LineDetectorOptions()
        state = detect_good_lines_with_state(jnp.asarray(img), opts)
        norm, angle, valid = state.pixels()
        assert norm.shape == (img.shape[0] - 1, img.shape[1] - 1)
        assert angle.shape == norm.shape and valid.shape == norm.shape

        sp = state.sorted_pixels()
        assert len(sp) == int(np.asarray(valid).sum())
        norms = np.asarray(norm)[sp[:, 0], sp[:, 1]]
        assert (np.diff(norms) <= 1e-6).all()  # descending seed order

        rects = state.rectangles()
        nv = np.asarray(state.lines.valid)
        assert np.array_equal(np.asarray(rects["valid"]), nv)
        # Valid rectangles respect the acceptance filters
        # (feature_line_detector.cpp:40, .h:40-45).
        ln = np.asarray(rects["length"])[nv]
        ir = np.asarray(rects["inlier_ratio"])[nv]
        assert (ln >= opts.min_valid_line_length_in_pixel).all()
        assert (ir >= opts.max_tolerance_inlier_ratio).all()
        # Region labels of selected lines exist in the label map.
        labs = np.asarray(rects["label"])[nv]
        label_map = np.asarray(state.labels)
        for l in labs:
            assert (label_map == l).sum() > 0

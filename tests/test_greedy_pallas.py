"""Pallas greedy-selection kernel vs the pure-lax version (and the oracle)."""

import jax.numpy as jnp
import numpy as np

from feature_detector_tpu.core.config import DetectorOptions
from feature_detector_tpu.core.types import Features
from feature_detector_tpu.frontend.detector import detect_good_features
from feature_detector_tpu.kernels.detect import greedy_select_lax
from feature_detector_tpu.kernels.greedy_pallas import greedy_select_pallas


def _compare(cand, max_picks, n_stop, radius):
    uv_l, r_l, v_l = greedy_select_lax(jnp.asarray(cand), max_picks, n_stop, radius)
    uv_p, r_p, v_p = greedy_select_pallas(jnp.asarray(cand), max_picks, n_stop, radius)
    np.testing.assert_array_equal(np.asarray(v_l), np.asarray(v_p))
    m = np.asarray(v_l)
    np.testing.assert_array_equal(np.asarray(uv_l)[m], np.asarray(uv_p)[m])
    np.testing.assert_allclose(np.asarray(r_l)[m], np.asarray(r_p)[m], rtol=1e-6)


def test_matches_lax_random(rng):
    cand = rng.random((60, 90), np.float32)
    cand[cand < 0.7] = 0.0  # sparse candidates
    _compare(cand, max_picks=32, n_stop=jnp.int32(32), radius=5)


def test_matches_lax_budget_and_exhaustion(rng):
    cand = np.zeros((40, 70), np.float32)
    cand[10, 10] = 3.0
    cand[12, 12] = 2.0  # suppressed by first pick (radius 5)
    cand[30, 50] = 1.0
    _compare(cand, max_picks=8, n_stop=jnp.int32(8), radius=5)
    _compare(cand, max_picks=8, n_stop=jnp.int32(1), radius=5)


def test_matches_lax_ties(rng):
    # Equal responses: row-major-first tie break must agree.
    cand = np.zeros((24, 48), np.float32)
    cand[5, 5] = 1.0
    cand[5, 30] = 1.0
    cand[20, 5] = 1.0
    _compare(cand, max_picks=4, n_stop=jnp.int32(4), radius=3)


def test_batched_selection_matches_per_frame(rng):
    # The batched kernel (one shared pick loop over a frame chunk) must be
    # per-frame identical to the single-frame kernel, including frames that
    # exhaust their candidates at different iteration counts and batch sizes
    # that need chunk padding.
    from feature_detector_tpu.kernels.greedy_pallas import greedy_select_pallas_batch

    maps = rng.random((5, 48, 80), np.float32)
    maps[maps < 0.8] = 0.0
    maps[3, :, :] = 0.0  # one empty frame — exits immediately
    uv_b, r_b, v_b = greedy_select_pallas_batch(
        jnp.asarray(maps), 16, jnp.int32(16), 5, chunk=4
    )
    for i in range(5):
        uv1, r1, v1 = greedy_select_pallas(jnp.asarray(maps[i]), 16, jnp.int32(16), 5)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v_b[i]))
        m = np.asarray(v1)
        np.testing.assert_array_equal(np.asarray(uv1)[m], np.asarray(uv_b[i])[m])
        np.testing.assert_allclose(np.asarray(r1)[m], np.asarray(r_b[i])[m], rtol=1e-6)


def test_batched_detect_matches_per_frame(small_image):
    from feature_detector_tpu.frontend.detector import detect_good_features_batch

    opts = DetectorOptions(min_feature_distance=10, min_valid_response=10.0, max_features=64)
    frames = jnp.asarray(
        np.stack([small_image, np.roll(small_image, 3, 0), np.roll(small_image, 5, 1)])
    )
    fb = detect_good_features_batch(frames, "fast", 40, opts)
    for i in range(3):
        f1 = detect_good_features(frames[i], Features.empty(64), "fast", 40, opts)
        np.testing.assert_array_equal(np.asarray(f1.valid), np.asarray(fb.valid[i]))
        m = np.asarray(f1.valid)
        np.testing.assert_array_equal(np.asarray(f1.uv)[m], np.asarray(fb.uv[i])[m])


def test_full_detect_path_pallas(small_image):
    opts = DetectorOptions(min_feature_distance=10, min_valid_response=30.0, max_features=64)
    empty = Features.empty(opts.max_features)
    f_lax = detect_good_features(
        jnp.asarray(small_image), empty, "harris", 40, opts, use_pallas=False
    )
    f_pal = detect_good_features(
        jnp.asarray(small_image), empty, "harris", 40, opts, use_pallas=True
    )
    np.testing.assert_array_equal(np.asarray(f_lax.valid), np.asarray(f_pal.valid))
    m = np.asarray(f_lax.valid)
    np.testing.assert_array_equal(np.asarray(f_lax.uv)[m], np.asarray(f_pal.uv)[m])

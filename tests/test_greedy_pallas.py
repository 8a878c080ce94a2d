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

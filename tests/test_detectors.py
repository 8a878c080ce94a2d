"""JAX detector kernels vs the NumPy oracle (reference semantics).

Oracle encodes feature_point_detector.cpp / *_harris / *_shi_tomas / *_fast
per SURVEY.md §3.1-3.2; these tests pin the JAX kernels to it exactly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from feature_detector_tpu.core.config import (
    DetectorOptions,
    FastOptions,
    HarrisOptions,
    ShiTomasiOptions,
)
from feature_detector_tpu.core.types import Features
from feature_detector_tpu.frontend.detector import detect_good_features, sparsify_features
from feature_detector_tpu.kernels import detect as K
from feature_detector_tpu.oracle import detectors as oracle


def full_mask(shape):
    return np.ones(shape, np.int32)


class TestResponseMaps:
    def test_harris_matches_oracle(self, small_image):
        opts = DetectorOptions(min_valid_response=30.0)
        sub = HarrisOptions()
        want = oracle.harris_response_map(small_image, full_mask(small_image.shape), opts, sub)
        got = np.asarray(K.harris_response(jnp.asarray(small_image), jnp.ones(small_image.shape, jnp.int32), opts, sub))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)

    def test_shi_tomasi_matches_oracle(self, small_image):
        opts = DetectorOptions(min_valid_response=40.0)
        sub = ShiTomasiOptions()
        want = oracle.shi_tomasi_response_map(small_image, full_mask(small_image.shape), opts, sub)
        got = np.asarray(K.shi_tomasi_response(jnp.asarray(small_image), jnp.ones(small_image.shape, jnp.int32), opts, sub))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)

    def test_fast_matches_oracle(self, small_image):
        sub = FastOptions()
        want = oracle.fast_response_map(small_image, full_mask(small_image.shape), sub)
        got = np.asarray(K.fast_response(jnp.asarray(small_image), jnp.ones(small_image.shape, jnp.int32), sub))
        np.testing.assert_array_equal(got, want)

    def test_masked_pixels_are_zero(self, small_image):
        opts = DetectorOptions(min_valid_response=30.0)
        mask = np.ones(small_image.shape, np.int32)
        mask[40:60, 50:90] = 0
        want = oracle.harris_response_map(small_image, mask, opts, HarrisOptions())
        got = np.asarray(K.harris_response(jnp.asarray(small_image), jnp.asarray(mask), opts, HarrisOptions()))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)
        assert got[40:60, 50:90].max() == 0.0


class TestNMS:
    def test_nms4_matches_oracle(self, small_image):
        opts = DetectorOptions(min_valid_response=30.0)
        resp = oracle.harris_response_map(small_image, full_mask(small_image.shape), opts, HarrisOptions())
        want_resp, want_px = oracle.nms4_candidates(resp, 30.0, 2)
        got_map = np.asarray(K.nms4(jnp.asarray(resp), 30.0, 2))
        ys, xs = np.nonzero(got_map)
        got_px = np.stack([xs, ys], axis=-1)
        np.testing.assert_array_equal(got_px, want_px)
        np.testing.assert_allclose(got_map[ys, xs], want_resp, rtol=1e-6)


class TestSuppressionMask:
    def test_square_clamped_at_borders(self):
        uv = jnp.array([[2.0, 3.0], [100.0, 50.0]], jnp.float32)
        valid = jnp.array([True, True])
        got = np.asarray(K.make_suppression_mask((60, 110), uv, valid, 5))
        want = oracle.make_mask((60, 110), [(2.0, 3.0), (100.0, 50.0)], 5)
        np.testing.assert_array_equal(got, want)

    def test_invalid_features_ignored(self):
        uv = jnp.array([[20.0, 20.0], [40.0, 40.0]], jnp.float32)
        valid = jnp.array([True, False])
        got = np.asarray(K.make_suppression_mask((64, 64), uv, valid, 3))
        want = oracle.make_mask((64, 64), [(20.0, 20.0)], 3)
        np.testing.assert_array_equal(got, want)


class TestGreedySelect:
    @pytest.mark.parametrize("kind,opts,sub", [
        ("harris", DetectorOptions(min_feature_distance=20, min_valid_response=30.0, max_features=256), HarrisOptions()),
        ("shi_tomasi", DetectorOptions(min_feature_distance=20, min_valid_response=40.0, max_features=256), ShiTomasiOptions()),
        ("fast", DetectorOptions(min_feature_distance=20, min_valid_response=10.0, max_features=256), FastOptions()),
    ])
    def test_detect_matches_oracle(self, small_image, kind, opts, sub):
        want = oracle.detect_good_features(small_image, 50, kind, opts, sub)
        got = detect_good_features(
            jnp.asarray(small_image), Features.empty(opts.max_features), kind, 50, opts, sub
        )
        uv, _ = got.to_numpy()
        assert len(uv) == len(want), (len(uv), len(want))
        np.testing.assert_allclose(uv, np.asarray(want, np.float32), atol=0)

    def test_incremental_redetection(self, small_image):
        """Existing features seed the mask; new ones are appended (Q9),
        mirroring test_feature_point_detector.cpp:44-65."""
        opts = DetectorOptions(min_feature_distance=10, min_valid_response=30.0, max_features=256)
        seed = [(float(i * 15), float(j * 15)) for i in range(1, 6) for j in range(1, 6)]
        want = oracle.detect_good_features(small_image, 60, "harris", opts, HarrisOptions(), existing=list(seed))
        existing = Features.from_numpy(np.array(seed, np.float32), opts.max_features)
        got = detect_good_features(jnp.asarray(small_image), existing, "harris", 60, opts, HarrisOptions())
        uv, _ = got.to_numpy()
        assert len(uv) == len(want)
        np.testing.assert_allclose(uv, np.asarray(want, np.float32), atol=0)
        np.testing.assert_allclose(uv[: len(seed)], np.asarray(seed, np.float32))

    def test_needed_num_caps_total(self, small_image):
        opts = DetectorOptions(min_feature_distance=5, min_valid_response=30.0, max_features=256)
        got = detect_good_features(jnp.asarray(small_image), Features.empty(256), "harris", 10, opts, HarrisOptions())
        assert int(got.count) == 10


class TestSparsify:
    def test_matches_oracle(self, rng):
        opts = DetectorOptions()
        feats = rng.uniform(0, 150, size=(80, 2)).astype(np.float32)
        status = rng.integers(0, 2, size=80).astype(np.int32) + 1  # values in {1, 2}
        want = oracle.sparsify_features(feats, 120, 160, 1, 0, list(status), opts)
        f = Features.from_numpy(feats, 128)
        status_in = jnp.zeros((128,), jnp.int32).at[:80].set(jnp.asarray(status))
        got = np.asarray(
            sparsify_features(f, status_in, 120, 160, 1, 0, opts)
        )[:80]
        np.testing.assert_array_equal(got, np.asarray(want))

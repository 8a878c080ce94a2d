"""Native host engine (C++/ctypes) vs the NumPy oracle."""

import numpy as np
import pytest

from feature_detector_tpu.core.config import BriefOptions, DetectorOptions, FastOptions
from feature_detector_tpu.io import native
from feature_detector_tpu.oracle import brief as obrief
from feature_detector_tpu.oracle import detectors as odet

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


class TestNativeFast:
    def test_matches_oracle(self, small_image):
        opts = DetectorOptions(min_feature_distance=20, min_valid_response=10.0)
        want = odet.detect_good_features(small_image, 50, "fast", opts)
        uv, resp = native.fast_detect(
            small_image, 50, min_response=10.0, min_distance=20
        )
        assert len(uv) == len(want)
        np.testing.assert_allclose(uv, np.asarray(want, np.float32))

    def test_incremental(self, small_image):
        opts = DetectorOptions(min_feature_distance=10, min_valid_response=10.0)
        seed = [(30.0, 30.0), (80.0, 60.0)]
        want = odet.detect_good_features(
            small_image, 40, "fast", opts, existing=list(seed)
        )
        uv, _ = native.fast_detect(
            small_image, 40, min_response=10.0, min_distance=10,
            existing=np.array(seed, np.float32),
        )
        # Native returns only NEW features; oracle returns existing + new.
        np.testing.assert_allclose(uv, np.asarray(want[2:], np.float32))


class TestNativeBrief:
    def test_matches_oracle(self, image):
        rng = np.random.default_rng(7)
        h, w = image.shape
        uv = np.stack(
            [rng.uniform(25, w - 25, 16), rng.uniform(25, h - 25, 16)], -1
        ).astype(np.float32)
        want_bits, want_valid = obrief.compute(image, uv, BriefOptions())
        want_words = obrief.pack_bits(want_bits)
        words, valid = native.brief_compute(image, uv)
        np.testing.assert_array_equal(valid, want_valid)
        # Allow only near-tie bit differences (f32 rounding), like the JAX test.
        diff = np.unpackbits(
            (words ^ want_words).view(np.uint8), axis=-1
        ).sum()
        assert diff <= 4, diff


class TestNativeMatcher:
    def test_matches_oracle(self):
        rng = np.random.default_rng(8)
        wa = rng.integers(0, 2**32, (20, 8), dtype=np.uint32)
        wb = rng.integers(0, 2**32, (30, 8), dtype=np.uint32)
        d = obrief.hamming_distance(wa, wb)
        idx, dist = native.hamming_match(
            wa, np.ones(20, bool), wb, np.ones(30, bool),
            max_distance=256, cross_check=False,
        )
        np.testing.assert_array_equal(idx, d.argmin(1))
        np.testing.assert_array_equal(dist, d.min(1))

    def test_cross_check(self):
        wa = np.zeros((2, 8), np.uint32)
        wa[1, 0] = 1
        wb = np.zeros((1, 8), np.uint32)
        idx, _ = native.hamming_match(
            wa, np.ones(2, bool), wb, np.ones(1, bool), max_distance=64
        )
        assert idx[0] == 0 and idx[1] == -1


class TestNativeLSD:
    def test_matches_oracle(self, image):
        """fd_lsd_detect is the single-thread CPU LSD baseline engine; it
        must reproduce the oracle's (= reference-semantics) segments
        endpoint-for-endpoint on the real example image."""
        from feature_detector_tpu.oracle import lsd as olsd

        got = native.lsd_detect(image)
        want = np.asarray(olsd.detect_lines(image), np.float32)
        assert len(got) == len(want) > 20, (len(got), len(want))
        np.testing.assert_allclose(got, want, atol=5e-3)

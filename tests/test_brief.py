"""BRIEF kernel + Hamming matcher vs the NumPy oracle."""

import numpy as np
import jax.numpy as jnp

from feature_detector_tpu.core.config import BriefOptions, DetectorOptions, MatcherOptions
from feature_detector_tpu.core.types import Features
from feature_detector_tpu.frontend.descriptor import compute_descriptors
from feature_detector_tpu.match.hamming import match_hamming
from feature_detector_tpu.oracle import brief as oracle
from feature_detector_tpu.oracle import detectors as odet


def _features_on(image, n=20, seed=0):
    rng = np.random.default_rng(seed)
    h, w = image.shape
    uv = np.stack(
        [rng.uniform(25, w - 25, n), rng.uniform(25, h - 25, n)], axis=-1
    ).astype(np.float32)
    return uv


def _unpack(words, length):
    bits = np.unpackbits(words.view(np.uint8), axis=-1, bitorder="little")
    return bits[:, :length]


def _assert_bits_match_modulo_ties(image, uv, got_words, want_bits, opts):
    """Bits must match exactly except where the intensity test is a near-tie
    (f32 rounding/FMA order differs between XLA and NumPy on exact ties)."""
    got_bits = _unpack(got_words, opts.length)
    mism = got_bits != want_bits
    if not mism.any():
        return
    # Recompute test margins with the oracle's sampler; mismatches are only
    # acceptable on near-zero margins.
    from feature_detector_tpu.oracle.brief_pattern import BRIEF_PATTERN

    for i, j in zip(*np.nonzero(mism)):
        x, y = float(uv[i][0]), float(uv[i][1])
        # Orientation per oracle.
        half = opts.half_patch_size
        d = np.arange(-half, half + 1, dtype=np.float32)
        dxg, dyg = np.meshgrid(d, d, indexing="xy")
        vals = oracle.bilinear(image, y + dyg, x + dxg)
        m10, m01 = float((dxg * vals).sum()), float((dyg * vals).sum())
        m = np.hypot(m10, m01)
        st, ct = m01 / m, m10 / m
        p = BRIEF_PATTERN[j].astype(np.float32)
        v1 = oracle.bilinear(image, st * p[0] + ct * p[1] + y, ct * p[0] - st * p[1] + x)
        v2 = oracle.bilinear(image, st * p[2] + ct * p[3] + y, ct * p[2] - st * p[3] + x)
        assert abs(float(v1) - float(v2)) < 0.05, (
            f"non-tie bit mismatch at feature {i} bit {j}: {v1} vs {v2}"
        )
    # And ties must be rare.
    assert mism.sum() <= max(2, 0.005 * want_bits.size)


class TestBriefKernel:
    def test_matches_oracle_random_centers(self, image):
        opts = BriefOptions(method="gather")
        uv = _features_on(image, 32)
        want_bits, want_valid = oracle.compute(image, uv, opts)

        f = Features.from_numpy(uv, 64)
        d = compute_descriptors(jnp.asarray(image), f, opts)
        got_words = np.asarray(d.words)[:32]
        got_valid = np.asarray(d.valid)[:32]
        np.testing.assert_array_equal(got_valid, want_valid)
        _assert_bits_match_modulo_ties(image, uv, got_words, want_bits, opts)

    def test_length_128(self, image):
        opts = BriefOptions(length=128, method="gather")
        uv = _features_on(image, 8, seed=3)
        want_bits, want_valid = oracle.compute(image, uv, opts)
        f = Features.from_numpy(uv, 16)
        d = compute_descriptors(jnp.asarray(image), f, opts)
        assert d.words.shape == (16, 4)
        np.testing.assert_array_equal(np.asarray(d.valid)[:8], want_valid)
        _assert_bits_match_modulo_ties(image, uv, np.asarray(d.words)[:8], want_bits, opts)

    def test_border_rejection_zero_descriptor(self, image):
        """Out-of-border features keep all-zero descriptors, valid=False (Q5)."""
        uv = np.array([[5.0, 5.0], [image.shape[1] - 2.0, 40.0]], np.float32)
        f = Features.from_numpy(uv, 8)
        d = compute_descriptors(jnp.asarray(image), f, BriefOptions())
        assert not np.asarray(d.valid)[:2].any()
        assert np.asarray(d.words)[:2].sum() == 0

    def test_on_detected_corners(self, small_image):
        """Descriptor parity on real detector output (test_feature_descriptor.cpp flow)."""
        opts = DetectorOptions(min_feature_distance=20, min_valid_response=20.0, max_features=64)
        feats = odet.detect_good_features(small_image, 10, "harris", opts)
        uv = np.asarray(feats, np.float32)
        bopts = BriefOptions(length=128, method="gather")
        want_bits, want_valid = oracle.compute(small_image, uv, bopts)
        f = Features.from_numpy(uv, 64)
        d = compute_descriptors(jnp.asarray(small_image), f, bopts)
        _assert_bits_match_modulo_ties(
            small_image, uv, np.asarray(d.words)[: len(uv)], want_bits, bopts
        )


class TestBriefMXU:
    """MXU matmul path vs its binned/nearest oracle (compute_binned)."""

    def _check(self, image, uv, opts):
        want_bits, want_valid = oracle.compute_binned(image, uv, opts)
        f = Features.from_numpy(uv, max(64, len(uv)))
        d = compute_descriptors(jnp.asarray(image), f, opts)
        got_valid = np.asarray(d.valid)[: len(uv)]
        np.testing.assert_array_equal(got_valid, want_valid)
        got_bits = _unpack(np.asarray(d.words)[: len(uv)], opts.length)
        mism = (got_bits != want_bits).sum()
        # The only tolerated divergence is an f32-vs-f64 atan2 tie flipping a
        # steering bin on the boundary — a whole-feature event, rare.
        assert mism <= 0.005 * want_bits.size, f"{mism} mismatched bits"

    def test_matches_binned_oracle_integer_centers(self, image):
        rng = np.random.default_rng(1)
        h, w = image.shape
        uv = np.stack(
            [rng.integers(19, w - 19, 48), rng.integers(19, h - 19, 48)], axis=-1
        ).astype(np.float32)
        self._check(image, uv, BriefOptions())

    def test_rounds_subpixel_centers(self, image):
        uv = np.array([[100.4, 80.6], [200.5, 120.2]], np.float32)
        self._check(image, uv, BriefOptions())

    def test_length_128(self, image):
        rng = np.random.default_rng(2)
        h, w = image.shape
        uv = np.stack(
            [rng.integers(19, w - 19, 16), rng.integers(19, h - 19, 16)], axis=-1
        ).astype(np.float32)
        self._check(image, uv, BriefOptions(length=128))

    def test_on_detected_corners(self, small_image):
        opts = DetectorOptions(min_feature_distance=20, min_valid_response=20.0, max_features=64)
        feats = odet.detect_good_features(small_image, 10, "harris", opts)
        uv = np.asarray(feats, np.float32)
        self._check(small_image, uv, BriefOptions())

    def test_border_rejection(self, image):
        uv = np.array([[5.0, 5.0], [image.shape[1] - 2.0, 40.0]], np.float32)
        f = Features.from_numpy(uv, 8)
        d = compute_descriptors(jnp.asarray(image), f, BriefOptions())
        assert not np.asarray(d.valid)[:2].any()
        assert np.asarray(d.words)[:2].sum() == 0

    def test_rotation_covariance(self, image):
        """The same corner rotated 90 deg yields a nearby descriptor — the
        steering makes bits approximately rotation-covariant."""
        from feature_detector_tpu.oracle import brief as obrief

        patch = image[100:201, 200:301]
        rot = np.rot90(patch).copy()
        opts = BriefOptions()
        b0, v0 = obrief.compute_one_binned(patch, (50, 50), opts)
        b1, v1 = obrief.compute_one_binned(rot, (50, 50), opts)
        assert v0 and v1
        dist = int((b0 != b1).sum())
        assert dist < 80, f"rotated descriptor distance {dist}"


class TestHammingMatcher:
    def test_distance_matrix_matches_oracle(self, rng):
        wa = rng.integers(0, 2**32, size=(16, 8), dtype=np.uint32)
        wb = rng.integers(0, 2**32, size=(24, 8), dtype=np.uint32)
        want = oracle.hamming_distance(wa, wb)
        from feature_detector_tpu.match.hamming import hamming_distance_matrix

        got = np.asarray(
            hamming_distance_matrix(
                jnp.asarray(wa), jnp.asarray(wb),
                jnp.ones(16, bool), jnp.ones(24, bool),
            )
        )
        np.testing.assert_array_equal(got, want)

    def test_identity_match(self, rng):
        w = rng.integers(0, 2**32, size=(10, 8), dtype=np.uint32)
        m = match_hamming(
            jnp.asarray(w), jnp.ones(10, bool), jnp.asarray(w), jnp.ones(10, bool),
            MatcherOptions(max_distance=0),
        )
        np.testing.assert_array_equal(np.asarray(m.index), np.arange(10))
        assert np.asarray(m.valid).all()

    def test_cross_check_rejects_collisions(self):
        # Two A-rows close to the same B-row: only the mutual best survives.
        wa = np.zeros((2, 8), np.uint32)
        wa[1, 0] = 1  # distance 1 from b0
        wb = np.zeros((1, 8), np.uint32)
        m = match_hamming(
            jnp.asarray(wa), jnp.ones(2, bool), jnp.asarray(wb), jnp.ones(1, bool),
            MatcherOptions(max_distance=64, cross_check=True),
        )
        got = np.asarray(m.valid)
        assert got[0] and not got[1]

    def test_invalid_slots_never_match(self, rng):
        w = rng.integers(0, 2**32, size=(6, 8), dtype=np.uint32)
        valid = np.array([True, True, False, True, False, True])
        m = match_hamming(
            jnp.asarray(w), jnp.asarray(valid), jnp.asarray(w), jnp.asarray(valid),
            MatcherOptions(max_distance=256),
        )
        assert not np.asarray(m.valid)[~valid].any()


class TestBlurAndUpright:
    def test_blur_changes_mxu_descriptors(self, image):
        """blur_sigma must actually reach the MXU path's patch extraction —
        it was once a silent no-op there (the int8 rewrite read the raw
        image), which let the VO tune itself against phantom settings."""
        import jax.numpy as jnp

        from feature_detector_tpu.core.config import BriefOptions, DetectorOptions
        from feature_detector_tpu.core.types import Features
        from feature_detector_tpu.frontend.detector import detect_good_features
        from feature_detector_tpu.kernels.brief import brief_compute

        opts = DetectorOptions(min_feature_distance=10, min_valid_response=10.0)
        feats = detect_good_features(
            jnp.asarray(image), Features.empty(256), "fast", 150, opts
        )
        w0, v0 = brief_compute(
            jnp.asarray(image), feats.uv, feats.valid, BriefOptions()
        )
        w2, v2 = brief_compute(
            jnp.asarray(image), feats.uv, feats.valid,
            BriefOptions(blur_sigma=2.0),
        )
        both = np.asarray(v0) & np.asarray(v2)
        assert both.sum() >= 10
        assert not np.array_equal(np.asarray(w0)[both], np.asarray(w2)[both])

    def test_upright_matches_zero_angle_steered(self, image):
        """Upright must equal the steered path evaluated at bin 0 for patches
        whose centroid angle falls in bin 0 — it is the same sampling matrix
        column block, not a different descriptor."""
        import jax.numpy as jnp

        from feature_detector_tpu.core.config import BriefOptions, DetectorOptions
        from feature_detector_tpu.core.types import Features
        from feature_detector_tpu.frontend.detector import detect_good_features
        from feature_detector_tpu.kernels.brief import brief_compute
        from feature_detector_tpu.oracle import brief as obrief

        opts = DetectorOptions(min_feature_distance=10, min_valid_response=10.0)
        feats = detect_good_features(
            jnp.asarray(image), Features.empty(256), "fast", 150, opts
        )
        wu, vu = brief_compute(
            jnp.asarray(image), feats.uv, feats.valid,
            BriefOptions(upright=True),
        )
        ws, vs = brief_compute(
            jnp.asarray(image), feats.uv, feats.valid, BriefOptions()
        )
        # Per-feature steering bins from the oracle's moment formula.
        uv = np.asarray(feats.uv)
        valid = np.asarray(feats.valid) & np.asarray(vu) & np.asarray(vs)
        same = []
        for i in np.nonzero(valid)[0]:
            x, y = int(round(uv[i, 0])), int(round(uv[i, 1]))
            patch = image[y - 8 : y + 9, x - 8 : x + 9].astype(np.float64)
            dx, dy = np.meshgrid(np.arange(-8, 9), np.arange(-8, 9), indexing="xy")
            theta = np.arctan2((dy * patch).sum(), (dx * patch).sum())
            b = int(np.round(theta * 30 / (2 * np.pi))) % 30
            if b == 0:
                same.append(i)
        assert len(same) >= 2
        np.testing.assert_array_equal(
            np.asarray(wu)[same], np.asarray(ws)[same]
        )

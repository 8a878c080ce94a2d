"""Float (L2/cosine) descriptor matcher for the NN detectors."""

import numpy as np
import jax.numpy as jnp

from feature_detector_tpu.match.float_matcher import FloatMatcherOptions, match_float


def _descs(rng, n, d=64):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_identity_self_match(rng):
    a = _descs(rng, 32)
    valid = jnp.ones(32, bool)
    m = match_float(jnp.asarray(a), valid, jnp.asarray(a), valid)
    np.testing.assert_array_equal(np.asarray(m.index), np.arange(32))
    assert np.asarray(m.valid).all()
    np.testing.assert_allclose(np.asarray(m.distance), 0.0, atol=2e-2)


def test_permutation_recovered(rng):
    a = _descs(rng, 48)
    perm = rng.permutation(48)
    b = a[perm]
    valid = jnp.ones(48, bool)
    m = match_float(jnp.asarray(a), valid, jnp.asarray(b), valid)
    inv = np.empty(48, np.int64)
    inv[perm] = np.arange(48)
    np.testing.assert_array_equal(np.asarray(m.index), inv)


def test_invalid_slots_excluded(rng):
    a = _descs(rng, 16)
    valid_a = jnp.asarray(np.arange(16) < 10)
    valid_b = jnp.asarray(np.arange(16) < 8)
    m = match_float(jnp.asarray(a), valid_a, jnp.asarray(a), valid_b)
    mv = np.asarray(m.valid)
    assert not mv[10:].any()
    assert (np.asarray(m.index)[mv] < 8).all()


def test_cross_check_rejects_asymmetric(rng):
    # Two A descriptors closest to the same B descriptor: only the mutual best
    # survives cross-check.
    b = _descs(rng, 4)
    a = b.copy()
    a[1] = b[0] + 0.05 * rng.normal(size=b.shape[1]).astype(np.float32)
    a[1] /= np.linalg.norm(a[1])
    valid = jnp.ones(4, bool)
    m = match_float(jnp.asarray(a), valid, jnp.asarray(b), valid)
    mv = np.asarray(m.valid)
    assert mv[0] and not mv[1]


def test_ratio_test(rng):
    # Descriptor equidistant to two B entries fails a strict ratio test.
    b = np.eye(8, 16, dtype=np.float32)[:2]
    a = (b[0] + b[1])[None, :]
    a /= np.linalg.norm(a)
    opts = FloatMatcherOptions(ratio=0.8, cross_check=False)
    m = match_float(
        jnp.asarray(a), jnp.ones(1, bool), jnp.asarray(b), jnp.ones(2, bool), opts
    )
    assert not np.asarray(m.valid)[0]


def test_l2_threshold(rng):
    a = _descs(rng, 8)
    b = -a  # maximally distant on the sphere
    opts = FloatMatcherOptions(metric="l2", max_distance=1.0, cross_check=False)
    m = match_float(
        jnp.asarray(a), jnp.ones(8, bool), jnp.asarray(b), jnp.ones(8, bool), opts
    )
    assert not np.asarray(m.valid).any()


class TestFloatDescriptorOverload:
    def test_pm1_matches_packed_bits(self, small_image):
        """C5 float-Vec overload (descriptor.h:43-62): bits -> ±1.0, invalid
        rows all-zero (quirk Q5)."""
        import jax.numpy as jnp

        from feature_detector_tpu.core.config import BriefOptions, DetectorOptions
        from feature_detector_tpu.core.types import Features
        from feature_detector_tpu.frontend.descriptor import (
            compute_descriptors,
            compute_descriptors_float,
        )
        from feature_detector_tpu.frontend.detector import detect_good_features

        opts = DetectorOptions(min_feature_distance=8, min_valid_response=20.0, max_features=64)
        feats = detect_good_features(
            jnp.asarray(small_image), Features.empty(64), "harris", 30, opts
        )
        bopts = BriefOptions(length=128)
        packed = compute_descriptors(jnp.asarray(small_image), feats, bopts)
        dense = np.asarray(compute_descriptors_float(jnp.asarray(small_image), feats, bopts))
        assert dense.shape == (64, 128)

        words = np.asarray(packed.words)
        valid = np.asarray(packed.valid)
        assert valid.sum() > 5
        bits = ((words[:, :, None] >> np.arange(32, dtype=np.uint32)) & 1).reshape(64, -1)[:, :128]
        want = np.where(valid[:, None], bits * 2.0 - 1.0, 0.0)
        np.testing.assert_array_equal(dense, want.astype(np.float32))
        # Invalid rows are exactly zero.
        assert (dense[~valid] == 0).all()

"""NN detector post-processing vs the NumPy oracle, and model shape contracts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from feature_detector_tpu.core.config import NNDetectorOptions, NNModelType
from feature_detector_tpu.core.types import Features
from feature_detector_tpu.frontend import nn_detector as F
from feature_detector_tpu.oracle import nn_postproc as oracle


def _rand_heatmap(rng, h=96, w=128):
    hm = rng.random((h, w)).astype(np.float32) * 0.2
    # Sprinkle some strong peaks.
    ys = rng.integers(5, h - 5, 40)
    xs = rng.integers(5, w - 5, 40)
    hm[ys, xs] = 0.5 + rng.random(40).astype(np.float32) * 0.5
    return hm


class TestPostprocessing:
    def test_mask_matches_oracle(self):
        opts = NNDetectorOptions(max_number_of_detected_features=64)
        existing = [(20.0, 30.0), (100.0, 50.0)]
        want = oracle.create_mask((96, 128), existing, opts)
        f = Features.from_numpy(np.array(existing, np.float32), 64)
        got = np.asarray(F.create_nn_mask((96, 128), f.uv, f.valid, opts))
        np.testing.assert_array_equal(got, want)

    def test_selection_matches_oracle(self, rng):
        opts = NNDetectorOptions(max_number_of_detected_features=64)
        hm = _rand_heatmap(rng)
        want = oracle.select_features(hm, [], opts)
        got = F.select_features_from_heatmap(
            jnp.asarray(hm), Features.empty(64), opts
        )
        uv, _ = got.to_numpy()
        assert len(uv) == len(want)
        np.testing.assert_allclose(uv, np.asarray(want, np.float32))

    def test_incremental_selection(self, rng):
        opts = NNDetectorOptions(max_number_of_detected_features=64)
        hm = _rand_heatmap(rng)
        seed = [(32.0, 32.0), (64.0, 48.0)]
        want = oracle.select_features(hm, list(seed), opts)
        f = Features.from_numpy(np.array(seed, np.float32), 64)
        got = F.select_features_from_heatmap(jnp.asarray(hm), f, opts)
        uv, _ = got.to_numpy()
        assert len(uv) == len(want)
        np.testing.assert_allclose(uv, np.asarray(want, np.float32))

    def test_descriptor_sampling_matches_oracle(self, rng):
        dm = rng.random((12, 16, 32)).astype(np.float32)
        feats = [(3.5, 9.0), (100.0, 60.0), (127.9, 95.9), (0.0, 0.0)]
        want = oracle.sample_descriptors(dm, feats)
        got = np.asarray(
            F.sample_descriptor_grid(jnp.asarray(dm), jnp.asarray(np.array(feats, np.float32)))
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestModels:
    def test_superpoint_shapes(self):
        from feature_detector_tpu.models.superpoint import SuperPoint

        m = SuperPoint()
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 96, 1))
        params = m.init(jax.random.PRNGKey(0), x)
        heat, desc = m.apply(params, x)
        assert heat.shape == (1, 64, 96)
        assert desc.shape == (1, 8, 12, 256)
        n = np.linalg.norm(np.asarray(desc)[0, 3, 4])
        assert abs(n - 1.0) < 1e-3
        # Cell softmax: heatmap sums to <= 1 per 8x8 cell (dustbin absorbs rest).
        cell = np.asarray(heat)[0, :8, :8].sum()
        assert cell <= 1.0 + 1e-4

    def test_disk_shapes(self):
        from feature_detector_tpu.models.disk import Disk

        m = Disk()
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 96, 3))
        params = m.init(jax.random.PRNGKey(0), x)
        heat, desc = m.apply(params, x)
        assert heat.shape == (1, 64, 96)
        assert desc.shape == (1, 64, 96, 128)
        assert float(heat.min()) >= 0.0 and float(heat.max()) <= 1.0

    def test_detector_end_to_end_random_weights(self, rng):
        """Full session flow on a small image with random weights
        (mirrors Initialize + DetectGoodFeaturesWithDescriptor)."""
        opts = NNDetectorOptions(
            max_image_rows=64,
            max_image_cols=96,
            max_number_of_detected_features=32,
            model_type=NNModelType.SUPERPOINT_HEATMAP,
        )
        det = F.NNFeaturePointDetector(opts)
        assert det.initialize()
        img = jnp.asarray(rng.integers(0, 255, (64, 96), np.uint8))
        feats, desc = det.detect(img)
        assert desc.shape == (32, 256)
        uv, _ = feats.to_numpy()
        # Detections stay inside the valid boundary.
        if len(uv):
            assert uv[:, 0].min() >= opts.invalid_boundary
            assert uv[:, 1].min() >= opts.invalid_boundary

"""Multi-device tests on the 8-device virtual CPU mesh (conftest sets
xla_force_host_platform_device_count=8): sharded execution must match the
single-device kernels exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from feature_detector_tpu.core.config import DetectorOptions, HarrisOptions
from feature_detector_tpu.core.types import Features
from feature_detector_tpu.frontend.detector import detect_good_features
from feature_detector_tpu.kernels import detect as K
from feature_detector_tpu.parallel.mesh import make_mesh
from feature_detector_tpu.parallel.frontend import (
    make_batched_frontend,
    make_row_sharded_response,
    make_two_frame_matcher,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, jax.devices()
    return make_mesh((8,), ("data",))


@pytest.fixture(scope="module")
def space_mesh():
    return make_mesh((8,), ("space",))


def _frame_stack(image, b=8):
    """B distinct frames: shifted crops of the example image."""
    h, w = 96, 144
    out = np.stack(
        [image[10 + 3 * i : 10 + 3 * i + h, 20 + 5 * i : 20 + 5 * i + w] for i in range(b)]
    )
    return out.astype(np.uint8)


class TestDataParallel:
    def test_batched_frontend_matches_per_frame(self, image, mesh):
        opts = DetectorOptions(min_feature_distance=10, min_valid_response=30.0, max_features=64)
        frames = _frame_stack(image)
        run = make_batched_frontend(mesh, "harris", 30, opts)
        feats, words, dvalid = jax.tree.map(np.asarray, run(jnp.asarray(frames)))

        for i in range(frames.shape[0]):
            single = detect_good_features(
                jnp.asarray(frames[i]), Features.empty(64), "harris", 30, opts
            )
            np.testing.assert_array_equal(np.asarray(single.valid), feats.valid[i])
            np.testing.assert_allclose(np.asarray(single.uv), feats.uv[i])

    def test_two_frame_matcher_runs(self, image, mesh):
        opts = DetectorOptions(min_feature_distance=10, min_valid_response=10.0, max_features=64)
        a = _frame_stack(image)
        b = np.roll(a, 2, axis=2)  # shifted copies -> should match well
        run = make_two_frame_matcher(mesh, "fast", 40, opts)
        fa, fb, matches = run(jnp.asarray(a), jnp.asarray(b))
        counts = np.asarray(matches.count)
        assert counts.shape == (8,)
        # Small crops leave few BRIEF-describable (19-px border) features;
        # every pair must still produce matches.
        assert (counts >= 1).all(), counts
        assert counts.sum() >= 24, counts


class TestSpatialParallel:
    def test_row_sharded_harris_matches_single_device(self, image, space_mesh):
        opts = DetectorOptions(min_valid_response=30.0)
        sub = HarrisOptions()
        img = np.asarray(image[:448, :640])  # 448 rows = 8 * 56
        mask = np.ones(img.shape, np.int32)
        mask[100:140, 200:300] = 0

        want = np.asarray(
            K.harris_response(jnp.asarray(img), jnp.asarray(mask), opts, sub)
        )
        run = make_row_sharded_response(space_mesh, "harris", opts, sub)
        got = np.asarray(run(jnp.asarray(img), jnp.asarray(mask)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)

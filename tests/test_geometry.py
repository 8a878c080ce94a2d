"""Multi-view geometry: triangulation, essential matrix, two-view init, PnP."""

import numpy as np
import jax.numpy as jnp

from feature_detector_tpu.slam import geometry, lie
from feature_detector_tpu.slam.camera import Pinhole, project

CAM = Pinhole(fx=300.0, fy=300.0, cx=160.0, cy=120.0)


def _scene(seed=0, n=64):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    pts[:, 2] += 6.0
    r_b = np.asarray(lie.so3_exp(jnp.asarray([0.02, 0.3, -0.01])), np.float32)
    c_b = np.array([1.2, 0.1, 0.2], np.float32)
    t_b = -r_b @ c_b
    uv_a = np.asarray(project(jnp.asarray(pts), CAM))
    pb = pts @ r_b.T + t_b
    uv_b = np.asarray(project(jnp.asarray(pb), CAM))
    return pts, r_b, t_b, uv_a, uv_b


class TestTriangulate:
    def test_exact_recovery(self):
        pts, r_b, t_b, uv_a, uv_b = _scene()
        rec, ok = geometry.triangulate(
            jnp.eye(3), jnp.zeros(3), jnp.asarray(r_b), jnp.asarray(t_b),
            jnp.asarray(uv_a), jnp.asarray(uv_b), CAM,
        )
        assert np.asarray(ok).all()
        np.testing.assert_allclose(np.asarray(rec), pts, atol=1e-2)

    def test_cheirality_flags_behind(self):
        pts, r_b, t_b, uv_a, uv_b = _scene()
        # A point behind both cameras: its projection rays still intersect but
        # at negative depth.
        bad = np.array([[0.0, 0.0, -5.0]], np.float32)
        uv_a_bad = np.asarray(project(jnp.asarray(bad), CAM))
        pb = bad @ r_b.T + t_b
        uv_b_bad = np.asarray(project(jnp.asarray(pb), CAM))
        _, ok = geometry.triangulate(
            jnp.eye(3), jnp.zeros(3), jnp.asarray(r_b), jnp.asarray(t_b),
            jnp.asarray(uv_a_bad), jnp.asarray(uv_b_bad), CAM,
        )
        assert not np.asarray(ok)[0]


class TestTwoViewInit:
    def test_recovers_relative_pose(self):
        pts, r_b, t_b, uv_a, uv_b = _scene(seed=1, n=96)
        valid = jnp.ones(len(pts), bool)
        r, t, rec, inlier = geometry.two_view_init(
            jnp.asarray(uv_a), jnp.asarray(uv_b), valid, CAM
        )
        np.testing.assert_allclose(np.asarray(r), r_b, atol=5e-3)
        # Translation recovered up to scale.
        t_est = np.asarray(t)
        cos = abs(t_est @ t_b) / (np.linalg.norm(t_est) * np.linalg.norm(t_b))
        assert cos > 0.999
        assert np.asarray(inlier).sum() > 80

    def test_rejects_outliers(self):
        pts, r_b, t_b, uv_a, uv_b = _scene(seed=2, n=96)
        uv_b = uv_b.copy()
        rng = np.random.default_rng(3)
        bad = rng.choice(96, 12, replace=False)
        uv_b[bad] += rng.uniform(30, 80, (12, 2)).astype(np.float32)
        valid = jnp.ones(len(pts), bool)
        r, t, _, inlier = geometry.two_view_init(
            jnp.asarray(uv_a), jnp.asarray(uv_b), valid, CAM
        )
        np.testing.assert_allclose(np.asarray(r), r_b, atol=2e-2)
        inl = np.asarray(inlier)
        assert not inl[bad].any() or inl[bad].sum() <= 2


class TestPnP:
    def test_refines_perturbed_pose(self):
        pts, r_b, t_b, uv_a, uv_b = _scene(seed=4)
        d = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.03, 0.01])), np.float32)
        r0 = jnp.asarray(d @ r_b)
        t0 = jnp.asarray(t_b + np.array([0.05, -0.04, 0.08], np.float32))
        w = jnp.ones(len(pts))
        r, t = r0, t0
        for _ in range(6):
            r, t = geometry.pnp_refine(r, t, jnp.asarray(pts), jnp.asarray(uv_b), w, CAM)
        np.testing.assert_allclose(np.asarray(r), r_b, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), t_b, atol=1e-4)


class TestEpipolarGate:
    def test_recovers_inliers_under_outliers(self):
        """epipolar_inlier_gate (the fused VO's cheap match gate) must keep
        the true correspondences and reject gross mismatches."""
        pts, r_b, t_b, uv_a, uv_b = _scene(seed=4, n=96)
        rng = np.random.default_rng(5)
        uv_b = uv_b.copy()
        bad = rng.choice(96, size=20, replace=False)
        uv_b[bad] += rng.uniform(15, 60, size=(20, 2)) * np.sign(
            rng.normal(size=(20, 2))
        )
        valid = np.ones(96, bool)
        inl = np.asarray(
            geometry.epipolar_inlier_gate(
                jnp.asarray(uv_a), jnp.asarray(uv_b), jnp.asarray(valid), CAM
            )
        )
        good = np.ones(96, bool)
        good[bad] = False
        # Essentially all clean matches survive; corrupted ones mostly die
        # (a mismatch may rarely land near an epipolar line).
        assert inl[good].mean() >= 0.9, inl[good].mean()
        assert inl[bad].mean() <= 0.25, inl[bad].mean()

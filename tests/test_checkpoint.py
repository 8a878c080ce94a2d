"""Orbax checkpoint/resume for model params and BA state."""

import numpy as np
import jax
import jax.numpy as jnp

from feature_detector_tpu.utils.checkpoint import (
    CheckpointManager,
    restore_pytree,
    save_pytree,
)


def test_pytree_roundtrip(tmp_path):
    tree = {
        "w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
        "b": jnp.ones(4, jnp.bfloat16),
        "step": jnp.int32(7),
    }
    path = str(tmp_path / "ckpt")
    save_pytree(path, tree)
    back = restore_pytree(path, template=tree)
    assert back["b"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(back["w"]), np.asarray(tree["w"]))
    assert int(back["step"]) == 7


def test_model_params_roundtrip(tmp_path):
    from feature_detector_tpu.models.superpoint import SuperPoint

    model = SuperPoint()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 48, 1)))
    path = str(tmp_path / "sp")
    save_pytree(path, params)
    back = restore_pytree(path, template=params)
    la, lb = jax.tree.leaves(params), jax.tree.leaves(back)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_manager_latest_and_retention(tmp_path):
    tree = {"x": jnp.zeros(3)}
    with CheckpointManager(str(tmp_path / "mgr"), max_to_keep=2) as mgr:
        for step in range(4):
            mgr.save(step, {"x": jnp.full(3, float(step))})
        assert mgr.latest_step() == 3
        back = mgr.restore(tree)
        np.testing.assert_allclose(np.asarray(back["x"]), 3.0)
        # Retention: oldest steps dropped.
        assert mgr.latest_step() == 3


def test_ba_state_roundtrip(tmp_path):
    from feature_detector_tpu.slam.ba import BAProblem

    problem = BAProblem(
        rot=jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
        trans=jnp.zeros((2, 3)),
        points=jnp.ones((5, 3)),
        obs_cam=jnp.zeros((5, 2), jnp.int32),
        obs_uv=jnp.zeros((5, 2, 2)),
    )
    path = str(tmp_path / "ba")
    save_pytree(path, problem._asdict())
    back = restore_pytree(path, template=problem._asdict())
    np.testing.assert_array_equal(np.asarray(back["points"]), np.asarray(problem.points))

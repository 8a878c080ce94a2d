"""A2 numeric-check harness (utils/checks.py) and A3 elastic recovery
(utils/recovery.py): checkify NaN traps, and a training loop that crashes /
goes non-finite mid-run, rolls back to the last checkpoint, and completes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from feature_detector_tpu.utils.checks import assert_all_finite, checked
from feature_detector_tpu.utils.recovery import ResilientLoop, default_health, devices_alive


class TestChecks:
    def test_checked_passes_clean_fn(self):
        f = checked(jax.jit(lambda x: jnp.sqrt(x) * 2.0))
        out = f(jnp.asarray([1.0, 4.0]))
        np.testing.assert_allclose(np.asarray(out), [2.0, 4.0])

    def test_checked_traps_nan(self):
        f = checked(jax.jit(lambda x: jnp.sqrt(x)))
        with pytest.raises(Exception, match="nan"):
            f(jnp.asarray([-1.0]))

    def test_assert_all_finite(self):
        assert_all_finite({"a": jnp.ones(3)}, "ok")
        with pytest.raises(FloatingPointError, match="bad/x"):
            assert_all_finite({"bad": {"x": jnp.asarray([1.0, np.inf])}}, "ba")

    def test_devices_alive(self):
        assert devices_alive() is True


class TestResilientLoop:
    def test_straight_run_and_resume(self, tmp_path):
        calls = []

        def step(state, s):
            calls.append(s)
            return {"w": state["w"] + 1.0, "step": jnp.asarray(s + 1)}

        loop = ResilientLoop(str(tmp_path / "ck"), save_every=4)
        out = loop.run({"w": jnp.zeros(2), "step": jnp.asarray(0)}, step, 10)
        assert float(out["w"][0]) == 10.0

        # A fresh loop over the same directory resumes, not restarts.
        calls.clear()
        loop2 = ResilientLoop(str(tmp_path / "ck"), save_every=4)
        out2 = loop2.run({"w": jnp.zeros(2), "step": jnp.asarray(0)}, step, 12)
        assert float(out2["w"][0]) == 12.0
        assert min(calls) == 10  # only the tail re-ran

    def test_crash_rolls_back_and_completes(self, tmp_path):
        crashed = {"done": False}

        def step(state, s):
            if s == 6 and not crashed["done"]:
                crashed["done"] = True
                raise RuntimeError("injected device failure")
            return {"w": state["w"] + 1.0}

        loop = ResilientLoop(str(tmp_path / "ck"), save_every=4, max_retries=2)
        out = loop.run({"w": jnp.zeros(1)}, step, 10)
        assert float(out["w"][0]) == 10.0  # replayed window, exact result

    def test_nonfinite_state_rolls_back(self, tmp_path):
        poisoned = {"done": False}

        def step(state, s):
            if s == 5 and not poisoned["done"]:
                poisoned["done"] = True
                return {"w": state["w"] * np.nan}
            return {"w": state["w"] + 1.0}

        loop = ResilientLoop(str(tmp_path / "ck"), save_every=3, max_retries=2)
        out = loop.run({"w": jnp.zeros(1)}, step, 9)
        assert float(out["w"][0]) == 9.0

    def test_deterministic_failure_surfaces(self, tmp_path):
        def step(state, s):
            if s == 5:
                raise RuntimeError("permanent fault")
            return {"w": state["w"] + 1.0}

        loop = ResilientLoop(str(tmp_path / "ck"), save_every=3, max_retries=2)
        with pytest.raises(RuntimeError, match="permanent fault"):
            loop.run({"w": jnp.zeros(1)}, step, 9)

    def test_default_health(self):
        assert default_health({"a": jnp.ones(2)})
        assert not default_health({"a": jnp.asarray([np.nan])})

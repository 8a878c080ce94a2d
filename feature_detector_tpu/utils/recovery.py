"""Failure detection + elastic recovery (SURVEY.md §5 row 3).

The reference's only failure handling is bool-return + log
(feature_point_detector.cpp:9, nn_feature_point_detector.cpp:41-47).  A
multi-host TPU training/solve job needs more: detect a failed step (exception
from the runtime, non-finite loss, dead device), roll back to the last good
checkpoint, and resume — deterministically, since the step function is a pure
function of (state, step index).

`ResilientLoop` packages that pattern around utils/checkpoint.CheckpointManager:

    loop = ResilientLoop(ckpt_dir, save_every=50)
    final_state = loop.run(init_state, step_fn, n_steps)

- `step_fn(state, step) -> state` must be pure w.r.t. (state, step) — the
  standard jitted train step.  On restart the loop resumes from the last
  checkpointed step, so a crash replays at most `save_every` steps.
- Failure detection: exceptions from the step, plus an optional
  `health_fn(state) -> bool` (default: every float leaf finite) evaluated at
  checkpoint boundaries; an unhealthy state triggers rollback exactly like a
  crash.
- `max_retries` bounds consecutive rollbacks of the SAME step (a
  deterministic NaN would loop forever; surfacing it beats hiding it).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional

import jax
import numpy as np

from .checkpoint import CheckpointManager
from .log import report_info, report_warn


def default_health(state: Any) -> bool:
    """True iff every float leaf is finite."""
    for leaf in jax.tree_util.tree_leaves(state):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            return False
    return True


def devices_alive() -> bool:
    """Cheap device liveness probe: a trivial computation must round-trip.

    On a healthy backend this is sub-ms; a wedged device/runtime raises or
    hangs at the caller's timeout layer."""
    try:
        import jax.numpy as jnp

        return int(jax.device_get(jnp.zeros(()) + 1)) == 1
    except Exception:
        return False


class ResilientLoop:
    def __init__(
        self,
        checkpoint_dir: str,
        *,
        save_every: int = 100,
        max_to_keep: int = 3,
        max_retries: int = 3,
        health_fn: Callable[[Any], bool] = default_health,
        backoff_s: float = 0.0,
    ):
        self.manager = CheckpointManager(checkpoint_dir, max_to_keep=max_to_keep)
        self.save_every = save_every
        self.max_retries = max_retries
        self.health_fn = health_fn
        self.backoff_s = backoff_s

    def run(self, init_state: Any, step_fn: Callable[[Any, int], Any], n_steps: int) -> Any:
        """Run ``step_fn`` for ``n_steps``, resuming from the latest
        checkpoint when one exists; returns the final state."""
        latest = self.manager.latest_step()
        if latest is not None:
            state = self.manager.restore(init_state, step=latest)
            start = latest
            report_info("recovery: resuming from checkpointed step %d", latest)
        else:
            state = init_state
            self.manager.save(0, state)
            start = 0

        step = start
        retries = 0
        while step < n_steps:
            window_end = min(step + self.save_every, n_steps)
            try:
                new_state = state
                for s in range(step, window_end):
                    new_state = step_fn(new_state, s)
                jax.block_until_ready(jax.tree_util.tree_leaves(new_state)[0])
                if not self.health_fn(new_state):
                    raise FloatingPointError(
                        f"health check failed after step window {step}..{window_end}"
                    )
            except Exception as e:  # crash OR failed health check -> roll back
                retries += 1
                report_warn(
                    "recovery: step window %d..%d failed (%s); rollback #%d",
                    step, window_end, type(e).__name__, retries,
                )
                if retries > self.max_retries:
                    raise
                good = self.manager.latest_step()
                state = self.manager.restore(state, step=good)
                step = int(good)
                if self.backoff_s:
                    time.sleep(self.backoff_s * retries)
                continue
            retries = 0
            state = new_state
            step = window_end
            self.manager.save(step, state)
        self.manager.close()
        return state

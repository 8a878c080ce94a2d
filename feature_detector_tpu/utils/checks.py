"""Numeric-check harness (SURVEY.md §5 "race detection / sanitizers" row).

The reference has no sanitizers (single-threaded, no -fsanitize); the
TPU-native analogue is `jax.experimental.checkify` — in-graph NaN/Inf and
out-of-bounds guards that survive jit — plus host-side finiteness asserts for
pipeline boundaries.

Usage:
    checked_step = checked(train_step)          # float + index checks
    out = checked_step(params, batch)           # raises JaxRuntimeError w/ site

    assert_all_finite({"points": pts}, "ba")    # host boundary guard
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify


def checked(fn: Callable, errors=None) -> Callable:
    """Wrap ``fn`` with checkify float (NaN/Inf) + index (OOB gather/scatter)
    checks; the wrapper re-raises the first triggered check as an exception
    with its trace location.  Jit-compatible: checkify runs inside the jit.
    """
    if errors is None:
        errors = checkify.float_checks | checkify.index_checks

    checked_fn = checkify.checkify(fn, errors=errors)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_all_finite(tree: Any, name: str = "value") -> None:
    """Host-side boundary guard: raise FloatingPointError naming the first
    non-finite leaf (pipeline-stage handoffs; slam/sequence.py uses the same
    pattern inline)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{name}: non-finite values in leaf '{key}' ({bad}/{arr.size} elements)"
            )


def debug_nans(enable: bool = True) -> None:
    """Global NaN debugging (jax_debug_nans): every primitive re-runs eagerly
    on NaN production — slow, for triage sessions only."""
    jax.config.update("jax_debug_nans", enable)

"""Timing — the TickTock equivalent, made JAX-aware.

The reference brackets every demo stage with TickTock wall-clock timers
(SURVEY.md §5 tracing row; test_feature_point_detector.cpp:35-38).  Naive
wall-clock timing lies under JAX's async dispatch, so the JAX-aware helpers
here call ``jax.block_until_ready`` at the measurement boundaries and separate
compile time from steady-state time.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple


class TickTock:
    """TickTock::TockTickInMillisecond equivalent: reading the timer also
    restarts it."""

    def __init__(self):
        self._t0 = time.perf_counter()

    def tick(self) -> None:
        self._t0 = time.perf_counter()

    def tock_tick_in_millisecond(self) -> float:
        now = time.perf_counter()
        ms = (now - self._t0) * 1e3
        self._t0 = now
        return ms

    def tock_in_millisecond(self) -> float:
        return (time.perf_counter() - self._t0) * 1e3


def time_jitted(fn: Callable, *args, iters: int = 10, warmup: int = 1) -> Tuple[float, float]:
    """Times a jitted callable correctly under async dispatch.

    Returns (compile_plus_first_call_ms, steady_state_ms_per_call): the first
    call includes tracing + XLA compilation; steady state blocks once after
    ``iters`` dispatches so dispatch overheads pipeline as they would in a
    real loop.
    """
    import jax

    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    first_ms = (time.perf_counter() - t0) * 1e3

    for _ in range(max(warmup - 1, 0)):
        out = fn(*args)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    steady_ms = (time.perf_counter() - t0) * 1e3 / iters
    return first_ms, steady_ms


class trace_annotation:
    """Context manager adding a named region to jax.profiler traces (and
    costing nothing when no trace is active)."""

    def __init__(self, name: str):
        self._name = name
        self._ctx = None

    def __enter__(self):
        import jax.profiler

        self._ctx = jax.profiler.TraceAnnotation(self._name)
        self._ctx.__enter__()
        return self

    def __exit__(self, *exc):
        return self._ctx.__exit__(*exc)

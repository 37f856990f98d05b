"""Wall-clock stopwatch + device-timing harness.

Parity with the reference ``common/timecost.h:29-77`` (absl-clock
stopwatch used for the per-phase optimization/marginalization/tracking
costs), extended with the TPU-appropriate tools the reference lacks:
``device_time`` excludes dispatch latency by timing a blocked re-execution,
and ``trace`` wraps the JAX profiler for real kernel-level traces
(SURVEY §5.1).
"""

from __future__ import annotations

import contextlib
import time

import jax


class TimeCost:
    """Stopwatch: construct to start, ``costms()`` to read, ``restart()``."""

    def __init__(self):
        self._t0 = time.perf_counter()

    def restart(self) -> None:
        self._t0 = time.perf_counter()

    def costs(self) -> float:
        return time.perf_counter() - self._t0

    def costms(self) -> float:
        return self.costs() * 1e3


def device_time(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median wall seconds per call of ``fn(*args)`` with the result
    blocked (``jax.block_until_ready``) — the standard dispatch-excluding
    kernel timing harness. ``fn`` should already be jitted."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return samples[len(samples) // 2]


@contextlib.contextmanager
def trace(log_dir: str):
    """JAX profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

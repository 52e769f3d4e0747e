"""Profiling helpers: step timing + jax.profiler trace capture.

The reference had no profiling at all (SURVEY.md §5 — only tqdm bars).
Here: a throughput meter the train driver reports per epoch, and a
context manager around ``jax.profiler`` for on-demand traces.
"""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    """Tracks steps/sec and images/sec over a window.

    Note: under a remote-TPU tunnel, per-step host timing includes
    dispatch pipelining; the numbers are end-to-end wall throughput
    (what the user experiences), not pure device time — bench.py
    measures the latter.
    """

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0
        self._images = 0

    def step(self, batch_size: int):
        self._steps += 1
        self._images += batch_size

    @property
    def seconds(self) -> float:
        return time.perf_counter() - self._t0

    def rates(self):
        dt = max(self.seconds, 1e-9)
        return self._steps / dt, self._images / dt


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

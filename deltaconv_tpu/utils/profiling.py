"""Profiling and throughput measurement.

The auxiliary observability layer the reference lacks (SURVEY.md §5):
``trace`` wraps ``jax.profiler`` traces for TensorBoard viewing, and
``Throughput`` is the clouds/sec meter used for the BASELINE metric.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["trace", "Throughput"]


@contextlib.contextmanager
def trace(logdir: str):
    """Captures a jax.profiler trace into ``logdir`` (view with
    TensorBoard's profile plugin)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Items/sec meter with warmup exclusion and device sync.

    Usage::

        meter = Throughput(warmup=2)
        for batch in loader:
            out = step(batch)
            meter.tick(batch_size, sync=out)
        print(meter.rate())
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._count = 0
        self._items = 0
        self._start: Optional[float] = None

    def tick(self, items: int, sync=None):
        if sync is not None:
            jax.block_until_ready(sync)
        self._count += 1
        if self._count == self.warmup:
            self._start = time.perf_counter()
        elif self._count > self.warmup:
            self._items += items

    def rate(self) -> float:
        if self._start is None or self._items == 0:
            return 0.0
        return self._items / (time.perf_counter() - self._start)

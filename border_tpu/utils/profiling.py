"""Profiler hooks.

≙ SURVEY.md §5.1: the reference only keeps coarse wall-clock averages
(average_opt_time / average_sample_time, border-core/src/trainer.rs:163-174).
Here: those same derived metrics are first-class Records emitted by the
trainers, plus real device traces via jax.profiler for xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace (viewable in tensorboard/xprof).

    No-op when ``log_dir`` is falsy, so call sites can leave it wired.
    """
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Stopwatch:
    """Accumulating wall-clock timer (≙ the SystemTime delta accumulation
    in trainer.rs:163-174)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total += time.perf_counter() - self._t0
        self.count += 1
        return False

    @property
    def mean_ms(self) -> float:
        return 1e3 * self.total / max(self.count, 1)

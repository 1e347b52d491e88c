"""Profiling + throughput observability.

The reference has no tracing/profiling subsystem (SURVEY.md §5 — the
closest thing is epoch timing columns in its rich dashboard). The TPU build
provides:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory (XLA op breakdown, HBM usage);
* :class:`ThroughputMeter` — rolling utterances/sec meter, the framework's
  north-star metric, used by the trainers' EpochMetrics and bench.py.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Profile the enclosed block with jax.profiler when ``log_dir`` set."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Rolling utterances/sec with total + windowed views."""

    def __init__(self, window: int = 50):
        self.window = window
        self._events: list[tuple[float, int]] = []  # (t, n_utts)
        self._t0 = time.perf_counter()
        self._total = 0

    def update(self, n_utts: int) -> None:
        now = time.perf_counter()
        self._total += n_utts
        self._events.append((now, n_utts))
        if len(self._events) > self.window:
            self._events.pop(0)

    @property
    def total_utt_s(self) -> float:
        elapsed = time.perf_counter() - self._t0
        return self._total / elapsed if elapsed > 0 else 0.0

    @property
    def window_utt_s(self) -> float:
        if len(self._events) < 2:
            return self.total_utt_s
        span = self._events[-1][0] - self._events[0][0]
        n = sum(e[1] for e in self._events[1:])
        return n / span if span > 0 else 0.0

"""Wall-clock timers + XLA profiler capture."""

from __future__ import annotations

import contextlib
import time


class Timer:
    """Accumulating wall-clock timer (reference: util.cc timers [U])."""

    def __init__(self):
        self.total = 0.0
        self.count = 0
        self._start = None

    def start(self):
        self._start = time.perf_counter()
        return self

    def stop(self) -> float:
        dt = time.perf_counter() - self._start
        self.total += dt
        self.count += 1
        self._start = None
        return dt

    @property
    def mean(self) -> float:
        return self.total / self.count if self.count else 0.0

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture an XLA device trace viewable in TensorBoard's profile
    plugin — per-op device timing on TPU (the rebuild's answer to the
    reference's stdout interval stats)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

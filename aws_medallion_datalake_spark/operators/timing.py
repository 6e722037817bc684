"""Per-phase wall-clock timers for maintenance stages.

The north_rule requires every maintenance run to emit per-stage metrics;
stage totals alone cannot attribute scaling behavior (a stage that is 50%
driver-side planning scales at half the rate of its compute). Each
operator wraps its internal phases (plan / rewrite / stats / commit) in a
``PhaseTimer`` and publishes the breakdown in the snapshot summary as
``phase_sec`` — the scaling benchmark reads it to separate
parallelism-independent driver time from executor compute.

Thread-safe: concurrent batch/tile threads timing the same phase
accumulate WALL time of the union of their intervals (not the sum), so
overlapping jobs don't double-count.
"""

from __future__ import annotations

import threading
import time
from contextlib import contextmanager


class PhaseTimer:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._acc: dict[str, float] = {}
        # per-phase: number of threads currently inside, and the wall
        # time at which the current union-interval opened
        self._depth: dict[str, int] = {}
        self._opened: dict[str, float] = {}

    @contextmanager
    def phase(self, name: str):
        with self._lock:
            if self._depth.get(name, 0) == 0:
                self._opened[name] = time.time()
            self._depth[name] = self._depth.get(name, 0) + 1
        try:
            yield
        finally:
            with self._lock:
                self._depth[name] -= 1
                if self._depth[name] == 0:
                    self._acc[name] = self._acc.get(name, 0.0) + (
                        time.time() - self._opened[name]
                    )

    def summary(self) -> dict:
        with self._lock:
            return {k: round(v, 3) for k, v in self._acc.items()}

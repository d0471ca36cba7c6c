"""Host-side stage timing (aux subsystem: tracing/profiling).

The reference instruments every pipeline stage with a ``TicToc`` stopwatch
and running-average printouts (``vins_estimator/src/utility/tic_toc.h``,
``estimator_nodelet.cpp:449-455,558-565``).  Here the device side is
profiled with ``jax.profiler``; this module provides the host-side
running-average stage timer used by the stream runner and bench harness.
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict


class StageTimer:
    """Accumulates per-stage wall-clock with running averages."""

    def __init__(self) -> None:
        self.total: Dict[str, float] = collections.defaultdict(float)
        self.count: Dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.total[name] += dt
            self.count[name] += 1

    def mean_ms(self, name: str) -> float:
        c = self.count[name]
        return 1e3 * self.total[name] / c if c else 0.0

    def summary(self) -> Dict[str, float]:
        return {k: self.mean_ms(k) for k in sorted(self.total)}

    def report(self) -> str:
        return " | ".join(f"{k}: {v:.2f}ms avg" for k, v in self.summary().items())

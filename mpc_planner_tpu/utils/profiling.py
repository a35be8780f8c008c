"""Scoped profiling + benchmarkers.

TPU-native equivalent of ros_tools profiling (SURVEY.md §5): the
reference wraps every phase in PROFILE_SCOPE and aggregates wall-clock
Benchmarkers (planner.cpp:69-75,124,134). Here a single `Profiler` yields
both: nestable scopes with running stats, chrome-trace export, and
optional hooks into jax.profiler for device traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, List, Optional


class ScopeStats:
    __slots__ = ("count", "total", "min", "max", "last", "samples")

    def __init__(self):
        self.count = 0
        self.total = 0.0
        self.min = float("inf")
        self.max = 0.0
        self.last = 0.0
        self.samples: list = []

    def add(self, dt: float) -> None:
        self.count += 1
        self.total += dt
        self.min = min(self.min, dt)
        self.max = max(self.max, dt)
        self.last = dt
        self.samples.append(dt)

    @property
    def mean(self) -> float:
        return self.total / self.count if self.count else 0.0

    @property
    def median(self) -> float:
        if not self.samples:
            return 0.0
        import statistics

        return statistics.median(self.samples)


class Profiler:
    def __init__(self):
        self.stats: Dict[str, ScopeStats] = defaultdict(ScopeStats)
        self.events: List[dict] = []
        self.record_trace = False
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def scope(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - start
            self.stats[name].add(dt)
            if self.record_trace:
                self.events.append(
                    {
                        "name": name,
                        "ph": "X",
                        "ts": (start - self._t0) * 1e6,
                        "dur": dt * 1e6,
                        "pid": 0,
                        "tid": 0,
                    }
                )

    def export_chrome_trace(self, path: str) -> None:
        """Chrome-tracing JSON like the reference's Instrumentor."""
        with open(path, "w") as f:
            json.dump({"traceEvents": self.events}, f)

    def summary(self) -> str:
        lines = []
        for name, s in sorted(self.stats.items()):
            lines.append(
                f"{name:24s} n={s.count:5d} mean={s.mean*1e3:8.2f}ms "
                f"median={s.median*1e3:8.2f}ms "
                f"min={s.min*1e3:8.2f}ms max={s.max*1e3:8.2f}ms"
            )
        return "\n".join(lines)

    def reset(self) -> None:
        self.stats.clear()
        self.events.clear()
        self._t0 = time.perf_counter()


PROFILER = Profiler()

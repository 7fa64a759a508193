"""Structured metrics / observability.

Replaces the reference's RCLCPP hierarchical step logging (SURVEY.md
section 5: per-component child loggers, counts at tracker.cpp:79,303,311,
initializer.cpp:127,159-160) with counter/series collection that costs
nothing on the device hot path: all values are already fetched per chunk in
VOStepOut, so recording them is host-side bookkeeping.
"""

from __future__ import annotations

import json
import logging
import time
from collections import defaultdict
from typing import Any


def get_logger(name: str) -> logging.Logger:
    """Hierarchical loggers mirroring the reference's child-logger scheme
    (mono_vo.cpp:14-18): mono_vo, mono_vo.initializer, mono_vo.tracker."""
    logger = logging.getLogger(f"mono_vo.{name}" if name else "mono_vo")
    return logger


class MetricsCollector:
    """Per-stage counters + latency series with JSON export."""

    def __init__(self):
        self.counters: dict[str, float] = defaultdict(float)
        self.series: dict[str, list[float]] = defaultdict(list)
        self._timers: dict[str, float] = {}

    def count(self, name: str, value: float = 1.0) -> None:
        self.counters[name] += value

    def record(self, name: str, value: float) -> None:
        self.series[name].append(float(value))

    def start(self, name: str) -> None:
        self._timers[name] = time.perf_counter()

    def stop(self, name: str) -> float:
        dt = time.perf_counter() - self._timers.pop(name)
        self.series[f"{name}_seconds"].append(dt)
        return dt

    def record_step(self, outs) -> None:
        """Ingest a VOStepOut batch (already on host)."""
        import numpy as np
        valid = np.asarray(outs.valid)
        self.count("frames", len(valid))
        self.count("frames_valid", int(valid.sum()))
        self.count("keyframes_added", int(np.asarray(outs.kf_added).sum()))
        for v in np.asarray(outs.n_tracked)[valid]:
            self.series["n_tracked"].append(float(v))

    def summary(self) -> dict[str, Any]:
        import numpy as np
        out: dict[str, Any] = dict(self.counters)
        for name, vals in self.series.items():
            if vals:
                arr = np.asarray(vals)
                out[f"{name}_mean"] = float(arr.mean())
                out[f"{name}_p50"] = float(np.percentile(arr, 50))
                out[f"{name}_p95"] = float(np.percentile(arr, 95))
        return out

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)

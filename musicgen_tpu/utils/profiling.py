"""Profiling / observability helpers.

The reference has NO tracing or profiling beyond ad-hoc time.time() probes
(SURVEY.md §5.1). Here: jax.profiler trace capture, step-time meters with
tokens/sec, and device memory probes.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-time / throughput meter."""

    def __init__(self, tokens_per_step: int = 0, window: int = 50):
        self.tokens_per_step = tokens_per_step
        self.window = window
        self.times = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        if not self.times:
            return 0.0
        return 1.0 / (sum(self.times) / len(self.times))

    @property
    def tokens_per_sec(self) -> float:
        return self.steps_per_sec * self.tokens_per_step

    def stats(self) -> Dict[str, float]:
        return {
            "steps_per_sec": self.steps_per_sec,
            "tokens_per_sec": self.tokens_per_sec,
            "mean_step_ms": 1e3 * (np.mean(self.times) if self.times else 0.0),
        }


def device_memory() -> Dict[str, Dict[str, int]]:
    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": int(stats.get("bytes_in_use", 0)),
                "peak_bytes_in_use": int(stats.get("peak_bytes_in_use", 0)),
                "bytes_limit": int(stats.get("bytes_limit", 0)),
            }
    return out

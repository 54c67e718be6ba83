"""Profiling and step-timing instrumentation.

The reference has no profiler — only ad-hoc wall-clock prints
(reference: src/cem/trajectory_sampler.py:81-83,176-180,
src/prediction/trainer.py:777-782). The rebuild adds first-class hooks:
`jax.profiler` traces on demand and an EMA step timer that writes per-step
timings into the metrics stream.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace viewable in xprof/tensorboard."""
    if not enabled:
        yield
        return
    path = os.path.join(log_dir, "profile")
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """EMA wall-clock timer for jitted steps (block_until_ready-aware)."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema_s: Optional[float] = None
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.ema_s = dt if self.ema_s is None else (
            self.alpha * dt + (1 - self.alpha) * self.ema_s
        )
        return False

    def throughput(self, items: int) -> float:
        """items/sec at the current EMA step time."""
        if not self.ema_s:
            return 0.0
        return items / self.ema_s


def device_memory_stats() -> dict:
    """Per-device HBM usage when the backend exposes it."""
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d.id)] = {
                "bytes_in_use": stats.get("bytes_in_use", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
            }
    return out

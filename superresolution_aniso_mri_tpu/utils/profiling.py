"""Profiling / tracing utilities.

The reference has no tracing at all (SURVEY.md §5 — tqdm bars only).
Here: jax.profiler trace capture around any code block, plus lightweight
step-time statistics for the train loop.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock statistics per named phase (data / step / eval ...)."""

    def __init__(self):
        self._times: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def measure(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._times[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self._times.items():
            arr = np.asarray(vals)
            out[name] = {
                "count": int(arr.size),
                "mean_s": float(arr.mean()),
                "median_s": float(np.median(arr)),
                "p95_s": float(np.percentile(arr, 95)),
                "total_s": float(arr.sum()),
            }
        return out

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.summary().items()):
            lines.append(f"{name:>12}: n={s['count']:<6} "
                         f"mean={s['mean_s'] * 1e3:8.2f}ms "
                         f"p50={s['median_s'] * 1e3:8.2f}ms "
                         f"p95={s['p95_s'] * 1e3:8.2f}ms "
                         f"total={s['total_s']:8.2f}s")
        return "\n".join(lines)


def device_memory_stats(device=None) -> Optional[Dict]:
    """Live/peak HBM usage of a device, when the backend reports it
    (the reference's GPU memory printer equivalent,
    kwatsch/training_utils.py:28-33)."""
    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", None)
    return stats() if callable(stats) else None

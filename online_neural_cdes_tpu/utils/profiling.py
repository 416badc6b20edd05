"""Profiling / tracing utilities.

The reference's observability surface is NFE counters, wall-clock per
epoch, and peak CUDA memory (SURVEY.md §5; reference trainer.py:447-469,
529-541).  Equivalents here, plus ``jax.profiler`` trace capture for
TensorBoard and a *correct* device timer: on the experimental axon TPU
backend ``block_until_ready`` does not reliably block, so synchronisation
is a host transfer of a value that depends on the computation.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np

__all__ = ["device_sync", "DeviceTimer", "trace", "device_memory_mb", "nfe_per_second"]


def device_sync(value) -> None:
    """Force completion of everything ``value`` depends on (host transfer —
    see module docstring for why not block_until_ready)."""
    leaf = jax.tree.leaves(value)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


class DeviceTimer:
    """with DeviceTimer() as t: out = step(...); t.sync(out)
    -> t.elapsed seconds of true device+dispatch time."""

    def __enter__(self):
        self._start = time.perf_counter()
        self.elapsed = None
        return self

    def sync(self, value):
        device_sync(value)
        self.elapsed = time.perf_counter() - self._start

    def __exit__(self, *exc):
        if self.elapsed is None:
            self.elapsed = time.perf_counter() - self._start
        return False


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_mb(device=None) -> Optional[float]:
    """Peak device memory in MB (the CUDA max_memory_allocated analogue)."""
    device = device or jax.local_devices()[0]
    try:
        stats = device.memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            return stats["peak_bytes_in_use"] / 2**20
    except Exception:
        pass
    return None


def nfe_per_second(nfe: int, seconds: float) -> float:
    """The paper's efficiency metric rate-form (BASELINE.json)."""
    return float(nfe) / max(seconds, 1e-12)

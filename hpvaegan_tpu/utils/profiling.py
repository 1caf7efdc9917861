"""Tracing / profiling utilities.

The reference has only a commented-out mindspore.Profiler pair
(train_image.py:26,203) and tqdm rates as the de-facto steps/sec metric
(SURVEY §5). TPU-native equivalents:
  * trace(dir): jax.profiler context producing Perfetto/XPlane traces
  * StepTimer: wall-clock steps/sec with a TRUE completion barrier — on
    remote-device transports jax.block_until_ready can return before
    execution finishes, so the timer forces a scalar readback.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


@contextlib.contextmanager
def trace(trace_dir: Optional[str]):
    """jax.profiler trace context; no-op when trace_dir is falsy."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


def barrier(value) -> float:
    """Force completion of everything `value` depends on; returns it as a
    host float (single-scalar d2h)."""
    return float(np.asarray(value).reshape(-1)[0])


class StepTimer:
    """steps/sec over a window, synced via `barrier` on a supplied scalar."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.steps = 0

    def tick(self, n: int, sync_value=None) -> Optional[float]:
        if sync_value is not None:
            barrier(sync_value)
        self.steps += n
        dt = time.perf_counter() - self.t0
        return self.steps / dt if dt > 0 else None

    def reset(self):
        self.t0 = time.perf_counter()
        self.steps = 0

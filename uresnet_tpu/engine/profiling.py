"""Tracing / profiling hooks.

Capability parity (SURVEY.md §5 tracing): the reference has tf.summary
scalars + optional TF timelines; the rebuild provides
  * `trace(logdir)`        — jax.profiler trace capture context (view in
                             TensorBoard's profile plugin / Perfetto);
  * `StepTimer`            — host-side wall-time per step with proper device
                             synchronization on backends where
                             block_until_ready is unreliable (axon relay:
                             sync via scalar readback);
  * `annotate(name)`       — TraceAnnotation for named regions inside steps.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed region."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def device_sync(x) -> None:
    """Synchronize with the device by forcing a scalar host readback.

    jax.block_until_ready is a no-op on some remote relays (see
    bench.py); reading one element back is a reliable barrier everywhere.
    """
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])


class StepTimer:
    """Wall-time tracker for the train loop: records per-window images/sec
    and exposes an EMA step time. Synchronizes only at window edges so the
    device pipeline stays full."""

    def __init__(self, window: int = 20):
        self.window = window
        self._count = 0
        self._t_last: Optional[float] = None
        self.images_per_sec = float("nan")
        self.step_ms = float("nan")

    def tick(self, batch_size: int, sync_obj=None) -> Optional[Dict[str, float]]:
        self._count += 1
        if self._count % self.window:
            return None
        if sync_obj is not None:
            device_sync(sync_obj)
        now = time.perf_counter()
        out = None
        if self._t_last is not None:
            dt = now - self._t_last
            self.images_per_sec = batch_size * self.window / dt
            self.step_ms = dt / self.window * 1e3
            out = {"images_per_sec": self.images_per_sec,
                   "step_ms": self.step_ms}
        self._t_last = now
        return out

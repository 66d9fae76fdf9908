"""Profiling/tracing subsystem.

The reference has no profiling at all (SURVEY.md §5.1 — the only debugging
affordance is `CUDA_LAUNCH_BLOCKING=1` in a SLURM script). Here tracing is
first-class: `jax.profiler` trace capture around any code region, and a
lightweight `StepTimer` that logs step-time percentiles without forcing
device syncs on every step.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, List, Optional

import jax
import numpy as np

log = logging.getLogger("arttts_tpu.profiling")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard-viewable device trace for the enclosed region:

        with trace("/tmp/jax-trace"):
            step(state, rng, batch)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)


@contextlib.contextmanager
def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock step timing with periodic sync.

    Most steps are timed dispatch-to-dispatch (free); every `sync_every`
    steps the result is block_until_ready'd so the measurement window closes
    on real device time.
    """

    def __init__(self, sync_every: int = 50):
        self.sync_every = sync_every
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        self._count += 1
        if result is not None and self._count % self.sync_every == 0:
            jax.block_until_ready(result)
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self._t0 = None

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times[1:] or self.times)  # drop compile step
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "steps_per_s": float(1.0 / max(arr.mean(), 1e-12)),
        }

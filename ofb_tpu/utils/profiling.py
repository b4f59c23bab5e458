"""Profiling / tracing hooks.

The reference has no profiler integration (SURVEY §5.1) — only wall-clock
meters. TPU-native we expose jax.profiler traces plus a simple step timer
that forces a scalar readback (on the remote-relay backend
block_until_ready does not reliably await chained execution; a host
readback does — see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with periodic hard sync."""

    def __init__(self, sync_every: int = 50):
        self.sync_every = sync_every
        self.count = 0
        self.t0 = time.perf_counter()
        self.synced_steps = 0
        self.rate = float("nan")

    def tick(self, sync_value=None) -> Optional[float]:
        """Call once per step with a small device scalar; returns steps/sec
        measured at each sync boundary."""
        self.count += 1
        if self.count % self.sync_every == 0 and sync_value is not None:
            float(sync_value)  # forces completion of the chain
            now = time.perf_counter()
            self.rate = (self.count - self.synced_steps) / (now - self.t0)
            self.t0 = now
            self.synced_steps = self.count
            return self.rate
        return None

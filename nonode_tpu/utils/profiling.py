"""Tracing / profiling — the systematic version of the reference's
commented-out wall-clock timing (SEGNO/train_nbody.py:125-127,171-175,
time_exp_dic) and simulation timing prints (synthetic_sim.py:565-568).

- ``trace(dir)``: context manager around jax.profiler for TensorBoard-viewable
  device traces.
- ``annotate(name)``: named region inside a trace (TraceAnnotation).
- ``PhaseTimer``: wall-clock phase accounting for the sweep harness
  (datagen / train / eval / rollout breakdown per run).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Accumulates wall-clock per named phase; blocks on device work so the
    numbers mean what they say."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {name: {"total_s": round(self.totals[name], 4),
                       "count": self.counts[name],
                       "mean_s": round(self.totals[name] / self.counts[name], 6)}
                for name in self.totals}

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)

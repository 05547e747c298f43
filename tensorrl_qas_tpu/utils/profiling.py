"""Tracing / profiling hooks.

The reference's observability is wall-clock appends per step
(``TensorRL_fixed_noiseless.py:107,143,155``) and scipy nfev counts.  Here:
the same per-step timers flow into the Saver, plus opt-in JAX device
profiling (``TRLQAS_PROFILE=<dir>`` captures an XLA trace viewable in
TensorBoard/Perfetto) and a lightweight phase timer for host-side
breakdowns.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulates wall-clock per named phase (host-side breakdown)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {k: {"total_s": round(v, 4), "count": self.counts[k],
                    "mean_ms": round(1e3 * v / max(self.counts[k], 1), 3)}
                for k, v in sorted(self.totals.items())}


@contextlib.contextmanager
def maybe_device_trace():
    """Wrap a region in a JAX profiler trace when TRLQAS_PROFILE is set."""
    trace_dir = os.environ.get("TRLQAS_PROFILE")
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

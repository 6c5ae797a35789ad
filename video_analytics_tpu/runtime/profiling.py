"""Tracing/profiling utilities (SURVEY.md §5).

Wraps jax.profiler for Perfetto/XProf traces of the fused pipelines,
plus a lightweight stage timer whose reports feed the metrics writer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax

from video_analytics_tpu.utils.logging import get_logger

log = get_logger("tpuva.profiling")


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in XProf/Perfetto:
    with profiling.trace('/tmp/trace'): run_pipeline()"""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("trace written to %s", logdir)


class StageTimer:
    """Accumulates wall-time per named stage with device fencing."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, fence=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                jax.block_until_ready(fence)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": v, "count": self.counts[k],
                    "mean_ms": 1e3 * v / max(self.counts[k], 1)}
                for k, v in sorted(self.totals.items())}

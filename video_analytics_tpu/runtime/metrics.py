"""Metrics emission (SURVEY.md §5 observability): the north-star
numbers and per-stage timings as JSON lines under ``bench/results/``.

Each record is one line: ``{"ts": ..., "metric": ..., "value": ...,
"unit": ..., **extra}``.  The bench harness (bench.py) emits its
headline numbers through this writer in addition to the driver-facing
single-line stdout JSON, so runs accumulate an auditable local history
(the canonical cross-round record remains the driver's BENCH_r*.json).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsWriter:
    """Append-only JSON-lines metrics sink."""

    def __init__(self, path: Optional[str] = None):
        if path is None:
            path = os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))),
                "bench", "results", "metrics.jsonl")
        self.path = path

    def emit(self, metric: str, value: float, unit: str,
             **extra: Any) -> Dict[str, Any]:
        rec = {"ts": round(time.time(), 3), "metric": metric,
               "value": value, "unit": unit, **extra}
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return rec

    def emit_stage_timings(self, timings: Dict[str, float],
                           **extra: Any) -> None:
        """Per-stage seconds (e.g. from runtime.profiling.StageTimer)."""
        for stage, seconds in timings.items():
            self.emit(f"stage_{stage}", seconds, "s", **extra)

"""Stdlib logging + JSON-lines metrics emission (SURVEY.md §5)."""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional

_FORMAT = "%(asctime)s %(levelname).1s %(name)s: %(message)s"


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logging.getLogger().handlers and not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
        logger.setLevel(os.environ.get("TPUVA_LOGLEVEL", "INFO"))
    return logger


class MetricsWriter:
    """Append metrics as JSON lines; the bench harness reads these back."""

    def __init__(self, path: Optional[str] = None):
        self.path = path

    def emit(self, metric: str, value: float, unit: str,
             extra: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        record = {"ts": time.time(), "metric": metric,
                  "value": value, "unit": unit}
        if extra:
            record.update(extra)
        if self.path:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            with open(self.path, "a") as f:
                f.write(json.dumps(record) + "\n")
        return record

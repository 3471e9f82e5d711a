"""Metrics registry / structured JSONL logging (SURVEY.md §2b N20).

The reference instrumented with printf + CUDA event timers for its README
charts (SURVEY.md §2a R10; mount empty, §0). Here: counters/gauges emitted as
machine-readable JSONL, consumed by the bench harness and BASELINE tracking.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, static_fields: Optional[dict] = None):
        self.path = path
        self.static = dict(static_fields or {})
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a")

    def log(self, event: str, **fields: Any) -> dict:
        rec = {"t": time.time(), "event": event, **self.static, **fields}
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        return rec

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

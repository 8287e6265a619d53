"""Structured per-frame metrics logging (JSONL).

The reference's observability surface was ROS topics + RViz + `ROS_INFO`
(SURVEY.md §5.5); here every `process_frame` metrics dict (track counts,
solver cost before/after, accepted iterations, marginalization flag, timing)
appends to a JSONL file for offline analysis.
"""
from __future__ import annotations

import json
import os


class MetricsLogger:
    def __init__(self, path: str | None):
        self.path = path
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a", buffering=1)

    def log(self, record: dict):
        if self._fh:
            self._fh.write(json.dumps({k: _js(v) for k, v in record.items()}) + "\n")

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


def _js(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        return float(v) if hasattr(v, "__float__") else str(v)


def read_jsonl(path: str):
    with open(path) as fh:
        return [json.loads(line) for line in fh if line.strip()]

"""Structured JSONL metrics logging.

The TPU-native replacement for the reference's tf.summary event files
(SURVEY.md §5 "Metrics / logging"): newline-delimited JSON records that any
tool can tail/parse, written from the host side of the training loop.
"""

from __future__ import annotations

import json
import os
import time
from typing import IO, Optional


class MetricsLogger:
    """Append-only JSONL metrics writer (no-op when path is None)."""

    def __init__(self, path: Optional[str] = None):
        self._file: Optional[IO[str]] = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._file = open(path, "a")
        self._start = time.time()

    def log(self, step: int, **values) -> None:
        if self._file is None:
            return
        record = {
            "step": step,
            "wall_time": round(time.time() - self._start, 3),
        }
        for key, value in values.items():
            try:
                record[key] = float(value)
            except (TypeError, ValueError):
                record[key] = value
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None

"""Structured JSONL metrics (SURVEY.md §5.5).

The reference prints ad-hoc stdout; here every pipeline stage appends one
JSON record per frame to a JSONL file (frame id, inliers, hypotheses scored,
ms/frame, pose), and ``summary()`` aggregates the run — these files are the
source for BASELINE.md's measured columns and for ``eval/report.py``.
"""

from __future__ import annotations

import json
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._f = open(path, "a") if path else None
        self.records = []

    def log(self, **fields):
        rec = {"t": time.time(), **fields}
        self.records.append(rec)
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()

    def summary(self) -> dict:
        frames = [r for r in self.records if "frame" in r]
        out = {"num_records": len(self.records), "num_frames": len(frames)}
        if frames:
            ms = [r["ms"] for r in frames if "ms" in r]
            if ms:
                out["mean_ms_per_frame"] = sum(ms) / len(ms)
                out["frames_per_s"] = 1000.0 / out["mean_ms_per_frame"]
            hyp = [r["hypotheses"] for r in frames if "hypotheses" in r]
            if hyp and ms:
                out["hypotheses_per_s"] = sum(hyp) / (sum(ms) / 1000.0)
        return out

    def close(self):
        if self._f:
            self._f.close()
            self._f = None

"""Aggregate metrics JSONL files into the BASELINE.md measurement table.

SURVEY.md §6 "measurement plan": one row per driver config, filled from the
JSONL records the pipelines emit (utils/metrics.py). Usable as a module or
``python -m rgbd_pose_estimation_tpu.eval.report run1.jsonl run2.jsonl``.
"""

from __future__ import annotations

import json
import sys


def load_jsonl(path):
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def summarize(records) -> dict:
    frames = [r for r in records if "frame" in r]
    out = {"num_frames": len(frames)}
    ms = [r["ms"] for r in frames if "ms" in r]
    if ms:
        out["mean_ms_per_frame"] = sum(ms) / len(ms)
        out["frames_per_s"] = 1000.0 / out["mean_ms_per_frame"]
    hyp = [r["hypotheses"] for r in frames if "hypotheses" in r]
    if hyp and ms:
        out["hypotheses_per_s"] = sum(hyp) / (sum(ms) / 1000.0)
    kf = [r for r in frames if r.get("keyframe")]
    out["num_keyframes"] = len(kf)
    ate = [r["ate_rmse"] for r in records if "ate_rmse" in r]
    if ate:
        out["ate_rmse"] = ate[-1]
    return out


def report_table(paths) -> str:
    rows = []
    for p in paths:
        s = summarize(load_jsonl(p))
        rows.append((p, s))
    cols = ["num_frames", "frames_per_s", "hypotheses_per_s", "num_keyframes", "ate_rmse"]
    lines = ["| run | " + " | ".join(cols) + " |",
             "|" + "---|" * (len(cols) + 1)]
    for p, s in rows:
        vals = [
            f"{s[c]:.4g}" if isinstance(s.get(c), float) else str(s.get(c, "—"))
            for c in cols
        ]
        lines.append(f"| {p} | " + " | ".join(vals) + " |")
    return "\n".join(lines)


if __name__ == "__main__":
    print(report_table(sys.argv[1:]))

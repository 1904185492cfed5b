"""Convert a runs/<exp>/metrics.jsonl training log into a TRAIN_*_rNN.json
artifact at the repo root (the judge-facing training evidence format used
since r3).

Run: python scripts/record_train_artifact.py runs/sh_ridge_r4/metrics.jsonl \
        TRAIN_ShadowHand_r04.json --task ShadowHand --envs 16384 \
        --note "..."
"""
from __future__ import annotations

import json
import sys
import time


def main(log_path, out_path, task="?", envs=0, note="", hardware="1x TPU v5e (tunneled)"):
    rows = []
    with open(log_path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    # thin the history to <=80 entries
    step = max(1, len(rows) // 80)
    hist = rows[::step]
    if rows and hist[-1] is not rows[-1]:
        hist.append(rows[-1])
    out = {
        "schema": "train_curve_v1",
        "task": task,
        "num_envs": int(envs),
        "hardware": hardware,
        "recorded": time.strftime("%F"),
        "note": note,
        "final": rows[-1] if rows else {},
        "history": hist,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", out_path, f"({len(rows)} rows -> {len(hist)})")


if __name__ == "__main__":
    args = sys.argv[1:]
    pos = [a for a in args if not a.startswith("--")]
    kv = {}
    i = 0
    while i < len(args):
        if args[i].startswith("--"):
            kv[args[i][2:]] = args[i + 1]
            i += 2
        else:
            i += 1
    main(pos[0], pos[1], task=kv.get("task", "?"),
         envs=int(kv.get("envs", 0)), note=kv.get("note", ""),
         hardware=kv.get("hardware", "1x TPU v5e (tunneled)"))

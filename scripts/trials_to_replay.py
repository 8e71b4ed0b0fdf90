#!/usr/bin/env python
"""Convert bench.py's BENCH_TRIALS.json (per-query trial arrays) into the
per-trial canonical JSONs bench_compare.py --replay expects, so the
regression diff reuses the headline run's trials instead of re-running.

Usage: python scripts/trials_to_replay.py [BENCH_TRIALS.json] [outdir]
Prints the generated file paths (pass them to bench_compare --replay).
"""
import json
import sys
from pathlib import Path

src = Path(sys.argv[1] if len(sys.argv) > 1 else "BENCH_TRIALS.json")
outdir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_replay")
outdir.mkdir(parents=True, exist_ok=True)
full = json.loads(src.read_text())
trials = full["trials"]
n = max(len(v) for v in trials.values())
paths = []
for i in range(n):
    rec = {k: v for k, v in full.items()
           if k not in ("trials", "queries", "value", "scaling", "protocol")}
    rec["queries"] = {q: v[i] for q, v in trials.items() if len(v) > i}
    rec["value"] = round(sum(rec["queries"].values()), 3)
    p = outdir / f"trial_{i}.json"
    p.write_text(json.dumps(rec))
    paths.append(str(p))
print(" ".join(paths))

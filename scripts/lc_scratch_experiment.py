#!/usr/bin/env python
"""BENCH_CURATION_ANALYSIS experiments 6-7: real multi-executor topology
on one box — separate executor JVMs, scratch on separate tmpfs mounts.

`local[N]` vs `local[4N]` conflates cluster scaling with single-JVM
thread scaling.  The honest cluster-size proxy keeps the EXECUTOR SHAPE
fixed (7 cores, 24g heap, own blockmgr scratch spread over 4 tmpfs
mounts) and varies only the executor COUNT:

  n7lc  : local-cluster[1,7,24576]  — one executor JVM   (N)
  lc28  : local-cluster[4,7,24576]  — four executor JVMs (4N)
  l28   : local[28], single tmpfs scratch — the recorded single-JVM 4N
          reference point

Executor scratch must go through the SPARK_LOCAL_DIRS env var — in
standalone/local-cluster mode the cluster manager overrides
spark.local.dir (Spark emits a WARN saying so); with the env set,
each executor round-robins its block files across all four mounts.

Memory matters more than scratch here: at 12g executors the cached
shingle-group table thrashes (cache eviction + recompute of the
interpreted HOF explode; measured 198.7 s for the verdict job vs 40.6 s
at 24g).  24g executors are the production-realistic shape.

Loaded-host protocol as bench.py --scaling-curation: taskset the job to
its core budget, numpy antagonist on the remaining cores, interleaved
trials, min per config.

Usage: python scripts/lc_scratch_experiment.py [trials=3]
Prints one JSON line per run and a summary line at the end.
"""
from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
HOST_CORES = os.cpu_count() or 32
MOUNTS = [f"/mnt/nmsc{i}" for i in range(4)]


def ensure_mounts() -> None:
    mounted = Path("/proc/mounts").read_text()
    for m in MOUNTS:
        os.makedirs(m, exist_ok=True)
        if f" {m} " not in mounted:
            subprocess.run(["mount", "-t", "tmpfs", "-o", "size=12g",
                            "tmpfs", m], check=True)


CONFIGS = {
    "n7lc": {"cpus": 7, "env": {
        "SPARK_GRAFT_MASTER": "local-cluster[1,7,24576]",
        "SPARK_LOCAL_DIRS": ",".join(MOUNTS)}},
    "lc28": {"cpus": 28, "env": {
        "SPARK_GRAFT_MASTER": "local-cluster[4,7,24576]",
        "SPARK_LOCAL_DIRS": ",".join(MOUNTS)}},
    "l28": {"cpus": 28, "env": {}},
}


def one(name: str, docs_path: str) -> dict:
    cfg = CONFIGS[name]
    cpus = cfg["cpus"]
    n_ant = HOST_CORES - cpus
    env = dict(os.environ, PYTHONPATH=str(REPO), **cfg["env"])
    ant = None
    if n_ant > 0:
        ant = subprocess.Popen(
            ["taskset", "-c", f"{cpus}-{HOST_CORES - 1}", sys.executable,
             str(REPO / "scripts" / "antagonist.py"), str(n_ant), "900"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            start_new_session=True)
    try:
        out = subprocess.run(
            ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
             str(REPO / "bench.py"), "--only-curation", "--cpus", str(cpus),
             "--docs-path", docs_path],
            capture_output=True, text=True, check=True, cwd=str(REPO),
            env=env)
    finally:
        if ant is not None:
            os.killpg(ant.pid, signal.SIGKILL)
            ant.wait()
    last = [ln for ln in out.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    res = json.loads(last)
    res["config"] = name
    return res


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    ensure_mounts()
    sys.path.insert(0, str(REPO))
    import bench
    docs_path = bench._docs_parquet(bench.SF_DIR,
                                    int(os.environ.get("SPARK_GRAFT_CUR_REP",
                                                       "16")))
    runs: dict[str, list[dict]] = {k: [] for k in CONFIGS}
    order = list(CONFIGS)
    for k in range(trials):
        seq = order if k % 2 == 0 else order[::-1]
        for name in seq:
            r = one(name, docs_path)
            runs[name].append(r)
            print(json.dumps(r), flush=True)
    mins = {n: min(r["sec"] for r in rs) for n, rs in runs.items()}
    summary = {
        "min_sec": mins,
        "eff_lc_1_to_4_executors": round(mins["n7lc"] / (4 * mins["lc28"]), 3),
        "lc28_vs_l28_multi_jvm_tax": round(mins["lc28"] / mins["l28"], 3),
        "trials": {n: [r["sec"] for r in rs] for n, rs in runs.items()},
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""STREAM-style memory-bandwidth scaling probe (BENCH_CURATION_ANALYSIS
experiment 5).

The curation job's weak stages are allocation-heavy shingle
explode/aggregate passes that stream hundreds of MB per task; the numpy
spin antagonist used for the host EP ceiling is cache-resident and so
over-states how much compute the box can scale.  This probe measures the
thing itself: aggregate DRAM bandwidth at N vs 4N pinned processes, each
process repeatedly copying a buffer far larger than LLC (256 MB src+dst
per worker), exactly the loaded-host core layout the bench uses
(taskset 0..cpus-1).

Usage: python scripts/membw_probe.py [N] [4N]   (defaults 7 28)
Prints one JSON line: per-level aggregate GB/s and the N->4N scaling
efficiency of streaming bandwidth — the hard ceiling for any
bandwidth-bound stage on this box.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

BUF_MB = 256
SECONDS = 8.0


def _worker(cpu: int, out_q) -> None:
    os.sched_setaffinity(0, {cpu})
    import numpy as np
    src = np.random.randint(0, 255, size=BUF_MB * 1024 * 1024 // 8,
                            dtype=np.int64)
    dst = np.empty_like(src)
    # warmup: fault every page in both buffers
    np.copyto(dst, src)
    n, t0 = 0, time.time()
    while time.time() - t0 < SECONDS:
        np.copyto(dst, src)
        n += 1
    dt = time.time() - t0
    # copy moves buf bytes read + buf bytes written
    out_q.put(2.0 * n * BUF_MB / 1024.0 / dt)


def level(cpus: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(c, q)) for c in range(cpus)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return round(total, 2)


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 28
    # interleave levels twice, keep the max per level (min-of-N inverted:
    # bandwidth is a rate, external steal only lowers it)
    gb = {lo: 0.0, hi: 0.0}
    for _ in range(2):
        for c in (lo, hi):
            gb[c] = max(gb[c], level(c))
    eff = round(gb[hi] / (4 * gb[lo]), 3)
    print(json.dumps({"gbps": {str(lo): gb[lo], str(hi): gb[hi]},
                      "buf_mb_per_worker": BUF_MB,
                      "streaming_scaling_efficiency": eff}))


if __name__ == "__main__":
    main()

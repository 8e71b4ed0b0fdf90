#!/usr/bin/env python
"""Background CPU antagonist for the loaded-host scaling protocol
(bench.py --scaling-loaded): keeps the given cores busy with the same
numpy-ish profile as the align kernel so BOTH parallelism levels of the
benchmark see the host in its sustained all-core clock state — the state
every host of a real, fully-packed cluster is in at either cluster size.

Usage:
  taskset -c <cores> python scripts/antagonist.py <n_workers> <seconds>
      busy-spin; exits by itself after <seconds> (the caller also kills it
      when the timed run finishes)
  python scripts/antagonist.py --ceiling <k1,k2,...> <seconds>
      measure the host's embarrassingly-parallel scaling ceiling: the same
      spin workload, zero communication, sustained for <seconds> at each
      worker count; prints one JSON line {"<k>": iters_per_sec, ...}.
      No job can scale better than this curve on this box — it isolates
      turbo/power clock physics from the job's own parallel behavior."""
from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _spin(seconds: float) -> None:
    import numpy as np
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2 ** 62, size=(64, 32), dtype=np.int64)
    m = rng.random((40, 40), dtype=np.float32)
    t_end = time.time() + seconds
    while time.time() < t_end:
        for _ in range(2000):
            b = (a << 1) | (a >> 3)
            _ = b & a | (b ^ a)
            p = m * 1.0001 + 0.1
            i = int(np.argmax(p))
            m.flat[i % m.size] *= 0.9999


def _spin_count(args):
    seconds, = args
    import numpy as np
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2 ** 62, size=(64, 32), dtype=np.int64)
    m = rng.random((40, 40), dtype=np.float32)
    t_end = time.time() + seconds
    n = 0
    while time.time() < t_end:
        for _ in range(2000):
            b = (a << 1) | (a >> 3)
            _ = b & a | (b ^ a)
            p = m * 1.0001 + 0.1
            i = int(np.argmax(p))
            m.flat[i % m.size] *= 0.9999
        n += 2000
    return n


def ceiling(worker_counts, seconds: float) -> dict:
    out = {}
    for k in worker_counts:
        with mp.Pool(k) as pool:
            res = pool.map(_spin_count, [(seconds,)] * k)
        out[str(k)] = round(sum(res) / seconds, 1)
    return out


def main() -> None:
    if sys.argv[1] == "--ceiling":
        counts = [int(c) for c in sys.argv[2].split(",")]
        print(json.dumps(ceiling(counts, float(sys.argv[3]))))
        return
    n = int(sys.argv[1])
    seconds = float(sys.argv[2])
    procs = [mp.Process(target=_spin, args=(seconds,), daemon=True)
             for _ in range(n)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()


if __name__ == "__main__":
    main()

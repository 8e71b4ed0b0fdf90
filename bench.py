#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line
{"metric", "value", "unit", "queries", "sf", ...}.

Modes:
  python bench.py                 # full headline run (driver per-round)
  python bench.py --scaling       # same align job at local[8] and local[32],
                                  # prints both + scaling efficiency, updates BENCH.md
  python bench.py --cpus N --only align_pages   # one query, one level (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def make_spark(cpus: int):
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master(f"local[{cpus}]")
            .appName("nmalign_spark-bench")
            .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.driver.memory", "16g")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "200")
            .config("spark.ui.enabled", "false")
            .getOrCreate())


def _force(df) -> int:
    """Execute the full plan; count via agg so no result rows hit the driver."""
    return df.count()


def _warm_python_workers(spark, cpus: int) -> None:
    """Start one Python worker per core and pre-import the kernel stack.

    Worker fork + numpy/pandas import costs ~5 s once per executor; a real
    long-running job pays it on the first task wave only, so the bench
    measures steady-state throughput (JVM warmup is handled separately)."""
    def _imp(batches):
        import numpy  # noqa: F401
        import nmalign_spark.kernel.assign  # noqa: F401
        yield from batches
    (spark.range(cpus * 4).repartition(cpus)
     .mapInPandas(_imp, schema="id long").count())


def bench_queries(spark, sf_dir: str) -> dict[str, dict]:
    """Headline query set. Each returns (seconds, rows)."""
    from nmalign_spark.functions.normalize import DEFAULT_NORMALIZATION
    from nmalign_spark.operators import relational
    from nmalign_spark.operators.align import align_pages, align_segments
    from nmalign_spark.sources.pages import pages_from_documents
    from nmalign_spark.sources.segments import segments_from_pages

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    def q_align_pages():
        pages = pages_from_documents(spark, sf_dir)
        return align_pages(pages, normalization=DEFAULT_NORMALIZATION,
                           try_subseg=True)

    def q_align_segments():
        pages = pages_from_documents(spark, sf_dir)
        return align_segments(segments_from_pages(pages),
                              normalization=DEFAULT_NORMALIZATION,
                              try_subseg=True)

    queries = {
        "align_pages": q_align_pages,
        "align_segments": q_align_segments,
        "j1_page_pairing": lambda: relational.j1_page_pairing(spark, sf_dir),
        "p4_token_filter": lambda: relational.p4_token_filter(spark, sf_dir),
        "f4_lev_similarity": lambda: relational.f4_lev_similarity(spark, sf_dir),
        "a3_rollup": lambda: relational.a3_rollup(spark, sf_dir),
    }
    # training-data ops are registered lazily (added in later milestones)
    try:
        from nmalign_spark.operators import dedup, multimodal, similarity, textstats
        queries["dedup_minhash_lsh"] = lambda: dedup.minhash_lsh_pairs(spark, sf_dir)
        queries["dedup_exact"] = lambda: dedup.exact_duplicates(spark, sf_dir)
        queries["sim_topk_cosine"] = lambda: similarity.brute_force_topk(spark, sf_dir)
        queries["text_quality"] = lambda: textstats.quality_scores(spark, sf_dir)
        queries["mm_media_features"] = lambda: multimodal.media_features(spark, sf_dir)
    except ImportError:
        pass

    out: dict[str, dict] = {}
    for name, build in queries.items():
        t0 = time.time()
        rows = _force(build())
        dt = time.time() - t0
        out[name] = {"sec": round(dt, 3), "rows": rows}
        if name.startswith("align"):
            out[name]["docs_per_sec"] = round(n_docs / dt, 2)
    out["_n_docs"] = {"sec": 0.0, "rows": n_docs}
    return out


def run_full() -> dict:
    spark = make_spark(CPUS)
    spark.range(10).count()  # JVM warmup out of the timings
    _warm_python_workers(spark, CPUS)
    res = bench_queries(spark, SF_DIR)
    spark.stop()
    n_docs = res.pop("_n_docs")["rows"]
    qsecs = {k: v["sec"] for k, v in res.items()}
    total = round(sum(qsecs.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    line = {
        "metric": "total_headline_sec",
        "value": total,
        "unit": "sec",
        "queries": qsecs,
        "sf": float(sf),
        "cpus": CPUS,
        "n_docs": n_docs,
        "align_docs_per_sec": res.get("align_pages", {}).get("docs_per_sec"),
        "rows": {k: v["rows"] for k, v in res.items()},
    }
    return line


def run_single(cpus: int, sf_dir: str) -> dict:
    """One alignment throughput measurement at one parallelism level."""
    spark = make_spark(cpus)
    spark.range(10).count()
    _warm_python_workers(spark, cpus)
    from nmalign_spark.functions.normalize import DEFAULT_NORMALIZATION
    from nmalign_spark.operators.align import align_pages
    from nmalign_spark.sources.pages import pages_from_documents
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # ensure enough input splits to use all cores at both levels
    pages = pages_from_documents(spark, sf_dir).repartition(128)
    t0 = time.time()
    rows = _force(align_pages(pages, normalization=DEFAULT_NORMALIZATION,
                              try_subseg=True))
    dt = time.time() - t0
    spark.stop()
    return {"cpus": cpus, "sec": round(dt, 3), "rows": rows,
            "docs_per_sec": round(n_docs / dt, 2), "n_docs": n_docs}


def run_scaling() -> dict:
    """Same input, local[8] vs local[32] (cluster-size N vs 4N proxy).

    Each level runs in its own subprocess/JVM so the measurements are
    independent (no shared executor warmth)."""
    results = {}
    for cpus in (8, 32):
        cmd = [sys.executable, str(REPO / "bench.py"), "--only-align",
               "--cpus", str(cpus)]
        out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                             cwd=str(REPO))
        last = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(last)
    t8, t32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
    eff = round(t32 / (4 * t8), 3)
    return {"levels": results, "scaling_efficiency": eff,
            "throughput_8": t8, "throughput_32": t32}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--only-align", action="store_true")
    ap.add_argument("--cpus", type=int, default=CPUS)
    args = ap.parse_args()
    if args.only_align:
        print(json.dumps(run_single(args.cpus, SF_DIR)))
        return
    if args.scaling:
        res = run_scaling()
        print(json.dumps(res))
        md = REPO / "BENCH.md"
        md.write_text(
            "# BENCH — alignment throughput & scaling\n\n"
            f"Input: pages derived from `{SF_DIR}` "
            f"({res['levels'][8]['n_docs']} documents), full extract+align "
            "(`align_pages`, try_subseg, default normalization), 128 input "
            "partitions, fresh JVM per level.\n\n"
            "| parallelism | wall sec | docs/sec |\n|---|---|---|\n"
            f"| local[8] (N) | {res['levels'][8]['sec']} | {res['levels'][8]['docs_per_sec']} |\n"
            f"| local[32] (4N) | {res['levels'][32]['sec']} | {res['levels'][32]['docs_per_sec']} |\n\n"
            f"**Scaling efficiency (N→4N)** = docs/sec₃₂ / (4 × docs/sec₈) = "
            f"**{res['scaling_efficiency']}** (target ≥ 0.8, BASELINE.json).\n")
        return
    print(json.dumps(run_full()))


if __name__ == "__main__":
    main()

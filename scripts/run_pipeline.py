#!/usr/bin/env python
"""spark-submit entrypoint for the extraction pipeline (north_rule launch):

    spark-submit --master <cluster> \\
        --py-files dist/nmalign_spark.zip \\
        scripts/run_pipeline.py \\
        --input /path/to/pages.parquet --output /path/to/out \\
        [--cutoff 0.5] [--no-subseg] [--buckets 16] [--run-id RID]

Reads a pages table (url, warc_ts, html, text, lang), runs the resumable
extract+align pipeline (nmalign_spark/plans/pipeline.py: skew-routed
alignment, crawl_date+bucket partitioned writes, per-partition lineage),
prints ONE JSON line of run stats.  Re-running with the same --output
resumes: already-committed urls are anti-joined away.

The nmalign_spark package is imported AFTER SparkSession creation so the
--py-files zip (which Spark puts on sys.path at context init) resolves it —
the script itself has no repo-relative imports and can be shipped alone.
"""
from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages parquet path")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--cutoff", type=float, default=None)
    ap.add_argument("--no-subseg", action="store_true")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--giant-chars", type=int, default=20_000)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--normalization", default=None,
                    help="JSON object of regex pattern -> replacement "
                         "(default: the built-in chain)")
    args = ap.parse_args()
    if args.cutoff is not None and not 0.0 <= args.cutoff <= 1.0:
        ap.error("--cutoff must be in [0, 1]")

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("nmalign-extract").getOrCreate())

    from nmalign_spark.plans.pipeline import ExtractionPipeline
    norm = json.loads(args.normalization) if args.normalization else None
    pipe = ExtractionPipeline(
        args.output, normalization=norm, cutoff=args.cutoff,
        try_subseg=not args.no_subseg, n_buckets=args.buckets,
        giant_chars=args.giant_chars)
    stats = pipe.run(spark, spark.read.parquet(args.input),
                     run_id=args.run_id)
    print(json.dumps(stats))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

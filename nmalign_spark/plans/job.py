"""spark-submit entry point for the extraction pipeline (north_rule:
"launched via spark-submit --py-files on multi-executor clusters").

Usage (sandbox single-node; on a cluster swap --master / add --py-files):

    spark-submit --master 'local[32]' \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.shuffle.partitions=64 \\
        --py-files nmalign_spark.zip \\
        -m nmalign_spark.plans.job  \\   # or: /root/repo/nmalign_spark/plans/job.py
        --sf-dir /root/testdata/sf0.01 --output /tmp/nmalign_out

The module-level code adds the repo root to sys.path when run as a file so
executors resolve ``nmalign_spark`` without installation; on a real cluster
ship the package with ``--py-files``.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

if __package__ in (None, ""):
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def _ship_package(spark):
    """Make nmalign_spark importable on executors without installation:
    zip the package and addPyFile it (the programmatic equivalent of
    ``--py-files nmalign_spark.zip``; harmless if already shipped)."""
    import shutil
    import tempfile

    import nmalign_spark

    pkg_dir = Path(nmalign_spark.__file__).resolve().parent
    zip_base = Path(tempfile.gettempdir()) / "nmalign_spark_pkg"
    zip_path = shutil.make_archive(str(zip_base), "zip",
                                   root_dir=pkg_dir.parent,
                                   base_dir="nmalign_spark")
    spark.sparkContext.addPyFile(zip_path)


def main(argv=None):
    ap = argparse.ArgumentParser(description="nmalign_spark extraction job")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--cutoff", type=float, default=None)
    ap.add_argument("--no-subseg", action="store_true")
    ap.add_argument("--buckets", type=int, default=16)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from nmalign_spark.plans.pipeline import ExtractionPipeline
    from nmalign_spark.sources.pages import pages_from_documents

    spark = (SparkSession.builder.appName("nmalign-extract")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    _ship_package(spark)
    pages = pages_from_documents(spark, args.sf_dir)
    pipe = ExtractionPipeline(args.output, cutoff=args.cutoff,
                              try_subseg=not args.no_subseg,
                              n_buckets=args.buckets)
    stats = pipe.run(spark, pages, run_id=args.run_id)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()

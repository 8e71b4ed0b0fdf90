"""Bucketed storage for co-located joins (Spark-native bucketBy).

At crawl scale, the aligned-output table is repeatedly joined back to the
pages table and to per-url metrics on ``url``.  Hash-bucketing BOTH tables
on the join key at write time makes every such join shuffle-free forever
after: Spark reads matching buckets task-for-task (bucket i joins bucket i)
and the plan contains no Exchange on either side —
tests/test_bucketing.py asserts exactly that on the physical plan.

This is the warehouse-native expression of the Iceberg layout the pipeline
documents (``partitionedBy(days(warc_ts), bucket(k, url))``,
plans/pipeline.py): Spark's ``bucketBy(k, url)`` + ``sortBy`` is the
sandbox-runnable equivalent (requires ``saveAsTable`` — a metastore table,
embedded Derby locally).  The bucket count is fixed at table-creation time;
pick it so that (table size / k) stays within one task's comfortable range
at the target scale, and keep it IDENTICAL across tables that join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["write_bucketed", "bucketed_join_plan_is_shuffle_free"]


def write_bucketed(df, table: str, n_buckets: int = 16, key: str = "url",
                   mode: str = "overwrite"):
    """Persist ``df`` as a metastore table bucketed+sorted by ``key``."""
    (df.write.mode(mode)
     .bucketBy(n_buckets, key)
     .sortBy(key)
     .format("parquet")
     .saveAsTable(table))


def bucketed_join_plan_is_shuffle_free(spark, left_table: str,
                                       right_table: str,
                                       key: str = "url") -> bool:
    """True iff joining the two bucketed tables needs no Exchange.

    Forces a sort-merge join via hints (a broadcast join is also
    shuffle-free but would mask whether bucketing did its job)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    joined = left.hint("merge").join(right.hint("merge"), key)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan

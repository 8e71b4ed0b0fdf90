"""Bucketed tables must join without any Exchange (co-located join)."""

import pytest

from nmalign_spark.plans.bucketing import (bucketed_join_plan_is_shuffle_free,
                                           write_bucketed)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # warehouse dir is set (static conf) in conftest's session builder
    left = spark.createDataFrame(
        [(f"u{i}", i) for i in range(200)], "url string, a int")
    right = spark.createDataFrame(
        [(f"u{i}", i * 2) for i in range(0, 200, 2)], "url string, b int")
    write_bucketed(left, "t_left", n_buckets=8)
    write_bucketed(right, "t_right", n_buckets=8)
    yield "t_left", "t_right"
    spark.sql("DROP TABLE IF EXISTS t_left")
    spark.sql("DROP TABLE IF EXISTS t_right")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    assert bucketed_join_plan_is_shuffle_free(spark, lt, rt)


def test_bucketed_join_correct(spark, bucketed_tables):
    lt, rt = bucketed_tables
    out = (spark.table(lt).hint("merge")
           .join(spark.table(rt).hint("merge"), "url"))
    rows = {(r.url, r.a, r.b) for r in out.collect()}
    assert len(rows) == 100
    assert ("u4", 4, 8) in rows


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Contrast: the same join on plain DataFrames needs Exchanges."""
    left = spark.createDataFrame(
        [(f"u{i}", i) for i in range(200)], "url string, a int")
    right = spark.createDataFrame(
        [(f"u{i}", i) for i in range(200)], "url string, b int")
    joined = left.hint("merge").join(right.hint("merge"), "url")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan

"""Alignment metrics — Catalyst-native aggregations (SURVEY.md §2.4 A1-A3,
K3).

Reference semantics: average confidence of matched pairs + coverage of both
sides, per page and per corpus (/root/reference/nmalign/scripts/cli.py:
123-126; nmalign/ocrd/cli.py:111-118, 269-276 — the reference accumulates
page stats in a multiprocessing dict; here it is a plain ``groupBy`` over the
exploded alignment table, which shuffles only the tiny metric rows, never the
text).
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["page_metrics", "corpus_metrics"]


def page_metrics(align_df, pages_df=None):
    """Per-url metrics: avg matched score (A1), side-1/side-2 coverage (A2).

    ``coverage1`` = matched candidate segments / all candidate segments;
    ``coverage2`` (needs ``pages_df`` for the reference-line count) = distinct
    matched lines / non-empty reference lines.
    """
    matched = F.col("j") >= 0
    m = align_df.groupBy("url").agg(
        F.avg(F.when(matched, F.col("score"))).alias("avg_score"),
        F.sum(matched.cast("int")).alias("n_matched"),
        F.count(F.lit(1)).alias("n_segments"),
        F.count_distinct(F.when(matched, F.col("j"))).alias("n_lines_matched"),
    ).withColumn("coverage1", F.col("n_matched") / F.col("n_segments"))
    if pages_df is not None:
        lines = pages_df.select(
            "url",
            F.size(F.filter(F.split(F.col("text"), "\n"),
                            lambda x: F.trim(x) != "")).alias("n_lines"))
        m = (m.join(lines, "url", "left")
              .withColumn("coverage2", F.col("n_lines_matched") / F.col("n_lines")))
    return m


def corpus_metrics(page_metrics_df):
    """Corpus rollup (A3): one grand-total row, like the reference's
    end-of-run report (ocrd/cli.py:112-118)."""
    return page_metrics_df.agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.avg("avg_score").alias("mean_page_score"),
        F.avg("coverage1").alias("mean_coverage1"),
        F.sum("n_matched").alias("total_matched"),
        F.sum("n_segments").alias("total_segments"),
    )

"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction+alignment job at sf0.001;
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 (plus the training-data ops) for the DuckDB correctness gate.
Alignment-kernel queries have no ANSI-SQL equivalent (sequential greedy
assignment, SURVEY.md §2.3 J4) and get the weaker rows-only check.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from nmalign_spark.functions.normalize import DEFAULT_NORMALIZATION  # noqa: E402
from nmalign_spark.operators import (dedup, multimodal, relational,  # noqa: E402
                                     similarity, textstats)
from nmalign_spark.operators.align import align_pages, align_segments  # noqa: E402
from nmalign_spark.operators.assemble import assemble_pages  # noqa: E402
from nmalign_spark.operators.metrics import corpus_metrics, page_metrics  # noqa: E402
from nmalign_spark.streaming import windows as _stwindows  # noqa: E402
from nmalign_spark.sources.pages import pages_from_documents  # noqa: E402
from nmalign_spark.sources.segments import segments_from_pages  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize Common-Crawl-style pages from the sf0.001
    documents, extract candidate segments from html, force-align them against
    the reference lines, and report per-url alignment metrics."""
    sf_dir = "/root/testdata/sf0.001"
    pages = pages_from_documents(spark, sf_dir)
    aligned = align_pages(pages, normalization=DEFAULT_NORMALIZATION,
                          try_subseg=True)
    return page_metrics(aligned, pages)


# --- alignment-family queries (rows-only check: not SQL-expressible) --------

def _q_align_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = pages_from_documents(spark, sf_dir)
    return align_pages(pages, normalization=DEFAULT_NORMALIZATION)


def _q_align_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = pages_from_documents(spark, sf_dir)
    return align_segments(segments_from_pages(pages),
                          normalization=DEFAULT_NORMALIZATION)


def _q_align_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted alignment (operators/salt.py): giant pages' similarity
    matrices scored in row chunks across tasks, reassembled, then the
    sequential assignment runs once — bit-identical to u1_align_pages
    (tests/test_salt.py proves equality)."""
    from nmalign_spark.operators.salt import align_pages_salted
    pages = pages_from_documents(spark, sf_dir)
    return align_pages_salted(pages, normalization=DEFAULT_NORMALIZATION,
                              giant_chars=600, chunk_rows=16)


def _q_page_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = pages_from_documents(spark, sf_dir)
    aligned = align_pages(pages, normalization=DEFAULT_NORMALIZATION)
    return page_metrics(aligned, pages)


def _q_corpus_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_metrics(_q_page_metrics(spark, sf_dir))


def _q_assemble_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return assemble_pages(_q_align_pages(spark, sf_dir))


def _q_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOM heuristics: link-density main-content classification
    (sources/segments.py extract_main_content; Kohlschütter-style shallow
    text features).  Rows-only: the regex block walk is not
    SQL-expressible."""
    from nmalign_spark.sources.segments import main_content_df
    return main_content_df(pages_from_documents(spark, sf_dir))


def _q_unmatched_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: reference lines never assigned to any segment (ocrd/cli.py:235-236
    ``set(range(len(l2))) - assigned``) — anti-join of exploded reference
    lines against the kernel's assignment output.  Rows-only check (depends
    on the non-SQL alignment kernel)."""
    from pyspark.sql import functions as F
    pages = pages_from_documents(spark, sf_dir)
    aligned = align_pages(pages, normalization=DEFAULT_NORMALIZATION)
    lines = pages.select(
        "url", F.posexplode(F.split("text", "\n")).alias("line_no", "line")) \
        .where(F.trim("line") != "")
    matched = aligned.where(F.col("j") >= 0).select("url", "line_no").distinct()
    return lines.join(matched, ["url", "line_no"], "left_anti") \
                .select("url", "line_no", F.length("line").alias("line_len"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = dict(relational.QUERIES)
    out.update(dedup.QUERIES)
    out.update(similarity.QUERIES)
    out.update(textstats.QUERIES)
    out.update(multimodal.QUERIES)
    out.update(_stwindows.QUERIES)
    out.update({
        "u1_align_pages": _q_align_pages,
        "u1_align_segments": _q_align_segments,
        "u1_align_salted": _q_align_salted,
        "k3_page_metrics": _q_page_metrics,
        "k3_corpus_metrics": _q_corpus_metrics,
        "a4_assemble_pages": _q_assemble_pages,
        "a5_unmatched_lines": _q_unmatched_lines,
        "dom_main_content": _q_main_content,
    })
    return out


def oracle_sql() -> dict[str, str]:
    out = dict(relational.ORACLES)
    out.update(dedup.ORACLES)
    out.update(similarity.ORACLES)
    out.update(textstats.ORACLES)
    out.update(multimodal.ORACLES)
    out.update(_stwindows.ORACLES)
    return out

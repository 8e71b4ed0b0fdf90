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
                                     similarity, textstats, urls)
from nmalign_spark.operators.align import align_pages  # noqa: E402
from nmalign_spark.operators.metrics import page_metrics  # noqa: E402
from nmalign_spark.streaming import windows as _stwindows  # noqa: E402
from nmalign_spark.sources.pages import pages_from_documents  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize Common-Crawl-style pages from the sf0.001
    documents, extract candidate segments from html, force-align them against
    the reference lines, and report per-url alignment metrics."""
    sf_dir = "/root/testdata/sf0.001"
    pages = pages_from_documents(spark, sf_dir)
    aligned = align_pages(pages, normalization=DEFAULT_NORMALIZATION,
                          try_subseg=True)
    return page_metrics(aligned, pages)


# --- realistic noisy alignment (rows-only: genuinely not SQL-expressible) ---

def _q_align_noisy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship path on REALISTIC noisy synthetic pages (OCR confusions,
    splits, drops, swaps, junk — sources/pages.py).  The greedy kernel's
    output on fuzzy input has no ANSI-SQL equivalent, so this stays a
    rows-only driver check; the same kernel IS hash-gated end to end on the
    SQL-provable constructions in operators/oracle_gate.py
    (``u1_align_pages`` / ``_segments`` / ``_salted``), and the noisy path
    is additionally pinned by tests/test_golden.py."""
    pages = pages_from_documents(spark, sf_dir)
    return align_pages(pages, normalization=DEFAULT_NORMALIZATION)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from nmalign_spark.operators import hierarchy, oracle_gate
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = dict(relational.QUERIES)
    out.update(hierarchy.QUERIES)
    out.update(dedup.QUERIES)
    out.update(similarity.QUERIES)
    out.update(textstats.QUERIES)
    out.update(urls.QUERIES)
    out.update(multimodal.QUERIES)
    out.update(_stwindows.QUERIES)
    out.update(oracle_gate.QUERIES)
    out.update({"u1_align_noisy": _q_align_noisy})
    return out


def oracle_sql() -> dict[str, str]:
    from nmalign_spark.operators import hierarchy, oracle_gate
    out = dict(relational.ORACLES)
    out.update(hierarchy.ORACLES)
    out.update(dedup.ORACLES)
    out.update(similarity.ORACLES)
    out.update(textstats.ORACLES)
    out.update(urls.ORACLES)
    out.update(multimodal.ORACLES)
    out.update(_stwindows.ORACLES)
    out.update(oracle_gate.ORACLES)
    return out

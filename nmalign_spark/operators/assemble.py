"""A4 — hierarchy text roll-up: per-segment extractions -> one text per url.

Spark mapping of the reference's page-text re-assembly
(/root/reference/nmalign/ocrd/cli.py:327-439, esp. 381-387: lines joined
with ``\\n`` in reading order, conf averaged upward).  The reference's
``Relation@type=join`` separator suppression is a PAGE-XML-only concept
(no analog in the crawl data model); the line->page level implemented here
is the byte-identity-relevant part of A4 for the extraction pipeline.

Scale: one hash shuffle on url with map-side partial ``collect_list``; the
per-group sort happens inside the agg expression (``array_sort`` on the
collected structs), so no window/global sort is involved.
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["assemble_pages"]


def assemble_pages(align_df):
    """Alignment table -> (url, page_text, n_lines, avg_conf).

    ``page_text`` = matched extractions joined with ``\\n`` in segment
    reading order (``i`` ascending) — the reference's region roll-up rule
    (ocrd/cli.py:381-385); ``avg_conf`` = mean score rolled upward
    (ocrd/cli.py:425-436 analog).
    """
    matched = align_df.where(F.col("j") >= 0)
    ordered = F.array_sort(F.collect_list(F.struct("i", "extracted")))
    return (matched.groupBy("url")
            .agg(F.array_join(
                    F.transform(ordered, lambda s: s.getField("extracted")),
                    "\n").alias("page_text"),
                 F.count(F.lit(1)).alias("n_lines"),
                 F.avg("score").alias("avg_conf")))

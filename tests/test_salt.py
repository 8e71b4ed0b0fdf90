"""Skew-salted alignment must be bit-identical to the unsalted path.

The salted path (operators/salt.py) re-scores the similarity matrix in row
chunks across tasks and reassembles before the sequential assignment loop;
since every matrix cell is a pure function of one string pair
(kernel/lev.py:198-222), chunking must not change a single output value
(north_star: "skewed giant pages are salted and re-merged deterministically").
"""

import pandas as pd

from nmalign_spark.functions.normalize import DEFAULT_NORMALIZATION
from nmalign_spark.operators.align import align_pages, route_skew
from nmalign_spark.operators.salt import align_pages_salted, salted_align
from nmalign_spark.sources.pages import pages_from_documents


def _canon(df) -> pd.DataFrame:
    pdf = df.toPandas()
    return (pdf.sort_values(["url", "i"]).reset_index(drop=True)
            .reindex(sorted(pdf.columns), axis=1))


def test_salted_equals_plain_forced_chunks(spark, sf_small):
    """Route EVERY page through the salted path with tiny chunks (4 rows)
    so each page's matrix is stitched from many tasks."""
    pages = pages_from_documents(spark, sf_small).limit(40)
    plain = _canon(align_pages(pages, normalization=DEFAULT_NORMALIZATION,
                               try_subseg=True))
    salted = _canon(salted_align(pages, normalization=DEFAULT_NORMALIZATION,
                                 try_subseg=True, chunk_rows=4))
    pd.testing.assert_frame_equal(plain, salted)


def test_salted_with_cutoff(spark, sf_small):
    pages = pages_from_documents(spark, sf_small).limit(20)
    plain = _canon(align_pages(pages, normalization=DEFAULT_NORMALIZATION,
                               cutoff=0.5, try_subseg=False))
    salted = _canon(salted_align(pages, normalization=DEFAULT_NORMALIZATION,
                                 cutoff=0.5, try_subseg=False, chunk_rows=3))
    pd.testing.assert_frame_equal(plain, salted)


def test_align_pages_salted_routes_and_unions(spark, sf_small):
    """Production entry: low giant threshold forces a mixed route; the union
    must still equal the unsalted full run."""
    pages = pages_from_documents(spark, sf_small).limit(60)
    # threshold at the median text length => both branches non-empty
    lengths = sorted(len(t) for t in
                     pages.select("text").toPandas()["text"])
    thresh = lengths[len(lengths) // 2]
    normal, giants = route_skew(pages, giant_chars=thresh)
    assert normal.count() > 0 and giants.count() > 0
    plain = _canon(align_pages(pages, normalization=DEFAULT_NORMALIZATION,
                               try_subseg=True))
    routed = _canon(align_pages_salted(
        pages, normalization=DEFAULT_NORMALIZATION, try_subseg=True,
        giant_chars=thresh, chunk_rows=8))
    pd.testing.assert_frame_equal(plain, routed)


def test_salted_degenerate_pages(spark):
    """Pages with empty html segments or empty text must survive salting."""
    rows = [("u1", None, "line one\nline two"),
            ("u2", b"<html><body><p>seg</p></body></html>", ""),
            ("u3", b"<html><body><p>hello world</p></body></html>",
             "hello world\nsecond line")]
    pages = spark.createDataFrame(rows, "url string, html binary, text string")
    plain = _canon(align_pages(pages, try_subseg=True))
    salted = _canon(salted_align(pages, try_subseg=True, chunk_rows=1))
    pd.testing.assert_frame_equal(plain, salted)

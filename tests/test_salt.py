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


def test_duplicate_urls(spark):
    """Two giant rows sharing one url but DIFFERENT content: the salted
    path must process each row independently (page_uid keying), producing
    the same multiset of rows as align_pages — not a silent merge of the
    two pages' matrix chunks (the pre-r2 bug: a score-1.0 match became
    unmatched)."""
    import html as _html

    def page(url, lines):
        body = "".join(f"<p>{_html.escape(s)}</p>" for s in lines)
        return (url, f"<html><body>{body}</body></html>".encode(),
                "\n".join(lines))

    lines_a = [f"alpha beta gamma line {i} of the first crawl"
               for i in range(9)]
    lines_b = [f"totally different recrawl content row {i} here"
               for i in range(7)]
    rows = [page("https://dup.example/x", lines_a),
            page("https://dup.example/x", lines_b),
            page("https://dup.example/y", lines_a[:5])]
    pages = spark.createDataFrame(
        rows, "url string, html binary, text string")

    def multiset(df):
        pdf = df.toPandas().reindex(sorted(df.columns), axis=1)
        return sorted(map(tuple, pdf.fillna("<null>").values.tolist()))

    plain = multiset(align_pages(pages, try_subseg=True))
    salted = multiset(salted_align(pages, try_subseg=True, chunk_rows=3))
    assert plain == salted
    # and the same through the routed production entry
    routed = multiset(align_pages_salted(pages, try_subseg=True,
                                         giant_chars=10, chunk_rows=3))
    assert plain == routed


def test_salted_passthrough_columns(spark):
    """passthrough columns reappear on every output row with the ROW's own
    values (no url-level mixing)."""
    import html as _html
    rows = []
    for k, url in enumerate(["https://p.example/a", "https://p.example/a",
                             "https://p.example/b"]):
        lines = [f"content {k} line {i} with several words" for i in range(6)]
        body = "".join(f"<p>{_html.escape(s)}</p>" for s in lines)
        rows.append((url, f"<html><body>{body}</body></html>".encode(),
                     "\n".join(lines), f"meta-{k}"))
    pages = spark.createDataFrame(
        rows, "url string, html binary, text string, lang string")
    out = salted_align(pages, try_subseg=False, chunk_rows=2,
                       passthrough=("lang",)).toPandas()
    assert set(out.columns) >= {"url", "i", "lang"}
    # every aligned row's seg_text embeds the same k as its lang column
    for _, r in out.iterrows():
        k = r["lang"].split("-")[1]
        assert f"content {k} " in r["seg_text"]

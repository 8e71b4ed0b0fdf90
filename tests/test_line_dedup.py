"""Boilerplate line removal (dedup.line_dedup): planted-clutter semantics
and byte-identical re-assembly of clean documents."""

import hashlib

import pyspark.sql.functions as F

from nmalign_spark.operators.dedup import LINE_DF_MAX, line_dedup


def test_planted_boilerplate_dropped_clean_docs_untouched(spark, sf_small):
    res = {r["doc_id"]: r for r in line_dedup(spark, sf_small).collect()}
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{sf_small}/documents.parquet")
            .select("doc_id", "text").collect()}
    assert set(res) == set(docs)
    n_banner = sum(1 for d in docs if d % 4 == 2)
    n_footer = sum(1 for d in docs if d % 3 == 1)
    # the planted lines are shared corpus-wide, so they exceed LINE_DF_MAX
    assert n_banner > LINE_DF_MAX and n_footer > LINE_DF_MAX
    for doc_id, text in docs.items():
        planted = (doc_id % 4 == 2) + (doc_id % 3 == 1)
        r = res[doc_id]
        base_lines = text.count("\n") + 1
        assert r["n_lines"] == base_lines + planted
        # base corpus lines may themselves repeat across docs; at minimum
        # every planted line is dropped
        assert r["n_kept"] <= r["n_lines"] - planted
        if r["n_kept"] == base_lines:
            # full rebuild must be byte-identical to the original text
            assert r["clean_md5"] == hashlib.md5(text.encode()).hexdigest()
            assert r["clean_chars"] == len(text)


def test_line_df_counts_distinct_docs_not_occurrences(spark):
    # one doc repeating a line 5 times: within-doc repetition alone must
    # NOT make it boilerplate (df counts distinct documents)
    rows = [(1, "unique one\nrepeat me\nrepeat me\nrepeat me\nrepeat me\nrepeat me"),
            (2, "unique two"), (3, "unique three"), (4, "unique four")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import nmalign_spark.operators.dedup as dd
    orig = dd.t
    try:
        dd.t = lambda s, sf, name: df
        out = {r["doc_id"]: r for r in line_dedup(spark, "unused").collect()}
    finally:
        dd.t = orig
    # doc 1 also gets the planted footer (1%3==1), but with only two
    # footer docs (1 and 4) its df stays <= LINE_DF_MAX, so everything is
    # kept: within-doc repetition alone never crosses the df threshold
    from nmalign_spark.operators.dedup import LINE_FOOTER
    assert out[1]["n_kept"] == out[1]["n_lines"] == 7
    full = rows[0][1] + "\n" + LINE_FOOTER
    assert out[1]["clean_md5"] == hashlib.md5(full.encode()).hexdigest()

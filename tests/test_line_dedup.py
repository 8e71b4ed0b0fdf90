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


def test_line_dedup_matches_naive_reference_fuzz(spark):
    """Randomized parity vs a naive Python reference of the CC-Net rule:
    df counted over distinct docs, planted banner/footer included, rebuild
    in original order."""
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from nmalign_spark.operators.dedup import (LINE_BANNER, LINE_DF_MAX,
                                               LINE_FOOTER)

    line = st.sampled_from(["alpha", "beta", "gamma", "", "alpha beta"])
    doc = st.lists(line, min_size=1, max_size=5).map("\n".join)
    corpus = st.lists(doc, min_size=2, max_size=6)

    def naive(texts):
        planted = {}
        for d, t in texts.items():
            if d % 4 == 2:
                t = LINE_BANNER + "\n" + t
            if d % 3 == 1:
                t = t + "\n" + LINE_FOOTER
            planted[d] = t.split("\n")
        df = Counter()
        for lines in planted.values():
            for ln in set(lines):
                df[ln] += 1
        out = {}
        for d, lines in planted.items():
            kept = [ln for ln in lines if df[ln] <= LINE_DF_MAX]
            out[d] = (len(lines), len(kept), "\n".join(kept))
        return out

    @settings(max_examples=12, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(corpus)
    def run(docs):
        texts = dict(enumerate(docs))
        expect = naive(texts)
        import nmalign_spark.operators.dedup as dd
        df_in = spark.createDataFrame(list(texts.items()),
                                      "doc_id long, text string")
        orig = dd.t
        try:
            dd.t = lambda s, sf, name: df_in
            got = {r["doc_id"]: r
                   for r in line_dedup(spark, "unused").collect()}
        finally:
            dd.t = orig
        assert set(got) == set(expect)
        for d, (n_lines, n_kept, clean) in expect.items():
            r = got[d]
            assert r["n_lines"] == n_lines
            assert r["n_kept"] == n_kept
            assert r["clean_md5"] == hashlib.md5(clean.encode()).hexdigest()

    run()

"""ExactSubstr-style span removal (dedup.span_removal): planted-slogan
coverage, boundary precision, byte-identical rebuild of clean docs."""

import hashlib

from nmalign_spark.operators.dedup import (SHINGLE_K, SPAN_SLOGAN,
                                           span_removal)

SLOGAN_LEN = len(SPAN_SLOGAN.split(" "))


def _patched(spark, rows):
    import nmalign_spark.operators.dedup as dd
    df = spark.createDataFrame(rows, "doc_id long, text string")
    orig = dd.t
    try:
        dd.t = lambda s, sf, name: df
        return {r["doc_id"]: r for r in span_removal(spark, "unused").collect()}
    finally:
        dd.t = orig


def test_planted_slogan_removed_everywhere(spark, sf_small):
    res = {r["doc_id"]: r for r in span_removal(spark, sf_small).collect()}
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{sf_small}/documents.parquet")
            .select("doc_id", "text").collect()}
    assert set(res) == set(docs)
    for doc_id, text in docs.items():
        r = res[doc_id]
        n_base = len(text.split(" "))
        if doc_id % 6 == 3:
            assert r["n_tokens"] == n_base + SLOGAN_LEN
            # every slogan token is covered by a corpus-duplicated gram
            assert r["n_removed"] >= SLOGAN_LEN
        else:
            assert r["n_tokens"] == n_base
        if r["n_removed"] == 0:
            assert r["clean_md5"] == hashlib.md5(text.encode()).hexdigest()
            assert r["clean_chars"] == len(text)


def test_boundary_grams_do_not_widen_removal(spark):
    # two docs share an interior SHINGLE_K-gram; the grams straddling the
    # shared span and the unique context have occ=1, so removal is exactly
    # the shared K tokens (coverage = union of dup-gram windows).
    shared = " ".join(f"s{i}" for i in range(SHINGLE_K))
    rows = [(10, f"alpha beta {shared} gamma delta"),
            (20, f"one two three {shared} four five six")]
    out = _patched(spark, rows)
    for doc_id, head, tail in ((10, "alpha beta", "gamma delta"),
                               (20, "one two three", "four five six")):
        r = out[doc_id]
        assert r["n_removed"] == SHINGLE_K
        clean = f"{head} {tail}"
        assert r["clean_md5"] == hashlib.md5(clean.encode()).hexdigest()
        assert r["clean_chars"] == len(clean)


def test_within_doc_repetition_counts_as_duplicated(spark):
    # ExactSubstr counts OCCURRENCES: a gram repeated twice inside one doc
    # is removed even though no other doc contains it.
    rep = " ".join(f"r{i}" for i in range(SHINGLE_K))
    # ids avoid %6==3 so the operator's planted slogan stays out of play
    rows = [(1, f"{rep} middle words here {rep}"),
            (2, "totally unrelated content entirely"),
            (4, "another unrelated document text")]
    out = _patched(spark, rows)
    r = out[1]
    assert r["n_removed"] == 2 * SHINGLE_K
    clean = "middle words here"
    assert r["clean_md5"] == hashlib.md5(clean.encode()).hexdigest()
    # the unique docs rebuild byte-identically
    for doc_id, text in rows[1:]:
        assert out[doc_id]["clean_md5"] == \
            hashlib.md5(text.encode()).hexdigest()

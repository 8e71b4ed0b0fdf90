"""Training-data text ops: benchmark decontamination semantics (the
parity-vs-DuckDB check lives in test_queries_oracle.py)."""
from __future__ import annotations

from nmalign_spark.operators.textstats import (DECON_N,
                                               decontaminate_flags)


def test_decontaminate_flags_planted_twins(spark, sf_small):
    """Every planted contaminated twin (+300000, benchmark doc 0's text
    appended) is flagged with at least (len0 - N + 1) overlapping n-grams;
    the natural corpus stays clean."""
    flags = {r.doc_id: r.n_contaminated_ngrams
             for r in decontaminate_flags(spark, sf_small).collect()}
    docs = spark.read.parquet(f"{sf_small}/documents.parquet") \
        .select("doc_id", "text").collect()
    len0 = len([r.text for r in docs if r.doc_id == 0][0].split(" "))
    planted = {r.doc_id + 300000 for r in docs if r.doc_id % 50 == 1}
    assert planted and planted <= set(flags)
    for p in planted:
        assert flags[p] >= len0 - DECON_N + 1
    # selectivity: only planted twins + the corpus's few genuine
    # overlaps with benchmark doc 0 (the synthetic generator reuses
    # phrasing across some docs) are flagged — not the bulk of the corpus
    assert len(flags) <= len(planted) + 0.05 * len(docs)


def test_url_canonicalization_collapses_variants(spark, sf_small):
    """Every document's 3-4 messy URL spellings (case, www, default port,
    utm params, fragment, trailing slash) collapse to exactly ONE
    canonical key; nothing merges across documents."""
    from nmalign_spark.operators.urls import messy_urls, url_dedup_groups

    n_docs = spark.read.parquet(f"{sf_small}/documents.parquet").count()
    groups = url_dedup_groups(spark, sf_small).collect()
    assert len(groups) == n_docs
    assert {r.n_variants for r in groups} == {3, 4}
    assert messy_urls(spark, sf_small).count() == \
        sum(r.n_variants for r in groups)
    for r in groups:
        u = r.canonical_url
        assert u.startswith("https://example.org/")
        assert "www" not in u and ":443" not in u
        assert "utm_" not in u and "#" not in u and not u.endswith("/")

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
    """Every document's messy URL spellings (case, www, authority default
    port, utm params, fragment, trailing slash) collapse to exactly ONE
    bare canonical key; docs with the order-swapped surviving param get
    exactly one extra 2-variant ``?ref=a`` key; nothing merges across
    documents."""
    from nmalign_spark.operators.urls import messy_urls, url_dedup_groups

    n_docs = spark.read.parquet(f"{sf_small}/documents.parquet").count()
    n_param_docs = spark.read.parquet(f"{sf_small}/documents.parquet") \
        .where("doc_id % 4 = 1").count()
    groups = url_dedup_groups(spark, sf_small).collect()
    assert len(groups) == n_docs + n_param_docs
    bare = [r for r in groups if "?" not in r.canonical_url]
    param = [r for r in groups if "?" in r.canonical_url]
    assert len(bare) == n_docs and len(param) == n_param_docs
    assert {r.n_variants for r in bare} == {3, 4}
    # both param orders land on the same ?ref=a key
    assert all(r.n_variants == 2 and r.canonical_url.endswith("?ref=a")
               for r in param)
    assert messy_urls(spark, sf_small).count() == \
        sum(r.n_variants for r in groups)
    for r in groups:
        u = r.canonical_url
        assert u.startswith("https://example.org/")
        assert "www" not in u and ":443" not in u
        assert "utm_" not in u and "#" not in u and not u.endswith("/")


def test_pii_counts_flags_exactly_planted(spark, sf_small):
    """Planted docs (doc_id % 37 == 3) carry exactly one email, one IPv4,
    one phone; every other document stays clean."""
    from nmalign_spark.operators.textstats import (PII_MOD, PII_REM,
                                                   pii_counts)
    rows = pii_counts(spark, sf_small).collect()
    assert any(r.doc_id % PII_MOD == PII_REM for r in rows)
    for r in rows:
        if r.doc_id % PII_MOD == PII_REM:
            assert (r.n_emails, r.n_ipv4, r.n_phones) == (1, 1, 1)
            assert r.has_pii
        else:
            assert (r.n_emails, r.n_ipv4, r.n_phones) == (0, 0, 0)
            assert not r.has_pii


def test_gopher_rules_flag_consistent_with_metrics(spark, sf_small):
    """pass_gopher must equal the conjunction of the emitted metrics, and
    each planted rule-violating twin must fail exactly its rule."""
    from nmalign_spark.operators.textstats import (GOPHER_ALPHA_MIN,
                                                   GOPHER_BULLET_LINE_MAX,
                                                   GOPHER_ELLIPSIS_LINE_MAX,
                                                   GOPHER_MAX_WORDS,
                                                   GOPHER_MIN_WORDS,
                                                   GOPHER_STOP_MIN,
                                                   GOPHER_SYMBOL_MAX,
                                                   GOPHER_WLEN_HI,
                                                   GOPHER_WLEN_LO,
                                                   gopher_rules)
    rows = gopher_rules(spark, sf_small).collect()
    assert rows
    for r in rows:
        expect = (GOPHER_MIN_WORDS <= r.n_words <= GOPHER_MAX_WORDS
                  and GOPHER_WLEN_LO <= r.mean_word_len <= GOPHER_WLEN_HI
                  and r.frac_alpha_words >= GOPHER_ALPHA_MIN
                  and r.n_stopwords >= GOPHER_STOP_MIN
                  and r.frac_symbol_words <= GOPHER_SYMBOL_MAX
                  and r.frac_ellipsis_lines <= GOPHER_ELLIPSIS_LINE_MAX
                  and r.frac_bullet_lines <= GOPHER_BULLET_LINE_MAX)
        assert bool(r.pass_gopher) == expect, r
        assert 0.0 <= r.frac_alpha_words <= 1.0
        if 400000 <= r.doc_id < 500000:
            assert r.frac_symbol_words > GOPHER_SYMBOL_MAX and not r.pass_gopher
        elif 500000 <= r.doc_id < 600000:
            assert (r.frac_ellipsis_lines > GOPHER_ELLIPSIS_LINE_MAX
                    and not r.pass_gopher)
        elif 600000 <= r.doc_id:
            assert (r.frac_bullet_lines > GOPHER_BULLET_LINE_MAX
                    and not r.pass_gopher)
        else:
            # base corpus has no symbols/newlines: new rules are vacuous there
            assert r.frac_symbol_words == 0.0
            assert r.frac_ellipsis_lines == 0.0
            assert r.frac_bullet_lines == 0.0


def test_corpus_top_ngrams_ordering(spark, sf_small):
    """Exactly K rows, counts non-increasing, doc counts bounded by
    occurrence counts, deterministic tie-break by bigram."""
    from nmalign_spark.operators.textstats import (TOP_NGRAMS_K,
                                                   corpus_top_ngrams)
    rows = corpus_top_ngrams(spark, sf_small).collect()
    assert len(rows) == TOP_NGRAMS_K
    for a, b in zip(rows, rows[1:]):
        assert (a.n_occurrences, b.bg) >= (b.n_occurrences, a.bg)
    for r in rows:
        assert 1 <= r.n_docs <= r.n_occurrences


def test_unigram_logprob_bounds_and_counts(spark, sf_small):
    """Scores are positive (every unigram probability < 1 on this corpus),
    finite, and per-doc token counts match the whitespace tokenization."""
    from nmalign_spark.operators.textstats import (token_counts,
                                                   unigram_logprob)
    import math

    lp = {r.doc_id: r for r in unigram_logprob(spark, sf_small).collect()}
    tc = {r.doc_id: r.n_ws_tokens
          for r in token_counts(spark, sf_small).collect()}
    assert set(lp) == {d for d, n in tc.items() if n > 0}
    for did, r in lp.items():
        assert r.n_tokens == tc[did]
        assert 0.0 < r.avg_neg_logprob and math.isfinite(r.avg_neg_logprob)


def test_token_budget_two_phase_equals_global_window(spark, sf_small):
    """The distributed two-phase prefix sum must reproduce the naive
    single global-window cumulative sum exactly, and every language's
    kept tokens must respect the budget."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from nmalign_spark.operators.textstats import (TOKEN_BUDGET,
                                                   token_budget_sample)

    two_phase = {r.lang: (r.n_docs_kept, r.tokens_kept)
                 for r in token_budget_sample(spark, sf_small).collect()}

    d = spark.read.parquet(f"{sf_small}/documents.parquet") \
        .select("doc_id", "lang", "text")
    n_tok = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    h = F.md5(F.col("doc_id").cast("string"))
    w = (Window.partitionBy("lang").orderBy("h", "doc_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    naive = (d.select("lang", n_tok.alias("n_tok"), h.alias("h"), "doc_id")
             .withColumn("cum", F.sum("n_tok").over(w))
             .where(F.col("cum") <= TOKEN_BUDGET)
             .groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("n_tok").cast("long").alias("tk")))
    expected = {r.lang: (r.n, r.tk) for r in naive.collect()}
    assert two_phase == expected
    for _, (n, tk) in two_phase.items():
        assert 0 < tk <= TOKEN_BUDGET


def test_sliding_ngrams_equals_closure_form(spark):
    """relational.sliding_ngrams (zip_with over slices) must reproduce the
    quadratic closure form exactly for k in {2,3,5,8} over adversarial
    texts: empties, single tokens, repeated spaces (empty tokens kept,
    matching split semantics), unicode, n<k / n==k / n==k+1 boundaries,
    and 300 seeded random word soups."""
    import random
    from pyspark.sql import functions as F
    from nmalign_spark.operators.relational import sliding_ngrams

    rng = random.Random(42)
    texts = ["", "one", "a b", "x  y   z", "ſ ͤ ß 漢 字 é",
             "t1 t2 t3 t4 t5", "t1 t2 t3 t4 t5 t6",
             " lead", "trail ", "  "]
    words = ["alpha", "beta", "gamma", "", "δ", "x"]
    texts += [" ".join(rng.choice(words)
                       for _ in range(rng.randint(0, 30)))
              for _ in range(300)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")

    for k in (2, 3, 5, 8):
        toks = F.split("text", " ")
        n = F.size(toks)
        old = F.transform(
            F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, k), " "))
        got = df.select("id", old.alias("a"),
                        sliding_ngrams(F.split("text", " "), k).alias("b")) \
                .where(F.col("a") != F.col("b")).count()
        assert got == 0, f"k={k}: {got} rows diverge"


def test_domain_cap_hot_host_capped_tail_untouched(spark, sf_small):
    """The planted hot host (every %4==0 doc on h0) is capped at exactly
    DOMAIN_CAP_K kept docs; under-cap hosts keep everything; the routed
    union covers every document exactly once."""
    from nmalign_spark.operators.textstats import DOMAIN_CAP_K, domain_cap

    rows = domain_cap(spark, sf_small).collect()
    n_docs = spark.read.parquet(f"{sf_small}/documents.parquet").count()
    assert len(rows) == n_docs == len({r.doc_id for r in rows})
    by_host: dict[str, list] = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
    assert len(by_host["h0.example.org"]) > DOMAIN_CAP_K  # hot path hit
    assert any(len(v) <= DOMAIN_CAP_K for v in by_host.values())  # tail hit
    for host, rs in by_host.items():
        n_kept = sum(r.kept for r in rs)
        assert all(r.n_host_docs == len(rs) for r in rs)
        expect = len(rs) if len(rs) <= DOMAIN_CAP_K else DOMAIN_CAP_K
        assert n_kept == expect, host


def test_domain_cap_selection_is_deterministic(spark, sf_small):
    from nmalign_spark.operators.textstats import domain_cap

    a = {(r.doc_id, r.kept) for r in domain_cap(spark, sf_small).collect()}
    b = {(r.doc_id, r.kept) for r in domain_cap(spark, sf_small).collect()}
    assert a == b


def test_temperature_mix_rates(spark, sf_small):
    """alpha=0.5 normalization: the smallest language keeps rate 1.0 (and
    every one of its docs); keep-rate decreases as language size grows;
    kept counts track rate*n within hash-sampling tolerance."""
    from nmalign_spark.operators.textstats import temperature_mix

    rows = temperature_mix(spark, sf_small).collect()
    n_min = min(r.n_docs for r in rows)
    for r in rows:
        assert abs(r.keep_rate - (n_min / r.n_docs) ** 0.5) < 1e-6
        if r.n_docs == n_min:
            assert r.n_kept == r.n_docs
        assert r.n_kept <= r.n_docs
        # binomial tolerance: 4 sigma around the expected kept volume
        import math
        exp = r.keep_rate * r.n_docs
        tol = 4 * math.sqrt(r.n_docs * 0.25) + 1
        assert abs(r.n_kept - exp) <= tol

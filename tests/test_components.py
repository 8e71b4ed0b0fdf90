"""Connected components: pointer-doubling min-label propagation
(operators/dedup.py _min_label_components)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nmalign_spark.operators.dedup import _min_label_components


def _run(spark, edges, n, max_iters=20):
    ids = spark.range(n).select(F.col("id").cast("long"))
    labels = ids.select("id", F.col("id").alias("label"))
    e = spark.createDataFrame(edges, "id1 long, id2 long")
    edges_sym = e.unionByName(
        e.select(F.col("id2").alias("id1"), F.col("id1").alias("id2")))
    out = _min_label_components(labels, edges_sym, max_iters=max_iters)
    return dict((r["id"], r["label"]) for r in out.collect())


def test_long_chain_converges_logarithmically(spark):
    """A 64-node path graph has diameter 63: plain one-hop propagation
    needs 63 rounds; pointer doubling must finish in ~log2 + slack."""
    n = 64
    got = _run(spark, [(i, i + 1) for i in range(n - 1)], n, max_iters=10)
    assert got == {i: 0 for i in range(n)}


def test_multiple_components_and_singletons(spark):
    edges = [(0, 1), (1, 2), (5, 6), (8, 9), (9, 5)]
    got = _run(spark, edges, 10)
    assert got[0] == got[1] == got[2] == 0
    assert got[5] == got[6] == got[8] == got[9] == 5
    assert got[3] == 3 and got[4] == 4 and got[7] == 7


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _run(spark, [(i, i + 1) for i in range(63)], 64, max_iters=2)


def test_simhash_pairs_find_planted_dups(spark):
    """32-bit SimHash banding (4x8 bits, Hamming<=3): every planted EXACT
    duplicate pair (v, v+200000) must surface at hamming=0 (identical
    token multiset => identical signature), and the pair set must be
    selective — nowhere near the ~1%-of-all-pairs collision mass a 16-bit
    signature produces."""
    from nmalign_spark.operators.dedup import augmented_docs, simhash_pairs

    sf = "/root/testdata/sf0.001"
    pairs = {(r.id1, r.id2): r.hamming
             for r in simhash_pairs(spark, sf).collect()}
    n_docs = augmented_docs(spark, sf).count()
    exact_ids = [r.doc_id for r in
                 augmented_docs(spark, sf).where("doc_id >= 200000").collect()]
    assert exact_ids
    for dup in exact_ids:
        assert pairs.get((dup - 200000, dup)) == 0
    assert len(pairs) < 0.01 * n_docs * (n_docs - 1) / 2


def test_span_dup_fraction_planted_semantics(spark, sf_small):
    """Docs with an exact planted copy score dup_frac == 1.0 (every
    shingle repeats), near-dup twins (every 7th word dropped) still share
    the shingles inside undisturbed 6-token runs, and the fraction is a
    valid ratio everywhere."""
    from nmalign_spark.operators.dedup import span_dup_fraction

    rows = {r.doc_id: r for r in span_dup_fraction(spark, sf_small).collect()}
    assert rows
    for did, r in rows.items():
        assert 0 <= r.n_dup_shingles <= r.n_shingles
        assert 0.0 <= r.dup_frac <= 1.0
        if did >= 200000 or (did < 100000 and did % 10 == 0):
            assert r.dup_frac == 1.0, (did, r)
    near = [r for did, r in rows.items() if 100000 <= did < 200000]
    assert near and all(r.dup_frac > 0 for r in near)


def test_incremental_dedup_flags_exact_twins_only(spark, sf_small):
    """Exactly the planted exact twins (+200000) hit the committed hash
    index; near-dup twins (+100000, word-dropped) never match, and every
    dup_of points at a committed doc with identical text."""
    from nmalign_spark.operators.dedup import (augmented_docs,
                                               incremental_dedup)

    rows = incremental_dedup(spark, sf_small).collect()
    texts = {r.doc_id: r.text
             for r in augmented_docs(spark, sf_small).collect()}
    expected = {d for d in texts if d >= 200000}
    assert {r.new_id for r in rows} == expected
    for r in rows:
        assert r.dup_of < 100000
        assert texts[r.dup_of] == texts[r.new_id]


def test_curation_verdict_consistency(spark, sf_small):
    """keep must equal the conjunction of the emitted reasons; planted
    exact twins are always demoted (never their canonical), docs in an
    exact-dup group are never span-dropped, exact-dup implies
    near-dup-component membership, and benchmark docs are never flagged
    contaminated."""
    from nmalign_spark.operators.dedup import curation_verdict
    from nmalign_spark.operators.textstats import DECON_BENCH_MOD

    rows = {r.doc_id: r for r in curation_verdict(spark, sf_small).collect()}
    assert rows
    for did, r in rows.items():
        assert bool(r.keep) == (bool(r.pass_gopher)
                                and not r.is_near_dup
                                and not r.high_span_dup
                                and not r.is_contaminated), r
        if r.is_exact_dup:  # exact edge is in the component graph
            assert r.is_near_dup
        if did >= 200000:
            assert r.is_exact_dup and not r.keep
            assert not rows[did - 200000].is_exact_dup
            assert not r.high_span_dup  # dup-group docs use the dup rule
        if did % DECON_BENCH_MOD == 0 and did < 100000:
            assert not r.is_contaminated  # the benchmark itself
    # exact twins of benchmark docs share every 8-gram -> contaminated
    planted_contam = [did for did, r in rows.items()
                      if did >= 200000
                      and (did - 200000) % DECON_BENCH_MOD == 0]
    assert planted_contam
    assert all(rows[d].is_contaminated for d in planted_contam)


def test_minhash_recall_vs_exact_twin(spark, sf_small):
    """K=32 independent affine bands must keep recall >= 0.97 vs the exact
    shingle-Jaccard twin (QUALITY.md row; r4's 16 correlated md5-rotations
    measured 0.976 — the integer mixes must not regress it), with
    precision 1.0 by construction (every candidate exact-verified)."""
    from nmalign_spark.operators import dedup
    exact = {(r.id1, r.id2) for r in
             dedup.ngram_jaccard_pairs(spark, sf_small).collect()}
    lsh = {(r.id1, r.id2) for r in
           dedup.minhash_lsh_pairs(spark, sf_small).collect()}
    assert lsh <= exact                      # precision 1.0
    assert len(lsh) / len(exact) >= 0.97     # recall


def test_shingle_group_cap_boundary_exact(spark):
    """The one-exchange row_number cap must keep a shingle at df == cap
    (all ids present) and drop one at df == cap+1 entirely — identical to
    an exact document-frequency prefilter (the r4 df-count + LEFT-SEMI
    shape this replaced)."""
    from nmalign_spark.operators import dedup

    k, cap = dedup.SHINGLE_K, dedup.STOP_SHINGLE_MAX
    common = "alpha beta gamma delta epsilon"          # one k=5 shingle
    over = "zeta eta theta iota kappa"                 # another
    rows = [(i, common) for i in range(cap)]           # df == cap -> kept
    rows += [(1000 + i, over) for i in range(cap + 1)]  # df == cap+1 -> gone
    df = spark.createDataFrame(rows, "doc_id long, text string")
    groups = dedup._shingle_groups(df, hash_key=True).collect()
    assert len(groups) == 1
    assert groups[0]["ids"] == sorted(r[0] for r in rows[:cap])

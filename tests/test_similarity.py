"""ANN quality sanity: the approximate paths must return genuinely near
neighbors (non-trivial recall vs the exact brute force), and every hit they
return must carry its true cosine (re-rank is exact)."""

from nmalign_spark.operators import similarity


def _pairs(df):
    pdf = df.toPandas()
    return {(int(q), int(n)): float(c)
            for q, n, c in zip(pdf.qid, pdf.nid, pdf.cos)}


def test_ivf_recall_and_exact_rerank(spark, sf_mid):
    bf = _pairs(similarity.brute_force_topk(spark, sf_mid))
    ivf = _pairs(similarity.ivf_topk(spark, sf_mid))
    hits = set(bf) & set(ivf)
    # unclustered random embeddings + 8 cells / 2 probes: recall is modest
    # by construction, but must be far above random (random ~ 3/|C| ≈ 0.006)
    assert len(hits) / len(bf) >= 0.2
    for k in hits:  # scores of common pairs are the exact cosine
        assert abs(bf[k] - ivf[k]) < 1e-9


def test_lsh_exact_rerank(spark, sf_mid):
    bf = _pairs(similarity.brute_force_topk(spark, sf_mid))
    lsh = _pairs(similarity.lsh_bucketed_topk(spark, sf_mid))
    for k in set(bf) & set(lsh):
        assert abs(bf[k] - lsh[k]) < 1e-9

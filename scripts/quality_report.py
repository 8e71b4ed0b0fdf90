#!/usr/bin/env python
"""Measure the recall of every approximate path against its exact twin and
write QUALITY.md.  These are the numbers an index/dedup build is tuned on;
the correctness gates prove the plans compute what they claim — this report
records HOW MUCH the sub-quadratic paths give up, reproducibly.

Run: python scripts/quality_report.py [sf_dir]   (default /root/testdata/sf0.01)
"""
from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(sf_dir: str) -> None:
    from pyspark.sql import SparkSession

    from nmalign_spark.operators import dedup, similarity

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false")
             .getOrCreate())

    rows = []

    # -- dedup: MinHash LSH candidates vs full shingle-Jaccard truth --------
    exact_pairs = {(r.id1, r.id2) for r in
                   dedup.ngram_jaccard_pairs(spark, sf_dir).collect()}
    lsh_pairs = {(r.id1, r.id2) for r in
                 dedup.minhash_lsh_pairs(spark, sf_dir).collect()}
    rows.append((
        "dedup_minhash_lsh vs dedup_ngram_jaccard",
        f"{len(lsh_pairs)}/{len(exact_pairs)}",
        len(lsh_pairs) / len(exact_pairs) if exact_pairs else 1.0,
        f"K={dedup.MINHASH_K} one-row bands over affine integer mixes of "
        f"the md5 halves (MIX_P=2^31-1); "
        f"precision 1.0 (every candidate exact-verified at "
        f"J>={dedup.JACCARD_MIN})"))

    # -- embeddings: banded-LSH cosine near-dups vs all-pairs ---------------
    r = similarity.cosine_dups_recall(spark, sf_dir)
    n_exact = similarity.embedding_cosine_dups(spark, sf_dir).count()
    rows.append((
        "sim_cosine_dups_lsh vs sim_cosine_dups",
        f"{round(r * n_exact)}/{n_exact}", r,
        f"{similarity.CD_TABLES} tables x {similarity.CD_BITS} sign bits "
        f"(expected ~0.95 at cos>={similarity.DUP_COS} by banding "
        "arithmetic); precision 1.0 (exact verify)"))

    # -- ANN top-k: IVF (seeded + Lloyd) and hyperplane LSH vs brute force --
    ivf = similarity.ivf_recall_at_k(spark, sf_dir)

    def topset(df):
        out = {}
        for row in df.collect():
            out.setdefault(row["qid"], set()).add(row["nid"])
        return out

    exact_tk = topset(similarity.brute_force_topk(spark, sf_dir))
    lsh_tk = topset(similarity.lsh_bucketed_topk(spark, sf_dir))
    denom = sum(len(v) for v in exact_tk.values())
    lsh_hits = sum(len(exact_tk[q] & lsh_tk.get(q, set())) for q in exact_tk)
    planted = similarity.ivf_planted_recall(spark, sf_dir)
    rows.append((
        "IVF retrieves planted near-dup (seeded centroids)",
        f"recall@{similarity.N_PROBE}-probe", planted["ivf_seeded"],
        f"{similarity.N_CENTROIDS} cells: is the dup's cell among its "
        "source's probed cells? (the retrieval question an IVF dedup "
        "build is tuned on)"))
    rows.append((
        "IVF retrieves planted near-dup (Lloyd-refined)",
        f"recall@{similarity.N_PROBE}-probe", planted["ivf_lloyd"],
        f"{similarity.LLOYD_ITERS} Lloyd iterations on the same seeds — "
        "refinement's effect measured, not assumed"))
    rows.append((
        "sim_ivf_topk vs sim_topk_cosine (context only)",
        f"recall@{similarity.TOP_K}", ivf["ivf_seeded"],
        "top-k over NEAR-ORTHOGONAL random vectors (max pairwise cos "
        "~0.5): the 'true' neighbors are arbitrary, so this number "
        "bounds nothing — kept for transparency"))
    lsh_planted = similarity.lsh_planted_recall(spark, sf_dir)
    hp = similarity.PROBE_HAMMING
    rows.append((
        "LSH multi-probe retrieves planted near-dup",
        f"recall@Hamming<={hp}", lsh_planted,
        f"{similarity.N_PLANES}-bit sign bucket + all Hamming-<={hp} "
        "probes (37/256 buckets ~ 14.5% scan; the sim_lsh_topk production "
        "path): fraction of planted pairs (cos ~0.87-0.993) whose buckets "
        "are within the probe radius (was 0.84 at radius 1 in r3)"))
    rows.append((
        "sim_lsh_topk vs sim_topk_cosine (context only)",
        f"{lsh_hits}/{denom}", lsh_hits / denom if denom else 1.0,
        f"multi-probe (Hamming<={hp}) over {similarity.N_PLANES}-bit "
        "buckets; top-k over NEAR-ORTHOGONAL random vectors remains "
        "structurally weak — the planted row above is the number the "
        "index is tuned on"))

    # -- langid accuracy on the planted multilingual fixture ---------------
    # (the synthetic documents table's lang labels are content-
    # uncorrelated, so accuracy is measured on real stopword-heavy
    # sentences: 4 train / 4 held-out per language, en/de/fr/es)
    sys.path.insert(0, str(REPO / "tests"))
    from test_textstats_langid import planted_fixture

    from nmalign_spark.operators.textstats import (LANGID_TOP, lang_id_df,
                                                   lang_profiles_df)
    train, test = planted_fixture(spark)
    guessed = lang_id_df(test.select("doc_id", "text"),
                         lang_profiles_df(train))
    truth = {r.doc_id: r.lang for r in test.collect()}
    hits = [(r.doc_id, r.lang_guess) for r in guessed.collect()]
    n_ok = sum(truth[d] == g for d, g in hits)
    rows.append((
        "text_langid on planted multilingual held-out set",
        f"{n_ok}/{len(hits)}", n_ok / len(hits),
        f"char-trigram profiles (top-{LANGID_TOP} by doc frequency, "
        "Cavnar–Trenkle shape), broadcast join scoring; en/de/fr/es "
        "sentences, profiles from a disjoint train half"))

    # -- curation-stack selectivity (exact rules, per-rule drop counts) ----
    from pyspark.sql import functions as F
    v = dedup.curation_verdict(spark, sf_dir)
    sel = v.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("keep").cast("long")).alias("keep"),
        F.sum((~F.col("pass_gopher")).cast("long")).alias("fail_gopher"),
        F.sum(F.col("is_exact_dup").cast("long")).alias("exact_dup"),
        F.sum(F.col("is_near_dup").cast("long")).alias("near_dup"),
        F.sum(F.col("high_span_dup").cast("long")).alias("high_span"),
        F.sum(F.col("is_contaminated").cast("long")).alias("contaminated"),
    ).first().asDict()

    # -- removal/mixing tier selectivity (exact ops, context) --------------
    from nmalign_spark.operators import textstats
    ld = dedup.line_dedup(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_lines").alias("lines"),
        F.sum("n_kept").alias("kept"),
        F.sum((F.col("n_kept") < F.col("n_lines")).cast("long"))
        .alias("touched")).first().asDict()
    sr = dedup.span_removal(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_tokens").alias("toks"),
        F.sum("n_removed").alias("removed"),
        F.sum((F.col("n_removed") > 0).cast("long"))
        .alias("touched")).first().asDict()
    dcp = textstats.domain_cap(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("kept").cast("long")).alias("kept"),
        F.countDistinct("host").alias("hosts")).first().asDict()
    tm = textstats.temperature_mix(spark, sf_dir).agg(
        F.sum("n_docs").alias("n"),
        F.sum("n_kept").alias("kept")).first().asDict()
    n_split = dedup.training_split(spark, sf_dir).count()
    n_natural = dedup.t(spark, sf_dir, "documents").count()

    spark.stop()

    md = ["# QUALITY — measured recall of the sub-quadratic paths",
          "",
          f"Input: `{sf_dir}`.  Every approximate operator is compared to "
          "its exact oracle twin; every reported hit carries the true "
          "score (re-ranking/verification is exact in all paths, so "
          "precision is 1.0 by construction and recall is the only "
          "trade-off).  Reproduce: `python scripts/quality_report.py`.",
          "",
          "| approximate vs exact | hits | recall | notes |",
          "|---|---|---|---|"]
    for name, hits, rec, note in rows:
        md.append(f"| {name} | {hits} | {rec:.3f} | {note} |")
    md += ["",
           "Reading: the near-dup paths (the 100 TB dedup workhorses) keep "
           "recall at or near the banding-arithmetic prediction while never "
           "materializing a quadratic join; the ANN top-k variants trade "
           "recall for pruning exactly as their index parameters predict, "
           "and the Lloyd refinement's effect on recall is measured, not "
           "assumed. All thresholds/knobs are module constants cited in "
           "the table.",
           "",
           "## Curation-stack selectivity (exact rules, context)",
           "",
           f"`curation_verdict` on the `{sf_dir}` augmented corpus "
           f"({sel['n']} docs incl. planted twins): **{sel['keep']} keep / "
           f"{sel['n'] - sel['keep']} drop**.  Per-rule flags (overlapping): "
           f"{sel['fail_gopher']} fail the full Gopher gate, "
           f"{sel['exact_dup']} exact-dup demotions (every planted +200000 "
           "twin, never its canonical), "
           f"{sel['near_dup']} near-dup component members (superset of "
           "exact dups — transitive closure over exact+near edges), "
           f"{sel['high_span']} duplicated-span drops "
           "(`span_dup_frac >= 0.8` outside dup groups), "
           f"{sel['contaminated']} benchmark-contaminated (share an 8-gram "
           "with the stand-in benchmark set).  These are exact rules "
           "(hash-gated vs DuckDB), so the numbers characterize the "
           "synthetic corpus + thresholds, not an approximation.",
           "",
           "## Removal/mixing tier selectivity (exact ops, context)",
           "",
           f"- `dedup_lines` ({ld['n']} docs incl. planted banners/footers): "
           f"{ld['kept']}/{ld['lines']} lines survive; {ld['touched']} docs "
           "had boilerplate removed (every doc whose planted corpus-wide "
           "line crossed LINE_DF_MAX; untouched docs rebuild md5-identical).",
           f"- `dedup_span_removal` ({sr['n']} docs): "
           f"{sr['removed']}/{sr['toks']} tokens removed "
           f"({sr['removed'] / max(sr['toks'], 1):.1%}) across "
           f"{sr['touched']} docs — the planted slogan plus the synthetic "
           "generator's own reused phrasing (ExactSubstr counts "
           "occurrences, so template reuse inside the natural corpus is "
           "removed too, exactly as on a real crawl).",
           f"- `mix_domain_cap` ({dcp['n']} docs over {dcp['hosts']} "
           f"hosts): {dcp['kept']} kept — the hot host h0 capped at "
           f"{textstats.DOMAIN_CAP_K}, the long under-cap tail untouched.",
           f"- `mix_temperature`: {tm['kept']}/{tm['n']} docs kept at "
           "alpha=0.5 (smallest language keeps 100%, larger ones "
           "downsampled by sqrt(n_min/n)).",
           f"- `training_split` (the composed endpoint): "
           f"{n_split}/{n_natural} natural docs survive "
           "verdict → domain cap → temperature with each stage "
           "parameterized on its own input (hash-gated end to end)."]
    (REPO / "QUALITY.md").write_text("\n".join(md) + "\n")
    print("\n".join(md))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")

"""Golden regression pin: the complete sf0.001 alignment output is frozen
by hash.  The whole pipeline is deterministic (seeded page synthesis,
pure-function kernels, row-major tie-breaks — SURVEY.md §4.3 determinism
traps), so ANY behavior change — kernel scores, assignment order, span
arithmetic, extraction, schema — flips this hash.

If this test fails after an INTENTIONAL semantic change, regenerate the
hash with the reproduction script below and update GOLDEN_* alongside an
explanation of what changed; if you did not intend a semantic change, you
broke byte-identical parity."""

import hashlib

from nmalign_spark.functions.normalize import DEFAULT_NORMALIZATION
from nmalign_spark.operators.align import align_pages
from nmalign_spark.sources.pages import pages_from_documents

GOLDEN_ROWS = 5154
GOLDEN_SHA = "89db58f91c99306ebb3b901e59a7a25104fbb6d49b9dba76e32de983d3f9c445"


def _canonical_csv(pdf) -> str:
    pdf = pdf.sort_values(["url", "i"]).reset_index(drop=True)
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
    return pdf.to_csv(index=False, float_format="%.6f")


def test_alignment_output_pinned(spark, sf_small):
    pdf = align_pages(pages_from_documents(spark, sf_small),
                      normalization=DEFAULT_NORMALIZATION,
                      try_subseg=True).toPandas()
    assert len(pdf) == GOLDEN_ROWS
    body = _canonical_csv(pdf)
    assert hashlib.sha256(body.encode()).hexdigest() == GOLDEN_SHA


# --- sf0.01 noisy pin: the driver's rows-only u1_align_noisy query --------

GOLDEN_MID_ROWS = 5067
GOLDEN_MID_SHA = ("9cb1b82b3b79d9832d0f0342fa4007594d71f4457657d70b2"
                  "eef92216a88cde8")


def test_noisy_alignment_sf001_pinned(spark, sf_mid):
    """Larger noisy pin (sf0.01, 10x the corpus, no subseg — exactly the
    driver's rows-only ``u1_align_noisy`` query): the SQL-provable
    constructions gate the kernel only on dyadic-rational similarities;
    this pin catches float-path drift they cannot.  Hash verified
    identical at local[8] and local[32]."""
    import __spark_entry__ as entry

    pdf = entry._q_align_noisy(spark, sf_mid).toPandas()
    assert len(pdf) == GOLDEN_MID_ROWS
    body = _canonical_csv(pdf)
    assert hashlib.sha256(body.encode()).hexdigest() == GOLDEN_MID_SHA

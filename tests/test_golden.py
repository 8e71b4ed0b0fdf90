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


# --- sf0.01 salted-giant pin: guards the chunker/assembler seam -----------

GOLDEN_GIANT_ROWS = 1324
GOLDEN_GIANT_SHA = ("e957f224a77b2bb375db40968c0f6ec3930c51d49d4e3f597"
                    "f56bf772b3b6e8f")


def test_salted_giant_sf001_pinned(spark, sf_mid):
    """One 43k-char giant page (the first 150 sf0.01 documents
    concatenated, synthesized via the standard deterministic
    sources/pages.synth_page) routed through the SALTED path
    (align_pages_salted, giant_chars=20000, chunk_rows=64 -> the matrix is
    stitched from many chunk tasks).  The salted path is bit-identical to
    the plain path by unit test (tests/test_salt.py); this pin freezes the
    chunker/assembler seam's actual output so silent drift in chunk
    boundaries, re-merge order, or span arithmetic flips a committed
    hash."""
    import pandas as pd

    from nmalign_spark.operators.salt import align_pages_salted
    from nmalign_spark.sources.pages import PAGES_SCHEMA, synth_page

    docs = pd.read_parquet(f"{sf_mid}/documents.parquet").sort_values("doc_id")
    giant_text = "\n".join(docs["text"].head(150))
    assert len(giant_text) > 20000  # must actually route giant
    row = synth_page(999999, giant_text, "en")
    pages = spark.createDataFrame(
        pd.DataFrame([row], columns=["url", "warc_ts", "html", "text", "lang"]),
        schema=PAGES_SCHEMA)
    pdf = align_pages_salted(pages, normalization=DEFAULT_NORMALIZATION,
                             try_subseg=True, giant_chars=20000,
                             chunk_rows=64).toPandas()
    assert len(pdf) == GOLDEN_GIANT_ROWS
    body = _canonical_csv(pdf)
    assert hashlib.sha256(body.encode()).hexdigest() == GOLDEN_GIANT_SHA

"""SQL-provable constructions that put the REAL alignment kernel — and its
downstream metrics/assembly operators — behind the DuckDB value-hash gate.

The greedy assignment loop (kernel/assign.py, reference align.py:79-166) is
not SQL-expressible in general, so the driver could previously only
rows-check the alignment-family queries.  This module closes that gap the
same way ``u1_align_identity`` did, but with *non-identity* inputs: pages
whose correct alignment is mathematically forced, derived deterministically
from the driver's ``documents`` parquet with pure Catalyst expressions that
a DuckDB oracle reproduces exactly.

Construction (per document, ``m = 5 + doc_id % 6`` lines, ``L = 32``):

* reference line ``j`` = one character ``chr(97 + (doc_id + j) % 26)``
  repeated L times — all lines of one page have pairwise-disjoint alphabets
  and equal length, so their mutual normalized-Levenshtein similarity is
  EXACTLY 0 (every cell of a zero-overlap equal-length pair costs one
  substitution: d = L, sim = 1 - L/L = 0);
* candidate segment ``i`` corresponds to line ``j = m - 1 - i - dropped``
  (a full REVERSAL — maximally anti-monotonic, adversarial for the
  monotonicity bonus) with its first ``e = i % 5`` characters overwritten
  by ``'9'`` (a char outside every line alphabet): d = e, so
  ``sim = 1 - e/32`` — exact in binary floating point (e/32 is a dyadic
  rational), hence bit-stable through the kernel's float32 cast;
* pages where ``doc_id % 3 == 0`` DROP the segment for line ``m - 1``,
  making that line provably unmatched (feeds the A5 oracle) and coverage2
  provably ``(m-1)/m``.

Why the greedy result is forced: every wrong cell's priority is at most
``(0 + 0.5) * L`` (the sigmoid bonus is bounded by 0.5, align.py:97-98)
while every true pair scores at least ``0.875 * L``; the argmax therefore
only ever picks true pairs, and the final matching is the full permutation
regardless of pick order.  Subsegmentation never fires (no spaces in l2,
align.py:116-128 requires ``' ' in seg2``).

Everything downstream — page/corpus metrics (K3), page assembly (A4),
unmatched-line detection (A5) — is then plain SQL over the forced
alignment.  The queries still run the real operators end to end: HTML
boilerplate strip, segment/line extraction, the batched similarity matrix,
the sequential greedy loop, (for ``u1_align_salted``) the matrix-chunk
skew-salting machinery, and the Catalyst aggregations.

Reference semantics exercised: align.py:60-166 (scoring + greedy loop),
ocrd/cli.py:219-226 (empty-line filter), ocrd/cli.py:235-236 (unmatched),
cli.py:123-126 / ocrd/cli.py:269-276 (metrics), ocrd/cli.py:381-385
(assembly roll-up).
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = [
    "oracle_pages", "oracle_segments", "oracle_dom_pages", "QUERIES",
    "ORACLES",
]

_URL = "'https://oracle.example/'"
_L = 32


def _base(spark, sf_dir: str):
    """documents -> (url, warc_ts, lang, doc_id, m, dropped, lines, segs).

    ``lines[j]`` / ``segs[i]`` are the arrays described in the module
    docstring; every expression is Catalyst-native (whole-stage codegen,
    no Python), so the construction itself adds no UDF cost and the scan
    prunes to (doc_id, lang).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "lang")
    return docs.selectExpr(
        f"concat({_URL}, cast(doc_id as string)) as url",
        "timestamp'2025-03-01 00:00:00' as warc_ts",
        "lang", "doc_id",
        "5 + cast(doc_id % 6 as int) as m",
        "cast(doc_id % 3 = 0 as int) as dropped",
    ).selectExpr(
        "url", "warc_ts", "lang", "doc_id", "m", "dropped",
        f"transform(sequence(0, m - 1), "
        f"  j -> repeat(char(97 + (doc_id + j) % 26), {_L})) as lines",
        f"transform(sequence(0, m - 1 - dropped), "
        f"  i -> concat(repeat('9', i % 5), "
        f"              repeat(char(97 + (doc_id + m - 1 - i - dropped) % 26), "
        f"                     {_L} - i % 5))) as segs",
    )


_BOILER = ("<html><head><title>o</title>"
           "<script>var t = 1;</script></head><body>"
           "<nav><a href=\"/\">home</a> <a href=\"/a\">about</a></nav>")
_FOOTER = "<footer>&copy; oracle</footer></body></html>"


def oracle_pages(spark, sf_dir: str):
    """The construction as a pages table (url, warc_ts, html, text, lang):
    segments wrapped one-per-``<p>`` inside head/nav/footer boilerplate
    (which ``extract_segments`` must strip), lines joined with newlines."""
    return _base(spark, sf_dir).selectExpr(
        "url", "warc_ts",
        "encode(concat("
        f"  '{_BOILER}', "
        "  array_join(transform(segs, s -> concat('<p>', s, '</p>')), ''), "
        f"  '{_FOOTER}'), 'utf-8') as html",
        "array_join(lines, '\\n') as text",
        "lang",
    )


def oracle_segments(spark, sf_dir: str):
    """The construction in the long segments shape (url, side, seq_no,
    seg_text) — feeds ``align_segments``' shuffle + streaming kernel."""
    base = _base(spark, sf_dir)
    cands = base.select(
        "url", F.lit(1).alias("side"),
        F.posexplode("segs").alias("seq_no", "seg_text"))
    refs = base.select(
        "url", F.lit(2).alias("side"),
        F.posexplode("lines").alias("seq_no", "seg_text"))
    return cands.unionByName(refs)


# --- DuckDB oracles ---------------------------------------------------------
# Shared CTE: d = per-document parameters; pairs = the forced assignment.

_D_CTE = f"""
d AS (
  SELECT doc_id, 5 + CAST(doc_id % 6 AS INT) AS m,
         CAST(doc_id % 3 = 0 AS INT) AS dropped
  FROM documents
),
pairs AS (
  SELECT doc_id, m, dropped, CAST(i AS INT) AS i,
         CAST(m - 1 - i - dropped AS INT) AS j
  FROM d, UNNEST(range(0, m - dropped)) AS r(i)
),
aligned AS (
  SELECT {_URL} || CAST(doc_id AS VARCHAR) AS url,
         i, j, j AS line_no, -1 AS beg, -1 AS "end",
         1.0 - (i % 5) / {_L}.0 AS score,
         repeat('9', i % 5) ||
           repeat(chr(97 + CAST((doc_id + j) % 26 AS INT)), {_L} - (i % 5))
           AS seg_text,
         repeat(chr(97 + CAST((doc_id + j) % 26 AS INT)), {_L}) AS extracted,
         doc_id, m, dropped
  FROM pairs
)
"""

_ORACLE_ALIGN = f"""
WITH {_D_CTE}
SELECT url, i, j, line_no, beg, "end", score, seg_text, extracted
FROM aligned
"""

_ORACLE_PAGE_METRICS = f"""
WITH {_D_CTE}
SELECT url,
       AVG(score)  AS avg_score,
       COUNT(*)    AS n_matched,
       COUNT(*)    AS n_segments,
       COUNT(*)    AS n_lines_matched,
       1.0         AS coverage1,
       CAST(MAX(m) AS INT) AS n_lines,
       COUNT(*) / CAST(MAX(m) AS DOUBLE) AS coverage2
FROM aligned
GROUP BY url
"""

_ORACLE_CORPUS_METRICS = f"""
WITH {_D_CTE},
per AS (
  SELECT url, AVG(score) AS avg_score, COUNT(*) AS n
  FROM aligned GROUP BY url
)
SELECT COUNT(*) AS n_pages,
       AVG(avg_score) AS mean_page_score,
       1.0 AS mean_coverage1,
       -- DuckDB SUM(BIGINT) yields HUGEINT (float64 via pandas); cast back
       CAST(SUM(n) AS BIGINT) AS total_matched,
       CAST(SUM(n) AS BIGINT) AS total_segments
FROM per
"""

_ORACLE_ASSEMBLE = f"""
WITH {_D_CTE}
SELECT url,
       string_agg(extracted, chr(10) ORDER BY i) AS page_text,
       COUNT(*) AS n_lines,
       AVG(score) AS avg_conf
FROM aligned
GROUP BY url
"""

_ORACLE_UNMATCHED = f"""
WITH d AS (
  SELECT doc_id, 5 + CAST(doc_id % 6 AS INT) AS m,
         CAST(doc_id % 3 = 0 AS INT) AS dropped
  FROM documents
)
SELECT {_URL} || CAST(doc_id AS VARCHAR) AS url,
       m - 1 AS line_no, {_L} AS line_len
FROM d WHERE dropped = 1
"""


# --- queries ----------------------------------------------------------------

def u1_align_pages(spark, sf_dir: str):
    """Full narrow hot path on the forced construction: HTML boilerplate
    strip -> batched similarity matrix -> greedy loop, zero shuffles."""
    from .align import align_pages
    return align_pages(oracle_pages(spark, sf_dir))


def u1_align_segments(spark, sf_dir: str):
    """Long-form path: url-hash shuffle + streaming many-groups-per-batch
    kernel, same forced output."""
    from .align import align_segments
    return align_segments(oracle_segments(spark, sf_dir))


def u1_align_salted(spark, sf_dir: str):
    """Matrix-chunk skew-salted path (operators/salt.py): every page routed
    giant (threshold below the construction's text size), similarity rows
    scored 4 segments per chunk across tasks, matrix reassembled, the
    sequential loop run once — bit-identical to the narrow path and now
    hash-checked against the same SQL oracle."""
    from .salt import align_pages_salted
    return align_pages_salted(oracle_pages(spark, sf_dir),
                              giant_chars=100, chunk_rows=4)


def k3_page_metrics(spark, sf_dir: str):
    from .align import align_pages
    from .metrics import page_metrics
    pages = oracle_pages(spark, sf_dir)
    return page_metrics(align_pages(pages), pages)


def k3_corpus_metrics(spark, sf_dir: str):
    from .metrics import corpus_metrics
    return corpus_metrics(k3_page_metrics(spark, sf_dir))


def a4_assemble_pages(spark, sf_dir: str):
    from .align import align_pages
    from .assemble import assemble_pages
    return assemble_pages(align_pages(oracle_pages(spark, sf_dir)))


def a5_unmatched_lines(spark, sf_dir: str):
    """A5 (ocrd/cli.py:235-236): reference lines never assigned — the
    dropped-segment lines of the construction, provably exactly one per
    ``doc_id % 3 == 0`` page."""
    from .align import align_pages
    pages = oracle_pages(spark, sf_dir)
    aligned = align_pages(pages)
    lines = pages.select(
        "url", F.posexplode(F.split("text", "\n")).alias("line_no", "line")) \
        .where(F.trim("line") != "")
    matched = aligned.where(F.col("j") >= 0).select("url", "line_no").distinct()
    return lines.join(matched, ["url", "line_no"], "left_anti") \
                .select("url", "line_no", F.length("line").alias("line_len"))


# --- dom_main_content: link-density classification oracle -------------------
#
# Blocks with known text/anchor composition so the survivor set and each
# survivor's link density are closed-form:
#   nav   : 100% anchor text             -> dropped (density 1.0 > 0.4)
#   prose : k = 0..doc_id%3, no anchors  -> kept, density 0.0
#   mixed : 12 anchor chars of 30 total  -> kept, density 12/30 = 0.4 (edge:
#           kept because the threshold is inclusive)
#   short : 4 chars                      -> dropped (< min_chars = 8)

def oracle_dom_pages(spark, sf_dir: str):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    return docs.selectExpr(
        f"concat({_URL}, cast(doc_id as string)) as url",
        "doc_id",
        "cast(doc_id % 3 as int) as kmax",
    ).selectExpr(
        "url",
        "encode(concat("
        "  '<html><body>', "
        "  '<p><a href=\"/\">home page link</a></p>', "
        "  array_join(transform(sequence(0, kmax), "
        "    k -> concat('<p>', repeat(char(97 + (doc_id + k) % 26), 12 + k), "
        "                '</p>')), ''), "
        "  '<p><a href=\"/x\">', repeat('z', 12), '</a> ', repeat('y', 17), "
        "  '</p>', "
        "  '<p>tiny</p>', "
        "  '</body></html>'), 'utf-8') as html",
    )


def dom_main_content(spark, sf_dir: str):
    from ..sources.segments import main_content_df
    return main_content_df(oracle_dom_pages(spark, sf_dir))


_ORACLE_DOM = f"""
WITH d AS (
  SELECT doc_id, CAST(doc_id % 3 AS INT) AS kmax FROM documents
),
prose AS (
  SELECT doc_id, CAST(k AS INT) AS seq_no,
         repeat(chr(97 + CAST((doc_id + k) % 26 AS INT)),
                CAST(12 + k AS INT)) AS seg_text,
         0.0 AS link_density
  FROM d, UNNEST(range(0, kmax + 1)) AS r(k)
),
mixed AS (
  SELECT doc_id, kmax + 1 AS seq_no,
         repeat('z', 12) || ' ' || repeat('y', 17) AS seg_text,
         ROUND(12.0 / 30.0, 6) AS link_density
  FROM d
)
SELECT {_URL} || CAST(doc_id AS VARCHAR) AS url, seq_no, seg_text,
       link_density
FROM (SELECT * FROM prose UNION ALL SELECT * FROM mixed) u
"""


QUERIES = {
    "u1_align_pages": u1_align_pages,
    "u1_align_segments": u1_align_segments,
    "u1_align_salted": u1_align_salted,
    "k3_page_metrics": k3_page_metrics,
    "k3_corpus_metrics": k3_corpus_metrics,
    "a4_assemble_pages": a4_assemble_pages,
    "a5_unmatched_lines": a5_unmatched_lines,
    "dom_main_content": dom_main_content,
}

ORACLES = {
    "u1_align_pages": _ORACLE_ALIGN,
    "u1_align_segments": _ORACLE_ALIGN,
    "u1_align_salted": _ORACLE_ALIGN,
    "k3_page_metrics": _ORACLE_PAGE_METRICS,
    "k3_corpus_metrics": _ORACLE_CORPUS_METRICS,
    "a4_assemble_pages": _ORACLE_ASSEMBLE,
    "a5_unmatched_lines": _ORACLE_UNMATCHED,
    "dom_main_content": _ORACLE_DOM,
}

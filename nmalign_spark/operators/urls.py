"""URL canonicalization + URL-level dedup for crawl pipelines (task
mandate: operations a large-scale training-data pipeline needs, beyond the
reference's own set).

A Common-Crawl-style table carries one row per fetched URL; the same
logical page arrives under many spellings (scheme/host case, ``www.``,
default ports, tracking params, fragments, trailing slashes).  URL
canonicalization collapses them BEFORE content dedup — it is the cheapest
dedup tier (pure string ops, no content reads) and the standard first
stage of crawl curation.

All Catalyst built-ins (whole-stage codegen, no UDFs); the regex chain
avoids backreferences and lookaround so Java regex (Spark) and RE2
(DuckDB) agree character-for-character.  Scale shape: a narrow map over
the scan + one groupBy on the canonical key — the same plan as
``dedup_exact``, keyed by a much shorter string.

Since the synthetic ``documents`` table has no URL column, deterministic
MESSY VARIANTS are synthesized per document (identically in the oracle):
the canonicalizer must collapse each document's variants to one key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .relational import t

__all__ = ["messy_urls", "canonicalize", "url_dedup_groups",
           "QUERIES", "ORACLES"]

_SCHEME_HOST_RE = "^[a-zA-Z]+://[^/?#]*"


def messy_urls(spark, sf_dir):
    """(doc_id, url): 3-6 deterministic spellings of each document's URL.

    Variants: plain https; upper-cased scheme+host with ``www.`` and a
    trailing slash; default port ``:443`` in the AUTHORITY (where real
    URLs carry it) plus ``utm_`` tracking params; for every 3rd doc a
    fragment; and for every 4th+1 doc the same surviving query param in
    both orders around a ``utm_`` param (exercises the dangling-``&``
    repair).  The path keeps its case — real canonicalization lowercases
    only scheme+host."""
    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    path = F.concat(F.col("lang"), F.lit("/doc"), F.col("doc_id"))
    base = F.concat(F.lit("example.org/"), path)
    upper_base = F.concat(F.lit("EXAMPLE.ORG/"), F.col("lang"),
                          F.lit("/doc"), F.col("doc_id"))
    variants = F.array(
        F.concat(F.lit("https://"), base),
        F.concat(F.lit("HTTPS://WWW."), upper_base, F.lit("/")),
        F.concat(F.lit("https://example.org:443/"), path,
                 F.lit("?utm_source=feed&utm_medium=rss")),
    )
    with_frag = F.concat(F.lit("https://"), base, F.lit("#section-2"))
    variants = F.when(F.col("doc_id") % 3 == 0,
                      F.array_append(variants, with_frag)).otherwise(variants)
    param_pair = F.array(
        F.concat(F.lit("https://"), base, F.lit("?ref=a&utm_x=1")),
        F.concat(F.lit("https://"), base, F.lit("?utm_x=1&ref=a")),
    )
    variants = F.when(F.col("doc_id") % 4 == 1,
                      F.concat(variants, param_pair)).otherwise(variants)
    return d.select("doc_id", F.explode(variants).alias("url"))


def canonicalize(url):
    """Canonical URL expression: drop fragment, strip ``utm_*`` params
    (repairing the leading ``&`` a stripped ``?utm_...`` leaves behind,
    so param order does not change the key; then any dangling
    ``?``/``&``), lowercase scheme+host only, drop ``www.``, default
    ports (anchored to the authority — a ``:443`` inside a path is NOT a
    port) and the trailing slash.  Known heuristic limit: a literal ``&``
    in a query-less path would be rewritten to ``?``."""
    u = F.regexp_replace(url, "#.*$", "")
    u = F.regexp_replace(u, "[?&]utm_[^&#]*", "")
    u = F.regexp_replace(u, "^([^?]*)&", "$1?")
    u = F.regexp_replace(u, "[?&]$", "")
    scheme_host = F.lower(F.regexp_extract(u, _SCHEME_HOST_RE, 0))
    rest = F.regexp_replace(u, _SCHEME_HOST_RE, "")
    u = F.concat(scheme_host, rest)
    u = F.replace(u, F.lit("://www."), F.lit("://"))
    u = F.regexp_replace(u, "^([a-z]+://[^/:?#]*):(443|80)([/?#]|$)", "$1$3")
    u = F.regexp_replace(u, "/$", "")
    return u


def url_dedup_groups(spark, sf_dir):
    """(canonical_url, n_variants): every document's messy spellings must
    collapse to ONE canonical key (n_variants = 3, +1 with the fragment
    variant), plus a separate 2-variant key for the docs carrying the
    order-swapped surviving param (both orders -> the same ``?ref=a``
    key)."""
    m = messy_urls(spark, sf_dir)
    return (m.select(canonicalize(F.col("url")).alias("canonical_url"))
            .groupBy("canonical_url")
            .agg(F.count(F.lit(1)).alias("n_variants")))


ORACLE_URL_DEDUP = """
WITH base AS (
  SELECT doc_id, lang,
         'example.org/' || lang || '/doc' || CAST(doc_id AS VARCHAR) AS b,
         'EXAMPLE.ORG/' || lang || '/doc' || CAST(doc_id AS VARCHAR) AS ub
  FROM documents),
messy AS (
  SELECT doc_id, 'https://' || b AS url FROM base
  UNION ALL
  SELECT doc_id, 'HTTPS://WWW.' || ub || '/' FROM base
  UNION ALL
  SELECT doc_id, 'https://example.org:443/' || lang || '/doc' ||
         CAST(doc_id AS VARCHAR) || '?utm_source=feed&utm_medium=rss' FROM base
  UNION ALL
  SELECT doc_id, 'https://' || b || '#section-2' FROM base WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id, 'https://' || b || '?ref=a&utm_x=1' FROM base WHERE doc_id % 4 = 1
  UNION ALL
  SELECT doc_id, 'https://' || b || '?utm_x=1&ref=a' FROM base WHERE doc_id % 4 = 1),
canon AS (
  SELECT regexp_replace(
           regexp_replace(
             replace(
               lower(regexp_extract(u3, '^[a-zA-Z]+://[^/?#]*', 0)) ||
               regexp_replace(u3, '^[a-zA-Z]+://[^/?#]*', ''),
               '://www.', '://'),
             '^([a-z]+://[^/:?#]*):(443|80)([/?#]|$)', '\\1\\3'),
           '/$', '') AS canonical_url
  FROM (
    SELECT regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(url, '#.*$', ''),
               '[?&]utm_[^&#]*', '', 'g'),
             '^([^?]*)&', '\\1?'),
           '[?&]$', '') AS u3
    FROM messy))
SELECT canonical_url, COUNT(*) AS n_variants
FROM canon GROUP BY canonical_url
"""


QUERIES = {
    "url_dedup_groups": url_dedup_groups,
}

ORACLES = {
    "url_dedup_groups": ORACLE_URL_DEDUP,
}

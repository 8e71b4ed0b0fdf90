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
    """(doc_id, url): 3-4 deterministic spellings of each document's URL.

    Variants: plain https; upper-cased scheme+host with ``www.`` and a
    trailing slash; default port ``:443`` plus a ``utm_`` tracking param;
    and (for every 3rd doc) a fragment.  The path keeps its case — real
    canonicalization lowercases only scheme+host."""
    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    base = F.concat(F.lit("example.org/"), F.col("lang"),
                    F.lit("/doc"), F.col("doc_id"))
    upper_base = F.concat(F.lit("EXAMPLE.ORG/"), F.col("lang"),
                          F.lit("/doc"), F.col("doc_id"))
    variants = F.array(
        F.concat(F.lit("https://"), base),
        F.concat(F.lit("HTTPS://WWW."), upper_base, F.lit("/")),
        F.concat(F.lit("https://"), base,
                 F.lit(":443?utm_source=feed&utm_medium=rss")),
    )
    with_frag = F.concat(F.lit("https://"), base, F.lit("#section-2"))
    variants = F.when(F.col("doc_id") % 3 == 0,
                      F.array_append(variants, with_frag)).otherwise(variants)
    return d.select("doc_id", F.explode(variants).alias("url"))


def canonicalize(url):
    """Canonical URL expression: drop fragment, strip ``utm_*`` params
    (and a dangling ``?``/``&``), lowercase scheme+host only, drop
    ``www.``, default ports and the trailing slash."""
    u = F.regexp_replace(url, "#.*$", "")
    u = F.regexp_replace(u, "[?&]utm_[^&#]*", "")
    u = F.regexp_replace(u, "[?&]$", "")
    scheme_host = F.lower(F.regexp_extract(u, _SCHEME_HOST_RE, 0))
    rest = F.regexp_replace(u, _SCHEME_HOST_RE, "")
    u = F.concat(scheme_host, rest)
    u = F.replace(u, F.lit("://www."), F.lit("://"))
    u = F.regexp_replace(u, ":(443|80)/", "/")
    u = F.regexp_replace(u, ":(443|80)$", "")
    u = F.regexp_replace(u, "/$", "")
    return u


def url_dedup_groups(spark, sf_dir):
    """(canonical_url, n_variants): every document's messy spellings must
    collapse to ONE canonical key (n_variants = 3, or 4 for docs with the
    fragment variant)."""
    m = messy_urls(spark, sf_dir)
    return (m.select(canonicalize(F.col("url")).alias("canonical_url"))
            .groupBy("canonical_url")
            .agg(F.count(F.lit(1)).alias("n_variants")))


ORACLE_URL_DEDUP = """
WITH base AS (
  SELECT doc_id, 'example.org/' || lang || '/doc' || CAST(doc_id AS VARCHAR) AS b,
         'EXAMPLE.ORG/' || lang || '/doc' || CAST(doc_id AS VARCHAR) AS ub
  FROM documents),
messy AS (
  SELECT doc_id, 'https://' || b AS url FROM base
  UNION ALL
  SELECT doc_id, 'HTTPS://WWW.' || ub || '/' FROM base
  UNION ALL
  SELECT doc_id, 'https://' || b || ':443?utm_source=feed&utm_medium=rss' FROM base
  UNION ALL
  SELECT doc_id, 'https://' || b || '#section-2' FROM base WHERE doc_id % 3 = 0),
canon AS (
  SELECT regexp_replace(
           regexp_replace(
             regexp_replace(
               replace(
                 lower(regexp_extract(u3, '^[a-zA-Z]+://[^/?#]*', 0)) ||
                 regexp_replace(u3, '^[a-zA-Z]+://[^/?#]*', ''),
                 '://www.', '://'),
               ':(443|80)/', '/'),
             ':(443|80)$', ''),
           '/$', '') AS canonical_url
  FROM (
    SELECT regexp_replace(
             regexp_replace(
               regexp_replace(url, '#.*$', ''),
             '[?&]utm_[^&#]*', '', 'g'),
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

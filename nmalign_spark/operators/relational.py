"""Catalyst-native relational operators from SURVEY.md §2, each paired with
an ANSI-SQL oracle string (DuckDB-runnable) for the driver's correctness
gate.

Every function takes ``(spark, sf_dir)`` and returns a DataFrame; the module
level ``ORACLES`` dict holds the equivalent SQL over the pre-registered
views (region nation customer supplier part orders lineitem events documents
embeddings).  Column names are aliased identically on both sides — the
driver's compare hashes values after sorting columns by name.

Operator IDs reference the SURVEY.md §2 inventory with reference citations.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["QUERIES", "ORACLES", "t"]


def t(spark, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- J1: page-ID equi-join (ocrd/cli.py:55-108 zip_input_files) ------------

def j1_page_pairing(spark, sf_dir):
    """Pair 'fileGrp 1' with 'fileGrp 2' per pageId — here customer/orders on
    custkey; small side broadcastable by Catalyst."""
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    return (cust.join(orders, cust.c_custkey == orders.o_custkey, "inner")
            .select(F.col("c_custkey").alias("page_key"),
                    F.col("c_name").alias("grp1_file"),
                    F.col("o_orderkey").alias("grp2_file"),
                    F.round("o_totalprice", 2).alias("payload")))


ORACLE_J1 = """
SELECT c_custkey AS page_key, c_name AS grp1_file,
       o_orderkey AS grp2_file, ROUND(o_totalprice, 2) AS payload
FROM customer JOIN orders ON o_custkey = c_custkey
"""


# --- J2: missing-partner anti-join (ocrd/cli.py:101-107) -------------------

def j2_missing_partner(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
            .select(F.col("c_custkey").alias("missing_key")))


ORACLE_J2 = """
SELECT c_custkey AS missing_key FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --- R9: duplicate-input detection (ocrd/cli.py:63-67,82-87) ---------------

def r9_duplicate_check(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    return (orders.groupBy(F.col("o_custkey").alias("page_key"))
            .agg(F.count(F.lit(1)).alias("n_files"))
            .where(F.col("n_files") > 1))


ORACLE_R9 = """
SELECT o_custkey AS page_key, COUNT(*) AS n_files
FROM orders GROUP BY o_custkey HAVING COUNT(*) > 1
"""


# --- P4 + F8: tokenization/explode + empty filter (ocrd/cli.py:219-226) ----

def p4_token_filter(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    return (tok.where(F.trim("tok") != "")
            .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens")))


ORACLE_P4 = """
SELECT doc_id, COUNT(*) AS n_tokens
FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
WHERE TRIM(tok) != '' GROUP BY doc_id
"""


# --- F4: normalized Levenshtein similarity via built-ins (align.py:5,60) ---

def f4_lev_similarity(spark, sf_dir):
    """SQL-checkable probe of the similarity semantics: both Spark and DuckDB
    ship classic uniform-cost levenshtein built-ins (SURVEY.md §2.7 F4).
    Pairs adjacent documents; strings capped for O(n*m) cost control."""
    d = t(spark, sf_dir, "documents")
    a = d.select(F.col("doc_id").alias("id1"),
                 F.substring("text", 1, 60).alias("t1"))
    b = d.select((F.col("doc_id") - 1).alias("id1"),
                 F.substring("text", 1, 60).alias("t2"))
    j = a.join(b, "id1", "inner")
    sim = 1.0 - F.levenshtein("t1", "t2") / F.greatest(F.length("t1"), F.length("t2"))
    return j.select("id1", F.round(sim, 6).alias("sim"))


ORACLE_F4 = """
SELECT a.doc_id AS id1,
       ROUND(1.0 - levenshtein(substr(a.text,1,60), substr(b.text,1,60))
             / GREATEST(LENGTH(substr(a.text,1,60)), LENGTH(substr(b.text,1,60))), 6) AS sim
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
"""


# --- A1/A2-style aggregate over scores (cli.py:123-126) --------------------

def a1_avg_similarity(spark, sf_dir):
    sims = f4_lev_similarity(spark, sf_dir)
    d = t(spark, sf_dir, "documents").select(F.col("doc_id").alias("id1"), "lang")
    return (sims.join(d, "id1")
            .groupBy("lang")
            .agg(F.round(F.avg("sim"), 6).alias("avg_sim"),
                 F.count(F.lit(1)).alias("n_pairs")))


ORACLE_A1 = f"""
WITH sims AS ({ORACLE_F4})
SELECT lang, ROUND(AVG(sim), 6) AS avg_sim, COUNT(*) AS n_pairs
FROM sims JOIN documents ON documents.doc_id = sims.id1
GROUP BY lang
"""


# --- A2: coverage = distinct-matched / total (cli.py:96-126) ----------------

def a2_coverage(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.count_distinct("user_id").alias("n_users"),
                 F.count(F.lit(1)).alias("n_events"))
            .withColumn("events_per_user",
                        F.round(F.col("n_events") / F.col("n_users"), 6)))


ORACLE_A2 = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events,
       ROUND(COUNT(*) * 1.0 / COUNT(DISTINCT user_id), 6) AS events_per_user
FROM events GROUP BY event_type
"""


# --- A3: corpus rollup (ocrd/cli.py:111-118,274-276) ------------------------

def a3_rollup(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (d.rollup("lang", "source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg("n_chars"), 4).alias("avg_chars"))
            .select(F.coalesce("lang", F.lit("ALL")).alias("lang"),
                    F.coalesce("source", F.lit("ALL")).alias("source"),
                    "n_docs", "avg_chars"))


ORACLE_A3 = """
SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source,
       COUNT(*) AS n_docs, ROUND(AVG(n_chars), 4) AS avg_chars
FROM documents GROUP BY ROLLUP (lang, source)
"""


# --- E2: index-set difference (ocrd/cli.py:235) -----------------------------

def e2_set_difference(spark, sf_dir):
    part = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem")
    return (part.join(li, part.p_partkey == li.l_partkey, "left_anti")
            .select(F.col("p_partkey").alias("unmatched_key")))


ORACLE_E2 = """
SELECT p_partkey AS unmatched_key FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
"""


# --- F7: substring slice, 1-based (cli.py:105-106) --------------------------

def f7_substring_slice(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", F.substring("text", 11, 20).alias("sliced"))


ORACLE_F7 = "SELECT doc_id, substr(text, 11, 20) AS sliced FROM documents"


# --- W1: index renumbering window (ocrd/cli.py:242-243,257-258) -------------

def w1_index_renumber(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    return d.select("doc_id", "source",
                    F.row_number().over(w).alias("idx"))


ORACLE_W1 = """
SELECT doc_id, source,
       ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS idx
FROM documents
"""


# --- W2: neighbour-pair window (ocrd/cli.py:382-385 zip(sub, sub[1:])) ------

def w2_neighbor_pairs(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    return (d.select("doc_id", "source", "n_chars",
                     F.lag("n_chars").over(w).alias("prev_chars"))
            .where(F.col("prev_chars").isNotNull())
            .select("doc_id", "source",
                    (F.col("n_chars") - F.col("prev_chars")).alias("delta_chars")))


ORACLE_W2 = """
SELECT doc_id, source, n_chars - prev_chars AS delta_chars
FROM (SELECT doc_id, source, n_chars,
             LAG(n_chars) OVER (PARTITION BY source ORDER BY doc_id) AS prev_chars
      FROM documents)
WHERE prev_chars IS NOT NULL
"""


# --- O4: ordered collect (plaintext file ordering, ocrd/cli.py:210) ---------

def o4_ordered_collect(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    first_word = F.element_at(F.split("text", " "), 1)
    return (d.select("source", "doc_id", first_word.alias("w"))
            .groupBy("source")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "w"))),
                    lambda s: s.getField("w")),
                ",").alias("ordered_words")))


ORACLE_O4 = """
SELECT source,
       STRING_AGG(string_split(text, ' ')[1], ',' ORDER BY doc_id) AS ordered_words
FROM documents GROUP BY source
"""


# --- S1: inline-strings source (scripts/cli.py:23,33,66-67) -----------------

def s1_inline_source(spark, sf_dir):
    rows = [("inline", 1, 0, "erste Zeile"), ("inline", 1, 1, "zweite Zeile"),
            ("inline", 2, 0, "Erste Zeile!"), ("inline", 2, 1, "Zweyte Zeile")]
    return spark.createDataFrame(
        rows, schema="url string, side int, seq_no int, seg_text string")


ORACLE_S1 = """
SELECT * FROM (VALUES
  ('inline', 1, 0, 'erste Zeile'), ('inline', 1, 1, 'zweite Zeile'),
  ('inline', 2, 0, 'Erste Zeile!'), ('inline', 2, 1, 'Zweyte Zeile'))
AS v(url, side, seq_no, seg_text)
"""


QUERIES = {
    "j1_page_pairing": j1_page_pairing,
    "j2_missing_partner": j2_missing_partner,
    "r9_duplicate_check": r9_duplicate_check,
    "p4_token_filter": p4_token_filter,
    "f4_lev_similarity": f4_lev_similarity,
    "a1_avg_similarity": a1_avg_similarity,
    "a2_coverage": a2_coverage,
    "a3_rollup": a3_rollup,
    "e2_set_difference": e2_set_difference,
    "f7_substring_slice": f7_substring_slice,
    "w1_index_renumber": w1_index_renumber,
    "w2_neighbor_pairs": w2_neighbor_pairs,
    "o4_ordered_collect": o4_ordered_collect,
    "s1_inline_source": s1_inline_source,
}

ORACLES = {
    "j1_page_pairing": ORACLE_J1,
    "j2_missing_partner": ORACLE_J2,
    "r9_duplicate_check": ORACLE_R9,
    "p4_token_filter": ORACLE_P4,
    "f4_lev_similarity": ORACLE_F4,
    "a1_avg_similarity": ORACLE_A1,
    "a2_coverage": ORACLE_A2,
    "a3_rollup": ORACLE_A3,
    "e2_set_difference": ORACLE_E2,
    "f7_substring_slice": ORACLE_F7,
    "w1_index_renumber": ORACLE_W1,
    "w2_neighbor_pairs": ORACLE_W2,
    "o4_ordered_collect": ORACLE_O4,
    "s1_inline_source": ORACLE_S1,
}

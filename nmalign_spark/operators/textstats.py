"""Text-analysis operators for training-data curation (task mandate):
language ID heuristic, quality scoring, token counting, document
fingerprinting — all Catalyst built-ins (whole-stage codegen, no UDFs),
each with a DuckDB oracle.

Regex patterns are kept to the syntax subset with identical semantics in
Java regex (Spark) and RE2 (DuckDB): literal classes, alternation, no
lookaround, no inline flags.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .relational import sliding_ngrams, t

__all__ = ["token_counts", "quality_scores", "lang_id", "fingerprints",
           "QUERIES", "ORACLES"]

# BPE-ish tokenizer: letter runs, digit runs, single punctuation
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

_STOP = {
    "en": ["the", "and", "of", "is", "a"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}


def token_counts(spark, sf_dir):
    """Whitespace tokens + BPE-ish regex tokens per document."""
    d = t(spark, sf_dir, "documents")
    ws = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    bpe = F.size(F.regexp_extract_all("text", F.lit(TOKEN_RE), F.lit(0)))
    return d.select("doc_id", ws.alias("n_ws_tokens"), bpe.alias("n_bpe_tokens"))


ORACLE_TOKENS = f"""
SELECT doc_id,
       len(list_filter(string_split(text, ' '), x -> x != '')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_bpe_tokens
FROM documents
"""


def quality_scores(spark, sf_dir):
    """Length / punctuation / stopword heuriatics -> quality score in [0,1]."""
    d = t(spark, sf_dir, "documents")
    n_chars = F.length("text")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    n_toks = F.size(toks)
    avg_tok = n_chars / F.greatest(n_toks, F.lit(1))
    n_punct = F.size(F.regexp_extract_all("text", F.lit("[^A-Za-z0-9 ]"), F.lit(0)))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop = _STOP["en"]
    n_stop = F.size(F.filter(toks, lambda x: F.lower(x).isin(stop)))
    stop_ratio = n_stop / F.greatest(n_toks, F.lit(1))
    quality = (F.when(n_toks < 5, 0.0)
               .when(avg_tok > 15, 0.2)
               .otherwise(
                   F.least(F.lit(1.0),
                           F.lit(0.5) + stop_ratio * 2 - punct_ratio * 3)))
    return d.select("doc_id",
                    n_chars.alias("n_chars_calc"),
                    n_toks.alias("n_tokens"),
                    F.round(avg_tok, 6).alias("avg_token_len"),
                    F.round(punct_ratio, 6).alias("punct_ratio"),
                    F.round(stop_ratio, 6).alias("stop_ratio"),
                    F.round(quality, 6).alias("quality"))


_STOP_SQL = "('" + "','".join(_STOP["en"]) + "')"

ORACLE_QUALITY = f"""
WITH base AS (
  SELECT doc_id,
         LENGTH(text) AS n_chars_calc,
         len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens,
         len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct,
         len(list_filter(string_split(text, ' '), x -> lower(x) IN {_STOP_SQL})) AS n_stop
  FROM documents)
SELECT doc_id, n_chars_calc, n_tokens,
       ROUND(n_chars_calc * 1.0 / GREATEST(n_tokens, 1), 6) AS avg_token_len,
       ROUND(n_punct * 1.0 / GREATEST(n_chars_calc, 1), 6) AS punct_ratio,
       ROUND(n_stop * 1.0 / GREATEST(n_tokens, 1), 6) AS stop_ratio,
       ROUND(CASE WHEN n_tokens < 5 THEN 0.0
                  WHEN n_chars_calc * 1.0 / GREATEST(n_tokens, 1) > 15 THEN 0.2
                  ELSE LEAST(1.0, 0.5 + (n_stop * 1.0 / GREATEST(n_tokens, 1)) * 2
                                  - (n_punct * 1.0 / GREATEST(n_chars_calc, 1)) * 3)
             END, 6) AS quality
FROM base
"""


LANGID_N = 3      # character n-gram order (Cavnar–Trenkle use 1..5; 3 here)
LANGID_TOP = 200  # profile size: top-K n-grams per language by doc frequency


def _char_ngrams(col):
    """Distinct lowercase character trigrams of a text column, as a direct
    substr window per position — the lambda closes over the lowered column
    reference only (no per-element re-evaluation of a heavy expression,
    the relational.sliding_ngrams lesson)."""
    lc = F.lower(col)
    return F.array_distinct(F.transform(
        F.sequence(F.lit(1),
                   F.greatest(F.length(lc) - (LANGID_N - 1), F.lit(1))),
        lambda i: lc.substr(i, F.lit(LANGID_N))))


def lang_profiles_df(labeled):
    """Language profiles from a LABELED sample: the LANGID_TOP character
    trigrams per language by document frequency (Cavnar–Trenkle 1994
    shape, doc-frequency instead of rank distance so scoring stays one
    broadcast join + count).  Deterministic tie-break at the profile
    boundary: (df DESC, trigram ASC) — binary string order in both
    engines.  The profile is tiny (langs × LANGID_TOP rows): at crawl
    scale it is built once from a small labeled sample and broadcast."""
    g = labeled.select("lang", F.explode(_char_ngrams(F.col("text"))).alias("g"))
    counts = g.groupBy("lang", "g").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("lang").orderBy(F.desc("df"), F.asc("g"))
    return (counts.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= LANGID_TOP).select("lang", "g"))


def lang_id_df(docs, profiles):
    """Score (doc_id, text) against broadcast language profiles: count the
    document's distinct trigrams that hit each profile, argmax with a
    deterministic tie-break (hits DESC, lang ASC); docs with no profile
    hit at all get BCP-47 'und'.  Scan-side explode -> broadcast equi-join
    -> partial-combinable count: no corpus shuffle wider than
    (doc, candidate-lang) rows."""
    g = docs.select("doc_id", F.explode(_char_ngrams(F.col("text"))).alias("g"))
    hits = (g.join(F.broadcast(profiles), "g")
            .groupBy("doc_id", F.col("lang").alias("cand"))
            .agg(F.count(F.lit(1)).alias("n_hits")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("n_hits"), F.asc("cand"))
    best = hits.withColumn("rn", F.row_number().over(w)).where("rn = 1")
    return (docs.select("doc_id")
            .join(best.select("doc_id", F.col("cand").alias("lang_guess"),
                              "n_hits"), "doc_id", "left")
            .na.fill({"lang_guess": "und", "n_hits": 0}))


def lang_id(spark, sf_dir):
    """Character-trigram-profile language ID (replaces the r1-r4 5-stopword
    vote): profiles learned from the table's own labels, scoring by
    profile-hit count.  On the synthetic fixture the labels are
    content-uncorrelated, so this gate checks the exact two-stage
    semantics; measured ACCURACY lives in QUALITY.md on a planted
    multilingual fixture (tests/test_textstats_langid.py)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return lang_id_df(d.select("doc_id", "text"), lang_profiles_df(d))


ORACLE_LANGID = f"""
WITH tri AS (
  SELECT doc_id, lang,
         unnest(list_distinct(list_transform(
           range(1, GREATEST(length(lower(text)) - {LANGID_N - 1}, 1) + 1),
           i -> substr(lower(text), i, {LANGID_N})))) AS g
  FROM documents),
prof AS (
  SELECT lang, g FROM (
    SELECT lang, g,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY COUNT(*) DESC, g) AS rn
    FROM tri GROUP BY lang, g)
  WHERE rn <= {LANGID_TOP}),
hits AS (
  SELECT t.doc_id, p.lang AS cand, COUNT(*) AS n_hits
  FROM tri t JOIN prof p USING (g)
  GROUP BY t.doc_id, p.lang),
best AS (
  SELECT doc_id, cand, n_hits,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY n_hits DESC, cand) AS rn
  FROM hits)
SELECT d.doc_id,
       COALESCE(b.cand, 'und') AS lang_guess,
       COALESCE(b.n_hits, 0) AS n_hits
FROM documents d
LEFT JOIN (SELECT doc_id, cand, n_hits FROM best WHERE rn = 1) b
       USING (doc_id)
"""


def fingerprints(spark, sf_dir):
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set (rolling-hash analog; robust to shuffling/reflow)."""
    d = t(spark, sf_dir, "documents")
    canon = F.array_join(
        F.array_sort(F.array_distinct(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != ""))), " ")
    return d.select("doc_id", F.md5(canon).alias("fingerprint"))


ORACLE_FINGERPRINT = """
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(
           list_filter(string_split(lower(text), ' '), x -> x != ''))), ' ')) AS fingerprint
FROM documents
"""


DECON_N = 8         # n-gram length for benchmark-overlap detection
DECON_BENCH_MOD = 97  # stand-in benchmark set: doc_id % 97 == 0


def decontaminate_flags(spark, sf_dir):
    """Benchmark decontamination: flag training documents that share any
    word-``DECON_N``-gram with the benchmark set (stand-in: every 97th
    document), with the overlapping-n-gram count per flagged doc.

    The standard eval-leakage filter of an LLM data pipeline.  Scale
    shape: the benchmark n-gram table is tiny relative to the corpus
    (eval suites are MBs, the crawl is TBs) — Catalyst broadcasts it, so
    the corpus side stays a narrow scan + hash lookup with NO shuffle of
    the training n-grams; the count agg shuffles only matched (doc,
    n-gram) rows.  N-grams are md5-hashed before the join (fixed-width
    key, no long-string comparisons through the broadcast).

    The synthetic docs are near-disjoint, so CONTAMINATED twins are
    planted (identically in the oracle): every 50th+1 document gets a
    +300000 twin with benchmark doc 0's text appended — those twins MUST
    be flagged."""
    base = t(spark, sf_dir, "documents").select("doc_id", "text")
    bench0 = base.where(F.col("doc_id") == 0) \
        .select(F.col("text").alias("btext"))
    planted = (base.where(F.col("doc_id") % 50 == 1)
               .crossJoin(F.broadcast(bench0))
               .select((F.col("doc_id") + 300000).alias("doc_id"),
                       F.concat_ws(" ", "text", "btext").alias("text")))
    d = base.unionByName(planted)
    grams = F.transform(sliding_ngrams(F.split("text", " "), DECON_N),
                        lambda g: F.md5(g))
    exploded = d.select("doc_id", F.explode(F.array_distinct(grams)).alias("h"))
    is_bench = F.col("doc_id") % DECON_BENCH_MOD == 0
    bench = exploded.where(is_bench).select("h").distinct()
    train = exploded.where(~is_bench)
    return (train.join(F.broadcast(bench), "h", "left_semi")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams")))


ORACLE_DECON = f"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT t.doc_id + 300000 AS doc_id, t.text || ' ' || b.text AS text
  FROM documents t JOIN documents b ON b.doc_id = 0
  WHERE t.doc_id % 50 = 1),
grams AS (
  SELECT DISTINCT doc_id,
         md5(array_to_string(list_slice(string_split(text, ' '), i, i + {DECON_N - 1}), ' ')) AS h
  FROM aug,
       UNNEST(range(1, GREATEST(len(string_split(text, ' ')) - {DECON_N - 1}, 1) + 1)) AS r(i)),
bench AS (SELECT DISTINCT h FROM grams WHERE doc_id % {DECON_BENCH_MOD} = 0)
SELECT doc_id, COUNT(*) AS n_contaminated_ngrams
FROM grams WHERE doc_id % {DECON_BENCH_MOD} != 0
  AND h IN (SELECT h FROM bench)
GROUP BY doc_id
"""


def repetition_ratio(spark, sf_dir):
    """Gopher-style repetition signal: fraction of all word bigrams taken
    by the single most frequent bigram, per document.  High values flag
    boilerplate/spam (repeated nav text, keyword stuffing).  Two keyed
    aggregations — (doc, bigram) count then per-doc max/sum — both
    map-side combinable; no joins."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    n = F.size(toks)
    bigrams = sliding_ngrams(toks, 2)
    # docs with < 2 tokens have no bigrams and emit no row (same WHERE in
    # the oracle; also keeps sliding_ngrams' short-array branch out)
    exploded = (d.where(n >= 2)
                .select("doc_id", F.explode(bigrams).alias("bg")))
    per_bg = exploded.groupBy("doc_id", "bg").agg(
        F.count(F.lit(1)).alias("c"))
    return (per_bg.groupBy("doc_id")
            .agg(F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac"),
                 F.sum("c").alias("n_bigrams")))


ORACLE_REPETITION = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS l
  FROM documents),
bigrams AS (
  SELECT doc_id, l[i] || ' ' || l[i + 1] AS bg
  FROM toks, UNNEST(range(1, len(l))) AS r(i)
  WHERE len(l) >= 2),
per_bg AS (SELECT doc_id, bg, COUNT(*) AS c FROM bigrams GROUP BY doc_id, bg)
SELECT doc_id, ROUND(MAX(c) * 1.0 / SUM(c), 6) AS top_bigram_frac,
       CAST(SUM(c) AS BIGINT) AS n_bigrams
FROM per_bg GROUP BY doc_id
"""


MIX_RATES = {"en": 60, "de": 35}   # percent kept per lang; default below
MIX_DEFAULT_RATE = 15


def stratified_sample(spark, sf_dir):
    """Deterministic per-language downsampling — the data-mixing step of
    a training pipeline (e.g. keep 60% en, 35% de, 15% everything else).

    The keep decision hashes the doc_id (md5 first 4 hex chars mod 100),
    so it is reproducible across runs/engines and needs NO shuffle: the
    sample is a narrow filter on the scan, and re-running the pipeline
    keeps the identical subset (resume-safe, unlike rand()-based
    sampling)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    rate = F.lit(MIX_DEFAULT_RATE)
    for lang, r in sorted(MIX_RATES.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
                    16, 10).cast("long") % 100
    return (d.withColumn("bucket", bucket)
            .where(F.col("bucket") < rate)
            .select("doc_id", "lang")
            .groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept")))


_RATE_SQL = " ".join(
    f"WHEN lang = '{lang}' THEN {r}" for lang, r in sorted(MIX_RATES.items()))

ORACLE_MIX = f"""
SELECT lang, COUNT(*) AS n_kept
FROM (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
              AS BIGINT) % 100 AS bucket,
         CASE {_RATE_SQL} ELSE {MIX_DEFAULT_RATE} END AS rate
  FROM documents)
WHERE bucket < rate GROUP BY lang
"""


# --- Gopher-style quality ruleset (Rae et al. 2021, public) ---------------

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_WLEN_LO = 3.0
GOPHER_WLEN_HI = 10.0
GOPHER_ALPHA_MIN = 0.8
GOPHER_STOP_MIN = 2
# The documented Gopher stopword rule (Rae et al. 2021, public): at least 2
# of these 8 English function words.  Distinct from the langid/quality
# `_STOP` lists, which stay as-is (their oracles share them already).
GOPHER_STOP = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_SYMBOL_MAX = 0.1        # '#'/ellipsis occurrences per word
GOPHER_ELLIPSIS_LINE_MAX = 0.3  # share of lines ending with an ellipsis
GOPHER_BULLET_LINE_MAX = 0.9    # share of lines starting with a bullet
# Java-regex ∩ RE2 subset (no lookaround): '#', literal '...', or U+2026
RE_GOPHER_SYMBOL = "#|\\.\\.\\.|…"


def gopher_metrics(text_col="text"):
    """The Gopher rule expressions over a ``text`` column — shared by the
    batch query, the per-language gate, the curation verdict, and the
    streaming at-ingest twin (streaming/extract.py) so all four filter
    identically.  Rules: word-count bounds, mean word length in [3,10],
    ≥80% words with an alphabetic char, ≥2 of the 8 documented stopwords,
    symbol-to-word ratio ≤0.1 ('#'/ellipsis), ≤30% of lines ending with an
    ellipsis, ≤90% of lines starting with a bullet."""
    toks = F.filter(F.split(text_col, " "), lambda x: x != "")
    n = F.size(toks)
    sum_len = F.aggregate(F.transform(toks, lambda x: F.length(x)),
                          F.lit(0), lambda a, v: a + v)
    mean_wl = sum_len / F.greatest(n, F.lit(1))
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
    frac_alpha = n_alpha / F.greatest(n, F.lit(1))
    n_stop = F.size(F.filter(toks, lambda x: F.lower(x).isin(GOPHER_STOP)))
    n_symbol = F.size(F.regexp_extract_all(text_col,
                                           F.lit(RE_GOPHER_SYMBOL), F.lit(0)))
    frac_symbol = n_symbol / F.greatest(n, F.lit(1))
    lines = F.split(text_col, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    frac_ell_lines = F.size(F.filter(
        lines, lambda x: x.endswith("...") | x.endswith("…"))) / n_lines
    frac_bullet_lines = F.size(F.filter(
        lines, lambda x: x.startswith("-") | x.startswith("•")
        | x.startswith("*"))) / n_lines
    passed = ((n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)
              & (mean_wl >= GOPHER_WLEN_LO) & (mean_wl <= GOPHER_WLEN_HI)
              & (frac_alpha >= GOPHER_ALPHA_MIN) & (n_stop >= GOPHER_STOP_MIN)
              & (frac_symbol <= GOPHER_SYMBOL_MAX)
              & (frac_ell_lines <= GOPHER_ELLIPSIS_LINE_MAX)
              & (frac_bullet_lines <= GOPHER_BULLET_LINE_MAX))
    return {"n_words": n, "mean_word_len": mean_wl,
            "frac_alpha_words": frac_alpha, "n_stopwords": n_stop,
            "frac_symbol_words": frac_symbol,
            "frac_ellipsis_lines": frac_ell_lines,
            "frac_bullet_lines": frac_bullet_lines,
            "pass_gopher": passed}


_GOPHER_STOP_SQL = "('" + "','".join(GOPHER_STOP) + "')"


def gopher_sql_exprs(l="l", text="text"):
    """DuckDB expressions mirroring :func:`gopher_metrics`, over a token
    list column ``l`` (= non-empty whitespace tokens) and the raw ``text``
    column — the single source for every oracle embedding the gate."""
    lines = f"string_split({text}, chr(10))"
    return {
        "n_words": f"len({l})",
        "mean_wl": (f"CAST(list_sum(list_transform({l}, x -> length(x))) "
                    f"AS DOUBLE) / GREATEST(len({l}), 1)"),
        "frac_alpha": (f"len(list_filter({l}, x -> regexp_matches(x, "
                       f"'[A-Za-z]'))) * 1.0 / GREATEST(len({l}), 1)"),
        "n_stopwords": (f"len(list_filter({l}, x -> lower(x) IN "
                        f"{_GOPHER_STOP_SQL}))"),
        "frac_symbol": (f"len(regexp_extract_all({text}, "
                        f"'{RE_GOPHER_SYMBOL}')) * 1.0 / "
                        f"GREATEST(len({l}), 1)"),
        "frac_ell_lines": (f"len(list_filter({lines}, x -> "
                           f"ends_with(x, '...') OR ends_with(x, '…'))) "
                           f"* 1.0 / GREATEST(len({lines}), 1)"),
        "frac_bullet_lines": (f"len(list_filter({lines}, x -> "
                              f"starts_with(x, '-') OR starts_with(x, '•') "
                              f"OR starts_with(x, '*'))) "
                              f"* 1.0 / GREATEST(len({lines}), 1)"),
    }


def gopher_cond_sql(n_words="n_words", mean_wl="mean_wl",
                    frac_alpha="frac_alpha", n_stopwords="n_stopwords",
                    frac_symbol="frac_symbol", frac_ell="frac_ell_lines",
                    frac_bullet="frac_bullet_lines"):
    """The combined pass condition over already-computed metric columns."""
    return (f"({n_words} >= {GOPHER_MIN_WORDS} "
            f"AND {n_words} <= {GOPHER_MAX_WORDS} "
            f"AND {mean_wl} >= {GOPHER_WLEN_LO} "
            f"AND {mean_wl} <= {GOPHER_WLEN_HI} "
            f"AND {frac_alpha} >= {GOPHER_ALPHA_MIN} "
            f"AND {n_stopwords} >= {GOPHER_STOP_MIN} "
            f"AND {frac_symbol} <= {GOPHER_SYMBOL_MAX} "
            f"AND {frac_ell} <= {GOPHER_ELLIPSIS_LINE_MAX} "
            f"AND {frac_bullet} <= {GOPHER_BULLET_LINE_MAX})")


def gopher_rules(spark, sf_dir):
    """Full Gopher-style document-quality ruleset: word count bounds, mean
    word length in [3,10], >=80% words containing an alphabetic character,
    >=2 of the documented stopwords, symbol-to-word ratio <= 0.1,
    <=30% ellipsis-terminated lines, <=90% bullet-started lines — plus the
    combined pass flag.  The standard pre-filter tier of an LLM data
    pipeline (applied before any expensive dedup).

    The synthetic corpus contains no '#'/ellipsis/bullet text, so
    deterministic rule-violating twins are planted (identically in the
    oracle, same pattern as the planted-PII scan): every ``%41==5`` doc
    gets a '#'-flooded +400000 twin, every ``%43==7`` an
    ellipsis-per-line +500000 twin, every ``%47==11`` a bulleted +600000
    twin — those must fail exactly their rule.

    Scale shape: pure Catalyst higher-order functions over the scan — no
    shuffle, no UDF; whole-stage codegen end to end, so at 100 TB this is
    scan-bound."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    n_toks = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    sym = (d.where(F.col("doc_id") % 41 == 5)
           .select((F.col("doc_id") + 400000).alias("doc_id"),
                   F.concat("text", F.expr("repeat(' #', size(filter("
                            "split(text, ' '), x -> x != '')))"))
                   .alias("text")))
    ell = (d.where(F.col("doc_id") % 43 == 7)
           .select((F.col("doc_id") + 500000).alias("doc_id"),
                   F.replace(F.col("text"), F.lit(" "), F.lit("...\n"))
                   .alias("text")))
    bul = (d.where(F.col("doc_id") % 47 == 11)
           .select((F.col("doc_id") + 600000).alias("doc_id"),
                   F.concat(F.lit("- "),
                            F.replace(F.col("text"), F.lit(" "),
                                      F.lit("\n- "))).alias("text")))
    d = d.unionByName(sym).unionByName(ell).unionByName(bul)
    m = gopher_metrics()
    return d.select("doc_id",
                    m["n_words"].alias("n_words"),
                    F.round(m["mean_word_len"], 6).alias("mean_word_len"),
                    F.round(m["frac_alpha_words"], 6).alias("frac_alpha_words"),
                    m["n_stopwords"].alias("n_stopwords"),
                    F.round(m["frac_symbol_words"], 6)
                    .alias("frac_symbol_words"),
                    F.round(m["frac_ellipsis_lines"], 6)
                    .alias("frac_ellipsis_lines"),
                    F.round(m["frac_bullet_lines"], 6)
                    .alias("frac_bullet_lines"),
                    m["pass_gopher"].alias("pass_gopher"))


_GE = gopher_sql_exprs()

GOPHER_PLANTED_SQL = """
gdocs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 400000 AS doc_id,
         text || repeat(' #', len(list_filter(string_split(text, ' '),
                                              x -> x != ''))) AS text
  FROM documents WHERE doc_id % 41 = 5
  UNION ALL
  SELECT doc_id + 500000 AS doc_id,
         replace(text, ' ', '...' || chr(10)) AS text
  FROM documents WHERE doc_id % 43 = 7
  UNION ALL
  SELECT doc_id + 600000 AS doc_id,
         '- ' || replace(text, ' ', chr(10) || '- ') AS text
  FROM documents WHERE doc_id % 47 = 11
)
"""

ORACLE_GOPHER = f"""
WITH {GOPHER_PLANTED_SQL.strip()},
base AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x != '') AS l
  FROM gdocs),
m AS (
  SELECT doc_id,
         {_GE['n_words']} AS n_words,
         {_GE['mean_wl']} AS mean_wl,
         {_GE['frac_alpha']} AS frac_alpha,
         {_GE['n_stopwords']} AS n_stopwords,
         {_GE['frac_symbol']} AS frac_symbol,
         {_GE['frac_ell_lines']} AS frac_ell_lines,
         {_GE['frac_bullet_lines']} AS frac_bullet_lines
  FROM base)
SELECT doc_id, n_words,
       ROUND(mean_wl, 6) AS mean_word_len,
       ROUND(frac_alpha, 6) AS frac_alpha_words,
       n_stopwords,
       ROUND(frac_symbol, 6) AS frac_symbol_words,
       ROUND(frac_ell_lines, 6) AS frac_ellipsis_lines,
       ROUND(frac_bullet_lines, 6) AS frac_bullet_lines,
       {gopher_cond_sql()} AS pass_gopher
FROM m
"""


def quality_gate_counts(spark, sf_dir):
    """Per-language pass/fail counts of the Gopher gate — the batch twin
    of the streaming at-ingest filter (streaming/extract.py
    ``stream_quality_gate``), sharing the exact same rule expressions via
    :func:`gopher_metrics`.  One map-side-combinable keyed agg."""
    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    sel = d.select("lang", gopher_metrics()["pass_gopher"].alias("p"))
    return (sel.groupBy("lang")
            .agg(F.sum(F.col("p").cast("long")).alias("n_pass"),
                 F.sum((~F.col("p")).cast("long")).alias("n_fail")))


_GOPHER_COND = gopher_cond_sql()

ORACLE_QUALITY_GATE = f"""
WITH base AS (
  SELECT lang, text,
         list_filter(string_split(text, ' '), x -> x != '') AS l
  FROM documents),
m AS (
  SELECT lang,
         {_GE['n_words']} AS n_words,
         {_GE['mean_wl']} AS mean_wl,
         {_GE['frac_alpha']} AS frac_alpha,
         {_GE['n_stopwords']} AS n_stopwords,
         {_GE['frac_symbol']} AS frac_symbol,
         {_GE['frac_ell_lines']} AS frac_ell_lines,
         {_GE['frac_bullet_lines']} AS frac_bullet_lines
  FROM base)
SELECT lang,
       CAST(SUM(CASE WHEN {_GOPHER_COND} THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(SUM(CASE WHEN {_GOPHER_COND} THEN 0 ELSE 1 END) AS BIGINT) AS n_fail
FROM m GROUP BY lang
"""


# --- PII pattern counting (planted, deterministic) -------------------------

PII_MOD = 37          # doc_id % PII_MOD == PII_REM gets planted PII
PII_REM = 3
RE_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
RE_IPV4 = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
RE_PHONE = "[0-9]{3}-[0-9]{4}"


def pii_counts(spark, sf_dir):
    """PII-pattern scan (email / IPv4 / phone-like) — the redaction-audit
    step of a web-text pipeline.  The synthetic corpus contains no PII, so
    deterministic PII is planted on every ``doc_id % 37 == 3`` document
    (identically in the oracle); those and only those must flag.

    Regexes stay in the Java-regex ∩ RE2 common subset (char classes,
    bounded repeats — no lookaround, no backrefs) so Spark and DuckDB
    tokenize identically.  Scale shape: narrow scan-side projection,
    whole-stage codegen, no shuffle."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    planted = F.concat(
        F.col("text"), F.lit(" contact user"), did.cast("string"),
        F.lit("@example.com or 192.168."), (did % 256).cast("string"),
        F.lit(".7 call 555-"),
        F.lpad((did % 10000).cast("string"), 4, "0"))
    aug = F.when(did % PII_MOD == PII_REM, planted).otherwise(F.col("text"))
    n_email = F.size(F.regexp_extract_all(aug, F.lit(RE_EMAIL), F.lit(0)))
    n_ipv4 = F.size(F.regexp_extract_all(aug, F.lit(RE_IPV4), F.lit(0)))
    n_phone = F.size(F.regexp_extract_all(aug, F.lit(RE_PHONE), F.lit(0)))
    return d.select("doc_id",
                    n_email.alias("n_emails"),
                    n_ipv4.alias("n_ipv4"),
                    n_phone.alias("n_phones"),
                    ((n_email + n_ipv4 + n_phone) > 0).alias("has_pii"))


ORACLE_PII = f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % {PII_MOD} = {PII_REM}
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com or 192.168.'
                   || CAST(doc_id % 256 AS VARCHAR) || '.7 call 555-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE text END AS text
  FROM documents),
m AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{RE_EMAIL}')) AS n_emails,
         len(regexp_extract_all(text, '{RE_IPV4}')) AS n_ipv4,
         len(regexp_extract_all(text, '{RE_PHONE}')) AS n_phones
  FROM aug)
SELECT doc_id, n_emails, n_ipv4, n_phones,
       (n_emails + n_ipv4 + n_phones) > 0 AS has_pii
FROM m
"""


# --- corpus-level boilerplate n-grams --------------------------------------

TOP_NGRAMS_K = 20


def corpus_top_ngrams(spark, sf_dir):
    """Corpus-wide most-frequent word bigrams — the boilerplate-discovery
    pass of a crawl pipeline (repeated nav/footer phrases surface at the
    top; the result seeds a strip-list).

    Scale shape: the (bigram -> count) aggregation is map-side combinable
    (partial HashAggregate before the single shuffle), and the final
    ``ORDER BY .. LIMIT k`` compiles to TakeOrderedAndProject — per-
    partition top-k then a k-row driver merge, never a global sort.  The
    (count DESC, bigram ASC) ordering is a total order (bigram is the
    grouping key, hence unique), so LIMIT is deterministic across
    engines."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    n = F.size(toks)
    bigrams = sliding_ngrams(toks, 2)
    exploded = (d.where(n >= 2)
                .select("doc_id", F.explode(bigrams).alias("bg")))
    counts = exploded.groupBy("bg").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"))
    return (counts.orderBy(F.desc("n_occurrences"), "bg")
            .limit(TOP_NGRAMS_K))


ORACLE_TOP_NGRAMS = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS l
  FROM documents),
bigrams AS (
  SELECT doc_id, l[i] || ' ' || l[i + 1] AS bg
  FROM toks, UNNEST(range(1, len(l))) AS r(i)
  WHERE len(l) >= 2)
SELECT bg, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM bigrams GROUP BY bg
ORDER BY n_occurrences DESC, bg ASC
LIMIT {TOP_NGRAMS_K}
"""


# --- unigram-LM perplexity proxy (CCNet-style quality signal) --------------

def unigram_logprob(spark, sf_dir):
    """Per-document mean negative log-probability under the corpus's own
    unigram model — the engine-native stand-in for CCNet's LM-perplexity
    quality bucket (Wenzek et al. 2020, public): rare-vocabulary /
    gibberish documents score high, common prose scores low.

    Scale shape: the unigram frequency table is a map-side-combinable
    ``groupBy(token).count`` (vocabulary, not corpus, sized); the scalar
    token total rides along as a broadcast 1-row cross join; the score
    pass is a keyed equi-join of tokens to frequencies — hot stopword
    tokens are the canonical AQE skew-join split — then one per-doc
    aggregation.  ln() differences between engines are sub-ulp and
    vanish under the round-6 gate."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda x: x != ""))
        .alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("total"))
    scored = (toks.join(freq, "tok")
              .crossJoin(F.broadcast(total))
              .select("doc_id",
                      (-F.log(F.col("c") / F.col("total"))).alias("nlp")))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.avg("nlp"), 6).alias("avg_neg_logprob")))


ORACLE_UNIGRAM = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
  FROM documents),
freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM freq)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(AVG(-ln(c * 1.0 / total)), 6) AS avg_neg_logprob
FROM toks JOIN freq USING (tok), tot
GROUP BY doc_id
"""


# --- token-budget quota sampling (distributed prefix sum) ------------------

TOKEN_BUDGET = 5000    # per-language token quota


def token_budget_sample(spark, sf_dir):
    """Per-language token-budget quota fill: walk documents in a
    deterministic hash order and keep them until the language's token
    budget is exhausted — the quota-sampling step of data mixing ("use at
    most B tokens of language L"), resume-safe because the order is
    content-addressed, not rand().

    Scale shape — a distributed two-phase prefix sum instead of one
    global per-language window sort: (1) per (lang, hash-bucket) token
    sums — a tiny map-side-combined agg (|langs|·256 rows); (2) exclusive
    bucket offsets by a window over that tiny table; (3) offsets
    broadcast back, and the running total needs only an intra-bucket
    cumulative window partitioned by (lang, bucket) — 256× more
    partitions than the naive per-lang global sort, each sorting 1/256th
    of a language (widen the hex prefix for more).  Because the bucket
    is the first-two-hex-chars prefix of the md5 ordering key,
    bucket-major + intra-bucket order IS the global hash order, so the
    result is identical to the oracle's single global cumulative
    window."""
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    n_tok = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    h = F.md5(F.col("doc_id").cast("string"))
    base = d.select("doc_id", "lang", n_tok.alias("n_tok"), h.alias("h"),
                    F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
                    .alias("bkt"))
    per_bkt = base.groupBy("lang", "bkt").agg(F.sum("n_tok").alias("s"))
    w_off = (Window.partitionBy("lang").orderBy("bkt")
             .rowsBetween(Window.unboundedPreceding, -1))
    offs = per_bkt.select(
        "lang", "bkt",
        F.coalesce(F.sum("s").over(w_off), F.lit(0)).alias("off"))
    w_in = (Window.partitionBy("lang", "bkt").orderBy("h", "doc_id")
            .rowsBetween(Window.unboundedPreceding, 0))
    cum = (base.join(F.broadcast(offs), ["lang", "bkt"])
           .select("lang", "n_tok",
                   (F.col("off") + F.sum("n_tok").over(w_in)).alias("cum")))
    return (cum.where(F.col("cum") <= TOKEN_BUDGET)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs_kept"),
                 F.sum("n_tok").cast("long").alias("tokens_kept")))


ORACLE_TOKEN_BUDGET = f"""
WITH base AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tok,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents),
cum AS (
  SELECT lang, n_tok,
         SUM(n_tok) OVER (PARTITION BY lang ORDER BY h, doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM base)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
       CAST(SUM(n_tok) AS BIGINT) AS tokens_kept
FROM cum WHERE cum <= {TOKEN_BUDGET}
GROUP BY lang
"""


C4_MIN_WORDS_PER_LINE = 3   # C4: drop lines shorter than this
C4_MIN_KEPT_LINES = 1       # docs keeping fewer terminal lines are dropped


def c4_filters(spark, sf_dir):
    """C4-style line+document filters (Raffel et al. 2020, public): keep
    only lines that end in terminal punctuation AND have >= 3 words; drop
    any document that mentions ``lorem ipsum``, contains ``{``, or has a
    line with the word ``javascript``; emit per-doc counts, the kept-line
    character count (the re-joined text's size — a cheap proxy the judge
    can hash without megabyte columns), and the combined ``pass_c4`` flag.

    The synthetic corpus is single-line without terminal punctuation, so
    deterministic twins are planted (identically in the oracle): every
    ``%53==13`` doc gets a +700000 twin reflowed into '.'-terminated lines
    (every line kept); every ``%59==17`` doc a +800000 twin with a
    ``lorem ipsum {`` line and a javascript line appended (dropped by the
    blocklist, whatever its line stats).

    Scale shape: pure scan-side HOFs over split lines — no shuffle, no
    UDF; same whole-stage-codegen tier as the Gopher gate."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    reflow = (d.where(F.col("doc_id") % 53 == 13)
              .select((F.col("doc_id") + 700000).alias("doc_id"),
                      F.concat(F.replace(F.col("text"), F.lit(" "),
                                         F.lit(" x y.\n")), F.lit(" x y."))
                      .alias("text")))
    blocked = (d.where(F.col("doc_id") % 59 == 17)
               .select((F.col("doc_id") + 800000).alias("doc_id"),
                       F.concat("text",
                                F.lit("\nlorem ipsum { dolor sit.\n"
                                      "enable javascript to continue."))
                       .alias("text")))
    d = d.unionByName(reflow).unionByName(blocked)
    lines = F.split("text", "\n")
    n_lines = F.size(lines)
    kept = F.filter(
        lines,
        lambda ln: (ln.endswith(".") | ln.endswith("!") | ln.endswith("?")
                    | ln.endswith("\""))
        & (F.size(F.filter(F.split(ln, " "), lambda w: w != ""))
           >= C4_MIN_WORDS_PER_LINE))
    n_kept = F.size(kept)
    kept_chars = F.length(F.array_join(kept, "\n"))
    low = F.lower("text")
    has_lorem = low.contains("lorem ipsum")
    has_brace = low.contains("{")
    has_js = low.contains("javascript")
    pass_c4 = ((n_kept >= C4_MIN_KEPT_LINES)
               & ~has_lorem & ~has_brace & ~has_js)
    return d.select("doc_id", n_lines.alias("n_lines"),
                    n_kept.alias("n_kept_lines"),
                    kept_chars.alias("kept_chars"),
                    has_lorem.alias("has_lorem"),
                    has_brace.alias("has_brace"),
                    has_js.alias("has_js"),
                    pass_c4.alias("pass_c4"))


ORACLE_C4 = f"""
WITH cdocs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 700000 AS doc_id,
         replace(text, ' ', ' x y.' || chr(10)) || ' x y.' AS text
  FROM documents WHERE doc_id % 53 = 13
  UNION ALL
  SELECT doc_id + 800000 AS doc_id,
         text || chr(10) || 'lorem ipsum {{ dolor sit.' || chr(10) ||
         'enable javascript to continue.' AS text
  FROM documents WHERE doc_id % 59 = 17),
base AS (
  SELECT doc_id, text, string_split(text, chr(10)) AS lines,
         list_filter(string_split(text, chr(10)), ln ->
           (ends_with(ln, '.') OR ends_with(ln, '!') OR ends_with(ln, '?')
            OR ends_with(ln, '"'))
           AND len(list_filter(string_split(ln, ' '), w -> w != ''))
               >= {C4_MIN_WORDS_PER_LINE}) AS kept
  FROM cdocs)
SELECT doc_id,
       len(lines) AS n_lines,
       len(kept) AS n_kept_lines,
       LENGTH(COALESCE(array_to_string(kept, chr(10)), '')) AS kept_chars,
       contains(lower(text), 'lorem ipsum') AS has_lorem,
       contains(lower(text), '{{') AS has_brace,
       contains(lower(text), 'javascript') AS has_js,
       (len(kept) >= {C4_MIN_KEPT_LINES}
        AND NOT contains(lower(text), 'lorem ipsum')
        AND NOT contains(lower(text), '{{')
        AND NOT contains(lower(text), 'javascript')) AS pass_c4
FROM base
"""


# --- per-domain document cap (RefinedWeb-style, public) --------------------

DOMAIN_CAP_K = 10
_N_HOSTS = 997


def _hosted_docs(spark, sf_dir):
    """(doc_id, host): deterministic host assignment with one planted hot
    host — every ``%4==0`` doc lands on ``h0`` (≈25% of the corpus), the
    rest spread thin over 997 hosts (a few docs each, under the cap).
    Mirrors real crawls, where a handful of domains dominate the page
    count while the host tail is long and sparse."""
    d = t(spark, sf_dir, "documents").select("doc_id")
    host_id = F.when(F.col("doc_id") % 4 == 0, F.lit(0)) \
        .otherwise(F.col("doc_id") % F.lit(_N_HOSTS))
    host = F.concat(F.lit("h"), host_id.cast("string"),
                    F.lit(".example.org"))
    return d.select("doc_id", host.alias("host"))


def domain_cap(spark, sf_dir):
    """Per-domain document cap (RefinedWeb / Penedo et al. 2023, public):
    keep at most ``DOMAIN_CAP_K`` documents per host so that no single
    domain dominates the training mix.  Selection is deterministic —
    rank by md5(doc_id) within the host — so re-runs keep the identical
    subset (resume-safe, like the stratified sampler).

    Scale shape (skew-routed, same pattern as the salted aligner): the
    host-frequency count is map-side combinable; docs on UNDER-cap hosts
    (the long tail — the vast majority of a real crawl) pass through with
    NO per-key ordering at all; only docs on over-cap hosts pay the
    window sort, and that subset is bounded by the hot-host row counts.
    A naive global ``row_number() over (partition by host)`` would sort
    the entire corpus and put each giant host in one task — routing
    first means the window input is only the skewed slice."""
    from pyspark.sql import Window

    docs = _hosted_docs(spark, sf_dir)
    counts = docs.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_host_docs"))
    sized = docs.join(counts, "host")
    small = (sized.where(F.col("n_host_docs") <= DOMAIN_CAP_K)
             .withColumn("kept", F.lit(True)))
    w = (Window.partitionBy("host")
         .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id")))
    hot = (sized.where(F.col("n_host_docs") > DOMAIN_CAP_K)
           .withColumn("kept", F.row_number().over(w) <= DOMAIN_CAP_K))
    return small.unionByName(hot).select(
        "doc_id", "host", "n_host_docs", "kept")


ORACLE_DOMAIN_CAP = f"""
WITH hosted AS (
  SELECT doc_id,
         'h' || CAST(CASE WHEN doc_id % 4 = 0 THEN 0
                          ELSE doc_id % {_N_HOSTS} END AS VARCHAR)
             || '.example.org' AS host
  FROM documents),
sized AS (
  SELECT h.doc_id, h.host, c.n_host_docs
  FROM hosted h
  JOIN (SELECT host, COUNT(*) AS n_host_docs FROM hosted GROUP BY host) c
    USING (host)),
ranked AS (
  SELECT doc_id, host, n_host_docs,
         ROW_NUMBER() OVER (PARTITION BY host
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rn
  FROM sized)
SELECT doc_id, host, CAST(n_host_docs AS BIGINT) AS n_host_docs,
       (n_host_docs <= {DOMAIN_CAP_K} OR rn <= {DOMAIN_CAP_K}) AS kept
FROM ranked
"""


# --- temperature-balanced multilingual mixing (alpha = 0.5, public) ---------

def temperature_mix(spark, sf_dir):
    """Temperature-balanced language sampling (the multilingual mixing
    rule of mBERT / XLM-R, Conneau et al. 2020, public): expected kept
    volume per language ∝ n_lang^alpha with alpha = 0.5, normalized so
    the smallest language keeps 100% — high-resource languages are
    downsampled toward the low-resource ones.  keep-rate_l =
    sqrt(n_min / n_l); the keep decision hashes doc_id into [0, 65536)
    and compares against rate·65536, so the subset is deterministic and
    engine-portable (sqrt and IEEE division are correctly rounded in
    both engines — no ulp drift across the threshold).

    Scale shape: the per-language count is map-side combinable and
    language-cardinality sized; the 1-row global min rides a broadcast
    cross join; the rate table broadcasts back onto the scan, so the
    corpus itself is filtered scan-side with NO shuffle; the final
    per-language rollup is a tiny combinable count."""
    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    nmin = counts.agg(F.min("n_docs").alias("n_min"))
    rates = (counts.crossJoin(F.broadcast(nmin))
             .withColumn("rate", F.sqrt(
                 F.col("n_min").cast("double") / F.col("n_docs"))))
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
                    16, 10).cast("long")
    keep = bucket < F.col("rate") * 65536
    return (d.join(F.broadcast(rates), "lang")
            .groupBy("lang", "n_docs", "rate")
            .agg(F.sum(keep.cast("long")).alias("n_kept"))
            .select("lang", "n_docs", "n_kept",
                    F.round("rate", 6).alias("keep_rate")))


ORACLE_TEMPERATURE = """
WITH counts AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
rates AS (
  SELECT lang, n_docs,
         sqrt((SELECT MIN(n_docs) FROM counts) * 1.0 / n_docs) AS rate
  FROM counts),
k AS (
  SELECT d.lang, r.n_docs, r.rate,
         CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))::BIGINT
              AS BIGINT) < r.rate * 65536 AS keep
  FROM documents d JOIN rates r USING (lang))
SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       ROUND(rate, 6) AS keep_rate
FROM k GROUP BY lang, n_docs, rate
"""


QUERIES = {
    "text_c4_filters": c4_filters,
    "text_token_counts": token_counts,
    "text_quality": quality_scores,
    "text_langid": lang_id,
    "text_fingerprint": fingerprints,
    "text_decontaminate": decontaminate_flags,
    "text_repetition": repetition_ratio,
    "mix_stratified_sample": stratified_sample,
    "text_gopher_rules": gopher_rules,
    "text_pii_counts": pii_counts,
    "corpus_top_ngrams": corpus_top_ngrams,
    "text_unigram_logprob": unigram_logprob,
    "mix_token_budget": token_budget_sample,
    "mix_domain_cap": domain_cap,
    "mix_temperature": temperature_mix,
    "st_quality_gate": quality_gate_counts,
}

ORACLES = {
    "text_c4_filters": ORACLE_C4,
    "text_token_counts": ORACLE_TOKENS,
    "text_quality": ORACLE_QUALITY,
    "text_langid": ORACLE_LANGID,
    "text_fingerprint": ORACLE_FINGERPRINT,
    "text_decontaminate": ORACLE_DECON,
    "text_repetition": ORACLE_REPETITION,
    "mix_stratified_sample": ORACLE_MIX,
    "text_gopher_rules": ORACLE_GOPHER,
    "text_pii_counts": ORACLE_PII,
    "corpus_top_ngrams": ORACLE_TOP_NGRAMS,
    "text_unigram_logprob": ORACLE_UNIGRAM,
    "mix_token_budget": ORACLE_TOKEN_BUDGET,
    "mix_domain_cap": ORACLE_DOMAIN_CAP,
    "mix_temperature": ORACLE_TEMPERATURE,
    "st_quality_gate": ORACLE_QUALITY_GATE,
}

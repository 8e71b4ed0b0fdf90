"""A4/F9 complete: hierarchical text/conf roll-up with join suppression.

Faithful re-derivation of ``page_update_higher_textequiv_levels``
(/root/reference/nmalign/ocrd/cli.py:327-436) over plain dict documents
(parsed from PAGE-XML by :func:`nmalign_spark.sources.pagexml.
parse_page_hierarchy`), covering every rule of the reference:

* glyph -> word: ``''.join`` of first-TextEquiv Unicodes, conf averaged
  (cli.py:411-416);
* word -> line: ``' '.join``, conf averaged (cli.py:417-424);
* line -> region: ``'\\n'.join`` — EXCEPT when the last word of a line and
  the first word of the next appear in a ``Relation@type=join``, which
  suppresses the separator (cli.py:425-436; F9);
* subregion -> region: ``'\\n'.join`` of subregion texts with join
  suppression by region ids, subregions sorted by ReadingOrder OrderedGroup
  index when one covers them all (cli.py:371-387);
* traversal order: lines reversed under ``textLineOrder=bottom-to-top``
  (region else page level, cli.py:389-393), words/glyphs reversed under
  ``readingDirection=right-to-left`` resolved innermost-first
  (cli.py:396-410) — the join check between lines, like the reference,
  uses DOCUMENT-order words (cli.py:429-431 re-reads ``line.get_Word()``);
* ``overwrite=False`` keeps existing higher-level text (cli.py:413,422,434).

Spark surface: :func:`rollup_hierarchy_df` — one narrow ``mapInPandas``
over (url, xml) emitting the updated word/line/region levels as a long
table.  Pure function of the bytes; no shuffle; scales like every other
source kernel.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)

from .relational import fan_out

__all__ = ["rollup_page", "rollup_hierarchy_df", "QUERIES", "ORACLES"]

_RTL = "right-to-left"
_BTT = "bottom-to-top"


def _avg(confs):
    return sum(confs) / len(confs) if confs else 0


def rollup_page(doc: dict, level: str = "glyph",
                overwrite: bool = True) -> dict:
    """Update TextEquivs of all hierarchy levels above ``level`` in place.

    ``doc`` is the dict shape produced by ``parse_page_hierarchy``:
    ``{page: {textLineOrder, readingDirection}, joins: [(src, tgt)],
    reading_order: {region_id: index}, regions: [...]}`` where each region
    is ``{id, textLineOrder, readingDirection, subregions: [...],
    lines: [{id, readingDirection, words: [{id, readingDirection,
    glyphs: [{text, conf}], text, conf, has_equiv}], ...}], text, conf,
    has_equiv}``.
    """
    page = doc.get("page", {})
    joins = set(map(tuple, doc.get("joins", ())))
    reading_order = doc.get("reading_order", {})

    def all_text_regions(regions):
        # post-order (children before parents): the reference's concat of a
        # parent's subregions relies on them being "already visited in
        # earlier iterations" (cli.py:368-372 comment) — the parent must see
        # the subregions' UPDATED text
        for region in regions:
            yield from all_text_regions(region.get("subregions", ()))
            yield region

    if level == "region":
        return doc
    for region in all_text_regions(doc.get("regions", ())):
        subregions = region.get("subregions") or []
        if subregions:
            # already visited in earlier iterations (document order)
            if all(sub["id"] in reading_order for sub in subregions):
                subregions = sorted(subregions,
                                    key=lambda sub: reading_order[sub["id"]])
            region_unicode = subregions[0].get("text", "")
            for sub, nxt in zip(subregions, subregions[1:]):
                if (sub["id"], nxt["id"]) not in joins:
                    region_unicode += "\n"
                region_unicode += nxt.get("text", "")
            region_conf = _avg([sub.get("conf", 1.0) for sub in subregions])
        else:
            lines = region.get("lines") or []
            if (region.get("textLineOrder")
                    or page.get("textLineOrder")) == _BTT:
                lines = list(reversed(lines))
            if level != "line":
                for line in lines:
                    words = line.get("words") or []
                    if (line.get("readingDirection")
                            or region.get("readingDirection")
                            or page.get("readingDirection")) == _RTL:
                        words = list(reversed(words))
                    if level != "word":
                        for word in words:
                            glyphs = word.get("glyphs") or []
                            if (word.get("readingDirection")
                                    or line.get("readingDirection")
                                    or region.get("readingDirection")
                                    or page.get("readingDirection")) == _RTL:
                                glyphs = list(reversed(glyphs))
                            word_unicode = "".join(g.get("text", "")
                                                   for g in glyphs)
                            word_conf = sum(g.get("conf", 1.0)
                                            for g in glyphs)
                            if glyphs:
                                word_conf /= len(glyphs)
                            if not word.get("has_equiv") or overwrite:
                                word["text"] = word_unicode
                                word["conf"] = word_conf
                                word["has_equiv"] = True
                    line_unicode = " ".join(w.get("text", "") for w in words)
                    line_conf = sum(w.get("conf", 1.0) for w in words)
                    if words:
                        line_conf /= len(words)
                    if not line.get("has_equiv") or overwrite:
                        line["text"] = line_unicode
                        line["conf"] = line_conf
                        line["has_equiv"] = True
            region_unicode = ""
            region_conf = 0
            if lines:
                region_unicode = lines[0].get("text", "")
                for line, nxt in zip(lines, lines[1:]):
                    # join check uses DOCUMENT-order words (cli.py:429-431)
                    words = line.get("words") or []
                    next_words = nxt.get("words") or []
                    if not (words and next_words and
                            (words[-1]["id"], next_words[0]["id"]) in joins):
                        region_unicode += "\n"
                    region_unicode += nxt.get("text", "")
                region_conf = _avg([ln.get("conf", 1.0) for ln in lines])
        if not region.get("has_equiv") or overwrite:
            region["text"] = region_unicode
            region["conf"] = region_conf
            region["has_equiv"] = True
    return doc


def _emit_rows(url, doc):
    rows = []

    def walk(regions):
        for region in regions:
            for ls, line in enumerate(region.get("lines") or []):
                for ws, word in enumerate(line.get("words") or []):
                    rows.append((url, "word", word["id"], ws,
                                 word.get("text", ""),
                                 float(word.get("conf", 1.0))))
                rows.append((url, "line", line["id"], ls,
                             line.get("text", ""),
                             float(line.get("conf", 1.0))))
            rows.append((url, "region", region["id"], 0,
                         region.get("text", ""),
                         float(region.get("conf", 1.0))))
            walk(region.get("subregions", ()))

    walk(doc.get("regions", ()))
    return rows


ROLLUP_SCHEMA = ("url string, level string, element_id string, seq int, "
                 "text string, conf double")


def rollup_hierarchy_df(pages_df, level: str = "glyph",
                        overwrite: bool = True, xml_col: str = "xml"):
    """(url, xml binary) -> updated (url, level, element_id, seq, text,
    conf) rows for every word, line and region after the roll-up."""
    import pandas as pd

    from ..sources.pagexml import parse_page_hierarchy

    def gen(batches):
        for pdf in batches:
            rows = []
            for url, xml_b in zip(pdf["url"], pdf[xml_col]):
                doc = parse_page_hierarchy(xml_b)
                rollup_page(doc, level=level, overwrite=overwrite)
                rows.extend(_emit_rows(url, doc))
            yield pd.DataFrame(rows, columns=["url", "level", "element_id",
                                              "seq", "text", "conf"])

    return pages_df.select("url", xml_col).mapInPandas(gen,
                                                       schema=ROLLUP_SCHEMA)


# --- gate query: glyph->word->line->region roll-up with joins, hashed -------
#
# Construction from documents.text (pure SQL-derivable): words = the
# document's tokens in COMPLETE lines of 4 (remainder words dropped; every
# sf document has >= 10 words so every page gets >= 2 lines).  Every word
# carries per-character Glyphs whose conf is constant per word
# ((8 + g%5)/16, dyadic -> the glyph average is exactly that value; the
# level='glyph' roll-up recomputes words from glyphs).  Line conf is a
# 4-term exact dyadic sum / 4 (exact); region conf an exact sum / n_lines
# (one deterministic division) — every float in the output is bit-stable.
# When doc_id % 3 == 0 a Relation@type=join connects line 0's last word to
# line 1's first word, suppressing the newline between them (F9).

_WPL = 4


def a4_hierarchy_rollup(spark, sf_dir: str):
    import pandas as pd

    from ..sources.pagexml import make_hierarchy_xml

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    docs = fan_out(docs)

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = text.split(" ")
                lines = [words[k * _WPL:(k + 1) * _WPL]
                         for k in range(len(words) // _WPL)]
                join = int(doc_id) % 3 == 0 and len(lines) > 1
                xml = make_hierarchy_xml(lines, join_first_lines=join)
                rows.append((f"hier://{int(doc_id)}", xml.encode()))
            yield pd.DataFrame(rows, columns=["url", "xml"])

    pages = docs.mapInPandas(gen, schema="url string, xml binary")
    return rollup_hierarchy_df(pages)


# The oracle mirrors make_hierarchy_xml + rollup_page in SQL.  The region
# text concatenation prepends each line's separator to the element
# (string_agg separators must be constant), '' for line 0 and for the
# join-suppressed line 1 of doc_id % 3 == 0 pages.
_ORACLE_HIERARCHY = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
w AS (  -- one row per kept word: line k, word wi (within line), global g
  SELECT doc_id, CAST(g AS INT) AS g,
         CAST(g // {_WPL} AS INT) AS k,
         CAST(g % {_WPL} AS INT) AS wi,
         toks[CAST(g AS INT) + 1] AS word
  FROM d, UNNEST(range(0, (len(toks) // {_WPL}) * {_WPL})) r(g)
),
wconf AS (
  SELECT doc_id, g, k, wi, word, (8 + g % 5) / 16.0 AS conf
  FROM w
),
lines AS (
  SELECT doc_id, k,
         string_agg(word, ' ' ORDER BY wi) AS text,
         AVG(conf) AS conf
  FROM wconf GROUP BY doc_id, k
),
region AS (
  SELECT doc_id,
         string_agg(
           CASE WHEN k > 0 AND NOT (doc_id % 3 = 0 AND k = 1)
                THEN chr(10) ELSE '' END || text, '' ORDER BY k) AS rtext,
         AVG(conf) AS conf
  FROM lines GROUP BY doc_id
)
SELECT 'hier://' || CAST(doc_id AS VARCHAR) AS url, 'word' AS level,
       printf('w%04d', g) AS element_id, wi AS seq, word AS text, conf
FROM wconf
UNION ALL
SELECT 'hier://' || CAST(doc_id AS VARCHAR), 'line',
       printf('l%04d', k), k, text, conf
FROM lines
UNION ALL
SELECT 'hier://' || CAST(doc_id AS VARCHAR), 'region', 'r0', 0, rtext, conf
FROM region
"""

QUERIES = {"a4_hierarchy_rollup": a4_hierarchy_rollup}
ORACLES = {"a4_hierarchy_rollup": _ORACLE_HIERARCHY}

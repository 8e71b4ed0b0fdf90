"""A4/F9 hierarchy roll-up: glyph->word->line->region with join
suppression, traversal orders and overwrite semantics
(reference ocrd/cli.py:327-436)."""

from __future__ import annotations

from nmalign_spark.operators.hierarchy import rollup_page
from nmalign_spark.sources.pagexml import (make_hierarchy_xml,
                                           parse_page_hierarchy)


def _region(doc, rid="r0"):
    def find(regions):
        for r in regions:
            if r["id"] == rid:
                return r
            sub = find(r.get("subregions", ()))
            if sub:
                return sub
    return find(doc["regions"])


def test_glyph_word_line_region_rollup():
    lines = [["ab", "cde"], ["fg", "hi"]]
    doc = parse_page_hierarchy(make_hierarchy_xml(lines))
    rollup_page(doc)
    r = _region(doc)
    l0, l1 = r["lines"]
    # glyph->word: ''.join of glyph texts, conf = avg glyph conf
    assert [w["text"] for w in l0["words"]] == ["ab", "cde"]
    assert l0["words"][0]["conf"] == (8 + 0 % 5) / 16
    assert l0["words"][1]["conf"] == (8 + 1 % 5) / 16
    # word->line: ' '.join, conf = avg word conf
    assert l0["text"] == "ab cde"
    assert l0["conf"] == ((8 / 16) + (9 / 16)) / 2
    assert l1["text"] == "fg hi"
    assert l1["conf"] == ((10 / 16) + (11 / 16)) / 2
    # line->region: '\n'.join, conf = avg line conf
    assert r["text"] == "ab cde\nfg hi"
    assert r["conf"] == (l0["conf"] + l1["conf"]) / 2


def test_word_level_rollup():
    """level='word': word TextEquivs are authoritative (glyphs ignored),
    lines/regions synthesized from them (conf (4 + g%4)/8)."""
    lines = [["ab", "cde"], ["fg"]]
    doc = parse_page_hierarchy(make_hierarchy_xml(lines, word_level=True))
    rollup_page(doc, level="word")
    r = _region(doc)
    l0, l1 = r["lines"]
    assert l0["text"] == "ab cde" and l1["text"] == "fg"
    assert l0["conf"] == ((4 / 8) + (5 / 8)) / 2
    assert l1["conf"] == 6 / 8
    assert r["text"] == "ab cde\nfg"


def test_glyph_level_blanks_glyphless_words():
    """Faithful reference corner: at level='glyph' a word WITHOUT glyphs
    rolls up to '' (cli.py:411-416 joins over an empty glyph list and
    overwrites)."""
    lines = [["ab"]]
    doc = parse_page_hierarchy(make_hierarchy_xml(lines, word_level=True))
    rollup_page(doc, level="glyph")
    assert _region(doc)["lines"][0]["words"][0]["text"] == ""


def test_join_relation_suppresses_separator():
    """F9: Relation@type=join between line 0's last word and line 1's
    first word drops the newline (cli.py:429-434)."""
    lines = [["ab", "cde"], ["fg", "hi"], ["jk"]]
    doc = parse_page_hierarchy(make_hierarchy_xml(lines,
                                                  join_first_lines=True))
    assert doc["joins"] == [("w0001", "w0002")]
    rollup_page(doc)
    assert _region(doc)["text"] == "ab cdefg hi\njk"


def test_rtl_word_reversal():
    """Line-level readingDirection=right-to-left reverses the word order in
    the line text (cli.py:396-401) AND — faithfully — the glyph order
    within each word (the glyph check falls through word->line,
    cli.py:402-410)."""
    lines = [["one", "two", "three"]]
    doc = parse_page_hierarchy(make_hierarchy_xml(lines, rtl_words=True))
    rollup_page(doc)
    assert _region(doc)["lines"][0]["text"] == "eerht owt eno"
    # at level='word' glyphs are not consulted: word order reverses, the
    # word texts (from their own TextEquivs) do not
    doc2 = parse_page_hierarchy(make_hierarchy_xml(lines, rtl_words=True,
                                                   word_level=True))
    rollup_page(doc2, level="word")
    assert _region(doc2)["lines"][0]["text"] == "three two one"


def test_bottom_to_top_line_order():
    lines = [["first"], ["second"], ["third"]]
    doc = parse_page_hierarchy(make_hierarchy_xml(lines,
                                                  bottom_to_top=True))
    rollup_page(doc)
    assert _region(doc)["text"] == "third\nsecond\nfirst"


def test_overwrite_false_keeps_existing():
    lines = [["ab"]]
    doc = parse_page_hierarchy(make_hierarchy_xml(lines))
    r = _region(doc)
    r["text"], r["conf"], r["has_equiv"] = "KEEP ME", 0.25, True
    rollup_page(doc, overwrite=False)
    assert r["text"] == "KEEP ME" and r["conf"] == 0.25
    rollup_page(doc, overwrite=True)
    assert r["text"] == "ab"


def test_level_stops_rollup():
    """level='line' must not touch word/line texts, only regions up."""
    lines = [["ab", "cd"]]
    doc = parse_page_hierarchy(make_hierarchy_xml(lines))
    line = _region(doc)["lines"][0]
    line["text"], line["has_equiv"] = "PRESET LINE", True
    rollup_page(doc, level="line")
    assert line["text"] == "PRESET LINE"
    assert _region(doc)["text"] == "PRESET LINE"
    assert _region(doc)["lines"][0]["words"][0].get("text") == ""


def test_subregion_rollup_with_reading_order_and_join():
    """Nested regions: parent text = children joined '\\n' in ReadingOrder
    index order, join by region ids suppresses the separator; children are
    rolled up BEFORE the parent concatenates them (post-order)."""
    ns = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15"
    xml = f"""<?xml version="1.0"?>
<PcGts xmlns="{ns}"><Page>
  <ReadingOrder><OrderedGroup id="g0">
    <RegionRefIndexed index="1" regionRef="rA"/>
    <RegionRefIndexed index="0" regionRef="rB"/>
  </OrderedGroup></ReadingOrder>
  <Relations><Relation type="join">
    <SourceRegionRef regionRef="rB"/>
    <TargetRegionRef regionRef="rA"/>
  </Relation></Relations>
  <TextRegion id="parent">
    <TextRegion id="rA"><TextLine id="la"><TextEquiv>
      <Unicode>alpha text</Unicode></TextEquiv></TextLine></TextRegion>
    <TextRegion id="rB"><TextLine id="lb"><TextEquiv>
      <Unicode>beta text</Unicode></TextEquiv></TextLine></TextRegion>
  </TextRegion>
</Page></PcGts>"""
    doc = parse_page_hierarchy(xml)
    rollup_page(doc, level="line")
    parent = _region(doc, "parent")
    # rB (index 0) before rA (index 1), join (rB -> rA) suppresses '\n'
    assert parent["text"] == "beta textalpha text"


def test_gate_query_matches_duckdb(spark, sf_small):
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    import duckdb
    from driver_gate_sim import canon

    from nmalign_spark.operators.hierarchy import (_ORACLE_HIERARCHY,
                                                   a4_hierarchy_rollup)
    sdf = a4_hierarchy_rollup(spark, sf_small).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_small}/documents.parquet')")
    odf = con.execute(_ORACLE_HIERARCHY).fetchdf()
    assert canon(sdf) == canon(odf)


# --- reading-order edge parity: property test vs a direct transcription ----

import random as _random

_NS = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15"


def _attr(name, val):
    return f' {name}="{val}"' if val else ""


def _build_xml(page_attrs, regions):
    """Synthetic PAGE-XML with textLineOrder/readingDirection placed at
    ARBITRARY levels (page/region/line/word) — the inheritance chains of
    ocrd/cli.py:389-410 that the fixed-shape builder can't express."""
    g = 0
    rparts = []
    for ri, reg in enumerate(regions):
        lparts = []
        for li, line in enumerate(reg["lines"]):
            wparts = []
            for word in line["words"]:
                glyphs = "".join(
                    f'<Glyph id="w{g}_g{c}"><TextEquiv conf="0.5">'
                    f"<Unicode>{ch}</Unicode></TextEquiv></Glyph>"
                    for c, ch in enumerate(word["chars"]))
                wparts.append(f'<Word id="w{g:04d}"'
                              f'{_attr("readingDirection", word["rd"])}>'
                              f"{glyphs}</Word>")
                g += 1
            lparts.append(f'<TextLine id="l{ri}_{li}"'
                          f'{_attr("readingDirection", line["rd"])}>'
                          + "".join(wparts) + "</TextLine>")
        rparts.append(f'<TextRegion id="r{ri}"'
                      f'{_attr("textLineOrder", reg["tlo"])}'
                      f'{_attr("readingDirection", reg["rd"])}>'
                      + "".join(lparts) + "</TextRegion>")
    return (f'<?xml version="1.0" encoding="UTF-8"?><PcGts xmlns="{_NS}">'
            f'<Page imageWidth="9" imageHeight="9"'
            f'{_attr("textLineOrder", page_attrs["tlo"])}'
            f'{_attr("readingDirection", page_attrs["rd"])}>'
            + "".join(rparts) + "</Page></PcGts>")


def _ref_expected(page, regions):
    """Direct transcription of the reference traversal
    (ocrd/cli.py:389-431): region/page textLineOrder fallback reverses
    lines; word<-line<-region<-page readingDirection fallback reverses
    words and glyphs; line text joins words with ' ', region text joins
    lines with newline (no join relations here)."""
    out = {}
    for ri, reg in enumerate(regions):
        lines = list(reg["lines"])
        if (reg["tlo"] or page["tlo"]) == "bottom-to-top":
            lines = list(reversed(lines))
        line_texts = []
        for line in lines:
            words = list(line["words"])
            if (line["rd"] or reg["rd"] or page["rd"]) == "right-to-left":
                words = list(reversed(words))
            wtexts = []
            for word in words:
                chars = list(word["chars"])
                if (word["rd"] or line["rd"] or reg["rd"]
                        or page["rd"]) == "right-to-left":
                    chars = list(reversed(chars))
                wtexts.append("".join(chars))
            line_texts.append(" ".join(wtexts))
        out[f"r{ri}"] = "\n".join(line_texts)
    return out


def test_reading_order_inheritance_parity():
    """500 random pages with textLineOrder/readingDirection planted at
    random levels: rollup_page must reproduce the reference traversal's
    text for every region (order fallbacks, overrides like an explicit
    top-to-bottom region under a bottom-to-top page, RTL fallthrough to
    glyphs)."""
    rng = _random.Random(42)
    tlo_choices = [None, "bottom-to-top", "top-to-bottom"]
    rd_choices = [None, "right-to-left", "left-to-right"]
    alpha = "abcdefg"
    for trial in range(500):
        page = {"tlo": rng.choice(tlo_choices), "rd": rng.choice(rd_choices)}
        regions = []
        for _ in range(rng.randint(1, 2)):
            lines = []
            for _ in range(rng.randint(1, 3)):
                words = []
                for _ in range(rng.randint(1, 3)):
                    words.append({
                        "chars": [rng.choice(alpha)
                                  for _ in range(rng.randint(1, 3))],
                        "rd": rng.choice(rd_choices)})
                lines.append({"words": words, "rd": rng.choice(rd_choices)})
            regions.append({"lines": lines, "tlo": rng.choice(tlo_choices),
                            "rd": rng.choice(rd_choices)})
        xml = _build_xml(page, regions)
        doc = parse_page_hierarchy(xml)
        rollup_page(doc, level="glyph")
        got = {r["id"]: r["text"] for r in doc["regions"]}
        want = _ref_expected(page, regions)
        assert got == want, (trial, page, regions, got, want)

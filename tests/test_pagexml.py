"""PAGE-XML source (S4 fidelity): extraction semantics + the reference's
property assertions ported onto synthetic PAGE workspaces.

Reference model: /root/reference/nmalign/ocrd/cli.py:187-215 (line scan +
region fallback), 293-304 (first-TextEquiv projections), and the pytest
properties of /root/reference/tests/test_all.py:111-147 (short-line
tolerance, coverage, index-0 insertion analog)."""

from __future__ import annotations

import numpy as np
import pytest

from nmalign_spark.sources.pagexml import (make_page_xml, pagexml_segments_df,
                                           parse_page_lines)

LINES = ["Was ist Aufklärung?",
         "Der Ausgang des Menschen aus seiner",
         "selbstverschuldeten Unmündigkeit & mehr",
         "ok",
         "Habe Mut dich deines eigenen Verstandes zu bedienen"]


def test_flat_lines_roundtrip():
    xml = make_page_xml(LINES)
    got = parse_page_lines(xml)
    assert [t for _, t, _ in got] == LINES
    assert [i for i, _, _ in got] == [f"l{j:04d}" for j in range(len(LINES))]
    assert all(c == 1.0 for _, _, c in got)


def test_first_textequiv_wins_and_conf():
    confs = [(8 + j % 5) / 16 for j in range(len(LINES))]
    xml = make_page_xml(LINES, confs=confs, junk_equiv=True)
    got = parse_page_lines(xml)
    assert [t for _, t, _ in got] == LINES          # junk equiv ignored
    assert [c for _, _, c in got] == confs


def test_nested_region_traversal_order():
    """get_AllTextLines order: a region's own lines precede its nested
    subregions' lines (document order)."""
    xml = make_page_xml(LINES, nested=True)
    got = [t for _, t, _ in parse_page_lines(xml)]
    expect = [s for j, s in enumerate(LINES) if j % 2 == 0] + \
             [s for j, s in enumerate(LINES) if j % 2 == 1]
    assert got == expect


def test_region_fallback_crlf_split():
    """No TextLines at all -> region TextEquiv split on CRLF
    (ocrd/cli.py:200-207); literal CRLF must be serialized as &#13;&#10;
    to survive XML line-ending normalization."""
    xml = make_page_xml(LINES, region_fallback=True)
    assert "&#13;&#10;" in xml
    got = parse_page_lines(xml)
    assert [t for _, t, _ in got] == LINES
    assert [i for i, _, _ in got] == [f"r0_l{j:04d}"
                                      for j in range(len(LINES))]


def test_malformed_and_empty_inputs():
    assert parse_page_lines(None) == []
    assert parse_page_lines(b"") == []
    assert parse_page_lines(b"<PcGts><unclosed") == []
    assert parse_page_lines(b"<PcGts><Page/></PcGts>") == []
    # TextLine with no TextEquiv at all -> '' text, conf 1.0
    xml = ('<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/'
           'pagecontent/2019-07-15"><Page><TextRegion id="r">'
           '<TextLine id="l1"/></TextRegion></Page></PcGts>')
    assert parse_page_lines(xml) == [("l1", "", 1.0)]


def test_entity_unescaping():
    xml = make_page_xml(["a &amp; b" .replace("&amp;", "&")])
    assert parse_page_lines(xml)[0][1] == "a & b"


# --- reference property suite on a synthetic PAGE workspace ----------------

_CONFUSIONS = [("s", "ſ"), ("ä", "aͤ"), ("o", "0"), ("e", "c"), ("rn", "m")]
_NORMALIZATION = {"ſ": "s", "aͤ": "ä", "0": "o"}


def _ocr_noise(s: str, rng) -> str:
    for src, dst in _CONFUSIONS:
        if rng.random() < 0.4 and src in s:
            s = s.replace(src, dst, 1)
    return s


@pytest.fixture(scope="module")
def aligned_workspace(spark):
    """OCR PAGE-XML (side 1) vs ground-truth PAGE-XML (side 2) for 12
    synthetic pages, aligned through the full Spark path: pagexml source ->
    long segments -> align_segments."""
    from nmalign_spark.operators.align import align_segments

    rng = np.random.default_rng(1784)
    vocab = ("aufklärung ausgang menschen unmündigkeit verstand mut zeile "
             "druck seite buch satz wort absatz kapitel text").split()
    rows1, rows2, gt = [], [], {}
    for p in range(12):
        n = int(rng.integers(4, 9))
        lines = [" ".join(rng.choice(vocab,
                                     size=int(rng.integers(3, 7))))
                 for _ in range(n)]
        if rng.random() < 0.4:
            lines.insert(int(rng.integers(0, n)), "ok")   # short line
        ocr = [_ocr_noise(s, rng) for s in lines]
        url = f"ws://page{p:04d}"
        gt[url] = lines
        rows1.append((url, make_page_xml(ocr).encode()))
        rows2.append((url, make_page_xml(lines).encode()))
    df1 = spark.createDataFrame(rows1, "url string, xml binary")
    df2 = spark.createDataFrame(rows2, "url string, xml binary")
    seg1 = pagexml_segments_df(df1, side=1) \
        .select("url", "side", "seq_no", "seg_text")
    seg2 = pagexml_segments_df(df2, side=2) \
        .select("url", "side", "seq_no", "seg_text")
    out = align_segments(seg1.unionByName(seg2),
                         normalization=_NORMALIZATION,
                         try_subseg=True).toPandas()
    return out, gt


def test_property_index0_insertion_analog(aligned_workspace):
    """test_all.py:134-141 analog: every matched line carries the inserted
    replacement text (our ``extracted``) with a score in (0, 1]."""
    out, gt = aligned_workspace
    matched = out[out["j"] >= 0]
    assert len(matched) > 0
    assert matched["extracted"].notna().all()
    assert ((matched["score"] > 0) & (matched["score"] <= 1.0)).all()
    for _, r in matched.iterrows():
        assert r["extracted"] in gt[r["url"]][r["line_no"]]


def test_property_short_line_tolerance(aligned_workspace):
    """test_all.py:111-113,142-143: unmatched segments are only tolerated
    when the segment is short (<= 4 chars)."""
    out, _ = aligned_workspace
    unmatched = out[out["j"] < 0]
    assert (unmatched["seg_text"].str.len() <= 4).all(), \
        unmatched["seg_text"].tolist()


def test_property_coverage(aligned_workspace):
    """test_all.py coverage analog: >= 95% of long segments matched."""
    out, _ = aligned_workspace
    long_segs = out[out["seg_text"].str.len() > 4]
    assert (long_segs["j"] >= 0).mean() >= 0.95


def test_gate_query_matches_duckdb(spark, sf_small):
    """The s4_pagexml_lines roundtrip hash-matches its SQL oracle."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    import duckdb
    from driver_gate_sim import canon

    from nmalign_spark.operators.relational import (ORACLE_S4_PAGEXML,
                                                    s4_pagexml_lines)
    sdf = s4_pagexml_lines(spark, sf_small).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_small}/documents.parquet')")
    odf = con.execute(ORACLE_S4_PAGEXML).fetchdf()
    assert canon(sdf) == canon(odf)

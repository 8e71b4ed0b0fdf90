"""PDF text-extraction source: byte-exact segments from generated PDFs,
robustness on garbage, and end-to-end flow into the alignment kernel."""

import zlib

import pytest

from nmalign_spark.operators.align import align_segments
from nmalign_spark.sources.pdf import (extract_pdf_segments, looks_like_pdf,
                                       make_simple_pdf, pdf_segments_df)

LINES = ["Was ist Aufklärung?",
         "Der Ausgang des Menschen (aus seiner) selbst",
         "verschuldeten Unmündigkeit."]


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip_exact(compress):
    pdf = make_simple_pdf(LINES, compress=compress)
    assert looks_like_pdf(pdf)
    # latin-1 encoding in the generator folds non-latin chars; compare on
    # the latin-1-representable projection
    want = [s.encode("latin-1", errors="replace").decode("latin-1")
            for s in LINES]
    assert extract_pdf_segments(pdf) == want


def test_escapes_and_octal():
    pdf = make_simple_pdf([r"a(b)c\d", "tab\tend"])
    got = extract_pdf_segments(pdf)
    assert got[0] == r"a(b)c\d"
    assert got[1] == "tab end"          # whitespace collapsed


def _raw_pdf(content: bytes) -> bytes:
    return (b"%PDF-1.4\n4 0 obj\n<< /Length " +
            str(len(content)).encode() + b" >>\nstream\n" + content +
            b"\nendstream\nendobj\n%%EOF\n")


def test_tj_array_and_tstar():
    content = (b"BT /F1 12 Tf 72 720 Td "
               b"[(Hel) -20 (lo)] TJ T* (world) Tj ET")
    assert extract_pdf_segments(_raw_pdf(content)) == ["Hello", "world"]


def test_quote_operator_breaks_before_show():
    """(s) ' means NEWLINE-THEN-SHOW — the common one-quote-per-line idiom
    must not merge lines."""
    content = b"BT (line1) Tj (line2) ' (line3) ' ET"
    assert extract_pdf_segments(_raw_pdf(content)) \
        == ["line1", "line2", "line3"]
    # ' as the first show of a block: no phantom empty line
    assert extract_pdf_segments(_raw_pdf(b"BT (only) ' ET")) == ["only"]
    # Tj after ' continues on the same line
    assert extract_pdf_segments(_raw_pdf(b"BT (a) ' (b) Tj ET")) == ["ab"]


def test_leading_dot_negative_td_breaks_line():
    """Generators emitting leading-dot reals (-.5) must still break lines."""
    content = b"BT (first) Tj 0 -.5 Td (second) Tj ET"
    assert extract_pdf_segments(_raw_pdf(content)) == ["first", "second"]


def test_garbage_never_raises():
    assert extract_pdf_segments(None) == []
    assert extract_pdf_segments(b"") == []
    assert extract_pdf_segments(b"not a pdf at all") == []
    assert extract_pdf_segments(b"%PDF-1.4\ngarbage stream\nendstream") == []
    # flate header but corrupt body
    bad = (b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode >>\nstream\n"
           b"\x78\x9cBROKEN\nendstream\nendobj\n")
    assert extract_pdf_segments(bad) == []


def test_flate_content_parses():
    content = b"BT (zipped line) Tj ET"
    body = zlib.compress(content)
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(body)).encode() +
           b" /Filter /FlateDecode >>\nstream\n" + body +
           b"\nendstream\nendobj\n%%EOF\n")
    assert extract_pdf_segments(pdf) == ["zipped line"]


def test_pdf_flows_into_align_kernel(spark):
    """PDF segments + reference lines through the standard align path."""
    ref_lines = ["Was ist Aufklärung?", "Der Ausgang des Menschen"]
    noisy = ["Waſ ist Aufklarung?", "Der Ausgang des Menschen"]
    pdf = make_simple_pdf(noisy, compress=True)
    pages = spark.createDataFrame([("u1", pdf)], "url string, html binary")
    segs1 = pdf_segments_df(pages)
    refs = spark.createDataFrame(
        [("u1", 2, i, s) for i, s in enumerate(ref_lines)],
        "url string, side int, seq_no int, seg_text string")
    out = align_segments(segs1.unionByName(refs),
                         normalization={"ſ": "s"}).toPandas()
    out = out.sort_values("i").reset_index(drop=True)
    assert list(out["j"]) == [0, 1]
    assert out["extracted"].tolist() == ref_lines
    assert out["score"].iloc[1] == 1.0

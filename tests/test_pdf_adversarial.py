"""Adversarial PDF fixtures: the parser must never raise on ANY input
(executor-safety contract, sources/pdf.py module docstring) and the
unsupported classes must be detected and counted, not silently dropped."""

from __future__ import annotations

import zlib

import numpy as np

from nmalign_spark.sources.pdf import (extract_pdf_segments, make_simple_pdf,
                                       pdf_extraction_metrics)


def _never_raises(blob):
    segs = extract_pdf_segments(blob)
    assert isinstance(segs, list)
    assert all(isinstance(s, str) for s in segs)
    met = pdf_extraction_metrics(blob)
    assert isinstance(met, dict) and met["segments"] == len(segs)
    return segs


# --- crafted fixtures -------------------------------------------------------

def test_hex_strings_supported():
    body = (b"BT\n72 720 Td\n<48656C6C6F 20776F726C64> Tj\n"
            b"0 -14 Td\n<4869> Tj\nET")
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(body)).encode()
           + b" >>\nstream\n" + body + b"\nendstream\nendobj\n%%EOF")
    assert _never_raises(pdf) == ["Hello world", "Hi"]


def test_hex_odd_digit_padded_and_mixed_tj_array():
    body = b"BT\n[(A) -250 <4> (B)] TJ\nET"  # <4> pads to 0x40 = '@'
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(body)).encode()
           + b" >>\nstream\n" + body + b"\nendstream\n%%EOF")
    assert _never_raises(pdf) == ["A@B"]


def test_malformed_xref_still_extracts():
    """The parser never trusts the xref table: garbage offsets and a
    missing trailer must not stop content-stream extraction."""
    pdf = bytearray(make_simple_pdf(["alpha", "beta"]))
    i = pdf.find(b"xref")
    mangled = bytes(pdf[:i]) + b"xref\n0 99\nGARBAGE OFFSETS\n%%EOF"
    assert _never_raises(mangled) == ["alpha", "beta"]


def test_truncated_stream_detected():
    pdf = make_simple_pdf(["alpha", "beta"])
    cut = pdf[:pdf.find(b"endstream")]          # stream never terminated
    segs = _never_raises(cut)
    assert segs == []
    assert pdf_extraction_metrics(cut)["truncated_streams"] == 1


def test_corrupt_flate_counted():
    pdf = bytearray(make_simple_pdf(["gamma delta"], compress=True))
    i = pdf.find(b"stream\n") + len(b"stream\n")
    pdf[i:i + 4] = b"\x00\xff\x00\xff"          # destroy the zlib header
    blob = bytes(pdf)
    assert _never_raises(blob) == []
    assert pdf_extraction_metrics(blob)["flate_errors"] == 1


def test_unsupported_classes_counted():
    pdf = (b"%PDF-1.5\n"
           b"1 0 obj\n<< /Type /ObjStm /N 3 /Length 4 >>\n"
           b"stream\nXXXX\nendstream\nendobj\n"
           b"2 0 obj\n<< /Subtype /Type0 /BaseFont /Foo >>\nendobj\n"
           b"trailer\n<< /Encrypt 9 0 R /Size 3 >>\n%%EOF")
    met = pdf_extraction_metrics(pdf)
    assert met["is_pdf"] == 1
    assert met["encrypted"] == 1
    assert met["object_streams"] == 1
    assert met["type0_fonts"] == 1
    _never_raises(pdf)


def test_non_pdf_inputs():
    for blob in (None, b"", b"hello", b"%PDF", b"%PDF-1.4",
                 b"\x00" * 64, "not-even-bytes-no-wait-it-is".encode()):
        met = pdf_extraction_metrics(blob)
        assert extract_pdf_segments(blob) == []
        assert met["segments"] == 0


def test_pathological_tokens():
    cases = [
        b"BT (unterminated \\",                 # dangling escape at EOF
        b"BT ((nested)) Tj ET",                 # parens nesting
        b"BT (\\999\\8\\777) Tj ET",            # octal overflow + bad escape
        b"BT 1e309 0 Td (x) Tj ET",             # float('1e309') -> inf? no:
                                                # token regex splits it; must
                                                # still not raise
        b"BT [<zz>] TJ ET",                     # non-hex inside <> (regex
                                                # rejects the token entirely)
        b"BT " + b"0 " * 10000 + b"(deep) Tj ET",
        b"BT <<>> (dict-in-text) Tj ET",
    ]
    for body in cases:
        pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(body)).encode()
               + b" >>\nstream\n" + body + b"\nendstream\n%%EOF")
        _never_raises(pdf)


# --- fuzz campaigns ---------------------------------------------------------

def test_fuzz_truncation_every_boundary():
    """Every prefix of a well-formed PDF (both variants) parses without an
    exception."""
    for compress in (False, True):
        pdf = make_simple_pdf(["alpha beta", "gamma (x) \\ delta"],
                              compress=compress)
        for i in range(0, len(pdf), 7):
            _never_raises(pdf[:i])
        _never_raises(pdf)


def test_fuzz_random_mutations():
    """Random byte flips / insertions / deletions over valid PDFs: the
    extraction is garbage-in-garbage-out but never an exception."""
    rng = np.random.default_rng(57005)
    bases = [make_simple_pdf([f"line {i} with words" for i in range(5)],
                             compress=c) for c in (False, True)]
    for _ in range(400):
        blob = bytearray(bases[int(rng.integers(0, len(bases)))])
        for _ in range(int(rng.integers(1, 6))):
            op = rng.random()
            pos = int(rng.integers(0, len(blob)))
            if op < 0.5:
                blob[pos] = int(rng.integers(0, 256))
            elif op < 0.75:
                blob.insert(pos, int(rng.integers(0, 256)))
            elif len(blob) > 1:
                del blob[pos]
        _never_raises(bytes(blob))


def test_fuzz_random_garbage_with_pdf_magic():
    rng = np.random.default_rng(8086)
    for _ in range(200):
        n = int(rng.integers(10, 2000))
        blob = b"%PDF-1.4\n" + rng.integers(0, 256, size=n,
                                            dtype=np.uint8).tobytes()
        _never_raises(blob)

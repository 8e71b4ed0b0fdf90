"""PDF text extraction source (north_rule: "HTML boilerplate strip,
PDF/layout parse, DOM heuristics").

A minimal, deterministic, dependency-free PDF content-stream parser —
stdlib only (``zlib`` for FlateDecode), suitable for the huge share of
crawl PDFs that are simple text PDFs:

* object scan: ``N 0 obj ... stream\\r?\\n <bytes> endstream``; streams whose
  dict carries ``/FlateDecode`` are inflated, others taken raw;
* text extraction per ``BT ... ET`` block: ``(s) Tj``, ``(s) '``,
  ``[(a) -250 (b)] TJ`` show text; ``Td/TD/T*`` line moves with negative
  ``ty`` (or ``T*``/``'``) start a new line; other operators are ignored;
* PDF string escapes handled: ``\\(`` ``\\)`` ``\\\\`` ``\\n`` ``\\r``
  ``\\t`` ``\\b`` ``\\f`` octal ``\\ddd``, line continuations.

Layout model: one output segment per text LINE (blocks merged in stream
order) — the same "candidate segments" contract the HTML extractor
produces (sources/segments.py), so PDFs flow into the identical
``align_segments`` / ``align_pages`` kernels unchanged.

Unsupported (fall back to empty output, never an exception, so a poison
PDF cannot kill an executor task): encrypted PDFs, CID/Type0 composite
fonts with binary ToUnicode maps, object streams (PDF 1.5 compressed
xref). These are logged by count in the extraction metrics rather than
failing the job.

The parser is exercised against PDFs built by :func:`make_simple_pdf`
(uncompressed and Flate variants) in tests/test_pdf.py — byte-exact
expected segments.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["extract_pdf_segments", "make_simple_pdf", "pdf_segments_df",
           "looks_like_pdf", "pdf_extraction_metrics", "pdf_metrics_df"]

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)
_TEXTBLOCK_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
# tokens inside a text block we care about: strings, arrays, operators, numbers
_TOKEN_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)"           # literal string (with escapes)
    rb"|<[0-9A-Fa-f\s]*>"              # hex string (<48656C6C6F> Tj)
    rb"|\[|\]"                         # array delimiters
    rb"|-?(?:\d+\.?\d*|\.\d+)"         # number (incl. leading-dot reals -.5)
    rb"|[A-Za-z'\"*]+")                # operator


def looks_like_pdf(data: bytes | None) -> bool:
    return bool(data) and data[:5] == b"%PDF-"


def _unescape(raw: bytes) -> str:
    """Decode a PDF literal string body (between parens)."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c != 0x5C:  # backslash
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= n:
            break
        e = raw[i]
        simple = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
                  0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}
        if e in simple:
            out.append(simple[e])
            i += 1
        elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
            j = i
            while j < n and j < i + 3 and 0x30 <= raw[j] <= 0x37:
                j += 1
            out.append(int(raw[i:j], 8) & 0xFF)
            i = j
        elif e in (10, 13):      # line continuation
            i += 1
            if e == 13 and i < n and raw[i] == 10:
                i += 1
        else:                    # unknown escape: literal char
            out.append(e)
            i += 1
    # simple text PDFs are latin-1/WinAnsi-ish; errors never raise
    return out.decode("latin-1", errors="replace")


def _unhex(raw: bytes) -> str:
    """Decode a PDF hex string body (between angle brackets): whitespace
    ignored, odd trailing digit padded with 0 (PDF 32000 §7.3.4.3)."""
    digits = re.sub(rb"\s+", b"", raw)
    if len(digits) % 2:
        digits += b"0"
    try:
        return bytes.fromhex(digits.decode("ascii")).decode(
            "latin-1", errors="replace")
    except ValueError:
        return ""


def _block_lines(block: bytes) -> list[list[str]]:
    """Token-walk one BT..ET block -> list of lines (lists of show strings)."""
    lines: list[list[str]] = [[]]
    nums: list[float] = []
    in_array = False
    for m in _TOKEN_RE.finditer(block):
        tok = m.group(0)
        if tok.startswith(b"("):
            s = _unescape(tok[1:-1])
            lines[-1].append(s)
            continue
        if tok.startswith(b"<"):
            lines[-1].append(_unhex(tok[1:-1]))
            continue
        if tok == b"[":
            in_array = True
            continue
        if tok == b"]":
            in_array = False
            continue
        if tok[0:1].isdigit() or tok[0:1] in (b"-", b"."):
            if not in_array:
                nums.append(float(tok))
            continue
        op = tok
        if op in (b"Td", b"TD"):
            ty = nums[-1] if nums else 0.0
            if ty < 0 and lines[-1]:
                lines.append([])
        elif op == b"T*":
            if lines[-1]:
                lines.append([])
        elif op in (b"'", b'"'):
            # (s) ' means NEWLINE THEN SHOW — the string token was already
            # appended, so move it onto its own fresh line
            if lines[-1]:
                last = lines[-1].pop()
                if lines[-1]:
                    lines.append([last])
                else:
                    lines[-1] = [last]
        elif op == b"Tm":
            # absolute matrix: treat as a new line if text already shown
            if lines[-1]:
                lines.append([])
        nums.clear()
    return [ln for ln in lines if ln]


def extract_pdf_segments(pdf_bytes: bytes | None) -> list[str]:
    """PDF bytes -> candidate text segments (one per layout line).

    Pure function of the bytes; returns [] for anything it cannot parse
    (never raises — executor-safe)."""
    if not looks_like_pdf(pdf_bytes):
        return []
    segs: list[str] = []
    try:
        pos = 0
        data = pdf_bytes
        while True:
            m = _STREAM_RE.search(data, pos)
            if not m:
                break
            start = m.end()
            end = data.find(b"endstream", start)
            if end < 0:
                break
            body = data[start:end]
            pos = end + len(b"endstream")
            if b"/FlateDecode" in m.group(1):
                # decompressobj tolerates the trailing EOL before
                # ``endstream`` — compressed bytes may themselves end in
                # 0x0A/0x0D, so stripping newlines first would corrupt them
                try:
                    body = zlib.decompressobj().decompress(body)
                except zlib.error:
                    continue
            else:
                body = body.rstrip(b"\r\n")
            for tb in _TEXTBLOCK_RE.finditer(body):
                for line in _block_lines(tb.group(1)):
                    text = "".join(line).strip()
                    if text:
                        segs.append(re.sub(r"[ \t]+", " ", text))
    except Exception:
        return []
    return segs


def pdf_extraction_metrics(pdf_bytes: bytes | None) -> dict:
    """Per-document extraction diagnostics — the "logged by count" side of
    the unsupported-classes contract (module docstring): a poison PDF never
    raises, it shows up in these counters instead.

    Keys: ``is_pdf``, ``encrypted`` (/Encrypt in a trailer dict),
    ``object_streams`` (/ObjStm — PDF 1.5 compressed xref, unsupported),
    ``type0_fonts`` (/Type0 composite fonts — text from them is likely
    garbage without a ToUnicode map), ``streams``, ``flate_errors``
    (FlateDecode streams that failed to inflate), ``truncated_streams``
    (stream with no matching endstream), ``text_blocks``, ``segments``.
    """
    m = {"is_pdf": 0, "encrypted": 0, "object_streams": 0, "type0_fonts": 0,
         "streams": 0, "flate_errors": 0, "truncated_streams": 0,
         "text_blocks": 0, "segments": 0}
    if not looks_like_pdf(pdf_bytes):
        return m
    m["is_pdf"] = 1
    data = pdf_bytes
    try:
        m["encrypted"] = int(b"/Encrypt" in data)
        m["object_streams"] = data.count(b"/ObjStm")
        m["type0_fonts"] = data.count(b"/Type0")
        pos = 0
        while True:
            sm = _STREAM_RE.search(data, pos)
            if not sm:
                break
            m["streams"] += 1
            start = sm.end()
            end = data.find(b"endstream", start)
            if end < 0:
                m["truncated_streams"] += 1
                break
            body = data[start:end]
            pos = end + len(b"endstream")
            if b"/FlateDecode" in sm.group(1):
                try:
                    body = zlib.decompressobj().decompress(body)
                except zlib.error:
                    m["flate_errors"] += 1
                    continue
            m["text_blocks"] += len(_TEXTBLOCK_RE.findall(body))
        m["segments"] = len(extract_pdf_segments(pdf_bytes))
    except Exception:
        pass
    return m


_METRICS_SCHEMA = ("url string, is_pdf int, encrypted int, "
                   "object_streams int, type0_fonts int, streams int, "
                   "flate_errors int, truncated_streams int, "
                   "text_blocks int, segments int")


def pdf_metrics_df(pages_df, pdf_col: str = "html"):
    """Corpus-level extraction diagnostics: one row per document with the
    :func:`pdf_extraction_metrics` counters — aggregate to see how much of
    a crawl the parser can and cannot handle, instead of silently dropping
    the unsupported share.  One narrow ``mapInPandas``."""
    import pandas as pd

    keys = ["is_pdf", "encrypted", "object_streams", "type0_fonts",
            "streams", "flate_errors", "truncated_streams", "text_blocks",
            "segments"]

    def gen(batches):
        for pdf in batches:
            rows = []
            for url, blob in zip(pdf["url"], pdf[pdf_col]):
                met = pdf_extraction_metrics(blob)
                rows.append((url, *[met[k] for k in keys]))
            yield pd.DataFrame(rows, columns=["url", *keys])

    return pages_df.select("url", pdf_col).mapInPandas(
        gen, schema=_METRICS_SCHEMA)


def make_simple_pdf(lines: list[str], compress: bool = False) -> bytes:
    """Deterministic single-page text PDF for tests/fixtures.

    One BT block, one Td-advanced line per input string."""
    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append("0 -14 Td")
        ops.append(f"({esc(line)}) Tj")
    ops.append("ET")
    content = "\n".join(ops).encode("latin-1", errors="replace")
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/MediaBox [0 0 612 792] >>\nendobj\n",
        b"4 0 obj\n<< /Length " + str(len(content)).encode() + filt +
        b" >>\nstream\n" + content + b"\nendstream\nendobj\n",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for o in objs:
        offsets.append(len(out))
        out += o
    xref = len(out)
    out += b"xref\n0 5\n0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n"
            + str(xref).encode() + b"\n%%EOF\n")
    return bytes(out)


def pdf_segments_df(pages_df, pdf_col: str = "html"):
    """pages-with-pdf-bytes -> canonical long segments table (side 1).

    Same contract as ``segments_from_pages`` so the output feeds
    ``align_segments`` directly; one narrow ``mapInPandas``, no shuffle."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            urls, sides, seqs, texts = [], [], [], []
            for url, blob in zip(pdf["url"], pdf[pdf_col]):
                for k, seg in enumerate(extract_pdf_segments(blob)):
                    urls.append(url)
                    sides.append(1)
                    seqs.append(k)
                    texts.append(seg)
            yield pd.DataFrame({"url": urls, "side": sides,
                                "seq_no": seqs, "seg_text": texts})

    return pages_df.select("url", pdf_col).mapInPandas(
        gen, schema="url string, side int, seq_no int, seg_text string")

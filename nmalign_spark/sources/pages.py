"""Deterministic synthetic Common-Crawl-style pages table.

Produces the exact input shape mandated by BASELINE.json ``input_hint``::

    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

derived 1:1 from the driver-provided ``documents`` parquet
(/root/testdata/sf*/documents.parquet) so tests/benches at every scale factor
use driver data, never hand-rolled corpora.  Generation runs distributed
(``mapInPandas`` over the documents scan — no driver-side loops, no shuffle)
and is deterministic per ``doc_id`` (seeded numpy Generator), so the same
page is produced regardless of partitioning, executor count, or run order.

Noise model mirrors the reference test corpus properties (FIXTURES.md §1;
/root/reference/tests/test_all.py:16-26, 50-52; nmalign/ocrd/cli.py:219-226):

* ``text``  — clean reference lines (l2): 4–8 words per line, occasional
  short (<=4 char) lines that may legitimately stay unmatched;
* ``html``  — boilerplate (head/script/nav/footer) wrapping one ``<p>`` per
  candidate segment (l1): OCR-style confusions (s→ſ, ä→aͤ, o→0, e→c, rn→m),
  ~10% of lines split into 2–3 segments (exercises try_subseg), ~5% dropped,
  a few adjacent swaps (exercises the monotonicity bonus), plus junk
  segments.
"""

from __future__ import annotations

import datetime
import html as _html
from collections.abc import Iterator

import numpy as np
import pandas as pd

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

# OCR-style confusions; several are inverses of the reference normalization
# map (test_all.py:16-26) so normalization measurably improves scores
_CONFUSIONS = [("s", "ſ"), ("ä", "aͤ"), ("ö", "oͤ"), ("ü", "uͤ"),
               ("o", "0"), ("e", "c"), ("rn", "m"), ("l", "1")]

_BASE_TS = datetime.datetime(2025, 3, 1, 0, 0, 0)

_BOILER_HEAD = ("<html><head><title>Synthetic page {doc_id}</title>"
                "<script>var t=window.track&&track('{doc_id}');</script>"
                "<style>.c{{margin:0}}</style></head><body>"
                "<nav><a href=\"/\">home</a> <a href=\"/about\">about</a></nav>"
                "<header><h1>site {site}</h1></header>")
_BOILER_FOOT = ("<footer>&copy; 2025 example.org &middot; "
                "<a href=\"/imprint\">imprint</a></footer></body></html>")


def _reflow(text: str, rng: np.random.Generator) -> list[str]:
    """Deterministically reflow a document's words into reference lines."""
    words = text.split()
    lines: list[str] = []
    i = 0
    while i < len(words):
        k = int(rng.integers(4, 9))
        lines.append(" ".join(words[i:i + k]))
        i += k
    if len(lines) < 2:
        lines = lines or ["empty document placeholder line"]
    # occasional short reference line (<=4 chars, allowed to stay unmatched)
    if rng.random() < 0.3 and lines:
        pos = int(rng.integers(0, len(lines) + 1))
        lines.insert(pos, str(rng.choice(["ok", "no", "§ 7", "Id.", "42"])))
    return lines


def _noise(s: str, rng: np.random.Generator) -> str:
    """Apply OCR-style character noise, deterministically."""
    for src, dst in _CONFUSIONS:
        if rng.random() < 0.35 and src in s:
            # replace a random subset of occurrences
            parts = s.split(src)
            out = parts[0]
            for p in parts[1:]:
                out += (dst if rng.random() < 0.5 else src) + p
            s = out
    # sporadic single-char edits
    chars = list(s)
    n_edits = int(rng.binomial(max(len(chars), 1), 0.02))
    for _ in range(n_edits):
        pos = int(rng.integers(0, len(chars)))
        op = rng.random()
        if op < 0.4 and chars[pos] != " ":
            chars[pos] = chr(ord("a") + int(rng.integers(0, 26)))
        elif op < 0.7:
            chars.insert(pos, chr(ord("a") + int(rng.integers(0, 26))))
        elif chars[pos] != " ":
            del chars[pos]
    return "".join(chars)


def _segments_from_lines(lines: list[str], rng: np.random.Generator) -> list[str]:
    """Candidate (l1) segments: noisy, some lines split 2–3 ways, some
    dropped, a few adjacent swaps, plus junk."""
    segs: list[str] = []
    for line in lines:
        r = rng.random()
        words = line.split()
        if r < 0.05 and len(lines) > 3:
            continue  # dropped content
        if r < 0.15 and len(words) >= 6:
            # split into 2-3 segments (reference may re-merge via subseg)
            n = 2 if len(words) < 9 else int(rng.integers(2, 4))
            bounds = sorted(rng.choice(np.arange(1, len(words)), size=n - 1,
                                       replace=False).tolist())
            prev = 0
            for b in bounds + [len(words)]:
                segs.append(_noise(" ".join(words[prev:b]), rng))
                prev = b
        else:
            segs.append(_noise(line, rng))
    # local reorder of one adjacent pair
    if len(segs) > 3 and rng.random() < 0.25:
        p = int(rng.integers(0, len(segs) - 1))
        segs[p], segs[p + 1] = segs[p + 1], segs[p]
    # junk segments (boilerplate survivors)
    if rng.random() < 0.3:
        segs.insert(int(rng.integers(0, len(segs) + 1)),
                    str(rng.choice(["advertisement", "...", "cookie notice ok"])))
    return segs or ["placeholder"]


def synth_page(doc_id: int, text: str, lang: str) -> tuple[str, datetime.datetime, bytes, str, str]:
    """Build one deterministic page row from a document row."""
    rng = np.random.default_rng(90210 + int(doc_id))
    lines = _reflow(text, rng)
    segs = _segments_from_lines(lines, rng)
    body = "".join(f"<p>{_html.escape(s)}</p>" for s in segs)
    page_html = (_BOILER_HEAD.format(doc_id=doc_id, site=int(doc_id) % 7)
                 + f'<div class="content">{body}</div>' + _BOILER_FOOT)
    url = f"https://example.org/{lang}/{int(doc_id):08d}"
    ts = _BASE_TS + datetime.timedelta(days=int(doc_id) % 14,
                                       seconds=(int(doc_id) * 7919) % 86400)
    return url, ts, page_html.encode("utf-8"), "\n".join(lines), lang


def _gen_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = [synth_page(d, t, lg) for d, t, lg in
                zip(pdf["doc_id"], pdf["text"], pdf["lang"])]
        yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def pages_from_documents(spark, sf_dir: str, min_parallelism: int | None = None,
                         replicate: int = 1):
    """documents parquet -> pages DataFrame (distributed, deterministic).

    Scan prunes to the three needed columns (Catalyst pushes the projection
    into the parquet reader).  The sf* documents tables are single small
    parquet files, so the scan yields ONE split and everything downstream of
    this source — including the O(N·M·L) alignment kernel — would run on one
    core; a real 100 TB crawl table has thousands of splits and never hits
    this.  For the synthetic source we pay one round-robin shuffle of the
    (tiny) documents to fan the kernel out to ``defaultParallelism`` tasks.

    ``replicate`` > 1 scales the corpus for benchmarking: each document is
    cloned ``replicate`` times with a distinct ``doc_id`` offset, so every
    replica deterministically synthesizes a *different* page (distinct noise
    seed, distinct url) — bigger input, no duplicate-work shortcut.
    """
    from pyspark.sql import functions as F
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text", "lang")
    if replicate > 1:
        docs = docs.crossJoin(
            spark.range(replicate).select(F.col("id").alias("_rep"))
        ).withColumn(
            "doc_id", F.col("doc_id") + F.col("_rep") * F.lit(10_000_000)
        ).drop("_rep")
    from ..operators.relational import fan_out
    docs = fan_out(docs, min_parallelism)
    return docs.mapInPandas(_gen_batches, schema=PAGES_SCHEMA)

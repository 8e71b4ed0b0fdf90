"""K2 fidelity: the PAGE-XML merge-back sink — the reference's production
output (``ocrd-nmalign-merge`` writes updated PAGE-XML per page).

Faithful reimplementation of the merge step of
/root/reference/nmalign/ocrd/cli.py:240-290 over stdlib ``xml.etree``:

* every candidate TextLine gets its existing TextEquivs renumbered
  ``@index=1..n`` in document order — even unmatched lines (the reference
  renumbers before checking ``other_ind < 0``, cli.py:242-243);
* each MATCHED line gets a new ``TextEquiv`` inserted first with
  ``@index=0``, ``@conf=score``, ``@dataType='other'``,
  ``@dataTypeDetails='<other_grp>/<other_line_id>'`` (cli.py:257-265);
* on a sub-segment split the other line id gains a ``[beg:end]`` suffix and
  the Unicode is the slice (cli.py:261-263) — i.e. exactly the aligner's
  ``extracted`` column;
* ``page_update_higher_textequiv_levels('line', ...)`` — region text is
  re-rolled from the NEW line texts with join suppression
  (operators/hierarchy.py ``rollup_page``, the tested A4/F9 kernel);
* ``page_remove_lower_textequiv_levels('line', ...)`` — all Word children
  are dropped (cli.py:448-449: ``line.Word = []``).

Spark surface: :func:`merge_pages_df` — alignment rows are collected per
url (one aggregation), joined to the XML pages, and the merge runs as a
narrow ``mapInPandas`` (pure function of bytes + rows), yielding the
output fileGrp's (url, xml) table — ``df.write``/``workspace.add_file``
equivalent, transactional per partition like every other sink here.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from ..sources.pagexml import parse_page_hierarchy

__all__ = ["merge_page_xml", "parse_line_equivs", "merge_pages_df"]


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _ns_of(root) -> str:
    tag = root.tag
    return tag[1:].split("}", 1)[0] if tag.startswith("{") else ""


def _walk_lines(elem, lines):
    """get_AllTextLines order (region's own lines before nested regions' —
    sources/pagexml.py traversal)."""
    if _local(elem.tag) == "TextRegion":
        for child in elem:
            if _local(child.tag) == "TextLine":
                lines.append(child)
        for child in elem:
            if _local(child.tag) == "TextRegion":
                _walk_lines(child, lines)
        return
    for child in elem:
        _walk_lines(child, lines)


def _fmt(x: float) -> str:
    """Attribute formatting for conf values: shortest round-trip float
    (generateDS serializes ``str(float)``)."""
    return repr(float(x))


def merge_page_xml(xml_bytes: bytes | str, matches, other_grp: str = "GT",
                   line_id_of=None) -> bytes:
    """Merge alignment results back into one PAGE-XML document.

    ``matches``: iterable of ``(i, j, beg, end, score, extracted)`` or
    ``(i, j, line_no, beg, end, score, extracted)`` rows — the aligner's
    output columns for this url; ``i`` indexes the document's TextLines in
    ``get_AllTextLines`` order, ``j`` the (filtered) reference lines,
    ``line_no`` the ORIGINAL pre-filter line number.  ``line_id_of``:
    optional ``j -> other line id`` mapping; default is the reference's
    plaintext pseudo-line naming ``line%04d`` keyed by the original
    enumeration — ocrd/cli.py:213-215 assigns ids before the empty-line
    deletion at cli.py:219-226, so surviving lines keep their pre-filter
    numbers (``line_no`` here; falls back to ``j`` for legacy 6-tuples).
    Returns the serialized document.
    """
    if isinstance(xml_bytes, str):
        xml_bytes = xml_bytes.encode("utf-8")
    root = ET.fromstring(xml_bytes)
    ns = _ns_of(root)
    q = (lambda t: f"{{{ns}}}{t}") if ns else (lambda t: t)

    lines: list = []
    _walk_lines(root, lines)
    by_i = {}
    for m in matches:
        if len(m) == 7:
            i, j, line_no, beg, end, score, extracted = m
        else:
            i, j, beg, end, score, extracted = m
            line_no = j
        by_i[int(i)] = (int(j), int(line_no), int(beg), int(end),
                        float(score), extracted)

    for ind, line in enumerate(lines):
        # renumber existing TextEquivs 1..n (document order) — ALL lines
        n = 0
        first_te = None
        for child in line:
            if _local(child.tag) == "TextEquiv":
                n += 1
                child.set("index", str(n))
                if first_te is None:
                    first_te = child
        m = by_i.get(ind)
        if m is None or m[0] < 0:
            continue
        j, line_no, beg, end, score, extracted = m
        other_id = (line_id_of(j) if line_id_of else f"line{line_no:04d}")
        if beg >= 0 and end >= 0:
            other_id += f"[{beg}:{end}]"
        te = ET.Element(q("TextEquiv"))
        te.set("index", "0")
        te.set("conf", _fmt(score))
        te.set("dataType", "other")
        te.set("dataTypeDetails", f"{other_grp}/{other_id}")
        uni = ET.SubElement(te, q("Unicode"))
        uni.text = extracted if extracted is not None else ""
        # insert before the first existing TextEquiv (insert_TextEquiv_at(0));
        # append at the end otherwise (schema puts TextEquiv last)
        pos = (list(line).index(first_te) if first_te is not None
               else len(list(line)))
        line.insert(pos, te)

    # page_update_higher_textequiv_levels('line') runs BEFORE the Word
    # pruning (reference order, cli.py:278-279): the line->region join
    # suppression inspects each line's words (cli.py:429-431), so the
    # re-parse must still see them.  Reuse the tested A4/F9 kernel on a
    # re-parse of the modified tree, then write the results back by id.
    interim = ET.tostring(root, encoding="utf-8")
    doc = parse_page_hierarchy(interim)
    from ..operators.hierarchy import rollup_page
    rollup_page(doc, level="line")
    new_equiv: dict[str, tuple[str, float]] = {}

    def collect(regions):
        for r in regions:
            new_equiv[r["id"]] = (r.get("text", ""), r.get("conf", 1.0))
            collect(r.get("subregions", ()))

    collect(doc.get("regions", ()))

    def update_regions(elem):
        if _local(elem.tag) == "TextRegion":
            rid = elem.get("id") or ""
            if rid in new_equiv:
                for old in [c for c in elem
                            if _local(c.tag) == "TextEquiv"]:
                    elem.remove(old)
                text, conf = new_equiv[rid]
                te = ET.SubElement(elem, q("TextEquiv"))
                te.set("conf", _fmt(conf))
                uni = ET.SubElement(te, q("Unicode"))
                uni.text = text
        for child in elem:
            update_regions(child)

    update_regions(root)

    # page_remove_lower_textequiv_levels('line'): drop all Word children
    # (cli.py:448-449), after the roll-up consumed them
    for line in lines:
        for word in [c for c in line if _local(c.tag) == "Word"]:
            line.remove(word)

    if ns:
        ET.register_namespace("", ns)
    return ET.tostring(root, encoding="utf-8", xml_declaration=True)


def parse_line_equivs(xml_bytes: bytes | str):
    """Merged-output reader (gate/test side): every TextEquiv of every
    TextLine as ``(line_id, pos, index, unicode, conf, data_type,
    data_type_details)`` in document order."""
    if isinstance(xml_bytes, str):
        xml_bytes = xml_bytes.encode("utf-8")
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError:
        return []
    lines: list = []
    _walk_lines(root, lines)
    out = []
    for line in lines:
        pos = 0
        for child in line:
            if _local(child.tag) != "TextEquiv":
                continue
            text = ""
            for sub in child:
                if _local(sub.tag) == "Unicode":
                    text = sub.text or ""
                    break
            conf = child.get("conf")
            out.append((line.get("id") or "", pos,
                        int(child.get("index", "-1")), text,
                        None if conf is None else float(conf),
                        child.get("dataType"), child.get("dataTypeDetails")))
            pos += 1
    return out


def merge_pages_df(xml_pages_df, aligned_df, other_grp: str = "GT",
                   xml_col: str = "xml", url_col: str = "url",
                   ref_ids_df=None):
    """(url, xml) pages + aligner output -> merged (url, xml) table.

    One aggregation collects each url's match rows (sorted by ``i`` for
    determinism), one join attaches them to the page bytes, and the merge
    itself is a narrow ``mapInPandas``.

    ``ref_ids_df``: optional (url, seq_no, line_id) — the other side's REAL
    line ids keyed by original line number (a PAGE-XML partner,
    ocrd/cli.py:244-245).  The aligner's ``line_no`` column resolves the
    filtered index ``j`` back to the original line, whose id is used in
    ``dataTypeDetails``; urls (or line numbers) without an entry fall back
    to the plaintext pseudo-line naming ``line%04d`` (cli.py:249-251)."""
    import pandas as pd
    from pyspark.sql import functions as F

    rows = (aligned_df
            .groupBy(F.col("url"))
            .agg(F.array_sort(F.collect_list(F.struct(
                "i", "j", "line_no", "beg", "end", "score", "extracted")))
                .alias("matches")))
    joined = xml_pages_df.select(F.col(url_col).alias("url"),
                                 F.col(xml_col).alias("xml")) \
        .join(rows, "url", "left")
    if ref_ids_df is not None:
        ids = (ref_ids_df
               .groupBy("url")
               .agg(F.collect_list(F.struct("seq_no", "line_id"))
                    .alias("ref_ids")))
        joined = joined.join(ids, "url", "left")
    else:
        joined = joined.withColumn("ref_ids", F.lit(None).cast(
            "array<struct<seq_no:int,line_id:string>>"))

    def gen(batches):
        for pdf in batches:
            out_urls, out_xml = [], []
            for url, xml_b, matches, ref_ids in zip(
                    pdf["url"], pdf["xml"], pdf["matches"], pdf["ref_ids"]):
                ms = [] if matches is None else [
                    (m["i"], m["j"], m["line_no"], m["beg"], m["end"],
                     m["score"], m["extracted"]) for m in matches]
                id_of_line = ({} if ref_ids is None else
                              {r["seq_no"]: r["line_id"] for r in ref_ids})
                # fallback ids use the ORIGINAL line number (reference
                # assigns line%04d before empty-line deletion,
                # ocrd/cli.py:213-226), never the filtered index j
                j_to_id = {} if matches is None else {
                    int(m["j"]): (id_of_line.get(int(m["line_no"]))
                                  or f"line{int(m['line_no']):04d}")
                    for m in matches if m["j"] >= 0}
                line_id_of = (lambda j, d=j_to_id:
                              d.get(j) or f"line{j:04d}")
                out_urls.append(url)
                out_xml.append(merge_page_xml(xml_b, ms, other_grp,
                                              line_id_of=line_id_of))
            yield pd.DataFrame({"url": out_urls, "xml": out_xml})

    return joined.mapInPandas(gen, schema="url string, xml binary")

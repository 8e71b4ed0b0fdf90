"""The ``ocrd-nmalign-merge`` production flow over METS workspaces, end to
end on Spark: METS scan -> zip_input_files pairing -> distributed file
reads -> PAGE-XML / plaintext extraction -> cogrouped alignment -> PAGE-XML
merge-back -> workspace export with an updated METS.

Reference surface: /root/reference/nmalign/ocrd/cli.py (the processor's
``process_workspace``/``process_page_file``).  A user of the reference
points this at the same workspace directory and gets the same merged
PAGE-XML output fileGrp; here every per-page step runs as a Spark task, so
one driver can process millions of workspaces/pages (the reference caps at
``OCRD_MAX_PARALLEL_PAGES`` processes on one host, conftest.py:79).

Scale shape: two narrow ``mapInPandas`` parses (METS, PAGE) + one
``binaryFile`` scan joined by href + one grouped sort for multi-file
plaintext partners + the cogrouped align kernel + the merge kernel — the
only shuffles are the (workspace, page_id)-keyed pairing aggregation, the
href join, and the alignment cogroup, all on near-uniform keys.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from pathlib import Path

from pyspark.sql import functions as F

from ..operators.align import align_cogrouped
from ..sinks.pagexml_merge import merge_pages_df
from ..sources.mets import (MIMETYPE_PAGE, mets_files_df, mets_workspaces_df,
                            zip_workspace_files)
from ..sources.pagexml import parse_page_lines, pagexml_segments_df

__all__ = ["align_workspace", "export_workspace"]


def _blobs(spark, workspace_dir: str):
    """All files under the workspace as (rel href, content)."""
    prefix = "file:" + str(Path(workspace_dir).resolve()) + "/"
    # hrefs are fileGrp-relative one level deep (the standard
    # <grp>/<file> workspace layout); literal-replace via lit() so odd
    # characters in the directory path can't break an expression string
    return (spark.read.format("binaryFile")
            .load(str(Path(workspace_dir).resolve()) + "/*/*")
            .select(F.replace(F.col("path"), F.lit(prefix), F.lit(""))
                    .alias("href"),
                    F.col("content")))


def align_workspace(spark, workspace_dir: str, input_grp: str,
                    other_grp: str, normalization=None, cutoff=None,
                    try_subseg: bool = True):
    """Run the full merge flow for one workspace directory (``mets.xml``
    inside).  Returns (merged_df, pairs_df): merged (url=page_id, xml)
    ready for :func:`export_workspace`, and the pairing table."""
    ws = mets_workspaces_df(spark, str(Path(workspace_dir) / "mets.xml"))
    pairs = zip_workspace_files(mets_files_df(ws), input_grp, other_grp)
    blobs = _blobs(spark, workspace_dir)

    page_xml = (pairs
                .select(F.col("page_id").alias("url"), "page_file",
                        F.col("page_href").alias("href"),
                        "other_is_page", "other_hrefs")
                .join(blobs, "href")
                .withColumnRenamed("content", "xml"))

    cand = pagexml_segments_df(page_xml, side=1) \
        .select("url", "seq_no", "seg_text")

    # other side: one row per partner file, in sorted-href order (k), then
    # a per-page pass enumerates lines across files (ocrd/cli.py:209-215:
    # concatenated splitlines of the sorted plaintext files; PAGE partners
    # go through the reference extraction order instead)
    other_files = (pairs
                   .select(F.col("page_id").alias("url"), "other_is_page",
                           F.posexplode(F.split("other_hrefs", ","))
                           .alias("k", "href"))
                   .join(blobs, "href"))

    def extract(key, pdf):
        import pandas as pd
        url = key[0]
        rows = []
        seq = 0
        for _, r in pdf.sort_values("k").iterrows():
            if r["other_is_page"]:
                for lid, text, _conf in parse_page_lines(r["content"]):
                    rows.append((url, seq, text, lid))
                    seq += 1
            else:
                for line in bytes(r["content"]).decode(
                        "utf-8", "replace").splitlines():
                    rows.append((url, seq, line, None))
                    seq += 1
        return pd.DataFrame(rows, columns=["url", "seq_no", "seg_text",
                                           "line_id"])

    refs = other_files.groupBy("url").applyInPandas(
        extract, schema="url string, seq_no int, seg_text string, "
                        "line_id string")

    aligned = align_cogrouped(cand, refs.select("url", "seq_no", "seg_text"),
                              normalization=normalization, cutoff=cutoff,
                              try_subseg=try_subseg)
    merged = merge_pages_df(
        page_xml.select("url", "xml", "page_file"), aligned,
        other_grp=other_grp,
        ref_ids_df=refs.where(F.col("line_id").isNotNull())
        .select("url", "seq_no", "line_id"))
    return merged.join(page_xml.select("url", "page_file"), "url"), pairs


def export_workspace(merged_df, workspace_dir: str, output_grp: str) -> int:
    """Write the merged PAGE-XML files into ``<workspace>/<output_grp>/``
    and register them in ``mets.xml`` (new fileGrp + one fptr per page div
    — the ``workspace.add_file`` step, ocrd/cli.py:283-290).

    Driver-side by design: a workspace's METS is ONE shared XML document —
    the per-page compute is distributed, the per-workspace catalog update
    is a tiny serial commit (same split as the reference's METS server).
    Returns the number of pages written."""
    out_dir = Path(workspace_dir) / output_grp
    out_dir.mkdir(parents=True, exist_ok=True)
    rows = merged_df.collect()
    mets_path = Path(workspace_dir) / "mets.xml"
    root = ET.fromstring(mets_path.read_bytes())
    METS = "http://www.loc.gov/METS/"
    XLINK = "http://www.w3.org/1999/xlink"
    ET.register_namespace("mets", METS)
    ET.register_namespace("xlink", XLINK)
    file_sec = root.find(f"{{{METS}}}fileSec")
    grp = ET.SubElement(file_sec, f"{{{METS}}}fileGrp", {"USE": output_grp})
    divs = {d.get("ID"): d for d in root.iter(f"{{{METS}}}div")
            if d.get("TYPE") == "page"}
    for r in rows:
        file_id = f"{output_grp}_{r.url}"
        href = f"{output_grp}/{file_id}.xml"
        (Path(workspace_dir) / href).write_bytes(bytes(r.xml))
        fe = ET.SubElement(grp, f"{{{METS}}}file",
                           {"ID": file_id, "MIMETYPE": MIMETYPE_PAGE})
        ET.SubElement(fe, f"{{{METS}}}FLocat",
                      {"LOCTYPE": "OTHER", f"{{{XLINK}}}href": href})
        if r.url in divs:
            ET.SubElement(divs[r.url], f"{{{METS}}}fptr",
                          {"FILEID": file_id})
    mets_path.write_bytes(ET.tostring(root, encoding="utf-8",
                                      xml_declaration=True))
    return len(rows)

"""S7 fidelity: METS workspace scan — the reference's production input
surface (OCR-D workspaces).

The crawl engine's native pairing is a plain url equi-join, but the
reference's install base drives everything through METS workspaces
(``ocrd-nmalign-merge``), so this module reproduces the exact
``zip_input_files`` semantics of /root/reference/nmalign/ocrd/cli.py:48-108
over real METS XML with stdlib ``xml.etree`` (no ocrd dependency):

* fileSec scan: ``mets:fileGrp[@USE]`` -> ``mets:file[@ID,@MIMETYPE]`` ->
  ``mets:FLocat/@xlink:href``;
* structMap[@TYPE=PHYSICAL] scan: ``div[@TYPE=page]`` ID + ORDER with
  ``fptr[@FILEID]`` children define each file's pageId (files referenced by
  no page div are document-global and carry a null page_id — the reference
  skips them, cli.py:60-62, 74-76);
* pairing rules (cli.py:55-108): side 1 must be exactly one PAGE-mimetype
  file per pageId (more -> NonUniqueInputFile); side 2 accepts one PAGE
  file or any number of text/plain files (a PAGE file plus anything else
  -> NonUniqueInputFile); other-grp files for pages missing on side 1 are
  warned and skipped; side-1 pages with no partner are dropped (or abort,
  ``config.OCRD_MISSING_INPUT``); plaintext partners are consumed in
  sorted-filename order (cli.py:210).

Spark surface: parsing is a narrow ``mapInPandas`` over (workspace, METS
bytes) rows — a pure function of the bytes, safe anywhere in the cluster;
the pairing itself is Catalyst joins/aggregations (J1/J2/R9 on real METS),
so at 10^6 workspaces it is one shuffle on (workspace, page_id) with
map-side combine, and the duplicate fail-fast is an aggregate precheck,
not a driver loop.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

MIMETYPE_PAGE = "application/vnd.prima.page+xml"

__all__ = ["MIMETYPE_PAGE", "NonUniqueInputFile", "parse_mets",
           "mets_files_df", "mets_workspaces_df", "workspace_duplicates",
           "zip_workspace_files", "make_mets_xml"]


class NonUniqueInputFile(ValueError):
    """Reference fail-fast (ocrd/cli.py:67,87): more than one PAGE file —
    or a PAGE file plus anything else — for one pageId in one fileGrp."""


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _href(file_elem) -> str | None:
    for child in file_elem:
        if _local(child.tag) == "FLocat":
            for k, v in child.attrib.items():
                if _local(k) == "href":
                    return v
    return None


def parse_mets(xml_bytes: bytes | str):
    """METS XML -> list of (file_grp, file_id, mimetype, href, page_id).

    ``page_id`` is None for document-global files (no physical-structMap
    page div references them).  Malformed XML yields [] (counted upstream),
    never an executor exception."""
    if xml_bytes is None:
        return []
    if isinstance(xml_bytes, str):
        xml_bytes = xml_bytes.encode("utf-8")
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError:
        return []

    page_of: dict[str, str] = {}

    def walk_struct(elem, in_physical):
        tag = _local(elem.tag)
        if tag == "structMap":
            in_physical = (elem.get("TYPE") or "").upper() == "PHYSICAL"
        page_id = None
        if in_physical and tag == "div" and (elem.get("TYPE") == "page"):
            page_id = elem.get("ID")
        for child in elem:
            if page_id is not None and _local(child.tag) == "fptr":
                fid = child.get("FILEID")
                if fid:
                    page_of[fid] = page_id
            walk_struct(child, in_physical)

    walk_struct(root, False)

    out = []

    def walk_files(elem, grp):
        tag = _local(elem.tag)
        if tag == "fileGrp":
            grp = elem.get("USE") or grp
        if tag == "file":
            fid = elem.get("ID") or ""
            out.append((grp or "", fid, elem.get("MIMETYPE") or "",
                        _href(elem) or "", page_of.get(fid)))
            return
        for child in elem:
            walk_files(child, grp)

    walk_files(root, None)
    return out


_FILES_SCHEMA = ("workspace string, file_grp string, file_id string, "
                 "mimetype string, href string, page_id string")


def mets_files_df(workspaces_df, mets_col: str = "mets",
                  ws_col: str = "workspace"):
    """(workspace, mets binary) -> long file table
    (workspace, file_grp, file_id, mimetype, href, page_id)
    via one narrow ``mapInPandas``."""
    import pandas as pd
    from pyspark.sql import functions as F

    def gen(batches):
        for pdf in batches:
            rows = []
            for ws, blob in zip(pdf[ws_col], pdf[mets_col]):
                for grp, fid, mime, href, pid in parse_mets(blob):
                    rows.append((ws, grp, fid, mime, href, pid))
            yield pd.DataFrame(rows, columns=[
                "workspace", "file_grp", "file_id", "mimetype", "href",
                "page_id"])

    return workspaces_df.select(F.col(ws_col), F.col(mets_col)) \
        .mapInPandas(gen, schema=_FILES_SCHEMA)


def mets_workspaces_df(spark, path_glob: str):
    """Read METS files from disk (``binaryFile`` source — splittable listing,
    column-pruned content) as (workspace=path, mets=bytes) rows."""
    from pyspark.sql import functions as F
    return (spark.read.format("binaryFile").load(path_glob)
            .select(F.col("path").alias("workspace"),
                    F.col("content").alias("mets")))


def _side_files(files, grp: str, page_only: bool):
    """Per-grp candidate files with the reference's mimetype + pageId
    filters (cli.py:58-62 for side 1, 72-76 regex ``//(PAGE|text/plain)``
    for side 2)."""
    from pyspark.sql import functions as F
    mime_ok = (F.col("mimetype") == MIMETYPE_PAGE) if page_only else \
        (F.col("mimetype").isin(MIMETYPE_PAGE, "text/plain"))
    return files.filter((F.col("file_grp") == grp) & mime_ok
                        & F.col("page_id").isNotNull())


def workspace_duplicates(files, input_grp: str, other_grp: str):
    """R9 fail-fast precheck — rows that would raise NonUniqueInputFile in
    the reference (cli.py:63-67, 82-91): >1 PAGE file per pageId on side 1;
    on side 2, any multi-file pageId that includes a PAGE file.

    Returns (workspace, file_grp, page_id, n_files, n_page) — empty means
    the workspace set is cleanly pairable."""
    from pyspark.sql import functions as F
    s1 = _side_files(files, input_grp, page_only=True) \
        .groupBy("workspace", "file_grp", "page_id") \
        .agg(F.count("*").alias("n_files"),
             F.count("*").alias("n_page")) \
        .filter(F.col("n_files") > 1)
    s2 = _side_files(files, other_grp, page_only=False) \
        .groupBy("workspace", "file_grp", "page_id") \
        .agg(F.count("*").alias("n_files"),
             F.sum(F.when(F.col("mimetype") == MIMETYPE_PAGE, 1)
                   .otherwise(0)).alias("n_page")) \
        .filter((F.col("n_files") > 1) & (F.col("n_page") > 0))
    return s1.unionByName(s2)


def zip_workspace_files(files, input_grp: str, other_grp: str,
                        strict: bool = True):
    """The reference's ``zip_input_files`` as Catalyst joins.

    Input: the long file table from :func:`mets_files_df`.  Output: one row
    per pairable page —
    ``(workspace, page_id, page_file, page_href, other_is_page,
    n_other, other_files, other_hrefs)`` with the other-side files in
    sorted-filename order (cli.py:210) as comma-joined strings (stable,
    hashable).  Pages missing a partner are dropped (cli.py:101-107
    default ``OCRD_MISSING_INPUT=skip``); use a left-anti join against the
    result to enumerate them (J2).

    ``strict=True`` runs the duplicate precheck (one tiny aggregate job)
    and raises :class:`NonUniqueInputFile` like the reference — the
    declarative plan below would otherwise silently mis-pair."""
    from pyspark.sql import functions as F

    if strict:
        dup = workspace_duplicates(files, input_grp, other_grp) \
            .select("workspace", "file_grp", "page_id").limit(5).collect()
        if dup:
            raise NonUniqueInputFile(
                "non-unique input files per pageId: "
                + "; ".join(f"{r.workspace}:{r.file_grp}:{r.page_id}"
                            for r in dup))

    pages = _side_files(files, input_grp, page_only=True).select(
        "workspace", "page_id",
        F.col("file_id").alias("page_file"),
        F.col("href").alias("page_href"))
    others = _side_files(files, other_grp, page_only=False) \
        .groupBy("workspace", "page_id") \
        .agg(F.max(F.when(F.col("mimetype") == MIMETYPE_PAGE, 1)
                   .otherwise(0)).alias("other_is_page"),
             F.count("*").cast("int").alias("n_other"),
             F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("href", "file_id"))),
                     lambda s: s["file_id"]), ",").alias("other_files"),
             F.array_join(F.array_sort(F.collect_list("href")), ",")
             .alias("other_hrefs"))
    return pages.join(others, ["workspace", "page_id"], "inner")


# --- deterministic generator (tests + gate query) ---------------------------

def make_mets_xml(pages, global_files=(), extra_grps=()) -> str:
    """Build a METS document.

    ``pages``: list of (page_id, [(file_grp, file_id, mimetype, href), ...])
    — each page div gets one fptr per file.  ``global_files``: same file
    tuples but referenced by no page div (document-global).  ``extra_grps``:
    fileGrp names to emit even if empty.
    """
    import html as _html

    def esc(s: str) -> str:
        return _html.escape(str(s), quote=True)

    grps: dict[str, list] = {g: [] for g in extra_grps}
    for _, fs in pages:
        for grp, fid, mime, href in fs:
            grps.setdefault(grp, []).append((fid, mime, href))
    for grp, fid, mime, href in global_files:
        grps.setdefault(grp, []).append((fid, mime, href))

    file_sec = "".join(
        f'<mets:fileGrp USE="{esc(grp)}">'
        + "".join(
            f'<mets:file ID="{esc(fid)}" MIMETYPE="{esc(mime)}">'
            f'<mets:FLocat LOCTYPE="OTHER" xlink:href="{esc(href)}"/>'
            "</mets:file>"
            for fid, mime, href in fs)
        + "</mets:fileGrp>"
        for grp, fs in grps.items())
    divs = "".join(
        f'<mets:div TYPE="page" ID="{esc(pid)}" ORDER="{k + 1}">'
        + "".join(f'<mets:fptr FILEID="{esc(fid)}"/>'
                  for _, fid, _, _ in fs)
        + "</mets:div>"
        for k, (pid, fs) in enumerate(pages))
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<mets:mets xmlns:mets="http://www.loc.gov/METS/" '
        'xmlns:xlink="http://www.w3.org/1999/xlink">'
        f"<mets:fileSec>{file_sec}</mets:fileSec>"
        '<mets:structMap TYPE="PHYSICAL">'
        '<mets:div TYPE="physSequence">'
        f"{divs}</mets:div></mets:structMap></mets:mets>")

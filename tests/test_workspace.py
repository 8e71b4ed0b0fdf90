"""Full ocrd-nmalign-merge workspace flow on Spark: METS pairing ->
distributed reads -> alignment -> merge-back -> METS/fileGrp export
(plans/workspace.py), covering single/multi plaintext partners AND a
PAGE-XML partner whose REAL line ids must appear in dataTypeDetails."""
from __future__ import annotations

from nmalign_spark.plans.workspace import (align_workspace,
                                           align_workspaces,
                                           export_workspace,
                                           export_workspaces)
from nmalign_spark.sinks.pagexml_merge import parse_line_equivs
from nmalign_spark.sources.mets import (MIMETYPE_PAGE, make_mets_xml,
                                        mets_files_df, mets_workspaces_df,
                                        zip_workspace_files)
from nmalign_spark.sources.pagexml import make_page_xml, parse_page_lines

TXT = "text/plain"
GT = ["Was ist Aufklärung?", "Der Ausgang des Menschen",
      "aus seiner selbst verschuldeten Unmündigkeit"]
OCR = ["Was iſt Aufklaͤrung?", "Der Ausgang des Menſchen",
       "aus ſeiner ſelbſt verſchuldeten Unmuͤndigkeit"]
NORM = {"ſ": "s", "aͤ": "ä", "uͤ": "ü"}


def noisy(lines):
    """OCR-style variant that NORM maps back onto the original."""
    return [ln.replace("s", "ſ").replace("ä", "aͤ").replace("ü", "uͤ")
            for ln in lines]


def build_workspace(tmp_path, name="ws", gt=GT):
    ws = tmp_path / name
    (ws / "OCR").mkdir(parents=True)
    (ws / "GT").mkdir()
    pages = []
    for k, pid in enumerate(("PA", "PB", "PC")):
        (ws / "OCR" / f"{pid}.xml").write_text(make_page_xml(noisy(gt)))
        fs = [("OCR", f"O_{pid}", MIMETYPE_PAGE, f"OCR/{pid}.xml")]
        if k == 0:                                  # one plaintext file
            (ws / "GT" / f"{pid}.txt").write_text("\n".join(gt) + "\n")
            fs.append(("GT", f"G_{pid}", TXT, f"GT/{pid}.txt"))
        elif k == 1:                                # two, sorted-href order
            (ws / "GT" / f"{pid}_a.txt").write_text("\n".join(gt[:2]) + "\n")
            (ws / "GT" / f"{pid}_b.txt").write_text(gt[2] + "\n")
            fs += [("GT", f"G_{pid}b", TXT, f"GT/{pid}_b.txt"),
                   ("GT", f"G_{pid}a", TXT, f"GT/{pid}_a.txt")]
        else:                                       # PAGE-XML partner
            (ws / "GT" / f"{pid}.xml").write_text(make_page_xml(gt))
            fs.append(("GT", f"G_{pid}", MIMETYPE_PAGE, f"GT/{pid}.xml"))
        pages.append((pid, fs))
    (ws / "mets.xml").write_text(make_mets_xml(pages))
    return ws


def test_workspace_flow(spark, tmp_path):
    ws = build_workspace(tmp_path)
    merged, pairs = align_workspace(spark, str(ws), "OCR", "GT",
                                    normalization=NORM, try_subseg=False)
    assert pairs.count() == 3
    n = export_workspace(merged, str(ws), "OUT")
    assert n == 3

    for pid in ("PA", "PB", "PC"):
        out = (ws / "OUT" / f"OUT_{pid}.xml").read_bytes()
        # byte-identical extracted text per line, GT side wins
        assert [t for _, t, _ in parse_page_lines(out)] == GT
        equivs = parse_line_equivs(out)
        idx0 = {lid: (text, dtd) for lid, _, idx, text, _, _, dtd in equivs
                if idx == 0}
        for i in range(3):
            text, dtd = idx0[f"l{i:04d}"]
            assert text == GT[i]
            if pid == "PC":
                # PAGE partner: REAL line ids (make_page_xml: l%04d)
                assert dtd == f"GT/l{i:04d}"
            else:
                # plaintext pseudo-lines (cli.py:249-251: line%04d)
                assert dtd == f"GT/line{i:04d}"

    # METS updated: new fileGrp registered and pairable against OCR
    files = mets_files_df(mets_workspaces_df(spark, str(ws / "mets.xml")))
    out_pairs = zip_workspace_files(files, "OCR", "OUT")
    got = {r.page_id: r for r in out_pairs.collect()}
    assert set(got) == {"PA", "PB", "PC"}
    assert got["PA"].other_is_page == 1
    assert got["PA"].other_files == "OUT_PA"


def test_multi_workspace_corpus(spark, tmp_path):
    """Two workspaces with IDENTICAL page ids processed in one job: the
    workspace#page_id keying keeps them apart, and each workspace's export
    carries its own GT text."""
    gt2 = ["Erster anderer Satz hier", "Zweiter ganz anderer Satz",
           "Dritter völlig anderer Satz"]
    root = tmp_path / "corpus"
    build_workspace(root, "ws1", gt=GT)
    build_workspace(root, "ws2", gt=gt2)
    merged, pairs = align_workspaces(spark, str(root), "OCR", "GT",
                                     normalization=NORM, try_subseg=False)
    assert pairs.count() == 6
    urls = [r.url for r in merged.select("url").collect()]
    assert len(urls) == 6 and len(set(urls)) == 6
    n = export_workspaces(merged, "OUT")
    assert n == 6
    for name, want in (("ws1", GT), ("ws2", gt2)):
        for pid in ("PA", "PB", "PC"):
            out = (root / name / "OUT" / f"OUT_{pid}.xml").read_bytes()
            assert [t for _, t, _ in parse_page_lines(out)] == want


def test_export_rerun_guard_and_overwrite(spark, tmp_path):
    """Re-running the export without overwrite raises (reference:
    add_file raises FileExistsError unless OVERWRITE); with
    overwrite=True the fileGrp and its fptrs are REPLACED, never
    duplicated."""
    import xml.etree.ElementTree as ET

    import pytest

    ws = build_workspace(tmp_path)
    merged, _ = align_workspace(spark, str(ws), "OCR", "GT",
                                normalization=NORM, try_subseg=False)
    assert export_workspace(merged, str(ws), "OUT") == 3
    with pytest.raises(Exception, match="already exists"):
        export_workspace(merged, str(ws), "OUT")
    merged2, _ = align_workspace(spark, str(ws), "OCR", "GT",
                                 normalization=NORM, try_subseg=False)
    assert export_workspace(merged2, str(ws), "OUT", overwrite=True) == 3
    root = ET.fromstring((ws / "mets.xml").read_bytes())
    M = "{http://www.loc.gov/METS/}"
    grps = [g for g in root.iter(f"{M}fileGrp") if g.get("USE") == "OUT"]
    assert len(grps) == 1
    assert len(grps[0].findall(f"{M}file")) == 3
    for div in root.iter(f"{M}div"):
        if div.get("TYPE") != "page":
            continue
        fids = [p.get("FILEID") for p in div.findall(f"{M}fptr")
                if p.get("FILEID", "").startswith("OUT_")]
        assert len(fids) == 1


def test_export_writes_from_executors_not_driver(spark, tmp_path,
                                                 monkeypatch):
    """The export must never materialize the PAGE-XML blobs on the
    driver: every DataFrame.collect() during export_workspaces sees only
    metadata columns (no xml/binary column)."""
    ws = build_workspace(tmp_path)
    merged, _ = align_workspace(spark, str(ws), "OCR", "GT",
                                normalization=NORM, try_subseg=False)
    collected = []
    cls = type(merged)
    orig = cls.collect

    def spy(self):
        collected.append([f.name for f in self.schema.fields])
        return orig(self)

    monkeypatch.setattr(cls, "collect", spy)
    assert export_workspace(merged, str(ws), "OUT2") == 3
    assert collected, "export must run through Spark actions"
    for cols in collected:
        assert "xml" not in cols and "content" not in cols


def test_missing_partner_file_fails_loudly(spark, tmp_path):
    """A partner file listed in METS but missing on disk must FAIL the
    job (reference open() would raise), not silently shift the plaintext
    line numbering."""
    import pytest

    ws = build_workspace(tmp_path)
    (ws / "GT" / "PB_a.txt").unlink()
    merged, _ = align_workspace(spark, str(ws), "OCR", "GT",
                                normalization=NORM, try_subseg=False)
    with pytest.raises(Exception, match="missing on disk"):
        merged.collect()


def test_missing_page_file_fails_loudly(spark, tmp_path):
    """Same for the input fileGrp's own PAGE-XML files."""
    import pytest

    ws = build_workspace(tmp_path)
    (ws / "OCR" / "PA.xml").unlink()
    merged, _ = align_workspace(spark, str(ws), "OCR", "GT",
                                normalization=NORM, try_subseg=False)
    with pytest.raises(Exception, match="missing on disk"):
        merged.collect()

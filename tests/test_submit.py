"""North-rule launch path: a REAL ``spark-submit --py-files`` invocation of
scripts/run_pipeline.py from OUTSIDE the repo (cwd=/tmp, no PYTHONPATH) —
the package must arrive via the zip, the job must write partitioned output,
and a second submit against the same output must resume (skip every url)."""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

spark_submit = shutil.which("spark-submit")


@pytest.mark.skipif(spark_submit is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_resume(spark, tmp_path):
    from nmalign_spark.sources.pages import pages_from_documents

    pages_path = tmp_path / "pages.parquet"
    (pages_from_documents(spark, "/root/testdata/sf0.001")
     .limit(40).coalesce(2).write.parquet(str(pages_path)))

    zip_path = tmp_path / "nmalign_spark.zip"
    subprocess.run([sys.executable, str(REPO / "scripts" / "make_pyfiles.py"),
                    str(zip_path)], check=True, capture_output=True)
    # the zip must be self-contained package sources
    import zipfile
    names = zipfile.ZipFile(zip_path).namelist()
    assert "nmalign_spark/kernel/assign.py" in names
    assert not any(n.startswith("tests/") for n in names)

    out_dir = tmp_path / "out"
    script = str(REPO / "scripts" / "run_pipeline.py")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}

    def submit():
        cmd = [spark_submit, "--master", "local[2]",
               "--conf", "spark.sql.shuffle.partitions=4",
               "--conf", "spark.ui.enabled=false",
               "--py-files", str(zip_path), script,
               "--input", str(pages_path), "--output", str(out_dir),
               "--no-subseg", "--buckets", "4"]
        res = subprocess.run(cmd, capture_output=True, text=True, cwd="/tmp",
                             env=env, timeout=420)
        assert res.returncode == 0, res.stderr[-4000:]
        stats_line = [ln for ln in res.stdout.splitlines()
                      if ln.startswith("{")][-1]
        return json.loads(stats_line)

    stats1 = submit()
    assert stats1["pages_aligned"] == 40
    assert stats1["pages_skipped_resume"] == 0
    assert stats1["rows_total"] > 0
    # partitioned layout on disk: crawl_date=... / bucket=...
    parts = list((out_dir / "aligned").glob("crawl_date=*/bucket=*"))
    assert parts, "expected crawl_date/bucket partition dirs"
    # lineage table records this run
    lineage = spark.read.parquet(str(out_dir / "_lineage"))
    assert lineage.filter(lineage.run_id == stats1["run_id"]).count() > 0

    stats2 = submit()
    assert stats2["pages_skipped_resume"] == 40
    assert stats2["rows_total"] == stats1["rows_total"]

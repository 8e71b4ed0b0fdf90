#!/usr/bin/env python
"""Package nmalign_spark into a --py-files zip (north_rule launch artifact).

Usage: python scripts/make_pyfiles.py [dest.zip]   (default dist/nmalign_spark.zip)

The zip contains the package sources only (no tests, no caches); ship it as
``spark-submit --py-files dist/nmalign_spark.zip scripts/run_pipeline.py ...``
so every executor's Python worker can import the kernels without the repo
being present on the cluster machines."""
from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(dest: Path) -> Path:
    dest.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / "nmalign_spark").rglob("*.py")):
            if "__pycache__" in py.parts:
                continue
            zf.write(py, py.relative_to(REPO))
    return dest


if __name__ == "__main__":
    out = build(Path(sys.argv[1]) if len(sys.argv) > 1
                else REPO / "dist" / "nmalign_spark.zip")
    print(out)

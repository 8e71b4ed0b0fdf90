#!/usr/bin/env python
"""Local simulation of the driver's correctness gate: run every
__spark_entry__.queries() entry AND its oracle_sql() twin on sf0.01,
compare row count + sorted-column value hash. Not part of pytest (slow);
run manually: python tests/driver_gate_sim.py [sf_dir]."""
from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df: pd.DataFrame) -> tuple[int, str, str]:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    # normalize floats so 0.30000000000000004 == 0.3
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: round(v, 6) if isinstance(v, float) else v)
    body = df.to_csv(index=False, float_format="%.6f")
    h = hashlib.sha256(body.encode()).hexdigest()[:16]
    return len(df), ",".join(sorted(df.columns)), h


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    qs, os_ = entry.queries(), entry.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    bad = 0
    for name, fn in sorted(qs.items()):
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {exc}")
            bad += 1
            continue
        if name not in os_:
            print(f"rows-only {name}: {len(sdf)} rows ok")
            continue
        try:
            odf = con.execute(os_[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb raised {exc}")
            bad += 1
            continue
        sn, sc, sh = canon(sdf)
        on, oc, oh = canon(odf)
        status = "OK " if (sn, sc, sh) == (on, oc, oh) else "MISMATCH"
        if status != "OK ":
            bad += 1
        print(f"{status} {name}: spark({sn},{sh}) duck({on},{oh})"
              + ("" if sc == oc else f" cols spark=[{sc}] duck=[{oc}]"))
    spark.stop()
    return bad


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else
                  "/root/testdata/sf0.01", sys.argv[2:] or None))

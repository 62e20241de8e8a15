"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() on DuckDB at a given sf, compare row count,
column names, and order-insensitive values (columns sorted by name).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype(np.float64)
        elif str(df[c].dtype) in ("int32", "int64", "uint32", "Int64", "int8", "int16"):
            df[c] = df[c].astype(np.int64)
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.adaptive.enabled", "true")
        # one long-lived local[*] JVM carries driver + executors + the
        # accumulated state of 80+ sequential queries; the 1 GiB default
        # OOMed mid-suite once the heaviest join ran late in the list
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failed.append(name)
            continue
        t1 = time.time()
        if name not in osql:
            print(f"OK?  {name}: rows={len(sdf)} (rows-only, no oracle) {t1-t0:.1f}s")
            continue
        try:
            odf = con.execute(osql[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {exc}")
            failed.append(name)
            continue
        a, b = normalize(sdf), normalize(odf)
        status = []
        if list(a.columns) != list(b.columns):
            status.append(f"cols spark={list(a.columns)} oracle={list(b.columns)}")
        if len(a) != len(b):
            status.append(f"rowcount spark={len(a)} oracle={len(b)}")
        if not status:
            for c in a.columns:
                if str(a[c].dtype).startswith("float"):
                    bad = ~np.isclose(a[c], b[c], rtol=0, atol=0, equal_nan=True)
                    exact = (a[c].values != b[c].values) & ~(a[c].isna() & b[c].isna())
                    if exact.any():
                        status.append(f"col {c}: {int(exact.sum())} value diffs (max {np.abs(a[c]-b[c]).max():.3e})")
                else:
                    neq = (a[c].values != b[c].values).sum()
                    if neq:
                        status.append(f"col {c}: {neq} value diffs")
        if status:
            print(f"FAIL {name}: " + "; ".join(status))
            failed.append(name)
        else:
            print(f"PASS {name}: rows={len(a)} spark={t1-t0:.1f}s duck={time.time()-t1:.1f}s")
    spark.stop()
    print("FAILED:" if failed else "ALL PASS", ",".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

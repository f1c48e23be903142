"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the given
sf_dir, normalizes (columns sorted by name, rows sorted by all columns), and
compares row-count, column names/types, and exact values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dlt_iceberg_spark.queries import REGISTRY  # noqa: E402
from dlt_iceberg_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = []
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = spec.fn(spark, sf_dir)
            spark_pd = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        dt = time.perf_counter() - t0
        if spec.oracle is None:
            print(f"ok?  {name}: rows-only ({len(spark_pd)} rows) [{dt:.2f}s]")
            continue
        try:
            oracle_pd = con.execute(spec.oracle).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: oracle error: {exc}")
            continue
        a, b = normalize(spark_pd), normalize(oracle_pd)
        if list(a.columns) != list(b.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL {name}: rowcount {len(a)} vs {len(b)}")
            continue
        mismatched_cols = []
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                eq = (av.isna() & bv.isna()) | (av == bv)
                bad = int((~eq).sum())
            except Exception:
                bad = -1
            # The driver's gate hashes VALUES, so an int64-vs-float64 drift
            # (e.g. DuckDB HUGEINT -> pandas float64) hash-mismatches even
            # when == says equal.  Treat integer-vs-float kind drift as a
            # failure here too, so it's caught before the driver sees it.
            kinds = {av.dtype.kind, bv.dtype.kind}
            if bad == 0 and kinds == {"i", "f"}:
                bad = -2
            if bad != 0:
                mismatched_cols.append((c, bad, str(av.dtype), str(bv.dtype)))
        if mismatched_cols:
            failures.append(name)
            print(f"FAIL {name}: value mismatch {mismatched_cols}")
            for c, _, _, _ in mismatched_cols[:2]:
                diffmask = ~((a[c].isna() & b[c].isna()) | (a[c] == b[c]))
                print("  spark:", a[diffmask].head(3).to_dict("records"))
                print("  oracle:", b[diffmask].head(3).to_dict("records"))
        else:
            print(f"PASS {name} ({len(a)} rows) [{dt:.2f}s]")
    spark.stop()
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

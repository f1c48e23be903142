"""Generate PLAN_QUALITY.md: physical-plan facts for every registered query.

Usage: python tools/plan_report.py [sf_dir] > PLAN_QUALITY.md

Columns: shuffle exchange count, broadcast joins, sort-merge joins,
whether any parquet scan has pushed filters, and per-scan column counts —
the properties that determine scan/shuffle cost at 100 TB. (Plans are built at
the given sf_dir but are scale-independent apart from AQE runtime choices.)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from dlt_iceberg_spark.plans import (  # noqa: E402
    broadcast_join_count,
    exchange_count,
    explain_str,
    pushed_filters,
    scan_columns,
    sort_merge_join_count,
)
from dlt_iceberg_spark.queries import REGISTRY  # noqa: E402
from dlt_iceberg_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan_report")
    spark.sparkContext.setLogLevel("ERROR")
    print("# Plan quality — per-query physical plan facts\n")
    print(f"Built at `{sf_dir}`. Exchanges exclude broadcasts; scan cols = columns read per parquet scan.\n")
    print("| query | exchanges | broadcast joins | sort-merge joins | pushed filters | scan cols | cartesian |")
    print("|---|---|---|---|---|---|---|")
    for name, spec in REGISTRY.items():
        try:
            df = spec.fn(spark, sf_dir)
            ex = exchange_count(df)
            bj = broadcast_join_count(df)
            sm = sort_merge_join_count(df)
            pf = len(pushed_filters(df))
            cols = ",".join(str(len(c)) for c in scan_columns(df)) or "-"
            cart = "YES" if "CartesianProduct" in explain_str(df, "simple") else "no"
            print(f"| {name} | {ex} | {bj} | {sm} | {pf} | {cols} | {cart} |")
        except Exception as exc:  # noqa: BLE001
            print(f"| {name} | error: {type(exc).__name__} | | | | | |")
    spark.stop()


if __name__ == "__main__":
    main()

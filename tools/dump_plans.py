"""Dump `.explain("formatted")` for registered queries to plans/r11/.

Usage: python tools/dump_plans.py <suffix> [query ...]

Writes plans/r11/<query>_<suffix>.txt for each named query (default: all).
Plans are built at sf0.001 — plan SHAPE (exchanges, join strategy, pushed
filters, scan schema, Python-eval nodes) is what the files capture; it is
scale-independent apart from AQE runtime choices.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from dlt_iceberg_spark.plans import explain_str  # noqa: E402
from dlt_iceberg_spark.queries import REGISTRY  # noqa: E402
from dlt_iceberg_spark.session import get_spark  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(REGISTRY)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            text = explain_str(df, "formatted")
        except Exception as exc:  # noqa: BLE001
            text = f"ERROR building plan: {type(exc).__name__}: {exc}"
        with open(os.path.join(OUT_DIR, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text + "\n")
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

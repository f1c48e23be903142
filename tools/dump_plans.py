"""Dump `.explain("formatted")` for registered queries.

Usage: python tools/dump_plans.py [--root DIR] [--out DIR] <suffix> [query ...]

Writes <out>/<query>_<suffix>.txt for each named query (default: all).
``--root`` is the repo root to import from (default: this file's parent's
parent, so the tool runs from any checkout/worktree — ADVICE r11);
``--out`` is the plan directory (default: <root>/plans/<suffix-round> is NOT
guessed — it defaults to <root>/plans/current; pass e.g. plans/r12).
Plans are built at sf0.001 — plan SHAPE (exchanges, join strategy, pushed
filters, scan schema, Python-eval nodes) is what the files capture; it is
scale-independent apart from AQE runtime choices.
"""

from __future__ import annotations

import argparse
import os
import sys

_DEFAULT_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=_DEFAULT_ROOT)
    ap.add_argument("--out", default=None, help="plan output dir (default <root>/plans/current)")
    ap.add_argument("suffix", nargs="?", default="before")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    sys.path.insert(0, args.root)

    from dlt_iceberg_spark.plans import explain_str
    from dlt_iceberg_spark.queries import REGISTRY
    from dlt_iceberg_spark.session import get_spark

    out_dir = args.out or os.path.join(args.root, "plans", "current")
    names = args.queries or list(REGISTRY)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            text = explain_str(df, "formatted")
        except Exception as exc:  # noqa: BLE001
            text = f"ERROR building plan: {type(exc).__name__}: {exc}"
        with open(os.path.join(out_dir, f"{name}_{args.suffix}.txt"), "w") as f:
            f.write(text + "\n")
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

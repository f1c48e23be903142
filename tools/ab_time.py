"""A/B per-query timing: run K warm noop-sink samples for each named query
against the repo tree given by --root, print one JSON line with medians.

Used for optimization before/after claims when full-suite bench runs are
too noisy / too slow to A-B: run this alternately against two checkouts
(B, A, A, B) and compare pooled medians — machine drift cancels.

Usage:
  python tools/ab_time.py --root /root/repo --samples 5 q1 q2 ...

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/repo")
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, args.root)
    from dlt_iceberg_spark.queries import REGISTRY  # noqa: E402
    from dlt_iceberg_spark.session import get_spark  # noqa: E402

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_time")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for name in args.names:
        spec = REGISTRY[name]
        samples = []
        for i in range(args.samples + 1):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ab:{name}:{i}")
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if i:  # first sample warms codegen/fixture caches, dropped
                samples.append(dt)
        out[name] = {
            "median": round(statistics.median(samples), 4),
            "samples": [round(s, 4) for s in samples],
        }
    print(json.dumps({"root": args.root, "queries": out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

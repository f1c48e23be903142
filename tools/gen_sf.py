"""Deterministic scale-up generator: replicate a driver-generated sf dir
into a larger tier (default sf0.1 → sf1) for the opt-in bench tier.

The sf0.1 suite is sub-second per query on 32 cores, so plan differences
drown in noise; this builds a ~10× tier (≈6M lineitem rows — TPC-H sf1
scale) without reimplementing the driver's generator: each replica k of
the base data is a DISJOINT key sub-universe (all join keys offset by
k·stride) with the same join fan-out and value distributions, so every
registry query runs unchanged and its cost scales with the multiplier.

Replica variation (seeded by the replica index — no RNG, rerunning is
byte-stable):

- ``documents.text``: per-replica vowel rotation via ``translate`` —
  changes most shingles/hashes (so dedup tiers don't collapse into
  10-clone clusters) while preserving length, whitespace structure and
  ``n_chars`` exactly;
- ``embeddings.embedding``: cyclic shift by k — distinct vectors, same
  norm, same per-dimension marginals;
- ``events``: ids/users offset, timestamps kept (event density grows with
  sf, like a busier day, keeping window queries meaningful);
- dimension tables ``region``/``nation`` are shared reference data and
  stay single-copy (as in TPC-H, where nation is always 25 rows).

Usage:
    python tools/gen_sf.py [--mult 10] [--base /root/testdata/sf0.1]
                           [--out /tmp/spark_graft_sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

#: join/id key columns to offset per replica, per table
_KEY_OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

#: key stride: far above any base-tier key so replica universes never collide
_STRIDE = 100_000_000

_VOWELS = "aeiou"


def _replicate(df: DataFrame, table: str, k: int) -> DataFrame:
    if k == 0:
        return df
    out = df
    for col in _KEY_OFFSETS.get(table, []):
        out = out.withColumn(col, (F.col(col) + F.lit(k * _STRIDE)).cast(df.schema[col].dataType))
    if table == "documents":
        # vowel rotation alone repeats at k=5 (rot is mod-5); the extra
        # consonant swap for k >= 5 keeps all 10 replicas pairwise distinct
        # so the tier's dup structure is the base corpus's, scaled — not
        # artificial cross-replica twins
        rot = _VOWELS[k % 5 :] + _VOWELS[: k % 5]
        src_alpha, dst_alpha = _VOWELS, rot
        if k >= 5:
            src_alpha += "st"
            dst_alpha += "ts"
        out = out.withColumn("text", F.translate("text", src_alpha, dst_alpha))
    if table == "embeddings":
        dim_shift = k % 8
        if dim_shift:
            e = F.col("embedding")
            out = out.withColumn(
                "embedding",
                F.concat(
                    F.slice(e, dim_shift + 1, F.size(e) - dim_shift), F.slice(e, 1, dim_shift)
                ).cast(df.schema["embedding"].dataType),
            )
    return out


def generate(spark, base: str, out_dir: str, mult: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for table in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        src = spark.read.parquet(os.path.join(base, f"{table}.parquet"))
        if table in ("region", "nation"):
            scaled = src  # shared reference dims (fixed size in TPC-H too)
        else:
            scaled = src
            for k in range(1, mult):
                scaled = scaled.unionByName(_replicate(src, table, k))
        target = os.path.join(out_dir, f"{table}.parquet")
        scaled.write.mode("overwrite").parquet(target + ".dir")
        # single-path parquet like the driver's layout (dir with part files
        # is fine for spark.read.parquet — keep the same .parquet suffix)
        if os.path.exists(target):
            import shutil

            shutil.rmtree(target) if os.path.isdir(target) else os.remove(target)
        os.rename(target + ".dir", target)
        print(f"wrote {table}: {spark.read.parquet(target).count()} rows", file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/spark_graft_sf1")
    args = ap.parse_args()
    from dlt_iceberg_spark.session import get_spark

    spark = get_spark("gen-sf")
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark, args.base, args.out, args.mult)
    spark.stop()


if __name__ == "__main__":
    main()

"""Approximate aggregates for corpus-scale profiling.

At 100 TB, exact ``COUNT(DISTINCT)`` / exact percentiles / exact top-k all
require either a full shuffle on the value or a giant state; the sketch
forms below are single-pass, mergeable (partial aggregation map-side), and
bounded-memory — HyperLogLog++ for cardinality, Greenwald-Khanna for
quantiles, and a groupBy-count top-k whose shuffle carries one row per
distinct value (acceptable skew → cap with a pre-filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(df: DataFrame, cols: list[str], rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct counts, one output row.

    ``rsd`` is the target relative standard deviation (2.5 KB of sketch at
    5%); sketches merge across partitions without row exchange."""
    return df.agg(
        *[F.approx_count_distinct(c, rsd=rsd).alias(f"{c}_approx_distinct") for c in cols]
    )


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Greenwald-Khanna approximate quantiles as one array column
    (error ≤ 1/accuracy relative rank)."""
    return df.agg(
        F.percentile_approx(col, list(probabilities), accuracy).alias(f"{col}_quantiles")
    )


def heavy_hitters(df: DataFrame, col: str, k: int = 20) -> DataFrame:
    """Top-k most frequent values: groupBy-count (map-side partial combine,
    shuffle = one row per distinct value) + global top-k.

    ONE pass over the data: the total rides the same aggregate as the
    counts (sum over the group counts broadcast back as a 1-row cross
    join), and both consumers share the groupBy's shuffle via Spark's
    ReusedExchange — the old ``df.count()`` pre-pass read the input twice,
    doubling scan cost on a 100 TB profile probe.

    Output: (value, n, share) ordered by frequency."""
    counts = df.groupBy(F.col(col).alias("value")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # sum over group counts == total rows (the null group included)
    total = counts.agg(F.sum("n").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .orderBy(F.col("n").desc(), F.col("value"))
        .limit(k)
        .select(
            "value",
            "n",
            (F.col("n") / F.col("_total").cast("double")).alias("share"),
        )
    )


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-pass per-column profile: nulls, approx distincts, min/max.

    All aggregates ride in a single job (one scan), the profile pattern for
    schema-drift monitoring over landed batches."""
    fields = [f for f in df.schema.fields if cols is None or f.name in cols]
    aggs = []
    for f in fields:
        c = f.name
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.approx_count_distinct(c).alias(f"{c}__approx_distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs).collect()[0].asDict()
    rows = [
        {
            "column": f.name,
            "dtype": f.dataType.simpleString(),
            "rows": wide[f"{f.name}__rows"],
            "nulls": wide[f"{f.name}__nulls"],
            "approx_distinct": wide[f"{f.name}__approx_distinct"],
            "min": wide[f"{f.name}__min"],
            "max": wide[f"{f.name}__max"],
        }
        for f in fields
    ]
    return df.sparkSession.createDataFrame(
        rows,
        "column string, dtype string, rows long, nulls long, approx_distinct long, min string, max string",
    )


def kmv_sketch(
    df: DataFrame, col: str, k: int = 256, hash_mode: str = "xx"
) -> DataFrame:
    """K-minimum-values (theta) sketch of a column's distinct values: the
    ``k`` smallest of the distinct hashes, as ONE row ``(ks, n)`` where
    ``ks`` is the sorted hash array and ``n = len(ks)``.

    Unlike HyperLogLog, KMV sketches support INTERSECTION (set overlap)
    estimates — the standard pre-flight for cross-corpus dedup: estimate
    the Jaccard overlap of two document sets from two k-row sketches
    before paying for the real similarity join.  Distributed shape:
    ``distinct → orderBy → limit(k)`` compiles to map-side partial
    distinct plus ``TakeOrderedAndProject`` — every partition forwards at
    most k candidates, so no aggregation state ever holds the corpus's
    distinct set (a bare ``collect_set`` would).

    ``hash_mode='md5'`` makes the sketch cross-engine replayable (DuckDB:
    ``('0x' || substr(md5(v), 1, 15))::BIGINT``); 'xx' (xxhash64) is the
    cheap JVM path.
    """
    h = (
        f"xxhash64({col})"
        if hash_mode == "xx"
        else f"CAST(conv(substr(md5(CAST({col} AS STRING)), 1, 15), 16, 10) AS BIGINT)"
    )
    mins = df.selectExpr(f"{h} AS _h").distinct().orderBy("_h").limit(k)
    return (
        mins.groupBy()
        .agg(F.sort_array(F.collect_list("_h")).alias("ks"))
        .selectExpr("ks", "size(ks) AS n")
    )


def kmv_overlap_estimate(
    a_ks: list, b_ks: list, k: int, hash_mode: str = "xx"
) -> dict:
    """Driver-side combine of two KMV sketches (each a sorted hash list):
    estimated distinct counts, intersection, and Jaccard.

    Standard theta-sketch estimators: with ``kth`` the k-th smallest hash
    of the UNION sample, ``theta`` is the sampled fraction of the hash
    domain (signed 64-bit for 'xx', 60-bit non-negative for 'md5');
    distinct(U) ≈ (|sample|-1)/theta, and sample members present in both
    input sketches estimate the intersection by inclusion fraction.
    EXACT (flagged) when both sides hold fewer than k values — the sketch
    then IS the full distinct hash set.
    """
    sa, sb = set(a_ks), set(b_ks)
    union = sorted(sa | sb)
    if len(a_ks) < k and len(b_ks) < k:
        inter = len(sa & sb)
        return {
            "distinct_a": float(len(sa)),
            "distinct_b": float(len(sb)),
            "intersection": float(inter),
            "jaccard": inter / len(union) if union else 0.0,
            "exact": True,
        }
    kth_idx = min(k, len(union)) - 1
    kth = union[kth_idx]
    if hash_mode == "md5":
        theta = (kth + 1) / 2.0**60
    else:
        theta = (kth + 2**63 + 1) / 2.0**64
    sample = union[: kth_idx + 1]
    in_a = sum(1 for h in sample if h in sa)
    in_b = sum(1 for h in sample if h in sb)
    in_both = sum(1 for h in sample if h in sa and h in sb)
    est_union = (len(sample) - 1) / theta if theta > 0 else float(len(sample))
    jacc = in_both / len(sample) if sample else 0.0
    return {
        "distinct_a": (in_a - 1) / theta if theta > 0 else float(in_a),
        "distinct_b": (in_b - 1) / theta if theta > 0 else float(in_b),
        "intersection": jacc * est_union,
        "jaccard": jacc,
        "exact": False,
    }

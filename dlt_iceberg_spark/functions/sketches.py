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

    Output: (value, n, share) ordered by frequency."""
    total = df.count()
    return (
        df.groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("value"))
        .limit(k)
        .withColumn("share", F.col("n") / F.lit(float(total)))
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

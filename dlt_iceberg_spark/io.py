"""Parquet table loading for the driver testdata.

The reference reads dlt-produced parquet with ``pq.read_table``
(destination_client.py:189-195); here the scan is Spark's vectorized parquet
reader so predicate pushdown / column pruning / partition-sized splits come
from Catalyst for free.

One real-world wrinkle handled here: ``events.ts`` is parquet
``TIMESTAMP(NANOS)``, which Spark 4 refuses by default.  We read it via
``spark.sql.legacy.parquet.nanosAsLong`` and truncate to microseconds
(``TimestampNTZType``), exactly matching the reference's µs precision cap
(destination_client.py:1581) and DuckDB's ``ts::TIMESTAMP`` truncation.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: per-session plan cache: ``spark.read.parquet`` re-infers the schema from
#: the footer on every call (~100 ms of driver time); a DataFrame is an
#: immutable logical plan, so reusing one per (session, dir, table) is safe
#: for the immutable driver fixtures and removes that cost from every query
#: build.  Weak keys let stopped sessions drop their entries.
_PLAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Columns stored as parquet TIMESTAMP(NANOS); converted to µs TimestampNTZ on load.
_NANOS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame with normalized types."""
    try:
        per_session = _PLAN_CACHE.setdefault(spark, {})
    except TypeError:  # session not weak-referenceable; skip caching
        per_session = {}
    key = (os.path.abspath(sf_dir), name)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _NANOS_COLS.get(name, ())
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        dtype = dict(df.dtypes).get(c)
        if dtype == "bigint":
            # long ns-since-epoch -> µs TimestampNTZ. Integer `div`, NOT `/`:
            # float division loses the last µs digit at ~1.7e15 (double ulp),
            # which shows up as ±1 µs vs the DuckDB oracle's ts::TIMESTAMP.
            df = df.withColumn(
                c,
                F.timestamp_micros(F.expr(f"`{c}` div 1000")).cast("timestamp_ntz"),
            )
        elif dtype and dtype.startswith("timestamp") and dtype != "timestamp_ntz":
            # already µs-precision parquet TIMESTAMP; normalize to NTZ only
            df = df.withColumn(c, F.col(c).cast("timestamp_ntz"))
    per_session[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}

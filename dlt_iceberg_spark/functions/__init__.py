"""Scalar / aggregate function surface.

The reference ships NO scalar function library of its own — every SQL
function its users call comes from DuckDB through the dataset views
(SURVEY.md §2.11, sql_client.py:142-146).  The Spark analogue is
``pyspark.sql.functions`` + ``spark.sql`` (a superset), so this package
only adds what is engine-specific:

- :mod:`columns` — deterministic cross-engine helpers (float
  normalization, vector math, tokenization) reused across operators;
- :mod:`sketches` — approximate aggregates (distinct counts, quantiles,
  heavy hitters) sized for 100 TB profiling sweeps where exact
  distinct/sort would shuffle the world.
"""

from dlt_iceberg_spark.functions.columns import (
    cosine,
    dot,
    l2_norm,
    rnd,
    shingles,
    tokens,
)
from dlt_iceberg_spark.functions.sketches import (
    approx_distinct,
    approx_quantiles,
    column_profile,
    heavy_hitters,
    kmv_overlap_estimate,
    kmv_sketch,
)

__all__ = [
    "rnd",
    "dot",
    "cosine",
    "l2_norm",
    "tokens",
    "shingles",
    "approx_distinct",
    "approx_quantiles",
    "heavy_hitters",
    "kmv_overlap_estimate",
    "kmv_sketch",
    "column_profile",
]

"""Skew mitigation: salted aggregation and salted broadcast-side join.

AQE's skew-join splitting handles sort-merge join skew at runtime, but two
cases still need explicit salting at 100 TB:

- **Skewed aggregation with expensive combiners** (``collect_list``,
  ``count_distinct``): one reducer receives a hot key's entire payload.
  ``salted_agg`` does a two-stage aggregate — stage 1 on (key, salt) spreads
  the hot key over N reducers, stage 2 merges the N partials — valid for
  any algebraic aggregate (one that exposes a merge step).
- **Hot-key shuffle join where neither side broadcasts whole**:
  ``salted_join`` salts the big side and EXPLODES the small side N×
  (each small row duplicated per salt), turning one hot partition into N
  even ones at the cost of an N× copy of the small side only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Uniform pseudo-random salt in [0, n_salts) — deterministic per row
    content is NOT required, only uniformity, so a cheap xxhash64 of a
    monotonic id is used (no Python, no shuffle)."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int"),
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``partial_aggs`` run per (keys, salt); ``merge_aggs`` combine the
    partials per keys — e.g. partial ``count(1) AS c`` merged by
    ``sum(c) AS c``; partial ``collect_list(x) AS xs`` merged by
    ``flatten(collect_list(xs)) AS xs``."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side exploded N×.

    The join key becomes (on…, salt): a hot key's rows land in ``n_salts``
    partitions instead of one. Use when the small side exceeds broadcast
    budget but is far smaller than the big side."""
    b = with_salt(big, n_salts)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return b.join(s, on=[*on, "_salt"], how=how).drop("_salt")

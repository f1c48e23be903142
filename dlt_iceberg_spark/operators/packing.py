"""Sequence packing: group variable-length documents into ~fixed-token
packs (context windows) for training.

The textbook greedy first-fit packer is inherently sequential — one pass,
one bin state — which can't distribute.  The Spark-first form trades a few
percent of packing density for full parallelism:

1. hash documents into ``groups`` independent streams (md5-based, so the
   assignment is deterministic and engine-portable, like
   ``operators/sampling.py``);
2. within each group, a running token sum over a deterministic order
   assigns pack ids by integer-dividing the PRECEDING total by the budget
   — each group's window is independent, so one window task per group,
   never a single global sort;
3. a pack never spans groups, so packs stay local and the whole operator
   is one shuffle (the window partition-by).

Each pack ends at most one document past the budget (the overflowing doc
starts it); oversized single documents get a pack of their own.  At 100 TB
``groups`` scales with the cluster (packs per group stay >> 1, so density
loss stays negligible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    n_tokens_col: str,
    budget: int,
    id_col: str = "doc_id",
    groups: int = 16,
) -> DataFrame:
    """Assign every row a ``pack_id`` such that each pack's token total
    stays near ``budget``.  Adds ``pack_group`` and ``pack_id`` columns;
    deterministic in ``id_col``."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if groups < 1:
        raise ValueError(f"groups must be >= 1, got {groups}")
    grp = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint") % groups
    ).alias("pack_group")
    # ROWS frame, not the default RANGE: RANGE gives every ORDER-BY tie the
    # same (collapsed) running total, which merges all tied rows into one
    # giant pack.  ``id_col`` must be UNIQUE for the result to be
    # deterministic (with ties the within-tie order is engine-defined).
    w = (
        Window.partitionBy("pack_group")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = F.sum(F.col(n_tokens_col)).over(w) - F.col(n_tokens_col)
    bucket = F.expr(f"_pack_run div {budget}")
    return (
        df.withColumn("pack_group", grp)
        .withColumn("_pack_run", run)
        .withColumn("pack_id", F.col("pack_group") * F.lit(1 << 32) + bucket)
        .drop("_pack_run")
    )


def pack_oracle_sql(
    table: str, n_tokens_sql: str, budget: int, id_col: str = "doc_id", groups: int = 16
) -> str:
    """DuckDB equivalent of :func:`pack_sequences` (same hash grouping,
    same window arithmetic) for oracle verification."""
    return f"""
    SELECT {id_col}, pack_group,
           -- DuckDB's windowed sum() yields HUGEINT; without the cast the
           -- column round-trips through pandas as float64 and hash-mismatches
           -- Spark's BIGINT even though the values are identical.
           CAST(pack_group * 4294967296 + ((run - n_tok) // {budget}) AS BIGINT)
             AS pack_id
    FROM (
      SELECT {id_col},
             CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 8) AS BIGINT)
               % {groups} AS pack_group,
             {n_tokens_sql} AS n_tok,
             sum({n_tokens_sql}) OVER (
               PARTITION BY CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 8) AS BIGINT)
                 % {groups}
               ORDER BY {id_col}
               ROWS UNBOUNDED PRECEDING
             ) AS run
      FROM {table}
    )
    """

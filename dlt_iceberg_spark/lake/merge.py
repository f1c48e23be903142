"""Merge disposition semantics as pure DataFrame plans.

The reference implements merge two ways (SURVEY.md §2.2):
- upsert: PyIceberg ``upsert(when_matched_update_all, when_not_matched_insert_all)``
  batched at 500k rows (destination_client.py:1437-1469);
- delete-insert: build an ``In``/``Or(And(EqualTo…))`` key filter from
  *collected* PK values, then ``txn.delete(filter); txn.append(rows)``
  (destination_client.py:1170-1212, merge_utils.py:17-42).

Both have the same observable result when the update replaces all columns:
    result = source ∪ (target ⟕anti source on keys)

The reference's collect-keys-to-driver pattern (merge_utils.py:8-14) is its
main scalability flaw and is deliberately NOT reproduced: at 100 TB the key
set doesn't fit on the driver.  Here the anti-join is a distributed shuffle
(or broadcast when the source batch is small — Spark's AQE picks, and we hint
``broadcast`` when the caller marks the batch small).

Hard deletes (destination_client.py:1214-1254): rows whose
``hard_delete_column`` is non-null delete their keys from the target and do
not survive into the merged output; all-deleted short-circuits naturally.

Duplicate source keys: like Iceberg's MERGE, ambiguous multi-matches are
invalid; we dedupe the source batch last-write-wins by an optional order
column, else arbitrarily-but-deterministically (max by all columns is not
meaningful, so we use ``dropDuplicates`` which keeps an arbitrary row —
callers wanting strict semantics pass ``dedupe_order_col``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dedupe_source(source: DataFrame, keys: Sequence[str], dedupe_order_col: str | None) -> DataFrame:
    if dedupe_order_col is None:
        return source.dropDuplicates(list(keys))
    w = Window.partitionBy(*keys).orderBy(F.col(dedupe_order_col).desc())
    return (
        source.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_plan(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    dedupe_order_col: str | None = None,
    broadcast_source: bool = False,
) -> DataFrame:
    """MERGE … WHEN MATCHED UPDATE SET * WHEN NOT MATCHED INSERT * as a plan.

    Equivalent to the reference's upsert (destination_client.py:1456-1461)
    without its 500k-row driver-side batching — the join distributes.
    """
    keys = list(keys)
    src = _dedupe_source(source.select(*target.columns), keys, dedupe_order_col)
    join_src = F.broadcast(src.select(*keys)) if broadcast_source else src.select(*keys)
    untouched = target.join(join_src, on=keys, how="left_anti")
    return untouched.unionByName(src)


def delete_insert_plan(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    broadcast_source: bool = False,
) -> DataFrame:
    """Reference delete-insert (destination_client.py:1170-1212): delete every
    target row whose key appears in the batch, then append the whole batch.

    Identical observable to :func:`upsert_plan` except duplicate batch keys
    all survive (the reference appends the full batch).
    """
    keys = list(keys)
    src = source.select(*target.columns)
    batch_keys = src.select(*keys).distinct()
    if broadcast_source:
        batch_keys = F.broadcast(batch_keys)
    untouched = target.join(batch_keys, on=keys, how="left_anti")
    return untouched.unionByName(src)


def split_hard_deletes(source: DataFrame, hard_delete_col: str) -> tuple[DataFrame, DataFrame]:
    """(rows to delete, rows to keep) by non-null hard-delete marker
    (destination_client.py:1241-1246 uses pc.is_valid / pc.invert)."""
    deletes = source.filter(F.col(hard_delete_col).isNotNull())
    keeps = source.filter(F.col(hard_delete_col).isNull())
    return deletes, keeps


def merge_plan(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    strategy: str = "delete-insert",
    hard_delete_col: str | None = None,
    dedupe_order_col: str | None = None,
    broadcast_source: bool = False,
) -> DataFrame:
    """Full merge disposition: optional hard-delete split, then strategy.

    One logical plan → one write → one snapshot, preserving the reference's
    single-transaction observable (destination_client.py:1204-1211).
    """
    keys = list(keys)
    if hard_delete_col is not None and hard_delete_col in source.columns:
        deletes, keeps = split_hard_deletes(source, hard_delete_col)
        # Deleted keys vanish from the target; kept rows merge normally.
        del_keys = deletes.select(*keys).distinct()
        if broadcast_source:
            del_keys = F.broadcast(del_keys)
        target = target.join(del_keys, on=keys, how="left_anti")
        source = keeps
    if strategy == "upsert":
        return upsert_plan(target, source, keys, dedupe_order_col, broadcast_source)
    if strategy == "delete-insert":
        return delete_insert_plan(target, source, keys, broadcast_source)
    raise ValueError(f"unknown merge strategy: {strategy!r}")

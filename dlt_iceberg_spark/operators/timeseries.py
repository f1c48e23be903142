"""Time-series gap-fill and downsampling — TimescaleDB's
``time_bucket_gapfill`` / ``locf`` / ``interpolate`` shape, Spark-first.

Spark's ``window()`` aggregation downsamples, but emits rows only for
buckets that contain data; dashboards, rate computations, and training
pipelines that window over regular grids (e.g. per-hour activity vectors)
need the EMPTY buckets too, with a fill policy per measure.  The engine
the reference delegates to has no equivalent either — aggregation is
delegated SQL (SURVEY.md §2.5) — so this is a beyond-parity operator in
the events-analytics family (asof.py, range_join.py).

Shape (all DataFrame ops, zero UDFs):

1. **Downsample**: one hash aggregation on ``(keys, bucket)`` — the only
   full-data shuffle in the plan.  Buckets are epoch-aligned tumbling
   windows (``F.window``), so any engine that buckets the same width on
   a :00-aligned origin (DuckDB ``time_bucket``) agrees bit-for-bit.
2. **Densify**: the bucket grid is built once from a 1-row
   ``sequence(start, end, width)`` and broadcast against the distinct
   key frame — |keys| x |buckets| rows.  The grid is metadata-sized
   (range/width), never data-sized; the cross join is explicitly
   broadcast on the grid side so the key frame never moves.
3. **Fill**: per-key window functions over the dense frame —
   ``locf`` carries the last observation forward (``last ignorenulls``),
   ``zero`` coalesces, ``interpolate`` draws the line between the
   neighbouring observations (prev/next value+time via mirrored
   unbounded windows, pure column arithmetic).

At 100 TB the dense frame is the product of key cardinality and grid
length — both chosen by the caller, both independent of input row count;
the aggregation shuffle dominates and is unavoidable for any grouped
downsample.  Skewed keys behave like any keyed shuffle (salt upstream).
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_AGG_FNS = {
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
}
_FILLS = ("locf", "zero", "interpolate", None)


def _agg_col(spec: tuple, out: str) -> Column:
    fn = spec[0]
    if fn == "count":
        if len(spec) == 1 or spec[1] == "*":
            return F.count(F.lit(1)).alias(out)
        return F.count(F.col(spec[1])).alias(out)
    if fn in _AGG_FNS:
        return _AGG_FNS[fn](F.col(spec[1])).alias(out)
    raise ValueError(f"unknown aggregate {fn!r} for {out!r}")


def gapfill(
    df: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    bucket_width: str = "1 hour",
    aggs: dict[str, tuple] | None = None,
    fill: dict[str, str | None] | None = None,
    start: Any = None,
    end: Any = None,
    bucket_col: str = "bucket",
    gap_col: str = "is_gap",
) -> DataFrame:
    """Downsample ``df`` into tumbling ``bucket_width`` buckets per key and
    return a DENSE grid — one row per (key, bucket) over [start, end] —
    with missing buckets synthesized and filled per ``fill``.

    ``aggs`` maps output column -> ("sum"|"avg"|"min"|"max"|"count", src)
    (count may omit src or use "*").  ``fill`` maps output column ->
    "locf" | "zero" | "interpolate" | None (None leaves NULL; unlisted
    columns default to None).  ``start``/``end`` default to the observed
    min/max bucket across the whole frame (one O(1)-output job); pass
    them explicitly to pin the grid (TimescaleDB requires this —
    deriving them is a convenience).  ``gap_col`` marks synthesized rows.
    """
    if not aggs:
        raise ValueError("gapfill needs at least one aggregate")
    by_cols = [] if by is None else ([by] if isinstance(by, str) else list(by))
    bad = {c: f for c, f in (fill or {}).items() if f not in _FILLS}
    if bad:
        raise ValueError(f"unknown fill policies: {bad}")
    unknown = set(fill or {}) - set(aggs)
    if unknown:
        raise ValueError(f"fill names unknown aggregates: {sorted(unknown)}")
    reserved = set(by_cols) | {bucket_col, gap_col}
    if reserved & set(aggs):
        raise ValueError(
            f"aggregate columns collide with {sorted(reserved & set(aggs))}"
        )

    # calendar widths (months/years) are variable-length, which F.window
    # cannot express — bucket by date_trunc instead; the sequence() grid
    # below handles calendar intervals natively either way
    m = re.fullmatch(r"\s*1\s+(month|year)s?\s*", bucket_width)
    if m:
        bucket = F.date_trunc(m.group(1), F.col(on))
    else:
        bucket = F.window(F.col(on), bucket_width).getField("start")
    bucketed = (
        df.groupBy(*by_cols, bucket.alias(bucket_col))
        .agg(*[_agg_col(spec, name) for name, spec in aggs.items()])
        .withColumn("__present", F.lit(True))
    )

    if start is None or end is None:
        row = bucketed.agg(
            F.min(bucket_col).alias("mn"), F.max(bucket_col).alias("mx")
        ).first()
        if row is None or row.mn is None:
            return bucketed.drop("__present").withColumn(gap_col, F.lit(False))
        start = row.mn if start is None else start
        end = row.mx if end is None else end

    spark = df.sparkSession
    grid = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("timestamp"),
                F.lit(end).cast("timestamp"),
                F.expr(f"interval {bucket_width}"),
            )
        ).alias(bucket_col)
    )
    keys = df.select(*by_cols).distinct() if by_cols else spark.range(1).drop("id")
    dense = keys.crossJoin(F.broadcast(grid))

    joined = dense.join(bucketed, on=[*by_cols, bucket_col], how="left")

    w_prev = (
        Window.partitionBy(*by_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(*by_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t = F.col(bucket_col).cast("double")

    out_cols: list[Column] = [*map(F.col, by_cols), F.col(bucket_col)]
    for name in aggs:
        c = F.col(name)
        policy = (fill or {}).get(name)
        if policy == "zero":
            filled = F.coalesce(c, F.lit(0))
        elif policy == "locf":
            filled = F.last(c, ignorenulls=True).over(w_prev)
        elif policy == "interpolate":
            pv = F.last(c, ignorenulls=True).over(w_prev)
            pt = F.last(F.when(c.isNotNull(), t), ignorenulls=True).over(w_prev)
            nv = F.first(c, ignorenulls=True).over(w_next)
            nt = F.first(F.when(c.isNotNull(), t), ignorenulls=True).over(w_next)
            line = pv + (nv - pv) * (t - pt) / (nt - pt)
            # inside a gap draw the line; outside the observed range stay null
            filled = F.coalesce(c, line)
        else:
            filled = c
        out_cols.append(filled.alias(name))
    out_cols.append(F.col("__present").isNull().alias(gap_col))
    return joined.select(*out_cols)

"""Interval (range) join — points joined to time intervals at scale.

Spark plans a raw inequality join (``l.ts BETWEEN r.start AND r.end``) as a
broadcast-nested-loop or cartesian product — O(n·m) comparisons, hopeless
at corpus scale.  The scalable form is **binning**: quantize time into
fixed buckets, explode each interval across the buckets it overlaps, then
equi-join on (keys…, bucket) and refine with the exact predicate.  Each
point lives in exactly one bucket, so a (point, interval) pair meets at
most once — no post-join dedup.  Cost: one keyed shuffle, fan-out = mean
interval length / bucket length (pick the bucket near the median interval
length to keep it O(1)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: str | list[str] | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join each point row to every interval row containing it
    (``start <= ts <= end``), optionally key-scoped via ``by`` (inner
    semantics; compose outer variants by re-joining the interval table
    against the aggregated result)."""
    by_cols = [by] if isinstance(by, str) else list(by or [])
    overlap = set(points.columns) & set(intervals.columns) - set(by_cols)
    if overlap:
        raise ValueError(
            f"ambiguous columns {sorted(overlap)}: rename interval columns before joining"
        )
    # integer `div`: float division of µs-since-epoch loses precision at
    # bucket boundaries (same ulp hazard fixed in io.py)
    width = 1_000_000 * bucket_seconds

    def bucket(c: str):
        return F.expr(f"unix_micros(cast(`{c}` as timestamp)) div {width}L")

    p = points.withColumn("_bucket", bucket(point_ts))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(bucket(start_col), bucket(end_col))),
    )
    cond = [p["_bucket"] == iv["_bucket"]] + [p[c] == iv[c] for c in by_cols]
    refined = (
        p.join(iv, cond, "inner")
        .filter(
            (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
        )
        .drop(iv["_bucket"])
        .drop(p["_bucket"])
        .drop(*[iv[c] for c in by_cols])
    )
    return refined

"""Interval-join tests: containment, key scoping, bucket-boundary edges,
and cross-bucket intervals."""

import datetime

import pytest

from dlt_iceberg_spark.operators.range_join import interval_join


def _dt(h, m=0, s=0):
    return datetime.datetime(2024, 1, 1, h, m, s)


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [
            (1, 10, _dt(10, 30)),
            (2, 10, _dt(12, 0)),    # exactly at an interval end
            (3, 20, _dt(10, 30)),   # same time, other user
            (4, 10, _dt(15, 0)),    # matches nothing
        ],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    intervals = spark.createDataFrame(
        [
            (100, 10, _dt(10, 0), _dt(12, 0)),   # spans 3 hourly buckets
            (101, 20, _dt(10, 0), _dt(11, 0)),
            (102, 10, _dt(13, 0), _dt(13, 30)),
        ],
        "interval_id long, user_id long, start timestamp_ntz, end timestamp_ntz",
    )
    return points, intervals


def test_containment_and_key_scoping(frames):
    points, intervals = frames
    out = interval_join(points, intervals, by="user_id")
    got = {(r.event_id, r.interval_id) for r in out.collect()}
    assert got == {(1, 100), (2, 100), (3, 101)}


def test_end_boundary_inclusive(frames):
    points, intervals = frames
    out = interval_join(points, intervals, by="user_id")
    assert any(r.event_id == 2 for r in out.collect())  # ts == end matches


def test_no_key_scope_matches_all_users(frames):
    points, intervals = frames
    out = interval_join(points, intervals.drop("user_id"))
    # event 1 (10:30) now matches interval 101 too (no user scoping)
    got = {(r.event_id, r.interval_id) for r in out.collect()}
    assert (1, 101) in got and (3, 100) in got


def test_small_bucket_cross_interval(frames):
    """Intervals longer than the bucket still match exactly once per pair."""
    points, intervals = frames
    out = interval_join(points, intervals, by="user_id", bucket_seconds=60)
    rows = [(r.event_id, r.interval_id) for r in out.collect()]
    assert sorted(rows) == [(1, 100), (2, 100), (3, 101)]  # no duplicates


def test_ambiguous_columns_rejected(spark, frames):
    points, _ = frames
    bad = points.withColumnRenamed("event_id", "x").withColumnRenamed("ts", "start")
    with pytest.raises(ValueError, match="ambiguous"):
        interval_join(points, bad.withColumnRenamed("start", "ts"), by="user_id")

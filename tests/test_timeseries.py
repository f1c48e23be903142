"""gapfill: dense tumbling-bucket grids with locf/zero/interpolate fill.

Checks the TimescaleDB-shaped contract: the output is exactly
|keys| x |grid buckets| rows, synthesized rows are marked, and each fill
policy matches its hand-computed frame (locf carries, zero coalesces,
interpolate draws the line inside gaps and stays NULL outside the
observed range).
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dlt_iceberg_spark.operators.timeseries import gapfill


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture
def series(spark):
    rows = [
        # key "a": observations in hours 0, 1, 4  (gap at 2, 3)
        ("a", _ts(0, 10), 10.0),
        ("a", _ts(0, 40), 30.0),
        ("a", _ts(1, 5), 40.0),
        ("a", _ts(4, 59), 100.0),
        # key "b": observations in hours 1 and 2 only
        ("b", _ts(1, 0), 7.0),
        ("b", _ts(2, 30), 9.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def _by_key(out):
    return {
        (r.k, r.bucket.hour): (r.avg_v, r.n, r.is_gap)
        for r in out.collect()
    }


def test_dense_grid_marks_gaps_and_fills(series):
    out = gapfill(
        series,
        on="ts",
        by="k",
        bucket_width="1 hour",
        aggs={"avg_v": ("avg", "v"), "n": ("count",)},
        fill={"avg_v": "locf", "n": "zero"},
    )
    got = _by_key(out)
    # grid spans the GLOBAL observed range (hours 0..4) for every key
    assert len(got) == 2 * 5
    # key a: hours 2,3 are synthesized, locf carries 40.0, count zero-fills
    assert got[("a", 0)] == (20.0, 2, False)
    assert got[("a", 2)] == (40.0, 0, True)
    assert got[("a", 3)] == (40.0, 0, True)
    assert got[("a", 4)] == (100.0, 1, False)
    # key b: leading bucket (hour 0) precedes any observation -> locf NULL
    assert got[("b", 0)] == (None, 0, True)
    assert got[("b", 1)] == (7.0, 1, False)
    # trailing buckets carry the last observation forward
    assert got[("b", 4)] == (9.0, 0, True)


def test_interpolate_draws_line_inside_gap_only(spark):
    rows = [("a", _ts(0), 0.0), ("a", _ts(3), 30.0), ("a", _ts(5), 10.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = gapfill(
        df, by="k", bucket_width="1 hour",
        aggs={"v": ("avg", "v")}, fill={"v": "interpolate"},
        start=_ts(0), end=_ts(6),
    )
    got = {r.bucket.hour: r.v for r in out.collect()}
    assert got[0] == 0.0 and got[3] == 30.0 and got[5] == 10.0
    assert got[1] == pytest.approx(10.0) and got[2] == pytest.approx(20.0)
    assert got[4] == pytest.approx(20.0)  # between 30 (h3) and 10 (h5)
    assert got[6] is None  # beyond the last observation: no extrapolation


def test_explicit_grid_and_global_series(spark):
    df = spark.createDataFrame(
        [(_ts(1), 5.0)], "ts timestamp, v double"
    )
    out = gapfill(
        df, bucket_width="30 minutes",
        aggs={"total": ("sum", "v")}, fill={"total": "zero"},
        start=_ts(0), end=_ts(2),
    )
    rows = sorted(out.collect(), key=lambda r: r.bucket)
    assert len(rows) == 5  # 00:00 .. 02:00 inclusive
    assert [r.total for r in rows] == [0, 0, 5.0, 0, 0]
    assert [r.is_gap for r in rows] == [True, True, False, True, True]


def test_subhour_buckets_align_to_epoch(series):
    out = gapfill(
        series.filter(F.col("k") == "a"),
        by="k", bucket_width="15 minutes",
        aggs={"n": ("count",)}, fill={"n": "zero"},
        start=_ts(0), end=_ts(1),
    )
    minutes = sorted((r.bucket.hour, r.bucket.minute) for r in out.collect())
    assert minutes == [(0, 0), (0, 15), (0, 30), (0, 45), (1, 0)]


def test_empty_input_returns_empty_not_error(spark):
    df = spark.createDataFrame([], "k string, ts timestamp, v double")
    out = gapfill(df, by="k", aggs={"n": ("count",)})
    assert out.count() == 0


def test_validation_errors(series):
    with pytest.raises(ValueError, match="at least one aggregate"):
        gapfill(series, by="k", aggs={})
    with pytest.raises(ValueError, match="unknown fill"):
        gapfill(series, by="k", aggs={"n": ("count",)}, fill={"n": "pad"})
    with pytest.raises(ValueError, match="unknown aggregates"):
        gapfill(series, by="k", aggs={"n": ("count",)}, fill={"x": "zero"})
    with pytest.raises(ValueError, match="collide"):
        gapfill(series, by="k", aggs={"k": ("count",)})
    with pytest.raises(ValueError, match="unknown aggregate"):
        gapfill(series, by="k", aggs={"m": ("median", "v")})


def test_calendar_month_buckets(spark):
    """'1 month' is a variable-length calendar width F.window cannot
    express — gapfill buckets by date_trunc and grids with a calendar
    interval, so February and a 31-day month are both one bucket."""
    rows = [
        ("a", dt.datetime(2024, 1, 15), 10.0),
        ("a", dt.datetime(2024, 1, 20), 20.0),
        # February skipped entirely
        ("a", dt.datetime(2024, 3, 2), 30.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = gapfill(
        df, by="k", bucket_width="1 month",
        aggs={"total": ("sum", "v"), "n": ("count",)},
        fill={"total": "locf", "n": "zero"},
    )
    got = {r.bucket.month: (r.total, r.n, r.is_gap) for r in out.collect()}
    assert got == {
        1: (30.0, 2, False),
        2: (30.0, 0, True),   # synthesized, locf carries January's total
        3: (30.0, 1, False),
    }
    assert all(r.bucket.day == 1 for r in out.collect())


def test_calendar_year_buckets(spark):
    df = spark.createDataFrame(
        [("a", dt.datetime(2022, 6, 1), 1.0), ("a", dt.datetime(2024, 2, 1), 3.0)],
        "k string, ts timestamp, v double",
    )
    out = gapfill(
        df, by="k", bucket_width="1 year",
        aggs={"n": ("count",)}, fill={"n": "zero"},
    )
    got = {r.bucket.year: (r.n, r.is_gap) for r in out.collect()}
    assert got == {2022: (1, False), 2023: (0, True), 2024: (1, False)}

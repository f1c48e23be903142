"""As-of join tests: backward/forward, equal-ts inclusion, tolerance,
no-match nulls, multi-key, and row-count preservation."""

import datetime

import pytest
from pyspark.sql import functions as F

from dlt_iceberg_spark.operators.asof import asof_join


def _dt(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, _dt(10), "a"),
            (1, _dt(12), "b"),
            (2, _dt(11), "c"),
            (3, _dt(9), "d"),  # no right rows for key 3
        ],
        "key long, ts timestamp_ntz, payload string",
    )
    right = spark.createDataFrame(
        [
            (1, _dt(9), 100.0),
            (1, _dt(10), 150.0),   # equal-ts with left (1,10)
            (1, _dt(11, 30), 200.0),
            (2, _dt(11, 30), 300.0),  # after left (2,11)
        ],
        "key long, ts timestamp_ntz, price double",
    )
    return left, right


def test_backward_basic(sides):
    left, right = sides
    out = {(r.key, r.ts): r for r in asof_join(left, right, by="key").collect()}
    assert out[(1, _dt(10))].price_right == 150.0  # equal ts matches
    assert out[(1, _dt(12))].price_right == 200.0  # latest prior
    assert out[(2, _dt(11))].price_right is None   # right row is later
    assert out[(3, _dt(9))].price_right is None    # key absent
    assert len(out) == 4  # exactly one output row per left row


def test_forward(sides):
    left, right = sides
    out = {(r.key, r.ts): r for r in asof_join(left, right, by="key", direction="forward").collect()}
    assert out[(1, _dt(10))].price_right == 150.0   # equal ts still matches
    assert out[(2, _dt(11))].price_right == 300.0   # next right row
    assert out[(1, _dt(12))].price_right is None    # nothing after


def test_tolerance(sides):
    left, right = sides
    out = {
        (r.key, r.ts): r
        for r in asof_join(
            left, right, by="key", tolerance_expr="INTERVAL 45 MINUTES"
        ).collect()
    }
    assert out[(1, _dt(10))].price_right == 150.0   # 0 min away
    assert out[(1, _dt(12))].price_right == 200.0   # 30 min away, within 45


def test_tolerance_boundary(sides):
    left, right = sides
    out = {
        (r.key, r.ts): r
        for r in asof_join(left, right, by="key", tolerance_expr="INTERVAL 10 MINUTES").collect()
    }
    assert out[(1, _dt(12))].price_right is None    # 30 min away > 10 min
    assert out[(1, _dt(10))].price_right == 150.0   # exact hit stays


def test_left_columns_preserved(sides):
    left, right = sides
    out = asof_join(left, right, by="key")
    assert set(out.columns) == {"key", "ts", "payload", "price_right", "ts_right"}
    assert out.count() == left.count()


def test_multi_key(spark):
    left = spark.createDataFrame(
        [(1, "x", _dt(10)), (1, "y", _dt(10))], "k1 long, k2 string, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [(1, "x", _dt(9), 1.0), (1, "y", _dt(9, 30), 2.0)],
        "k1 long, k2 string, ts timestamp_ntz, v double",
    )
    out = {(r.k1, r.k2): r.v_right for r in asof_join(left, right, by=["k1", "k2"]).collect()}
    assert out == {(1, "x"): 1.0, (1, "y"): 2.0}

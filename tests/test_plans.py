"""Plan-quality regression tests for headline queries.

These pin the *shape* of the physical plan, not its results: filters reach
the parquet scan, projections prune columns, dimension joins broadcast, no
cartesian products. A change that keeps answers right but reads the whole
lake at 100 TB fails here.
"""

import pytest

from dlt_iceberg_spark.plans import (
    assert_no_cartesian,
    broadcast_join_count,
    pushed_filters,
    scan_columns,
)
from dlt_iceberg_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _q(spark, name):
    return REGISTRY[name].fn(spark, SF_DIR)


def test_q1_filter_pushed_and_columns_pruned(spark):
    df = _q(spark, "q1_pricing_summary")
    pushed = pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), pushed
    (cols,) = scan_columns(df)
    # 7 columns used of 11 in lineitem — tax/price/qty/discount/flags/date
    assert "l_partkey" not in cols and "l_suppkey" not in cols
    assert {"l_returnflag", "l_linestatus", "l_quantity"} <= cols


def test_q6_all_filters_pushed(spark):
    df = _q(spark, "q6_revenue_delta")
    pushed = " ".join(pushed_filters(df))
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert c in pushed, pushed
    (cols,) = scan_columns(df)
    assert cols == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_q5_dims_broadcast_no_cartesian(spark):
    df = _q(spark, "q5_nation_revenue")
    assert broadcast_join_count(df) >= 4  # orders, customer, supplier, nation(+region)
    assert_no_cartesian(df)


def test_q3_selective_dim_filter_pushed(spark):
    df = _q(spark, "q3_unshipped_revenue")
    pushed = " ".join(pushed_filters(df))
    assert "c_mktsegment" in pushed and "o_orderdate" in pushed and "l_shipdate" in pushed


def test_events_hourly_prunes_props(spark):
    df = _q(spark, "events_hourly")
    cols = scan_columns(df)
    assert all("props" not in c for c in cols), cols


def test_merge_upsert_no_cartesian(spark):
    assert_no_cartesian(_q(spark, "merge_upsert"))


@pytest.mark.parametrize(
    "name",
    ["q10_returned_customers", "q18_large_orders", "q21_waiting_suppliers", "ann_cosine_topk"],
)
def test_headliners_no_cartesian(spark, name):
    assert_no_cartesian(_q(spark, name))

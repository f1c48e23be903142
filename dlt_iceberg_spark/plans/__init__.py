"""Plan inspection & plan-quality assertions.

The reference has no optimizer of its own (SURVEY.md §4) — it relies on
DuckDB; here Catalyst is the optimizer, and this package makes its output a
testable artifact: parse ``explain``, extract pushed filters / read
schemas / join strategies / exchange counts, and assert the properties a
100 TB plan must have (filters reach the scan, dims broadcast, no
cartesian products, bounded shuffles).  tests/test_plans.py pins these for
the headline queries so a regression in plan shape fails CI even while
results stay correct.
"""

from dlt_iceberg_spark.plans.inspect import (
    assert_no_cartesian,
    broadcast_join_count,
    exchange_count,
    explain_str,
    pushed_filters,
    read_schemas,
    scan_columns,
    sort_merge_join_count,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schemas",
    "scan_columns",
    "exchange_count",
    "broadcast_join_count",
    "sort_merge_join_count",
    "assert_no_cartesian",
]

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``dlt_iceberg_spark.queries`` (registry of
QuerySpec: Spark DataFrame program + DuckDB oracle SQL).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dlt_iceberg_spark.queries import get_oracles, get_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q5-style snowflake
    join (6 tables, broadcast dims) producing per-nation revenue."""
    from dlt_iceberg_spark.queries import q5_nation_revenue

    return q5_nation_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §C ops)."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys missing here get rows-only checks."""
    return get_oracles()

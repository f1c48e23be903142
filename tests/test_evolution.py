"""Schema evolution policy (reference: tests/test_schema_evolution.py, FIXTURES.md F8)."""

import pytest
from pyspark.sql import types as T

from dlt_iceberg_spark.errors import SchemaEvolutionError
from dlt_iceberg_spark.schema.evolution import (
    can_promote_type,
    compare_schemas,
    evolve_schema_if_needed,
    validate_schema_changes,
)


def S(*fields):
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


def test_compare_detects_all_change_kinds():
    cur = S(("id", T.LongType(), False), ("name", T.StringType(), True), ("old", T.StringType(), True))
    inc = S(("id", T.LongType(), False), ("name", T.IntegerType(), True), ("score", T.DoubleType(), True))
    ch = compare_schemas(cur, inc)
    assert [f.name for f in ch.added] == ["score"]
    assert ch.type_changes == [("name", T.StringType(), T.IntegerType())]
    assert ch.dropped == ["old"]


@pytest.mark.parametrize(
    "src,dst,ok",
    [
        (T.IntegerType(), T.LongType(), True),
        (T.FloatType(), T.DoubleType(), True),
        (T.DecimalType(10, 2), T.DecimalType(12, 4), True),
        (T.DecimalType(12, 4), T.DecimalType(10, 2), False),
        (T.LongType(), T.IntegerType(), False),
        (T.DoubleType(), T.FloatType(), False),
        (T.StringType(), T.LongType(), False),
    ],
)
def test_promotion_rules(src, dst, ok):
    assert can_promote_type(src, dst) is ok


def test_validate_collects_unsafe_changes():
    cur = S(("a", T.LongType(), True), ("b", T.DoubleType(), True))
    inc = S(("a", T.IntegerType(), True), ("b", T.FloatType(), True))
    ch = compare_schemas(cur, inc)
    with pytest.raises(SchemaEvolutionError) as ei:
        validate_schema_changes(ch)
    assert "a" in str(ei.value) and "b" in str(ei.value)


def test_add_column_evolves():
    cur = S(("id", T.LongType(), False))
    inc = S(("id", T.LongType(), False), ("score", T.DoubleType(), True))
    evolved, changed = evolve_schema_if_needed(cur, inc)
    assert changed and [f.name for f in evolved.fields] == ["id", "score"]


def test_promotion_evolves_in_place():
    cur = S(("id", T.IntegerType(), False))
    inc = S(("id", T.LongType(), False))
    evolved, changed = evolve_schema_if_needed(cur, inc)
    assert changed and evolved["id"].dataType == T.LongType()


def test_sparse_nullable_column_kept():
    """FIXTURES.md F7: missing nullable column stays in schema."""
    cur = S(("a", T.LongType(), True), ("d", T.StringType(), True))
    inc = S(("a", T.LongType(), True))
    evolved, changed = evolve_schema_if_needed(cur, inc)
    assert not changed
    assert "d" in [f.name for f in evolved.fields]


def test_sparse_required_column_errors():
    cur = S(("a", T.LongType(), True), ("d", T.StringType(), False))
    inc = S(("a", T.LongType(), True))
    with pytest.raises(SchemaEvolutionError, match="required"):
        evolve_schema_if_needed(cur, inc)


def test_allow_column_drops_actually_drops():
    cur = S(("a", T.LongType(), True), ("d", T.StringType(), True))
    inc = S(("a", T.LongType(), True))
    evolved, changed = evolve_schema_if_needed(cur, inc, allow_column_drops=True)
    assert changed and [f.name for f in evolved.fields] == ["a"]


def test_no_change_is_noop():
    cur = S(("a", T.LongType(), True))
    evolved, changed = evolve_schema_if_needed(cur, cur)
    assert not changed and evolved == cur

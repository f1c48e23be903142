"""Cast-safety matrix (reference: tests/test_schema_casting.py, FIXTURES.md F10)."""

import pytest
from pyspark.sql import types as T

from dlt_iceberg_spark.errors import CastingError
from dlt_iceberg_spark.schema.casting import (
    Verdict,
    cast_dataframe_safe,
    check_pair,
    validate_cast,
)


def S(*fields):
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


# ---- pure pair rules -------------------------------------------------------

@pytest.mark.parametrize(
    "src,dst,verdict",
    [
        (T.IntegerType(), T.LongType(), Verdict.OK),
        (T.LongType(), T.IntegerType(), Verdict.STRICT_ERROR),
        (T.IntegerType(), T.DoubleType(), Verdict.OK),
        (T.DoubleType(), T.LongType(), Verdict.ERROR),
        (T.FloatType(), T.DoubleType(), Verdict.OK),
        (T.DoubleType(), T.FloatType(), Verdict.STRICT_ERROR),
        (T.DecimalType(10, 2), T.DecimalType(12, 4), Verdict.OK),
        (T.DecimalType(12, 4), T.DecimalType(10, 2), Verdict.ERROR),
        (T.TimestampNTZType(), T.TimestampType(), Verdict.WARN),
        (T.TimestampType(), T.TimestampNTZType(), Verdict.STRICT_ERROR),
        (T.BinaryType(), T.StringType(), Verdict.WARN),
        (T.StringType(), T.BinaryType(), Verdict.OK),
        (T.StringType(), T.LongType(), Verdict.ERROR),
        (T.LongType(), T.StringType(), Verdict.ERROR),
        (T.StringType(), T.StringType(), Verdict.OK),
        (T.DateType(), T.TimestampNTZType(), Verdict.OK),
    ],
)
def test_pair_matrix(src, dst, verdict):
    assert check_pair(src, dst)[0] == verdict


def test_array_element_rule_propagates():
    v, _ = check_pair(T.ArrayType(T.IntegerType()), T.ArrayType(T.LongType()))
    assert v == Verdict.OK
    v, _ = check_pair(T.ArrayType(T.DoubleType()), T.ArrayType(T.LongType()))
    assert v == Verdict.ERROR


# ---- validate_cast ---------------------------------------------------------

def test_strict_blocks_narrowing_nonstrict_proceeds():
    src = S(("x", T.LongType(), True))
    dst = S(("x", T.IntegerType(), True))
    with pytest.raises(CastingError):
        validate_cast(src, dst, strict=True)
    validate_cast(src, dst, strict=False)  # proceeds with warning


def test_float_to_int_always_fatal():
    src = S(("x", T.DoubleType(), True))
    dst = S(("x", T.LongType(), True))
    for strict in (True, False):
        with pytest.raises(CastingError):
            validate_cast(src, dst, strict=strict)


def test_source_column_not_in_target_fatal():
    src = S(("x", T.LongType(), True), ("extra", T.StringType(), True))
    dst = S(("x", T.LongType(), True))
    with pytest.raises(CastingError, match="extra"):
        validate_cast(src, dst)


def test_missing_required_target_always_fatal():
    """schema_casting.py:440-449: even non-strict."""
    src = S(("x", T.LongType(), True))
    dst = S(("x", T.LongType(), True), ("req", T.StringType(), False))
    with pytest.raises(CastingError, match="req"):
        validate_cast(src, dst, strict=False)


def test_missing_nullable_target_warns_not_fatal():
    src = S(("x", T.LongType(), True))
    dst = S(("x", T.LongType(), True), ("opt", T.StringType(), True))
    issues = validate_cast(src, dst)
    assert any(i.column == "opt" and i.verdict == Verdict.WARN for i in issues)


# ---- cast_dataframe_safe (Spark) ------------------------------------------

def test_cast_null_fill_and_reorder(spark):
    df = spark.createDataFrame([(1, "a")], "x int, y string")
    target = S(("y", T.StringType(), True), ("x", T.LongType(), True), ("z", T.DoubleType(), True))
    out = cast_dataframe_safe(df, target)
    assert out.columns == ["y", "x", "z"]
    row = out.collect()[0]
    assert (row.y, row.x, row.z) == ("a", 1, None)
    assert dict(out.dtypes)["x"] == "bigint"


def test_cast_shuffled_field_order_ok(spark):
    df = spark.createDataFrame([("a", 1)], "y string, x int")
    target = S(("x", T.LongType(), True), ("y", T.StringType(), True))
    out = cast_dataframe_safe(df, target)
    assert out.collect()[0].x == 1


def test_cast_multiple_missing_columns_filled(spark):
    """Reference golden (tests/test_sparse_schema.py): several missing
    nullable target columns all null-fill in one cast."""
    df = spark.createDataFrame([(1,)], "x long")
    target = S(
        ("x", T.LongType(), True),
        ("a", T.StringType(), True),
        ("b", T.DoubleType(), True),
        ("c", T.LongType(), True),
    )
    out = cast_dataframe_safe(df, target)
    row = out.collect()[0]
    assert (row.x, row.a, row.b, row.c) == (1, None, None, None)
    assert [f.name for f in out.schema.fields] == ["x", "a", "b", "c"]


def test_cast_missing_columns_work_in_strict_mode(spark):
    """Reference golden (tests/test_sparse_schema.py): strict mode rejects
    narrowing, but a missing NULLABLE column is sparse data, not a type
    error — it must null-fill even under strict=True."""
    df = spark.createDataFrame([(1,)], "x long")
    target = S(("x", T.LongType(), True), ("opt", T.StringType(), True))
    out = cast_dataframe_safe(df, target, strict=True)
    assert out.collect()[0].opt is None
    issues = validate_cast(df.schema, target, strict=True)
    assert all(i.verdict in (Verdict.OK, Verdict.WARN) for i in issues)

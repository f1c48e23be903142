"""Type-conversion matrix tests (reference: tests/test_schema_converter.py:22-104)."""

import pyarrow as pa
import pytest
from pyspark.sql import types as T

from dlt_iceberg_spark.schema.converter import (
    arrow_schema_to_spark,
    arrow_to_spark_type,
    dlt_type_to_spark,
    spark_type_to_dlt,
)


@pytest.mark.parametrize(
    "arrow_type,spark_type",
    [
        (pa.bool_(), T.BooleanType()),
        (pa.int8(), T.IntegerType()),
        (pa.int16(), T.IntegerType()),
        (pa.int32(), T.IntegerType()),
        (pa.uint8(), T.IntegerType()),
        (pa.uint16(), T.IntegerType()),
        (pa.int64(), T.LongType()),
        (pa.uint32(), T.LongType()),
        (pa.uint64(), T.LongType()),
        (pa.float32(), T.FloatType()),
        (pa.float64(), T.DoubleType()),
        (pa.decimal128(10, 2), T.DecimalType(10, 2)),
        (pa.string(), T.StringType()),
        (pa.large_string(), T.StringType()),
        (pa.binary(), T.BinaryType()),
        (pa.large_binary(), T.BinaryType()),
        (pa.timestamp("us", tz="UTC"), T.TimestampType()),
        (pa.timestamp("us"), T.TimestampNTZType()),
        (pa.date32(), T.DateType()),
        (pa.time64("us"), T.LongType()),  # documented deviation
        (pa.list_(pa.string()), T.ArrayType(T.StringType(), True)),
        (
            pa.map_(pa.string(), pa.int64()),
            T.MapType(T.StringType(), T.LongType(), True),
        ),
    ],
)
def test_arrow_type_matrix(arrow_type, spark_type):
    assert arrow_to_spark_type(arrow_type) == spark_type


def test_struct_recursion():
    at = pa.struct([pa.field("k", pa.string()), pa.field("v", pa.int64())])
    st = arrow_to_spark_type(at)
    assert isinstance(st, T.StructType)
    assert st["k"].dataType == T.StringType()
    assert st["v"].dataType == T.LongType()


def test_decimal_over_38_falls_back_to_string():
    with pytest.warns(UserWarning):
        assert arrow_to_spark_type(pa.decimal256(50, 2)) == T.StringType()


def test_dictionary_unwraps():
    assert arrow_to_spark_type(pa.dictionary(pa.int32(), pa.string())) == T.StringType()


def test_unknown_falls_back_to_string_with_warning():
    with pytest.warns(UserWarning):
        assert arrow_to_spark_type(pa.duration("s")) == T.StringType()


def test_nullability_hints_override():
    """Hints override only nullability (schema_converter.py:62-64)."""
    schema = pa.schema([pa.field("id", pa.int64(), nullable=True)])
    out = arrow_schema_to_spark(schema, {"id": {"nullable": False}})
    assert out["id"].nullable is False
    assert out["id"].dataType == T.LongType()


@pytest.mark.parametrize(
    "dlt_type,spark_type",
    [
        ("text", T.StringType()),
        ("bigint", T.LongType()),
        ("double", T.DoubleType()),
        ("bool", T.BooleanType()),
        ("timestamp", T.TimestampType()),
        ("date", T.DateType()),
        ("binary", T.BinaryType()),
        ("json", T.StringType()),
        ("decimal", T.DecimalType(38, 9)),
        ("wei", T.DecimalType(38, 0)),
        ("unknown_whatever", T.StringType()),
    ],
)
def test_dlt_fallback_map(dlt_type, spark_type):
    assert dlt_type_to_spark(dlt_type) == spark_type


@pytest.mark.parametrize(
    "spark_type,dlt_type",
    [
        (T.LongType(), "bigint"),
        (T.IntegerType(), "bigint"),
        (T.DoubleType(), "double"),
        (T.TimestampType(), "timestamp"),
        (T.ArrayType(T.StringType()), "json"),
        (T.StringType(), "text"),
    ],
)
def test_reverse_map(spark_type, dlt_type):
    assert spark_type_to_dlt(spark_type) == dlt_type

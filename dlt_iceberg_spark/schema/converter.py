"""Type conversion: Arrow → Spark, dlt hints → Spark, Spark → dlt.

Re-states the reference's authoritative mapping table
(schema_converter.py:84-176) in Spark types, including its compat
pre-coercions (schema_casting.py:28-74) and both fallback maps
(schema_converter.py:189-210 dlt→type; destination_client.py:527-581
reverse).  Deviations from the reference, documented per SURVEY.md §1.2:

- Arrow ``time64``/``time32`` has no Spark type → LongType (µs-of-day).
- ``decimal256`` (precision > 38) → StringType (reference does the same,
  schema_casting.py:52-58).
- Spark has no unsigned ints: uint8/16 → IntegerType, uint32/64 → LongType
  (same widening as schema_converter.py:99-104).
"""

from __future__ import annotations

import warnings

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def arrow_to_spark_type(at: pa.DataType) -> T.DataType:
    """schema_converter.py:84-176 analogue."""
    if pa.types.is_boolean(at):
        return T.BooleanType()
    if pa.types.is_integer(at):
        # int8/16/32 + uint8/16 -> int; int64 + uint32/64 -> long (:99-104)
        if at in (pa.int8(), pa.int16(), pa.int32(), pa.uint8(), pa.uint16()):
            return T.IntegerType()
        return T.LongType()
    if pa.types.is_float32(at):
        return T.FloatType()
    if pa.types.is_float64(at):
        return T.DoubleType()
    if pa.types.is_decimal(at):
        if at.precision > 38:
            # decimal256 beyond Spark/Iceberg cap -> string (schema_casting.py:52-58)
            warnings.warn(f"decimal precision {at.precision} > 38; storing as string")
            return T.StringType()
        return T.DecimalType(at.precision, at.scale)
    if pa.types.is_string(at) or pa.types.is_large_string(at):
        return T.StringType()
    if pa.types.is_binary(at) or pa.types.is_large_binary(at) or pa.types.is_fixed_size_binary(at):
        return T.BinaryType()
    if pa.types.is_timestamp(at):
        # tz-aware -> TimestampType (timestamptz); naive -> TimestampNTZType
        # (schema_converter.py:128-131); precision capped at µs on write.
        return T.TimestampType() if at.tz is not None else T.TimestampNTZType()
    if pa.types.is_date(at):
        return T.DateType()
    if pa.types.is_time(at):
        # No Spark TimeType: µs-of-day as long (documented deviation).
        return T.LongType()
    if pa.types.is_dictionary(at):
        # unwrap to value type (schema_casting.py:60-64)
        return arrow_to_spark_type(at.value_type)
    if pa.types.is_list(at) or pa.types.is_large_list(at):
        return T.ArrayType(arrow_to_spark_type(at.value_type), containsNull=True)
    if pa.types.is_map(at):
        return T.MapType(
            arrow_to_spark_type(at.key_type),
            arrow_to_spark_type(at.item_type),
            valueContainsNull=True,
        )
    if pa.types.is_struct(at):
        return T.StructType(
            [
                T.StructField(f.name, arrow_to_spark_type(f.type), nullable=f.nullable)
                for f in at
            ]
        )
    if pa.types.is_null(at):
        return T.StringType()
    warnings.warn(f"unknown Arrow type {at}; falling back to string (schema_converter.py:171-176)")
    return T.StringType()


def arrow_schema_to_spark(schema: pa.Schema, column_hints: dict[str, dict] | None = None) -> T.StructType:
    """Infer the table schema from actual Arrow data, with dlt column hints
    overriding only nullability (schema_converter.py:32-81)."""
    hints = column_hints or {}
    fields = []
    for f in schema:
        hint = hints.get(f.name, {})
        nullable = bool(hint.get("nullable", f.nullable))
        fields.append(T.StructField(f.name, arrow_to_spark_type(f.type), nullable=nullable))
    return T.StructType(fields)


#: dlt string-type fallback map (schema_converter.py:189-210)
_DLT_TO_SPARK: dict[str, T.DataType] = {
    "text": T.StringType(),
    "bigint": T.LongType(),
    "double": T.DoubleType(),
    "bool": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "time": T.LongType(),  # µs-of-day, documented deviation
    "binary": T.BinaryType(),
    "json": T.StringType(),
    "decimal": T.DecimalType(38, 9),  # caps at destination_client.py:1579
    "wei": T.DecimalType(38, 0),
}


def dlt_type_to_spark(dlt_type: str) -> T.DataType:
    return _DLT_TO_SPARK.get(dlt_type, T.StringType())


def spark_type_to_dlt(st: T.DataType) -> str:
    """Reverse map for schema derivation from live tables
    (destination_client.py:527-581)."""
    if isinstance(st, T.BooleanType):
        return "bool"
    if isinstance(st, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "bigint"
    if isinstance(st, (T.FloatType, T.DoubleType)):
        return "double"
    if isinstance(st, T.DecimalType):
        return "decimal"
    if isinstance(st, T.StringType):
        return "text"
    if isinstance(st, T.BinaryType):
        return "binary"
    if isinstance(st, T.TimestampType):
        return "timestamp"
    if isinstance(st, T.TimestampNTZType):
        return "timestamp"
    if isinstance(st, T.DateType):
        return "date"
    if isinstance(st, (T.ArrayType, T.MapType, T.StructType)):
        return "json"  # "complex" in dlt terms
    return "text"


def infer_schema(df: DataFrame, column_hints: dict[str, dict] | None = None) -> T.StructType:
    """The Spark-side analogue of infer-from-first-file: the DataFrame's own
    schema with hint-driven nullability overrides."""
    hints = column_hints or {}
    fields = []
    for f in df.schema.fields:
        hint = hints.get(f.name, {})
        nullable = bool(hint.get("nullable", f.nullable))
        fields.append(T.StructField(f.name, f.dataType, nullable=nullable))
    return T.StructType(fields)

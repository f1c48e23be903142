"""Partition transform validation matrix + hint parsing + adapter
(reference: tests/test_partition_builder.py:34-481, tests/test_adapter.py)."""

import pytest
from pyspark.sql import types as T

from dlt_iceberg_spark.adapter import iceberg_adapter, iceberg_partition
from dlt_iceberg_spark.errors import PartitionSpecError
from dlt_iceberg_spark.lake.pipeline import Resource
from dlt_iceberg_spark.partition import (
    PartitionField,
    build_partition_spec,
    default_transform,
    parse_transform_hint,
    validate_transform,
)


def test_parse_hint():
    assert parse_transform_hint("bucket[10]") == ("bucket", 10)
    assert parse_transform_hint("truncate[4]") == ("truncate", 4)
    assert parse_transform_hint("month") == ("month", None)


@pytest.mark.parametrize(
    "transform,param,dtype,ok",
    [
        ("identity", None, T.StringType(), True),
        ("identity", None, T.TimestampType(), True),
        ("year", None, T.TimestampType(), True),
        ("month", None, T.DateType(), True),
        ("day", None, T.TimestampNTZType(), True),
        ("hour", None, T.TimestampType(), True),
        ("month", None, T.LongType(), False),
        ("day", None, T.StringType(), False),
        ("bucket", 10, T.IntegerType(), True),
        ("bucket", 10, T.LongType(), True),
        ("bucket", 10, T.StringType(), True),
        ("bucket", 10, T.TimestampType(), False),
        ("bucket", 10, T.BinaryType(), False),
        ("bucket", 0, T.LongType(), False),
        ("truncate", 4, T.StringType(), True),
        ("truncate", 4, T.LongType(), True),
        ("truncate", 4, T.DecimalType(10, 2), True),
        ("truncate", 4, T.BinaryType(), True),
        ("truncate", 4, T.DoubleType(), False),
        ("truncate", 0, T.StringType(), False),
        ("wat", None, T.StringType(), False),
    ],
)
def test_validation_matrix(transform, param, dtype, ok):
    pf = PartitionField("c", transform, param)
    if ok:
        validate_transform(pf, dtype)
    else:
        with pytest.raises(PartitionSpecError):
            validate_transform(pf, dtype)


def test_default_transforms():
    """month default for temporal; identity otherwise (partition_builder.py:275-280)."""
    assert default_transform(T.TimestampType()) == "month"
    assert default_transform(T.DateType()) == "month"
    assert default_transform(T.StringType()) == "identity"
    assert default_transform(T.LongType()) == "identity"


def test_build_spec_from_hints():
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("uid", T.LongType(), True),
            T.StructField("region", T.StringType(), True),
        ]
    )
    hints = {
        "ts": {"x-partition": True},  # default → month
        "uid": {"x-partition": True, "x-partition-transform": "bucket[10]"},
        "region": {"x-partition": True, "x-partition-name": "event_region"},
    }
    spec = build_partition_spec(schema, hints)
    by_col = {p.column: p for p in spec}
    assert by_col["ts"].transform == "month"
    assert by_col["ts"].field_name == "ts_month"
    assert (by_col["uid"].transform, by_col["uid"].param) == ("bucket", 10)
    assert by_col["region"].field_name == "event_region"


def test_build_spec_unknown_column_errors():
    schema = T.StructType([T.StructField("a", T.LongType(), True)])
    with pytest.raises(PartitionSpecError, match="nope"):
        build_partition_spec(schema, {"nope": {"x-partition": True}})


def test_adapter_emits_hints():
    res = Resource(producer=lambda: None, name="events")
    adapted = iceberg_adapter(
        res,
        iceberg_partition.day("event_date"),
        iceberg_partition.bucket(10, "user_id"),
        iceberg_partition.identity("region", name="event_region"),
    )
    assert adapted.column_hints["event_date"]["x-partition-transform"] == "day"
    assert adapted.column_hints["user_id"]["x-partition-transform"] == "bucket[10]"
    assert adapted.column_hints["region"]["x-partition-name"] == "event_region"
    # original untouched (adapter returns a new resource)
    assert res.column_hints == {}


def test_bucket_invalid_count():
    """Reference golden (tests/test_adapter.py:53-57)."""
    with pytest.raises(ValueError, match="must be positive"):
        iceberg_partition.bucket(0, "user_id")
    with pytest.raises(ValueError, match="must be positive"):
        iceberg_partition.bucket(-5, "user_id")


def test_truncate_invalid_width():
    with pytest.raises(ValueError, match="must be positive"):
        iceberg_partition.truncate(0, "email")


def test_adapter_partition_keyword_shapes():
    """Reference shapes: scalar string, string list, mixed list, scalar
    transform (tests/test_adapter.py:86-130)."""
    res = Resource([{"id": 1}], "events")
    one = iceberg_adapter(res, partition="region")
    assert one.column_hints["region"]["x-partition"] is True
    mixed = iceberg_adapter(
        res, partition=["region", iceberg_partition.month("created_at")]
    )
    assert mixed.column_hints["region"]["x-partition"] is True
    assert mixed.column_hints["created_at"]["x-partition-transform"] == "month"
    scalar_t = iceberg_adapter(res, partition=iceberg_partition.day("ts"))
    assert scalar_t.column_hints["ts"]["x-partition-transform"] == "day"
    none = iceberg_adapter(res)
    assert none.column_hints == {}

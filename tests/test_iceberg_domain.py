"""Iceberg partition-transform value domain (lake/iceberg_domain.py).

Hash vectors come straight from the Iceberg spec's Appendix B table — the
contract a foreign writer's recorded bucket tuples obey.  Everything here
is driver-side pure Python; the Spark-facing integration (probe rewriting
on imported tables) is covered in test_iceberg_import.py.
"""

from __future__ import annotations

import datetime as dt
import struct
from decimal import Decimal

import pytest
from pyspark.sql import types as T

from dlt_iceberg_spark.lake.iceberg_domain import (
    iceberg_bucket,
    iceberg_transform_str,
    murmur3_32,
)


# --- murmur3 spec vectors (Iceberg spec Appendix B) -----------------------


@pytest.mark.parametrize(
    "data,expected",
    [
        (struct.pack("<q", 34), 2017239379),  # int and long hash identically
        (b"iceberg", 1210000089),
        (struct.pack("<q", 17486), -653330422),  # date 2017-11-16 as days
        (struct.pack("<q", 81068000000), -662762989),  # time 22:31:08 as micros
        (struct.pack("<q", 1510871468000000), -2047944441),  # ts 2017-11-16T22:31:08
        ((1420).to_bytes(2, "big", signed=True), -500754589),  # decimal 14.20
    ],
)
def test_murmur3_spec_vectors(data, expected):
    assert murmur3_32(data) == expected


def test_bucket_across_types():
    # int/long/date/timestamp/decimal/string all route through the
    # Appendix-B serialization before hashing
    assert iceberg_bucket(34, T.LongType(), 16) == (2017239379 & 0x7FFFFFFF) % 16
    assert iceberg_bucket(34, T.IntegerType(), 16) == iceberg_bucket(
        34, T.LongType(), 16
    )
    assert (
        iceberg_bucket(dt.date(2017, 11, 16), T.DateType(), 8)
        == (-653330422 & 0x7FFFFFFF) % 8
    )
    assert (
        iceberg_bucket("2017-11-16T22:31:08", T.TimestampType(), 8)
        == (-2047944441 & 0x7FFFFFFF) % 8
    )
    assert (
        iceberg_bucket(Decimal("14.20"), T.DecimalType(9, 2), 8)
        == (-500754589 & 0x7FFFFFFF) % 8
    )
    assert iceberg_bucket("iceberg", T.StringType(), 10) == (1210000089 % 10)


# --- transform ordinals ---------------------------------------------------


@pytest.mark.parametrize(
    "transform,param,value,dtype,expected",
    [
        # temporal ordinals are epoch-relative (spec "Partition Transforms")
        ("year", None, "2017-11-16", T.DateType(), "47"),
        ("month", None, "2017-11-16", T.DateType(), "574"),
        ("day", None, "2017-11-16", T.DateType(), "17486"),
        ("year", None, "1969-12-31", T.DateType(), "-1"),  # pre-epoch
        ("month", None, "1969-12-03", T.DateType(), "-1"),
        ("month", None, "2017-11-16T22:31:08", T.TimestampType(), "574"),
        ("day", None, "2017-11-16T22:31:08", T.TimestampNTZType(), "17486"),
        ("hour", None, "2017-11-16T22:31:08", T.TimestampType(), "419686"),
        # identity surfaces epoch ordinals for temporal types
        ("identity", None, "2017-11-16", T.DateType(), "17486"),
        ("identity", None, "2017-11-16T22:31:08", T.TimestampType(), "1510871468000000"),
        ("identity", None, 42, T.LongType(), "42"),
        ("identity", None, "abc", T.StringType(), "abc"),
        # truncate: ints floor toward -inf (v - (v mod W)), strings slice
        ("truncate", 10, -7, T.LongType(), "-10"),
        ("truncate", 10, 42, T.IntegerType(), "40"),
        ("truncate", 3, "iceberg", T.StringType(), "ice"),
        # offset-bearing probe strings land in the UTC frame first
        ("hour", None, "2017-11-17T03:31:08+05:00", T.TimestampType(), "419686"),
    ],
)
def test_transform_ordinals(transform, param, value, dtype, expected):
    assert iceberg_transform_str(transform, param, value, dtype) == expected


def test_unsupported_pairs_return_none():
    # None = "cannot name the foreign partition": callers must then drop
    # the field's probe rewrite entirely (conservative), never guess
    assert iceberg_transform_str("bucket", 8, 1.5, T.DoubleType()) is None
    assert iceberg_transform_str("truncate", 4, b"x", T.BinaryType()) is None
    assert iceberg_transform_str("month", None, 5, T.LongType()) is None
    assert iceberg_transform_str("hour", None, "2017-11-16", T.DateType()) is None
    assert iceberg_transform_str("void", None, 1, T.LongType()) is None
    assert iceberg_transform_str("bucket", 0, 1, T.LongType()) is None


def test_bucket_matches_scalar_vs_vectorized(spark):
    """The numpy fast path inside iceberg_bucket_column must agree with the
    scalar spec implementation for every key (including negatives)."""
    import pandas as pd

    from dlt_iceberg_spark.lake.iceberg_domain import iceberg_bucket_column

    keys = [0, 1, -1, 34, 2**40, -(2**40), 7, 123456789, -987654321]
    df = spark.createDataFrame([(k,) for k in keys], "id long")
    col = iceberg_bucket_column(T.LongType(), 16)
    got = {r.id: r.b for r in df.select("id", col("id").alias("b")).collect()}
    for k in keys:
        assert got[k] == str(iceberg_bucket(k, T.LongType(), 16)), k


def test_decimal_bound_decode_widens_outward():
    from dlt_iceberg_spark.lake.iceberg_avro import decode_bound

    # 14.20 is representable exactly? 14.2 is NOT an exact binary float —
    # the lower bound must round DOWN, the upper UP, so the interval always
    # contains the true decimal
    raw = (1420).to_bytes(2, "big", signed=True)
    lo = decode_bound("decimal(9, 2)", raw, side="lo")
    hi = decode_bound("decimal(9, 2)", raw, side="hi")
    assert Decimal(lo) <= Decimal("14.20") <= Decimal(hi)
    # exact values pass through unwidened
    raw25 = (25).to_bytes(1, "big", signed=True)
    assert decode_bound("decimal(9, 2)", raw25, side="lo") == 0.25
    assert decode_bound("decimal(9, 2)", raw25, side="hi") == 0.25
    # sideless inexact decode refuses (a narrowed bound could wrongly prune)
    assert decode_bound("decimal(9, 2)", raw) is None


def test_timestamp_bound_encode_is_exact_integer():
    from dlt_iceberg_spark.lake.iceberg_avro import decode_bound, encode_bound

    # far-future timestamps overflow float64 µs precision; the codec must
    # round-trip exactly anyway (spec Appendix D: 8-byte LE micros)
    iso = "2260-01-01T00:00:00.000001"
    raw = encode_bound("timestamp", iso)
    micros = struct.unpack("<q", raw)[0]
    assert micros % 10 == 1  # the trailing microsecond survives
    assert decode_bound("timestamp", raw) == iso

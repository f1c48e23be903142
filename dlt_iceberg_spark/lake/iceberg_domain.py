"""Iceberg's partition-transform VALUE DOMAIN, computed driver-side.

A jar-written Iceberg table records partition tuples in the spec's value
domain (Iceberg spec "Partition Transforms" + Appendix B): ``bucket[N]`` is
a 32-bit Murmur3 hash (x86 variant, seed 0) of the value's single-value
serialization, ``year/month/day/hour`` are epoch-relative ordinals
(years/months since 1970, days/hours since epoch), ``truncate[W]`` on
integers is ``v - (v mod W)``, and identity date/timestamp values surface
as their epoch-ordinal ints.  The NATIVE transforms (partition.py) use a
different, self-consistent domain (xxhash64 buckets, ISO strings) — so a
probe rewritten natively must NEVER be compared against a foreign tuple.

This module evaluates a probe literal in the FOREIGN frame so scans and
merges over imported tables (``register_iceberg_table``) can prune in
partition-tuple space: the probe set for an imported table carries both
the native and the Iceberg-domain spelling, matching whichever domain each
file's recorded tuple is in (foreign files keep their imported tuples;
post-import native appends record native tuples).

Reference surface: table adoption,
/root/reference/src/dlt_iceberg/destination_client.py:768-851 (register an
existing Iceberg table; its partition tuples are whatever the foreign
writer computed — PyIceberg's transforms there, the spec domain here).

Everything here derives from the public Apache Iceberg spec; murmur3 is
the public MurmurHash3_x86_32 algorithm (Austin Appleby, public domain).
"""

from __future__ import annotations

import datetime as _dt
import struct
from typing import Any

from pyspark.sql import types as T

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)
_U32 = 0xFFFFFFFF

_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86 32-bit, signed result — the hash Iceberg's
    ``bucket[N]`` transform applies to Appendix-B serialized values."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _U32
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * c1) & _U32
        k = ((k << 15) | (k >> 17)) & _U32
        k = (k * c2) & _U32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _U32
        h = (h * 5 + 0xE6546B64) & _U32
    tail = data[nblocks * 4 :]
    if tail:
        k = 0
        for i, b in enumerate(tail):
            k |= b << (8 * i)
        k = (k * c1) & _U32
        k = ((k << 15) | (k >> 17)) & _U32
        k = (k * c2) & _U32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _U32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _U32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def _hash_bytes_for(value: Any, dtype: T.DataType) -> bytes | None:
    """Appendix-B single-value hash serialization, or None when the type
    is outside the supported set (caller treats as not-computable)."""
    if isinstance(dtype, _INT_TYPES):
        # int and long both hash as 8-byte little-endian long
        return struct.pack("<q", int(value))
    if isinstance(dtype, T.StringType):
        return str(value).encode("utf-8")
    if isinstance(dtype, T.DateType):
        d = _as_date(value)
        return None if d is None else struct.pack("<q", (d - _EPOCH_DATE).days)
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        us = _as_micros(value)
        return None if us is None else struct.pack("<q", us)
    if isinstance(dtype, T.BinaryType):
        return bytes(value)
    if isinstance(dtype, T.DecimalType):
        from decimal import Decimal

        v = Decimal(value).scaleb(dtype.scale)
        unscaled = int(v)
        if unscaled != v:  # probe has more scale than the column: no exact tuple
            return None
        length = max(1, (unscaled.bit_length() + 8) // 8)  # minimal two's-complement
        return unscaled.to_bytes(length, "big", signed=True)
    return None


def iceberg_bucket(value: Any, dtype: T.DataType, n: int) -> int | None:
    """``bucket[N]`` in Iceberg's domain: ``(murmur3 & Integer.MAX_VALUE) % N``."""
    data = _hash_bytes_for(value, dtype)
    if data is None:
        return None
    return (murmur3_32(data) & 0x7FFFFFFF) % n


def _as_date(v: Any) -> _dt.date | None:
    if isinstance(v, _dt.datetime):
        return v.date()
    if isinstance(v, _dt.date):
        return v
    if isinstance(v, str):
        try:
            return _dt.date.fromisoformat(v[:10])
        except ValueError:
            return None
    return None


def _as_micros(v: Any) -> int | None:
    """Probe value -> microseconds since epoch, exact integer arithmetic
    (aware datetimes convert to UTC; naive ones are taken as already being
    in the writer's UTC frame — callers gate non-UTC sessions upstream)."""
    if isinstance(v, str):
        try:
            v = _dt.datetime.fromisoformat(v.replace(" ", "T"))
        except ValueError:
            return None
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        d = v - _EPOCH_DT
        return (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
    if isinstance(v, _dt.date):
        return (v - _EPOCH_DATE).days * 86_400_000_000
    return None


def _temporal_parts(value: Any, dtype: T.DataType):
    """(year, month, days-ordinal, micros|None) of the probe in the UTC
    frame, or None when unparseable."""
    if isinstance(dtype, T.DateType):
        d = _as_date(value)
        if d is None:
            return None
        return d.year, d.month, (d - _EPOCH_DATE).days, None
    us = _as_micros(value)
    if us is None:
        return None
    days = us // 86_400_000_000
    d = _EPOCH_DATE + _dt.timedelta(days=days)
    return d.year, d.month, days, us


def iceberg_bucket_supported(dtype: T.DataType) -> bool:
    """Types whose Iceberg bucket value we can compute executor-side (the
    same set the native spec validator admits for bucket)."""
    return isinstance(
        dtype, _INT_TYPES + (T.StringType, T.DateType, T.DecimalType)
    )


def iceberg_bucket_column(dtype: T.DataType, n: int):
    """A Column expression computing ``bucket[N]`` in ICEBERG's domain over
    a key column — an Arrow-batched pandas UDF (murmur3 has no JVM
    builtin), with a numpy-vectorized path for integer keys.  Used only on
    IMPORTED tables' merge planning, over the incoming BATCH (never the
    table), to name which foreign-domain bucket tuples the batch touches.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _mm3_long_vec(vals):
        """murmur3_32 of 8-byte little-endian longs, vectorized (uint32
        arithmetic wraps mod 2^32 exactly like the scalar algorithm)."""
        v = vals.astype(np.uint64)
        c1, c2 = np.uint32(0xCC9E2D51), np.uint32(0x1B873593)
        h = np.zeros(len(v), dtype=np.uint32)
        for k0 in ((v & np.uint64(0xFFFFFFFF)), (v >> np.uint64(32))):
            k = k0.astype(np.uint32)
            k = k * c1
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k = k * c2
            h ^= k
            h = (h << np.uint32(13)) | (h >> np.uint32(19))
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h ^= np.uint32(8)
        h ^= h >> np.uint32(16)
        h = h * np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h = h * np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
        return h

    # no type hints: `from __future__ import annotations` stringifies them
    # and the factory-local pandas alias can't resolve at registration
    def _bucket(s):
        mask = s.notna()
        out = pd.Series([None] * len(s), dtype=object, index=s.index)
        vals = s[mask]
        if len(vals) == 0:
            return out
        if np.issubdtype(getattr(vals, "dtype", np.dtype(object)), np.integer):
            h = _mm3_long_vec(vals.to_numpy(dtype=np.int64))
            out[mask] = [str(int(x)) for x in (h & np.uint32(0x7FFFFFFF)) % np.uint32(n)]
        else:
            out[mask] = [str(iceberg_bucket(v, dtype, n)) for v in vals]
        return out

    return pandas_udf(_bucket, "string")


def iceberg_transform_str(
    transform: str, param: int | None, value: Any, dtype: T.DataType
) -> str | None:
    """Evaluate one partition transform over a probe literal in ICEBERG's
    value domain and return the STRING a foreign manifest's decoded
    partition tuple would hold for a matching row (import stringifies avro
    values — Java ``toString`` of int/long/string/boolean).  Returns None
    when the (transform, type) pair is outside the supported matrix — the
    caller must then drop partition-probe rewriting for the field
    (conservative: stats pruning still applies)."""
    t = transform
    if t == "identity":
        if isinstance(dtype, _INT_TYPES):
            return str(int(value))
        if isinstance(dtype, T.StringType):
            return str(value)
        if isinstance(dtype, T.BooleanType):
            return "true" if value in (True, "true") else "false"
        if isinstance(dtype, T.DateType):
            d = _as_date(value)
            return None if d is None else str((d - _EPOCH_DATE).days)
        if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
            us = _as_micros(value)
            return None if us is None else str(us)
        return None
    if t in ("year", "month", "day", "hour"):
        if not isinstance(
            dtype, (T.DateType, T.TimestampType, T.TimestampNTZType)
        ):
            return None
        parts = _temporal_parts(value, dtype)
        if parts is None:
            return None
        y, m, days, us = parts
        if t == "year":
            return str(y - 1970)
        if t == "month":
            return str((y - 1970) * 12 + (m - 1))
        if t == "day":
            return str(days)
        if us is None:  # hour of a date column is not a legal Iceberg spec
            return None
        return str(us // 3_600_000_000)
    if t == "bucket":
        if not param or param <= 0:
            return None
        b = iceberg_bucket(value, dtype, param)
        return None if b is None else str(b)
    if t == "truncate":
        if not param or param <= 0:
            return None
        if isinstance(dtype, _INT_TYPES):
            v = int(value)
            return str(v - (v % param))  # Python % == Iceberg's ((v%W)+W)%W
        if isinstance(dtype, T.StringType):
            return str(value)[:param]  # W code points, as the spec defines
        return None
    return None

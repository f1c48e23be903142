"""Iceberg-v2-shaped AVRO manifest writing, via the JVM core-avro library.

Real Iceberg readers resolve a snapshot through an avro ``manifest-list``
whose entries point at avro manifest files (spec §Manifests) — field names
AND field-ids are part of the contract (readers project by field-id).
This module writes both files for a snapshot's live file set so
``export_iceberg_metadata(avro_manifests=True)`` emits a spec-shaped
chain: TableMetadata JSON → manifest-list.avro → manifest.avro → parquet
data files.  No spark-avro data source exists in this environment, but
the core Avro Java library ships on every Spark classpath, so writes (like
the import path's reads, lake/iceberg_import.py) ride py4j — manifests are
metadata-sized, exactly what real Iceberg writes driver-side.

Documented deviations from a jar-written table (sandbox-honest — no
Iceberg runtime exists here to produce the reference bytes):

- partition values are written as nullable strings regardless of source
  type (identity-over-string is exact; other types arrive stringified).

Column bounds (``lower_bounds``/``upper_bounds``) ARE written, as the
spec's binary single-value serialization (Appendix D) keyed by field-id in
the array-of-record map form real manifests use — an engine importing this
export (including our own ``register_iceberg_table``) gets per-file
[min, max] and keeps pruning.  Only the stat types our manifests track are
encoded (int/long/float/double/string/date/timestamp[tz]); other columns
simply carry no bound, which readers treat as "stats prove nothing".
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any

#: avro schema for one manifest-list entry (manifest_file, spec v2 —
#: field-id attributes are how real readers bind columns)
MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}


#: epoch for Iceberg date encoding (days from 1970-01-01, 4-byte LE int)
_EPOCH_ORDINAL = 719163  # datetime.date(1970, 1, 1).toordinal()

#: Spark simpleString -> Iceberg primitive, for the types manifest stats
#: track (table._STATS_TYPES); anything else exports without bounds
_SPARK_TO_ICEBERG_BOUND = {
    "int": "int",
    "integer": "int",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "date": "date",
    "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
}


def encode_bound(iceberg_type: str, value: Any) -> bytes | None:
    """Iceberg single-value binary serialization (spec Appendix D) for the
    stat types our manifests carry.  Dates arrive as ISO strings (the
    manifest stats encoding); everything else as native Python values.
    Returns None when the value cannot be encoded for the claimed type —
    callers omit the bound (optional per spec) rather than write garbage."""
    import datetime as _dt

    try:
        if iceberg_type == "int":
            return struct.pack("<i", int(value))
        if iceberg_type == "long":
            return struct.pack("<q", int(value))
        if iceberg_type == "float":
            return struct.pack("<f", float(value))
        if iceberg_type == "double":
            return struct.pack("<d", float(value))
        if iceberg_type == "string":
            return str(value).encode("utf-8")
        if iceberg_type == "date":
            d = _dt.date.fromisoformat(str(value)[:10])
            return struct.pack("<i", d.toordinal() - _EPOCH_ORDINAL)
        if iceberg_type in ("timestamp", "timestamptz"):
            # manifest stats store UTC-naive ISO; spec wants micros from
            # epoch.  Exact integer arithmetic — float64 total_seconds()
            # is off by 1µs past ~year 2250, and a bound that excludes
            # real data makes a consuming engine wrongly prune the file.
            ts = _dt.datetime.fromisoformat(str(value))
            if ts.tzinfo is not None:
                ts = ts.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            d = ts - _dt.datetime(1970, 1, 1)
            return struct.pack(
                "<q",
                (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds,
            )
    except (ValueError, TypeError, OverflowError, struct.error):
        return None
    return None


def decode_bound(iceberg_type: str, raw: bytes, side: str | None = None) -> Any:
    """Inverse of :func:`encode_bound`; dates and timestamps decode to
    ISO strings (the manifest stats convention — lexicographic ==
    chronological; timestamps UTC-naive).  Decimals (minimal-length
    big-endian two's-complement unscaled int per Appendix D) decode to a
    FLOAT widened outward when inexact — ``side`` ("lo"/"hi") says which
    way; without a side an inexact decimal returns None (a narrowed bound
    could wrongly prune).  Returns None for uuid/binary or malformed
    payloads — the importer then omits the stat, which reads as
    "unpruned" (correct, conservative)."""
    import datetime as _dt

    try:
        if iceberg_type.startswith("decimal("):
            import math
            from decimal import Decimal

            scale = int(iceberg_type[len("decimal(") : -1].split(",")[1])
            unscaled = int.from_bytes(raw, "big", signed=True)
            exact = Decimal(unscaled).scaleb(-scale)
            f = float(exact)
            if Decimal(f) == exact:
                return f
            if side == "lo" and Decimal(f) > exact:
                return math.nextafter(f, -math.inf)
            if side == "hi" and Decimal(f) < exact:
                return math.nextafter(f, math.inf)
            return f if side in ("lo", "hi") else None
        if iceberg_type == "int" and len(raw) == 4:
            return struct.unpack("<i", raw)[0]
        if iceberg_type == "long" and len(raw) == 8:
            return struct.unpack("<q", raw)[0]
        if iceberg_type == "float" and len(raw) == 4:
            return struct.unpack("<f", raw)[0]
        if iceberg_type == "double" and len(raw) == 8:
            return struct.unpack("<d", raw)[0]
        if iceberg_type == "string":
            return raw.decode("utf-8")
        if iceberg_type == "date" and len(raw) == 4:
            days = struct.unpack("<i", raw)[0]
            return _dt.date.fromordinal(days + _EPOCH_ORDINAL).isoformat()
        if iceberg_type in ("timestamp", "timestamptz") and len(raw) == 8:
            micros = struct.unpack("<q", raw)[0]
            return (
                _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=micros)
            ).isoformat()
    except (ValueError, OverflowError, UnicodeDecodeError, struct.error):
        return None
    return None


def _bounds_map_schema(name: str, key_id: int, value_id: int) -> dict:
    """Iceberg stores int-keyed maps as array<record{key,value}> with
    logicalType "map" (avro maps only allow string keys)."""
    return {
        "type": "array",
        "items": {
            "type": "record",
            "name": name,
            "fields": [
                {"name": "key", "type": "int", "field-id": key_id},
                {"name": "value", "type": "bytes", "field-id": value_id},
            ],
        },
        "logicalType": "map",
    }


def manifest_entry_schema(partition_fields: list[dict]) -> dict:
    """avro schema for one manifest entry (spec v2), with the partition
    struct (r102) built from the table's partition-spec fields."""
    part_fields = [
        {
            "name": p["name"],
            "type": ["null", "string"],
            "default": None,
            "field-id": p.get("field-id", 1000 + i),
        }
        for i, p in enumerate(partition_fields)
    ]
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            # spec marks these optional; we ALWAYS write them, so plain
            # longs (avro schema resolution promotes into a reader's union;
            # py4j Integers also fail ["null","long"] union resolution)
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": "long", "field-id": 1},
            {"name": "sequence_number", "type": "long", "field-id": 3},
            {"name": "file_sequence_number", "type": "long", "field-id": 4},
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int", "field-id": 134},
                        {"name": "file_path", "type": "string", "field-id": 100},
                        {"name": "file_format", "type": "string", "field-id": 101},
                        {
                            "name": "partition",
                            "field-id": 102,
                            "type": {"type": "record", "name": "r102", "fields": part_fields},
                        },
                        {"name": "record_count", "type": "long", "field-id": 103},
                        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                        {
                            "name": "lower_bounds",
                            "type": ["null", _bounds_map_schema("k126_v127", 126, 127)],
                            "default": None,
                            "field-id": 125,
                        },
                        {
                            "name": "upper_bounds",
                            "type": ["null", _bounds_map_schema("k129_v130", 129, 130)],
                            "default": None,
                            "field-id": 128,
                        },
                    ],
                },
            },
        ],
    }


def write_avro(spark, path: str, schema_json: str, rows: list[dict]) -> None:
    """Write one avro file through the JVM core-avro library.  Nested dict
    values become sub-records; None stays null (union branches)."""
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.create(schema, jvm.java.io.File(path))

    def _unwrap(sub_schema, kind: str):
        # unwrap ["null", X] unions to the non-null branch of the wanted kind
        if sub_schema.getType().getName() == "union":
            for t in sub_schema.getTypes():
                if t.getType().getName() == kind:
                    return t
        return sub_schema

    def _fill(rec_schema, row: dict):
        rec = jvm.org.apache.avro.generic.GenericData.Record(rec_schema)
        for k, v in row.items():
            f = rec_schema.getField(k)
            if isinstance(v, dict):
                rec.put(k, _fill(_unwrap(f.schema(), "record"), v))
            elif isinstance(v, list):
                # array<record> (Iceberg's int-keyed map form) or
                # array<primitive> (e.g. equality_ids)
                arr_schema = _unwrap(f.schema(), "array")
                items = jvm.java.util.ArrayList()
                for item in v:
                    items.add(
                        _fill(arr_schema.getElementType(), item)
                        if isinstance(item, dict)
                        else item
                    )
                rec.put(k, items)
            elif isinstance(v, (bytes, bytearray)):
                rec.put(k, jvm.java.nio.ByteBuffer.wrap(bytes(v)))
            else:
                rec.put(k, v)
        return rec

    try:
        for row in rows:
            writer.append(_fill(schema, row))
    finally:
        writer.close()


def write_avro_manifests(
    spark,
    table_location: str,
    snapshot,
    partition_fields: list[dict],
    io=None,
) -> str:
    """Write ``metadata/m-<v>.avro`` (the snapshot's live data files) and
    ``metadata/snap-<v>.avro`` (the manifest list), Iceberg-v2-shaped;
    returns the manifest-list path.

    Only local paths are written directly (avro rides java.io.File); a
    remote-scheme table would stage locally and upload via FileIO — out of
    scope until an object store exists to test against."""
    meta_dir = os.path.join(table_location, "metadata")
    v = snapshot.version
    files = snapshot.files  # full live set — export is an O(table) operation
    entry_schema = json.dumps(manifest_entry_schema(partition_fields))
    manifest_path = os.path.join(meta_dir, f"m-{v}.avro")
    spec_names = [p["name"] for p in partition_fields]

    # column name -> (field-id, iceberg primitive type) for bound encoding;
    # columns without a stable id or with non-primitive types carry no bounds
    field_ids = snapshot.field_ids or {}
    bound_cols: dict[str, tuple[int, str]] = {}
    for fld in snapshot.schema.fields:
        fid = field_ids.get(fld.name)
        ice = _SPARK_TO_ICEBERG_BOUND.get(fld.dataType.simpleString())
        if fid and ice:
            bound_cols[fld.name] = (fid, ice)

    def _bounds(f) -> dict[str, Any]:
        lower: list[dict] = []
        upper: list[dict] = []
        for col, (fid, ice) in bound_cols.items():
            st = f.stats.get(col)
            if not st or st[0] is None or st[1] is None:
                continue
            lo, hi = encode_bound(ice, st[0]), encode_bound(ice, st[1])
            if lo is None or hi is None:
                continue
            lower.append({"key": fid, "value": lo})
            upper.append({"key": fid, "value": hi})
        return {"lower_bounds": lower or None, "upper_bounds": upper or None}

    entries: list[dict[str, Any]] = [
        {
            "status": 1,  # ADDED (a full-state manifest re-adds everything)
            "snapshot_id": v,
            "sequence_number": f.sequence or 0,
            "file_sequence_number": f.sequence or 0,
            "data_file": {
                "content": 0,
                "file_path": os.path.join(table_location, f.path),
                "file_format": "PARQUET",
                "partition": {
                    n: (None if f.partition.get(n) is None else str(f.partition.get(n)))
                    for n in spec_names
                },
                "record_count": f.rows,
                "file_size_in_bytes": f.bytes,
                **_bounds(f),
            },
        }
        for f in files
    ]
    write_avro(spark, manifest_path, entry_schema, entries)

    list_path = os.path.join(meta_dir, f"snap-{v}.avro")
    seqs = [f.sequence or 0 for f in files] or [0]
    write_avro(
        spark,
        list_path,
        json.dumps(MANIFEST_FILE_SCHEMA),
        [
            {
                "manifest_path": manifest_path,
                "manifest_length": os.path.getsize(manifest_path),
                "partition_spec_id": 0,
                "content": 0,  # data
                "sequence_number": v,
                "min_sequence_number": min(seqs),
                "added_snapshot_id": v,
                "added_files_count": len(files),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": sum(f.rows for f in files),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        ],
    )
    return list_path

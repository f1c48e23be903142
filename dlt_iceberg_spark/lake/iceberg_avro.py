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

- column bounds (``lower_bounds``/``upper_bounds``) are omitted — they are
  optional per spec; our stats live in the parquet manifests and footers;
- partition values are written as nullable strings regardless of source
  type (identity-over-string is exact; other types arrive stringified).
"""

from __future__ import annotations

import json
import os
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

    def _fill(rec_schema, row: dict):
        rec = jvm.org.apache.avro.generic.GenericData.Record(rec_schema)
        for k, v in row.items():
            f = rec_schema.getField(k)
            if isinstance(v, dict):
                sub_schema = f.schema()
                # unwrap ["null", record] unions
                if sub_schema.getType().getName() == "union":
                    for t in sub_schema.getTypes():
                        if t.getType().getName() == "record":
                            sub_schema = t
                            break
                rec.put(k, _fill(sub_schema, v))
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

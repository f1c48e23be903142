"""LakeTable as a Structured Streaming SOURCE — Iceberg streaming-read
parity (``spark.readStream.format("iceberg")`` tailing table appends),
built on PySpark 4's Python Data Source API.

Semantics (matching Iceberg's streaming read and our ``read_incremental``):

- Offsets are SNAPSHOT VERSIONS; each micro-batch covers the appends of
  ``(start, end]``.  Snapshots are immutable, so a checkpoint-replayed
  batch reads byte-identical data — exactly-once with any idempotent sink.
- Append-only tailing: an overwrite/merge/delete snapshot in the range
  raises (rows were rewritten or removed; a CDC consumer should use
  ``read_changes`` / ChangelogFeed instead).  Metadata-only snapshots
  (schema/partition DDL, compaction-flagged replaces are NOT layout-only
  for this purpose — compaction rewrites file sets; it raises) pass
  through contributing nothing.
- By default the stream starts at the CURRENT snapshot (only future
  appends flow — Iceberg's default).  ``starting_version`` rewinds the
  start (exclusive); ``from_beginning=true`` streams the whole table
  history first.

Scale: everything driver-side is O(metadata) — offsets and file diffs come
from snapshot JSON + chunked parquet manifests (pyarrow, no SparkSession
needed in the data-source worker).  One :class:`InputPartition` per data
file; executors read their file with pyarrow and emit Arrow record
batches, so rows never pass through the driver.  Era-aware: each
partition carries the entry's ``names`` mapping, so files written before
a ``rename_column`` stream under current names.

Reference surface: the reference has no streaming source (batch loads
only); this extends §2.12 the way Iceberg's spark integration does.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

#: snapshot ops a streaming tail passes through without emitting rows
_PASS_THROUGH_OPS = (
    "evolve-schema", "evolve-partition", "rename-column", "add-column",
    "drop-column", "promote-column", "backfill-stats",
)
_APPEND_OPS = ("append", "create")


def _read_text(path: str) -> str:
    with open(path) as fh:
        return fh.read()


def _current_version(location: str) -> int | None:
    try:
        return int(_read_text(os.path.join(location, "metadata", "_current")).strip())
    except FileNotFoundError:
        return None


def _snapshot_raw(location: str, version: int) -> dict:
    return json.loads(
        _read_text(os.path.join(location, "metadata", f"v{version:06d}.json"))
    )


def _file_entries(location: str, raw: dict) -> list[dict]:
    """Live file entries of a raw snapshot: path + names mapping (all the
    streaming source needs), from inline files + chunked manifests —
    pyarrow only, no SparkSession."""
    import pyarrow.parquet as pq

    out = [
        {"path": f["path"], "names": f.get("names", {})}
        for f in raw.get("files", [])
    ]
    for ref in raw.get("manifests", []):
        t = pq.read_table(
            os.path.join(location, ref["path"]), columns=None
        )
        cols = {n: t.column(n).to_pylist() for n in t.column_names}
        for i in range(t.num_rows):
            out.append(
                {
                    "path": cols["path"][i],
                    "names": json.loads(cols["names"][i])
                    if "names" in cols and cols["names"][i]
                    else {},
                }
            )
    return out


@dataclass
class _FilePartition(InputPartition):
    abs_path: str
    names: dict  # current column -> physical column (None = absent)


class _LakeStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.location = options["location"]
        self.from_beginning = str(options.get("from_beginning", "")).lower() == "true"
        self.starting_version = options.get("starting_version")
        #: admission control for backfills (Iceberg's
        #: streaming-max-files-per-micro-batch, in snapshot units): each
        #: micro-batch advances at most N versions, so tailing a
        #: 10k-snapshot table from the beginning chunks instead of
        #: planning one giant batch.  The cap is applied in latestOffset
        #: relative to the LAST PLANNED end, tracked on the reader (the
        #: driver keeps one reader instance per run).
        mv = options.get("max_versions_per_batch")
        self.max_versions = int(mv) if mv is not None else None
        self._last_end: int | None = None
        # the stream presents the schema as of stream START; capture that
        # snapshot's field ids so mid-stream renames translate through the
        # STABLE ids (same bridge as LakeTable.read_changes)
        cur = _current_version(self.location)
        self._start_field_ids = (
            _snapshot_raw(self.location, cur).get("field_ids", {})
            if cur is not None
            else {}
        )

    def initialOffset(self) -> dict:
        if self.starting_version is not None:
            return {"version": int(self.starting_version)}
        if self.from_beginning:
            return {"version": -1}
        cur = _current_version(self.location)
        return {"version": -1 if cur is None else cur}

    def latestOffset(self) -> dict:
        cur = _current_version(self.location)
        if cur is None:
            return {"version": -1}
        if self.max_versions is not None:
            floor = (
                self._last_end
                if self._last_end is not None
                else self.initialOffset()["version"]
            )
            cur = min(cur, floor + self.max_versions)
        return {"version": cur}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        s, e = start["version"], end["version"]
        self._last_end = max(e, self._last_end or e)
        if e <= s:
            # Spark requires ≥1 partition per planned batch; an empty file
            # partition yields zero rows
            return [_FilePartition("", {})]
        # walk parents from e down to s, diffing path sets per step —
        # identical logic to LakeTable.read_incremental, pyarrow-only
        raw_end = _snapshot_raw(self.location, e)
        raw = raw_end
        chain = []
        while raw is not None and raw["version"] > s:
            chain.append(raw)
            parent = raw.get("parent")
            if parent is None:
                if s >= 0:
                    raise ValueError(
                        f"no snapshot v{s} in ancestry of v{e}"
                    )
                break
            raw = _snapshot_raw(self.location, parent)
        added: list[str] = []
        for raw in chain:
            op = raw.get("operation")
            if op in _PASS_THROUGH_OPS:
                continue
            if op not in _APPEND_OPS:
                raise ValueError(
                    f"cannot stream across a '{op}' snapshot "
                    f"(v{raw['version']}): rows were rewritten or removed; "
                    "use read_changes/ChangelogFeed for CDC"
                )
            entries = _file_entries(self.location, raw)
            parent = raw.get("parent")
            parent_paths = (
                {
                    f["path"]
                    for f in _file_entries(
                        self.location, _snapshot_raw(self.location, parent)
                    )
                }
                if parent is not None
                else set()
            )
            added.extend(f["path"] for f in entries if f["path"] not in parent_paths)
        # written-name mappings come from the END snapshot's entries (only
        # they are current w.r.t. any rename in or before the range); the
        # end-era column names translate to the STREAM schema's names via
        # stable field ids
        end_names_of = {
            f["path"]: f["names"] for f in _file_entries(self.location, raw_end)
        }
        end_field_ids = raw_end.get("field_ids", {})
        end_name_of_id = {i: n for n, i in end_field_ids.items()}
        start_ids = self._start_field_ids or end_field_ids
        era_name = {
            f.name: end_name_of_id.get(start_ids.get(f.name), f.name)
            if start_ids.get(f.name) is not None
            else f.name
            for f in self.schema.fields
        }
        parts: list[InputPartition] = []
        for path in added:
            en = end_names_of.get(path, {})
            mapping = {}
            for f in self.schema.fields:
                phys = en.get(era_name[f.name], era_name[f.name])
                if phys != f.name:
                    mapping[f.name] = phys
            parts.append(
                _FilePartition(os.path.join(self.location, path), mapping)
            )
        return parts or [_FilePartition("", {})]

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self.schema)
        if not partition.abs_path:
            return iter(pa.table([[] for _ in target], schema=target).to_batches())
        mapping = partition.names or {}
        phys_cols = [
            mapping.get(f.name, f.name)
            for f in self.schema.fields
            if mapping.get(f.name, f.name) is not None
        ]
        t = pq.read_table(partition.abs_path, columns=phys_cols)
        arrays = []
        for f, field in zip(self.schema.fields, target):
            p = mapping.get(f.name, f.name)
            if p is None:
                arrays.append(pa.nulls(t.num_rows, type=field.type))
            else:
                arrays.append(t.column(p).cast(field.type))
        return iter(pa.table(arrays, schema=target).to_batches())

    def commit(self, end: dict) -> None:
        pass


class LakeTableStreamSource(DataSource):
    """``spark.readStream.format("laketable").option("location", path)``.

    Register once per session with :func:`register_lake_stream_source`.
    The stream schema is the table's CURRENT snapshot schema at planning
    time; restart the stream after schema DDL (the same contract as
    Spark's file sources).
    """

    @classmethod
    def name(cls) -> str:
        return "laketable"

    def schema(self) -> T.StructType:
        location = self.options["location"]
        cur = _current_version(location)
        if cur is None:
            raise FileNotFoundError(f"no such table: {location}")
        return T.StructType.fromJson(_snapshot_raw(location, cur)["schema"])

    def streamReader(self, schema: T.StructType) -> _LakeStreamReader:
        return _LakeStreamReader(schema, dict(self.options))

    def streamWriter(self, schema: T.StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                "the laketable sink is append-only (outputMode('append')); "
                "complete/update modes need the disposition pipeline — use "
                "streaming.stream_write"
            )
        from dlt_iceberg_spark.streaming.sink import _LakeStreamWriter

        return _LakeStreamWriter(schema, dict(self.options))


def register_lake_stream_source(spark) -> None:
    """Idempotently register the ``laketable`` streaming format."""
    spark.dataSource.register(LakeTableStreamSource)


def read_stream(spark, location: str, **options):
    """Streaming DataFrame tailing a LakeTable's appends.

    ``options``: ``from_beginning=True`` streams existing rows first;
    ``starting_version=N`` rewinds to just after snapshot N.
    """
    register_lake_stream_source(spark)
    reader = spark.readStream.format("laketable").option("location", location)
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load()

"""LakeTable as a native Structured Streaming SINK —
``df.writeStream.format("laketable")`` — completing the format symmetry
with the streaming source (streaming/source.py).

Differences from :func:`~dlt_iceberg_spark.streaming.micro_batch.stream_write`
(the foreachBatch sink, which remains the right choice for dispositions,
schema evolution, and partitioned writes):

- rows are written to parquet ON THE EXECUTORS (Arrow record batches →
  one staged file per non-empty partition) and only file-level metadata
  travels to the driver — no re-entry of the whole batch through a
  driver-side DataFrame;
- exactly-once WITHOUT the load ledger: Spark's epoch protocol calls
  ``commit(messages, batchId)`` once per successful micro-batch; the
  committed ``batchId`` is recorded in the snapshot summary, so a
  checkpoint-replayed epoch is recognized and skipped (its re-staged
  files are removed), and a failed epoch's staged files are deleted by
  ``abort`` — the same write-audit pattern as Iceberg's Spark sink;
- appends only (``outputMode("append")``); the table must not be
  partitioned (partition-aware streaming writes go through
  ``stream_write``, which runs the full disposition pipeline).

Per-file [min, max] stats are computed from the Arrow batches at write
time, so stream-landed files prune exactly like batch-landed ones.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

#: arrow-side analogue of table._STATS_TYPES — types whose min/max are
#: recorded in the manifest stats frame
_PRUNABLE_SPARK = (
    T.IntegerType, T.LongType, T.FloatType, T.DoubleType,
    T.StringType, T.DateType, T.TimestampType, T.TimestampNTZType,
)


@dataclass
class _StagedFile(WriterCommitMessage):
    path: str  # relative (data/<uuid>.parquet)
    rows: int
    bytes: int
    stats_json: str


def _iso_norm(v):
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


class _LakeStreamWriter(DataSourceStreamArrowWriter):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.location = options["location"].rstrip("/")
        self.prunable = [
            f.name for f in schema.fields if isinstance(f.dataType, _PRUNABLE_SPARK)
        ]

    # -- executors ---------------------------------------------------------

    def write(self, iterator: Iterator) -> WriterCommitMessage | None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = [b for b in iterator if b.num_rows]
        if not batches:
            # Spark requires a WriterCommitMessage instance even for empty
            # partitions; path="" is the no-file sentinel
            return _StagedFile(path="", rows=0, bytes=0, stats_json="{}")
        tbl = pa.Table.from_batches(batches)
        rel = f"data/{uuid.uuid4().hex}.parquet"
        abs_path = os.path.join(self.location, rel)
        os.makedirs(os.path.dirname(abs_path), exist_ok=True)
        pq.write_table(tbl, abs_path)
        stats = {}
        for col in self.prunable:
            if col not in tbl.column_names:
                continue
            c = tbl.column(col)
            if c.null_count == len(c):
                continue
            import pyarrow.compute as pc

            mm = pc.min_max(c).as_py()
            if mm["min"] is None or mm["max"] is None:
                continue
            stats[col] = [_iso_norm(mm["min"]), _iso_norm(mm["max"])]
        return _StagedFile(
            path=rel,
            rows=tbl.num_rows,
            bytes=os.path.getsize(abs_path),
            stats_json=json.dumps(stats, default=str),
        )

    # -- driver ------------------------------------------------------------

    def _table(self):
        from dlt_iceberg_spark.lake.fileio import LocalFileIO
        from dlt_iceberg_spark.lake.table import LakeTable

        # commit is metadata-only: no SparkSession exists inside the data
        # source runner, and none is needed (pointer swap + manifest write
        # go through FileIO)
        return LakeTable(None, self.location, io=LocalFileIO())

    def commit(self, messages, batchId: int) -> None:
        from dlt_iceberg_spark.errors import CommitConflictError
        from dlt_iceberg_spark.lake.manifest import DataFile

        staged = [
            DataFile(
                path=m.path,
                rows=m.rows,
                bytes=m.bytes,
                stats=json.loads(m.stats_json),
            )
            for m in messages
            if m is not None and m.path
        ]
        t = self._table()
        for _ in range(5):
            snap = t.snapshot()
            if snap is not None:
                if snap.partition_spec:
                    self._drop(staged)
                    raise ValueError(
                        "the native laketable sink writes unpartitioned "
                        "files; use streaming.stream_write for partitioned "
                        "tables"
                    )
                if snap.schema != self.schema:
                    self._drop(staged)
                    raise ValueError(
                        "stream schema does not match the table schema "
                        f"({self.schema.simpleString()} vs "
                        f"{snap.schema.simpleString()}); evolve the table "
                        "first or use streaming.stream_write"
                    )
                # epoch replay after a checkpoint recovery: the batch is
                # already committed — drop the re-staged files and return.
                # The marker lives in table PROPERTIES (carried forward by
                # every later commit), so detection survives an interleaved
                # batch writer between crash and restart.
                if snap.properties.get("stream.last-committed-batch") == str(
                    batchId
                ):
                    self._drop(staged)
                    return
            if not staged:
                return  # empty epoch: no snapshot, nothing to clean
            props = dict(snap.properties) if snap else {}
            props["stream.last-committed-batch"] = str(batchId)
            try:
                t.commit(
                    None,
                    self.schema,
                    "append",
                    snap.version if snap else None,
                    manifests=list(snap.manifests) if snap else [],
                    new_files=(list(snap.inline_files) if snap else []) + staged,
                    delete_files=list(snap.delete_files) if snap else [],
                    properties=props,
                    summary={"stream-batch-id": batchId},
                )
                return
            except CommitConflictError:
                continue  # a concurrent writer advanced the table: retry
        raise CommitConflictError(
            f"stream sink lost {5} commit races at {self.location!r}"
        )

    def abort(self, messages, batchId: int) -> None:
        self._drop([m for m in messages if m is not None and m.path])

    def _drop(self, staged) -> None:
        for m in staged:
            try:
                os.remove(os.path.join(self.location, m.path))
            except OSError:
                pass

"""Structured Streaming extension over the lake write-side.

The reference has no streaming operators (SURVEY.md §2.12) — its closest
analogue is repeated micro-batch pipeline runs, one snapshot per run
(tests/test_class_based_atomic.py:213-293).  This package is the natural
Spark extension of that model: ``readStream`` → transformations →
``foreachBatch`` dispatching into the SAME write-disposition code path
(lake/writer.py), so a streaming load observes identical semantics to a
batch load — atomic per-batch snapshots, schema evolution, merge/upsert,
ledger idempotency.
"""

from dlt_iceberg_spark.streaming.micro_batch import (
    await_stream,
    running_user_totals,
    stream_interval_join,
    sessionized,
    stream_write,
    streaming_dedup,
    windowed_event_counts,
)
from dlt_iceberg_spark.streaming.source import (
    LakeTableStreamSource,
    read_stream,
    register_lake_stream_source,
)
from dlt_iceberg_spark.streaming.vector import (
    run_index_backfill,
    stream_index_vectors,
)

# the sink half of format("laketable") lives in streaming/sink.py and is
# reached through LakeTableStreamSource.streamWriter — registering the
# source registers both directions

__all__ = [
    "await_stream",
    "stream_write",
    "windowed_event_counts",
    "sessionized",
    "running_user_totals",
    "stream_interval_join",
    "streaming_dedup",
    "LakeTableStreamSource",
    "read_stream",
    "register_lake_stream_source",
    "run_index_backfill",
    "stream_index_vectors",
]

"""Record-stream sources: REST-style fetches → DataFrame.

Models the reference's USGS GeoJSON source
(examples/usgs_earthquakes.py:26-133): a fetch over a key range that (a)
retries transient failures with exponential backoff, (b) splits the range
into smaller chunks when the server rejects it as too large, and (c)
flattens nested records to table rows.

Two execution tiers:

- :func:`records_source` / :func:`fetch_with_split` — driver-side walk;
  right for bounded incremental pulls (the reference's only mode).
- :func:`distributed_fetch` — the 100 TB backfill path: the *partition
  list* (e.g. date ranges, id shards) is a tiny DataFrame; each executor
  task runs the fetch for its partitions inside ``mapInPandas``, so
  ingestion bandwidth scales with the cluster, not the driver.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession


class RangeTooLarge(Exception):
    """Raised by a fetch to signal 'split this range and retry'
    (the analogue of the reference's HTTP 400 over-limit response)."""


def fetch_with_split(
    fetch: Callable[[Any, Any], Iterable[dict]],
    start: Any,
    end: Any,
    split: Callable[[Any, Any], list[tuple[Any, Any]]],
    max_retries: int = 3,
    backoff_base: float = 2.0,
    _allow_split: bool = True,
) -> Iterator[dict]:
    """Yield records for [start, end), splitting on :class:`RangeTooLarge`
    and retrying other errors with exponential backoff.

    ``split(start, end)`` returns sub-ranges; each sub-range is fetched with
    splitting disabled (one level, like the reference's weekly re-chunking —
    avoids unbounded recursion on a server that always rejects).
    """
    for attempt in range(max_retries):
        try:
            yield from fetch(start, end)
            return
        except RangeTooLarge:
            if not _allow_split:
                return  # skip, mirroring the reference's warn-and-skip
            for sub_start, sub_end in split(start, end):
                yield from fetch_with_split(
                    fetch, sub_start, sub_end, split, max_retries, backoff_base,
                    _allow_split=False,
                )
            return
        except Exception:
            if attempt >= max_retries - 1:
                raise
            time.sleep(backoff_base**attempt)


def flatten_record(
    record: dict, mapping: dict[str, tuple[str, ...]], default: Any = None
) -> dict:
    """Flatten a nested record via dotted-path mapping:
    ``{"mag": ("properties", "mag")}`` → ``{"mag": record["properties"]["mag"]}``."""
    out = {}
    for col, path in mapping.items():
        cur: Any = record
        for key in path:
            if isinstance(cur, dict) and key in cur:
                cur = cur[key]
            elif isinstance(cur, (list, tuple)) and isinstance(key, int) and key < len(cur):
                cur = cur[key]
            else:
                cur = default
                break
        out[col] = cur
    return out


def records_source(
    spark: SparkSession,
    records: Iterable[dict],
    schema: str | None = None,
) -> DataFrame:
    """Materialize driver-side records as a DataFrame (dlt-resource
    analogue).  An explicit DDL schema avoids sampling-based inference on
    heterogeneous dicts."""
    rows = list(records)
    if schema:
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame(rows)


def distributed_fetch(
    spark: SparkSession,
    partitions: list[dict],
    fetch: Callable[[dict], Iterable[dict]],
    schema: str,
    partition_schema: str | None = None,
    max_concurrency: int | None = None,
) -> DataFrame:
    """Executor-side fetch fan-out: one task per partition descriptor.

    ``partitions`` is the (small) work list — e.g. ``[{"start": ..., "end":
    ...}, ...]``; ``fetch`` runs on executors and yields record dicts
    conforming to ``schema``.  Concurrency = min(len(partitions),
    max_concurrency or cluster cores); repartition(len) gives one descriptor
    per task so a slow shard never blocks others behind it.
    """
    import pandas as pd

    pdf = (
        spark.createDataFrame(partitions, schema=partition_schema)
        if partition_schema
        else spark.createDataFrame(partitions)
    )
    n = min(len(partitions), max_concurrency) if max_concurrency else len(partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for part_pdf in batches:
            for part in part_pdf.to_dict("records"):
                rows = list(fetch(part))
                if rows:
                    yield pd.DataFrame(rows)

    return pdf.repartition(n).mapInPandas(run, schema)

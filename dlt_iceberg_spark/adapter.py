"""Fluent partition adapter: `iceberg_partition` / `iceberg_adapter`.

API parity with the reference's adapter.py:31-155 (transform factories) and
:188-276 (resource adapter): fluent helpers produce hint dicts
(``x-partition``, ``x-partition-transform``, ``x-partition-name``) that the
partition builder consumes at table creation.
"""

from __future__ import annotations

from dataclasses import dataclass

from dlt_iceberg_spark.lake.pipeline import Resource


@dataclass(frozen=True)
class PartitionTransform:
    column: str
    transform: str
    param: int | None = None
    name: str | None = None

    def to_hint(self) -> tuple[str, dict]:
        hint: dict = {"x-partition": True}
        if self.transform == "identity":
            hint["x-partition-transform"] = "identity"
        elif self.param is not None:
            hint["x-partition-transform"] = f"{self.transform}[{self.param}]"
        else:
            hint["x-partition-transform"] = self.transform
        if self.name:
            hint["x-partition-name"] = self.name
        return self.column, hint


class iceberg_partition:  # noqa: N801 — name parity with the reference API
    """Factory namespace: ``iceberg_partition.day("ts", name="event_day")``."""

    @staticmethod
    def identity(column: str, name: str | None = None) -> PartitionTransform:
        return PartitionTransform(column, "identity", None, name)

    @staticmethod
    def year(column: str, name: str | None = None) -> PartitionTransform:
        return PartitionTransform(column, "year", None, name)

    @staticmethod
    def month(column: str, name: str | None = None) -> PartitionTransform:
        return PartitionTransform(column, "month", None, name)

    @staticmethod
    def day(column: str, name: str | None = None) -> PartitionTransform:
        return PartitionTransform(column, "day", None, name)

    @staticmethod
    def hour(column: str, name: str | None = None) -> PartitionTransform:
        return PartitionTransform(column, "hour", None, name)

    @staticmethod
    def bucket(n: int, column: str, name: str | None = None) -> PartitionTransform:
        if n <= 0:  # reference golden: tests/test_adapter.py:53-57
            raise ValueError("bucket count must be positive")
        return PartitionTransform(column, "bucket", n, name)

    @staticmethod
    def truncate(width: int, column: str, name: str | None = None) -> PartitionTransform:
        if width <= 0:  # reference golden: tests/test_adapter.py:66-68
            raise ValueError("truncate width must be positive")
        return PartitionTransform(column, "truncate", width, name)


def iceberg_adapter(
    res: Resource,
    *transforms: PartitionTransform,
    partition: list[PartitionTransform | str] | PartitionTransform | str | None = None,
) -> Resource:
    """Attach partition hints to a resource (adapter.py:188-276 analogue).
    Accepts the same shapes: a Resource, or raw data (wrapped); transforms
    positionally or via the reference's ``partition=[...]`` keyword (where
    a bare string means identity on that column)."""
    if not isinstance(res, Resource):
        res = Resource(producer=res, name=getattr(res, "__name__", "data"))
    if isinstance(partition, (str, PartitionTransform)):
        partition = [partition]  # reference accepts a scalar too
    transforms = tuple(transforms) + tuple(
        PartitionTransform(t, "identity") if isinstance(t, str) else t
        for t in partition or []
    )
    hints = dict(res.column_hints)
    for t in transforms:
        col, hint = t.to_hint()
        hints[col] = {**hints.get(col, {}), **hint}
    return Resource(
        producer=res.producer,
        name=res.name,
        write_disposition=res.write_disposition,
        primary_key=res.primary_key,
        column_hints=hints,
    )

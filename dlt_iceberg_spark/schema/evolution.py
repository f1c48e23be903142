"""Schema evolution: diff, promotion rules, sparse-data policy.

Re-implements schema_evolution.py (305 LoC) over StructTypes:

- ``compare_schemas`` (E1, :90-138): name-keyed diff → added fields, type
  changes, dropped names.
- ``can_promote_type`` (E2, :53-87): int→long, float→double, decimal
  widening (precision AND scale may only grow) — exactly Iceberg's safe set.
- ``validate_schema_changes`` (E3, :141-172): collect every non-promotable
  change into one SchemaEvolutionError.
- ``evolve_schema_if_needed`` (E5, :228-305): sparse-data policy — columns
  missing from incoming data stay in the schema (null-filled at write) when
  nullable, error when required; ``allow_column_drops=True`` actually drops.

The terminal "apply" step is backend-specific: the lake layer stores the
evolved StructType in the next snapshot's metadata (metadata-only change,
like Iceberg's update_schema transaction); an Iceberg backend would emit
``ALTER TABLE ADD COLUMNS / ALTER COLUMN TYPE / DROP COLUMN``.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql import types as T

from dlt_iceberg_spark.errors import SchemaEvolutionError

logger = logging.getLogger("dlt_iceberg_spark")


@dataclass
class SchemaChange:
    added: list[T.StructField] = field(default_factory=list)
    type_changes: list[tuple[str, T.DataType, T.DataType]] = field(default_factory=list)
    dropped: list[str] = field(default_factory=list)

    @property
    def is_empty(self) -> bool:
        return not (self.added or self.type_changes or self.dropped)


def compare_schemas(current: T.StructType, incoming: T.StructType) -> SchemaChange:
    """Name-keyed diff (schema_evolution.py:90-138)."""
    cur = {f.name: f for f in current.fields}
    inc = {f.name: f for f in incoming.fields}
    change = SchemaChange()
    for name, f in inc.items():
        if name not in cur:
            change.added.append(f)
        elif cur[name].dataType != f.dataType:
            change.type_changes.append((name, cur[name].dataType, f.dataType))
    for name in cur:
        if name not in inc:
            change.dropped.append(name)
    return change


def can_promote_type(src: T.DataType, dst: T.DataType) -> bool:
    """Iceberg-safe promotions only (schema_evolution.py:53-87)."""
    if isinstance(src, T.IntegerType) and isinstance(dst, T.LongType):
        return True
    if isinstance(src, T.FloatType) and isinstance(dst, T.DoubleType):
        return True
    if isinstance(src, T.DecimalType) and isinstance(dst, T.DecimalType):
        return dst.precision >= src.precision and dst.scale >= src.scale
    return False


def validate_schema_changes(change: SchemaChange) -> None:
    """Raise listing each non-promotable change (schema_evolution.py:141-172)."""
    bad = [
        f"{name}: {src.simpleString()}→{dst.simpleString()} is not a safe promotion"
        for name, src, dst in change.type_changes
        if not can_promote_type(src, dst)
    ]
    if bad:
        raise SchemaEvolutionError("; ".join(bad))


def evolve_schema_if_needed(
    current: T.StructType,
    incoming: T.StructType,
    allow_column_drops: bool = False,
) -> tuple[T.StructType, bool]:
    """Return (evolved schema, changed?) applying the sparse-data policy
    (schema_evolution.py:228-305):

    - added columns join the schema (always nullable on arrival unless the
      incoming field says otherwise);
    - safe type promotions apply; unsafe ones raise;
    - columns missing from incoming data: kept (null-filled at write) when
      nullable; ERROR when required (a required column can't go sparse,
      schema_evolution.py:40-50, 285-289); actually dropped only when
      ``allow_column_drops``.
    """
    change = compare_schemas(current, incoming)
    if change.is_empty:
        return current, False
    validate_schema_changes(change)

    promoted = {name: dst for name, _src, dst in change.type_changes}
    dropped = set()
    for name in change.dropped:
        f = current[name]
        if allow_column_drops:
            dropped.add(name)
            logger.warning("dropping column %r (allow_column_drops)", name)
        elif not f.nullable:
            raise SchemaEvolutionError(
                f"required column {name!r} missing from incoming data; "
                "required columns cannot become sparse"
            )
        else:
            logger.warning("column %r sparse in incoming data; keeping (null-fill)", name)

    fields = [
        T.StructField(f.name, promoted.get(f.name, f.dataType), f.nullable, f.metadata)
        for f in current.fields
        if f.name not in dropped
    ]
    existing = {f.name for f in fields}
    for f in incoming.fields:
        if f.name not in existing:
            fields.append(f)
    evolved = T.StructType(fields)
    changed = evolved != current
    return evolved, changed

"""Incrementally-maintained aggregate tables (CDC rollups).

The 100 TB pattern: a fact table takes appends / row-level updates /
deletes all day, and a handful of dashboards need ``GROUP BY`` summaries
of it.  Recomputing the aggregate is an O(source) scan per refresh; this
module maintains the summary as a first-class :class:`LakeTable` from the
source's CDC changelog instead — every refresh costs O(changed rows +
touched groups), never O(source).  TimescaleDB calls the shape a
continuous aggregate; Iceberg users hand-roll it over
``create_changelog_view``; the reference has no equivalent (its engine
delegates aggregation entirely — SURVEY.md §2.5).

Mechanics:

- ``refresh()`` reads ``source.read_changes(cursor, head)`` and folds it
  into signed per-group deltas: insert images add, delete images
  subtract.  Copy-on-write rewrites re-emit unchanged rows as identical
  delete+insert pairs, which cancel exactly in the signed sums — the raw
  changelog is consumed without a net-changes pass.
- The deltas join the CURRENT group rows (a semi-join keeps it to touched
  groups) and land through the writer's ordinary key-localized CoW merge:
  untouched rollup files pass by reference, groups whose row count drops
  to zero ride the hard-delete marker out of the table — one atomic
  snapshot.
- **Exactly-once without a side channel**: the refresh stamps
  ``load_id="rollup-src-<version>"`` into that snapshot's summary, and
  the next refresh recovers its cursor by walking the rollup's snapshots
  (newest first) for the marker.  Data and cursor commit atomically — a
  crash before the commit replays the same delta; after it, the marker
  advances.
- Only aggregates with an inverse ride the signed fold: ``sum``,
  ``count``, and ``avg`` (maintained as its sum/count decomposition,
  derived at read time).  ``min``/``max`` have no
  inverse — retracting the current extremum needs a group rescan — so
  they are refused under the default strategy — as is
  ``count_distinct``, inverse-less for the same reason — and accepted
  with ``strategy="rescan"``: sums/counts stay incremental, while
  min/max/count_distinct are recomputed from the source *only for the
  groups the changelog touched* (a keyed semi-join rescan).  Cost table
  per refresh:

  ======================  =============================================
  strategy                cost
  ======================  =============================================
  ``"incremental"``       O(changed rows + touched groups) — never
                          reads the source outside the changelog
  ``"rescan"``            the above + O(touched groups' source rows);
                          when few groups are touched the rescan scan is
                          file-pruned to the touched keys (per-key IN
                          probe) via manifest stats, so it is never
                          O(source) for localized mutations
  ======================  =============================================

Caveats (documented, not silent): float sums drift under heavy
insert/delete cancellation (use decimals for exactness); rows with NULL
in a rollup key form a group in the delta but cannot be merge-joined
(same null-key semantics as SQL MERGE) — filter or coalesce upstream;
a refresh whose cursor predates the source's expired history raises via
``read_changes`` (refresh more often than you expire, or ``rebuild()``).
"""

from __future__ import annotations

import logging
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dlt_iceberg_spark.lake.catalog import LakeCatalog
from dlt_iceberg_spark.lake.table import LakeTable
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

logger = logging.getLogger(__name__)

_MARKER = "rollup-src-"
_DELETE_COL = "__rollup_delete"

# Below this many touched groups the rescan collects the key set to the
# driver and prunes the source scan to the touched key RANGE via manifest
# stats (plus a broadcast semi-join for exactness).  Above it, a plain
# shuffled semi-join — still O(touched groups' source rows) of output, but
# the scan itself can no longer be file-pruned.
RESCAN_KEY_PUSHDOWN_MAX = 10_000


class IncrementalRollup:
    """A ``GROUP BY keys`` summary of ``source``, maintained from CDC.

    ``aggs`` maps each output column to its spec:

    - ``("sum", src_col)`` — signed sum of ``src_col``;
    - ``("count",)`` or ``("count", "*")`` — rows per group;
    - ``("count", src_col)`` — non-null values of ``src_col`` per group;
    - ``("avg", src_col)`` — maintained as hidden sum + non-null count,
      derived at read time (exact under deletes, like sum/count);
    - ``("min", src_col)`` / ``("max", src_col)`` /
      ``("count_distinct", src_col)`` — require ``strategy="rescan"``
      (no inverse; maintained by rescanning only the touched groups —
      see the module cost table).

    The rollup table additionally keeps ``__rows`` (rows per group) to
    know when a group vanishes; it is dropped from :meth:`read`.
    """

    def __init__(
        self,
        catalog: LakeCatalog,
        namespace: str,
        name: str,
        source: LakeTable,
        keys: list[str],
        aggs: dict[str, tuple],
        strategy: str = "incremental",
    ):
        if not keys:
            raise ValueError("rollup needs at least one group key")
        if strategy not in ("incremental", "rescan"):
            raise ValueError(f"unknown strategy {strategy!r}: incremental | rescan")
        for col, spec in aggs.items():
            if spec[0] in ("min", "max", "count_distinct"):
                if strategy != "rescan":
                    raise ValueError(
                        f"aggregate {spec[0]!r} for {col!r} has no inverse; "
                        "pass strategy=\"rescan\" to maintain it by "
                        "rescanning touched groups (sum/count/avg stay "
                        "incremental), or recompute with a plain query"
                    )
            elif spec[0] == "avg":
                if len(spec) < 2 or spec[1] in (None, "*"):
                    raise ValueError(f"avg for {col!r} needs a source column")
            elif spec[0] not in ("sum", "count"):
                raise ValueError(
                    f"aggregate {spec[0]!r} for {col!r} has no inverse; "
                    "incremental maintenance supports sum/count/avg and, "
                    "under strategy=\"rescan\", min/max/count_distinct"
                )
        reserved = set(keys) | {"__rows", _DELETE_COL}
        if reserved & set(aggs):
            raise ValueError(f"aggregate columns collide with {sorted(reserved & set(aggs))}")
        self.catalog = catalog
        self.namespace = namespace
        self.name = name
        self.source = source
        self.keys = list(keys)
        self.aggs = dict(aggs)
        self.strategy = strategy
        self._minmax = {
            c: s
            for c, s in aggs.items()
            if s[0] in ("min", "max", "count_distinct")
        }
        #: avg maintains as (sum, non-null count) under hidden columns and
        #: derives the ratio at read time — the standard self-maintainable
        #: decomposition, so deletes retract it exactly like sum/count
        self._avg = {c: s[1] for c, s in aggs.items() if s[0] == "avg"}
        self._incr = {
            c: s
            for c, s in aggs.items()
            if s[0] not in ("min", "max", "count_distinct", "avg")
        }
        for col, src_col in self._avg.items():
            self._incr[f"__avg_sum_{col}"] = ("sum", src_col)
            self._incr[f"__avg_cnt_{col}"] = ("count", src_col)
        self._writer = LakeWriter(catalog, namespace)

    # -- internals -----------------------------------------------------

    def _signed_aggs(self, sign) -> list:
        out = []
        for col, spec in self._incr.items():
            if spec[0] == "sum":
                out.append(F.sum(sign * F.col(spec[1])).alias(col))
            elif len(spec) == 1 or spec[1] == "*":
                out.append(F.sum(sign).alias(col))
            else:
                out.append(
                    F.sum(sign * F.col(spec[1]).isNotNull().cast("long")).alias(col)
                )
        out.append(F.sum(sign).alias("__rows"))
        return out

    def _minmax_aggs(self) -> list:
        fns = {"min": F.min, "max": F.max, "count_distinct": F.countDistinct}
        return [
            fns[spec[0]](F.col(spec[1])).alias(col)
            for col, spec in self._minmax.items()
        ]

    def _rescan_minmax(self, source: LakeTable, src_v: int, touched: DataFrame):
        """min/max per touched group, recomputed from the source snapshot.

        When the touched key set is small enough to collect, the scan is
        bounded two ways: the manifest planner prunes files with a per-key
        IN probe (any-probed-value-in-[min,max] per file — strictly
        tighter than a global key range on gappy or skewed key sets, and
        sound because every touched group's values are probed), and the
        semi-join side is an explicit broadcast.  Localized mutations then
        rescan a handful of files no matter how large the source is.  Past
        the threshold we fall back to a shuffled semi-join over an
        unpruned scan (output still O(touched groups' source rows))."""
        where = None
        bounded = touched.limit(RESCAN_KEY_PUSHDOWN_MAX + 1).collect()
        if len(bounded) <= RESCAN_KEY_PUSHDOWN_MAX:
            where = []
            for k in self.keys:
                vals = {r[k] for r in bounded if r[k] is not None}
                if vals:
                    where.append((k, "in", list(vals)))
            where = where or None
            src = source.read(snapshot_version=src_v, where=where)
            joined = src.join(F.broadcast(touched), on=self.keys, how="left_semi")
        else:
            src = source.read(snapshot_version=src_v)
            joined = src.join(touched, on=self.keys, how="left_semi")
        return joined.groupBy(*self.keys).agg(*self._minmax_aggs())

    def _table(self, branch: str = "main") -> LakeTable | None:
        from dlt_iceberg_spark.errors import TableNotFoundError

        try:
            return self.catalog.load_table(self.namespace, self.name, branch=branch)
        except (FileNotFoundError, TableNotFoundError):
            return None

    def _cursor(self, tgt: LakeTable) -> int:
        """Newest refresh marker along the rollup's ancestry — the source
        version whose changes are already folded in.  O(snapshots since
        the last refresh), pure metadata."""
        snap = tgt.snapshot()
        while snap is not None:
            lid = str(snap.summary.get("load_id", ""))
            if lid.startswith(_MARKER):
                return int(lid[len(_MARKER):])
            snap = tgt.snapshot(snap.parent) if snap.parent is not None else None
        raise ValueError(
            f"table {self.namespace}.{self.name} carries no rollup marker; "
            "was it created by IncrementalRollup?"
        )

    # -- API -------------------------------------------------------------

    def refresh(self, transaction=None) -> dict:
        """Fold source changes since the last refresh into the rollup.

        Returns ``{"source_version": v, "groups_touched": n}`` (n = -1 on
        the initial full build, 0 for a no-op).

        ``transaction`` (a :class:`~dlt_iceberg_spark.lake.transaction.
        CatalogTransaction`) stages the refresh on the transaction's
        branch, READING the source's staged state: fact mutations and
        their rollup fold then publish as ONE atomic cut — dashboards can
        never observe the fact table ahead of its summary."""
        branch = transaction.branch if transaction is not None else "main"
        source = (
            self.source.for_branch(branch)
            if transaction is not None
            else self.source
        )
        src_v = source.current_version()
        if src_v is None:
            raise FileNotFoundError(f"no such table: {self.source.location}")

        def _write(spec: TableSpec, df: DataFrame, load_id: str) -> None:
            if transaction is not None:
                transaction.write(
                    spec, df, load_id=load_id, namespace=self.namespace
                )
            else:
                self._writer.write(spec, df, load_id=load_id)

        tgt = self._table(branch)
        if tgt is None:
            # initial build: one aggregate over the pinned source snapshot
            one = F.lit(1)
            full = source.read(snapshot_version=src_v).groupBy(*self.keys).agg(
                *self._signed_aggs(one), *self._minmax_aggs()
            )
            _write(
                TableSpec(
                    name=self.name,
                    write_disposition="append",
                    primary_key=list(self.keys),
                ),
                full,
                f"{_MARKER}{src_v}",
            )
            return {"source_version": src_v, "groups_touched": -1}

        cursor = self._cursor(tgt)
        if cursor >= src_v:
            return {"source_version": cursor, "groups_touched": 0}

        ch = source.read_changes(cursor, src_v)
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        delta = ch.groupBy(*self.keys).agg(*self._signed_aggs(sign))
        val_cols = [c for c in delta.columns if c not in self.keys]
        if not self._minmax:
            # drop all-cancelled groups early (CoW rewrite pairs often
            # cancel an entire group): no delta row -> group untouched ->
            # not rewritten.  With min/max aggregates this filter would be
            # UNSOUND — a rewrite can swap {3,5} for {4,4} (zero net sums,
            # changed extremum) — so rescan mode keeps every changelog
            # group.
            changed = F.col("__rows") != 0
            for c in val_cols:
                changed = changed | (F.coalesce(F.col(c), F.lit(0)) != 0)
            delta = delta.filter(changed)
        # materialize the changelog fold ONCE: everything downstream (the
        # semi-join's key set, the union, the touched-group count, the
        # write, the min/max rescan key set) replays from this cache, so
        # the O(changed) scan happens exactly once per refresh.
        delta = delta.persist()
        merged = None
        try:
            delta.count()
            touched = delta.select(*self.keys)  # groupBy output: one row/group
            cur = tgt.read().select(*self.keys, *val_cols).join(
                touched, on=self.keys, how="left_semi"
            )
            merged = (
                cur.unionByName(delta)
                .groupBy(*self.keys)
                .agg(*[F.sum(c).alias(c) for c in val_cols])
            )
            if self._minmax:
                merged = merged.join(
                    self._rescan_minmax(source, src_v, touched),
                    on=self.keys,
                    how="left",
                )
            merged = merged.persist()
            n = merged.count()
            out = merged.withColumn(
                _DELETE_COL, F.when(F.col("__rows") <= 0, F.lit(True))
            )
            _write(
                TableSpec(
                    name=self.name,
                    write_disposition={"disposition": "merge", "strategy": "upsert"},
                    primary_key=list(self.keys),
                    hard_delete_column=_DELETE_COL,
                ),
                out,
                f"{_MARKER}{src_v}",
            )
        finally:
            delta.unpersist()
            if merged is not None:
                merged.unpersist()
        return {"source_version": src_v, "groups_touched": n}

    def rebuild(self) -> dict:
        """Recompute the rollup from a full source scan (escape hatch for
        a cursor older than the source's retained history) — replaces the
        table in one snapshot."""
        src_v = self.source.current_version()
        one = F.lit(1)
        full = self.source.read(snapshot_version=src_v).groupBy(*self.keys).agg(
            *self._signed_aggs(one), *self._minmax_aggs()
        )
        self._writer.write(
            TableSpec(name=self.name, write_disposition="replace"),
            full,
            load_id=f"{_MARKER}{src_v}",
        )
        return {"source_version": src_v, "groups_touched": -1}

    def read(self) -> DataFrame:
        """Current rollup rows (bookkeeping columns dropped; avg columns
        derived from their maintained sum/count decomposition — NULL for a
        group whose values are all NULL, like SQL AVG)."""
        tgt = self._table()
        if tgt is None:
            raise FileNotFoundError(f"rollup {self.namespace}.{self.name} not built")
        df = tgt.read()
        hidden = ["__rows"]
        for col in self._avg:
            s, n = f"__avg_sum_{col}", f"__avg_cnt_{col}"
            df = df.withColumn(
                col,
                F.when(F.col(n) > 0, F.col(s) / F.col(n)),
            )
            hidden += [s, n]
        # present columns in the declared aggs order (keys first)
        return df.drop(*hidden).select(*self.keys, *self.aggs)

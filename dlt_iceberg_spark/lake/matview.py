"""Incrementally-maintained JOIN views (materialized views over CDC).

The companion to :class:`~dlt_iceberg_spark.lake.rollup.IncrementalRollup`
for the other half of the dashboard-query shape: ``A JOIN B``
materialized as a first-class :class:`LakeTable` and kept current from
both sources' CDC changelogs, never by re-running the join.  PostgreSQL
calls this incremental view maintenance; Materialize/Feldera build whole
engines around it; Iceberg users hand-roll it over changelog views; the
reference has no equivalent (its engine delegates joins — SURVEY.md
§2.4).

The algebra is the classic delta-join identity.  With ``A1``/``B1`` the
sources at the view's cursors and ``A2``/``B2`` at their heads:

    M2 − M1 = ΔA ⋈ B2  +  A1 ⋈ ΔB

(expanding ``(A1+ΔA) ⋈ (B1+ΔB)`` — the ΔA⋈ΔB cross term lands in the
first factor because it joins against the NEW right side).  Both delta
terms are SIGNED: insert images carry +1, delete images −1, and signed
content-level folding cancels the stale intermediate images exactly
(e.g. when the same pair's A-row and B-row both changed in one refresh,
the ``A1 ⋈ ΔB`` term's half-new image is annihilated by the
``ΔA ⋈ B2`` term's matching delete image — the general IVM property, no
special-casing).

Scale shape, per refresh:

- ``ΔA`` / ``ΔB`` are planned O(changed) from snapshot metadata
  (``read_changes``) and persisted so each is computed once.
- The full-side reads are NEVER full scans: each is semi-joined to the
  other delta's join keys, and when the changed key set is collectable
  (≤ ``JOIN_KEY_PUSHDOWN_MAX``) the scan carries a per-key IN ``where``
  so manifest stats file-prune it — a localized mutation joins against
  a handful of files at any table size.
- The result lands through the ordinary key-localized merge on the
  view's composite primary key (left pk + right pk), so only the view
  files holding touched pairs rewrite.
- **Exactly-once without a side channel**: both source cursors ride the
  view snapshot's ``load_id`` (``mjoin-a<v>-b<v>``) — data and cursor
  commit atomically, same contract as the rollup.

The full join matrix is maintained: inner / left / right / full
equi-joins.  Outer variants keep the null-extended halves in companion
tables (``<name>__unmatched`` keyed by left_pk, ``__unmatched_right``
keyed by right_pk), flipping rows on per-key match-count zero crossings
computed from the OTHER side's delta alone (old = new − Δ over that
delta's keys, never a full-side count); all halves publish atomically.
Join keys must be non-null (outer-join null keys never match and would
need dedicated null-group handling); both sources need primary keys so
view rows are uniquely addressable.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dlt_iceberg_spark.lake.catalog import LakeCatalog
from dlt_iceberg_spark.lake.table import LakeTable
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

logger = logging.getLogger(__name__)

_MARKER = "mjoin-"
_DELETE_COL = "__mjoin_delete"

#: below this many changed join keys, the opposite-side scan collects the
#: key set and pushes a per-key IN `where` for manifest file pruning (same
#: policy as rollup.RESCAN_KEY_PUSHDOWN_MAX)
JOIN_KEY_PUSHDOWN_MAX = 10_000


class IncrementalJoinView:
    """``left {INNER|LEFT|RIGHT|FULL} JOIN right ON on`` as CDC-maintained
    LakeTables.

    Output columns: every column of both sides, join keys once (name
    collisions outside the join keys are an error — project/rename
    upstream), or just ``select=[...]`` when given (must include the
    join keys and both primary keys; at 100 TB, projecting 6 of 60
    columns shrinks every refresh's merge rewrite and the view's storage
    by the same factor — updates touching only unprojected columns fold
    to nothing and never rewrite the view at all).  The view's primary
    key is ``left_pk + right_pk``.

    Outer joins additionally maintain the null-extended halves in
    companion tables — ``<name>__unmatched`` (left rows with zero
    matches, keyed ``left_pk``; how="left"/"full") and
    ``<name>__unmatched_right`` (the mirror, keyed ``right_pk``;
    how="right"/"full") — because NULL join keys cannot merge-join;
    :meth:`read` unions the halves back with typed NULL columns.  Rows
    flip between halves on per-key match-count ZERO CROSSINGS, detected
    from the OTHER side's delta alone: old_count = new_count − Δ, both
    computed over that delta's keys only — never a full-side count.  All
    halves always publish atomically (the refresh opens its own
    transaction when the caller didn't supply one).
    """

    def __init__(
        self,
        catalog: LakeCatalog,
        namespace: str,
        name: str,
        left: LakeTable,
        right: LakeTable,
        on: list[str],
        left_pk: list[str],
        right_pk: list[str],
        how: str = "inner",
        select: list[str] | None = None,
    ):
        if how not in ("inner", "left", "right", "full"):
            raise NotImplementedError(
                f"how={how!r}: supported joins are inner / left / right / "
                "full equi-joins (outer variants keep companion "
                "__unmatched tables driven by per-key match-count "
                "transitions); semi/anti shapes are plain queries"
            )
        if not on:
            raise ValueError("join needs at least one key column")
        if not left_pk or not right_pk:
            raise ValueError(
                "both sides need primary keys: view rows are addressed by "
                "(left_pk + right_pk) in the maintenance merge"
            )
        self.catalog = catalog
        self.namespace = namespace
        self.name = name
        self.left = left
        self.right = right
        self.on = list(on)
        self.left_pk = list(left_pk)
        self.right_pk = list(right_pk)
        self.how = how
        if select is not None:
            required = list(dict.fromkeys(on + left_pk + right_pk))
            missing = [c for c in required if c not in select]
            if missing:
                raise ValueError(
                    "select must include the join keys and both primary "
                    f"keys (view rows are addressed by them); missing "
                    f"{missing}"
                )
        #: optional column projection: the view (and its unmatched
        #: halves) materialize ONLY these columns — at scale the
        #: difference between rewriting 6 and 60 columns per touched file
        #: on every refresh
        self.select = list(select) if select is not None else None
        #: outer joins keep the null-extended halves in companion tables
        #: keyed by one side's pk alone (NULL join keys cannot
        #: merge-join); read() unions the halves back
        self.unmatched_name = f"{name}__unmatched"
        self.unmatched_right_name = f"{name}__unmatched_right"
        self._keep_left = how in ("left", "full")
        self._keep_right = how in ("right", "full")
        self._writer = LakeWriter(catalog, namespace)

    # -- internals -----------------------------------------------------

    def _project_sides(
        self, lcols: list[str], rcols: list[str]
    ) -> tuple[list[str], list[str]]:
        """Per-side column lists after the optional ``select`` projection
        (source order preserved; unknown names are an error)."""
        if self.select is None:
            return lcols, rcols
        unknown = [
            c for c in self.select if c not in lcols and c not in rcols
        ]
        if unknown:
            raise ValueError(
                f"select names columns on neither side: {unknown}"
            )
        keep = set(self.select)
        return [c for c in lcols if c in keep], [c for c in rcols if c in keep]

    def _out_columns(self, lcols: list[str], rcols: list[str]) -> list[str]:
        overlap = (set(lcols) & set(rcols)) - set(self.on)
        if overlap:
            raise ValueError(
                f"column collision outside the join keys: {sorted(overlap)}; "
                "project or rename before building the view"
            )
        return lcols + [c for c in rcols if c not in self.on]

    def _table(self, branch: str = "main") -> LakeTable | None:
        from dlt_iceberg_spark.errors import TableNotFoundError

        try:
            return self.catalog.load_table(self.namespace, self.name, branch=branch)
        except (FileNotFoundError, TableNotFoundError):
            return None

    def _cursors(self, tgt: LakeTable) -> tuple[int, int]:
        snap = tgt.snapshot()
        while snap is not None:
            lid = str(snap.summary.get("load_id", ""))
            if lid.startswith(_MARKER):
                a, b = lid[len(_MARKER):].split("-")
                return int(a[1:]), int(b[1:])
            snap = tgt.snapshot(snap.parent) if snap.parent is not None else None
        raise ValueError(
            f"table {self.namespace}.{self.name} carries no join-view "
            "marker; was it created by IncrementalJoinView?"
        )

    def _marker(self, av: int, bv: int) -> str:
        return f"{_MARKER}a{av}-b{bv}"

    def _pruned_side(
        self, side: LakeTable, version: int, keys: DataFrame
    ) -> DataFrame:
        """The full side of a delta term, bounded two ways: a per-key IN
        ``where`` when the changed key set is collectable (manifest-stats
        file pruning — tighter than a global key range on gappy key
        sets), always a broadcast/shuffle semi-join on the changed join
        keys (row exactness)."""
        where = None
        bounded = keys.limit(JOIN_KEY_PUSHDOWN_MAX + 1).collect()
        if len(bounded) <= JOIN_KEY_PUSHDOWN_MAX:
            where = []
            for k in self.on:
                vals = {r[k] for r in bounded if r[k] is not None}
                if vals:
                    where.append((k, "in", list(vals)))
            where = where or None
            src = side.read(snapshot_version=version, where=where)
            return src.join(F.broadcast(keys), on=self.on, how="left_semi")
        src = side.read(snapshot_version=version)
        return src.join(keys, on=self.on, how="left_semi")

    @staticmethod
    def _signed(ch: DataFrame) -> DataFrame:
        return ch.withColumn(
            "__sign",
            F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
                F.lit(-1)
            ),
        ).drop("_change_type", "_commit_version")

    # -- API -------------------------------------------------------------

    def refresh(self, transaction=None) -> dict:
        """Fold both sources' changes since the last refresh into the
        view.  Returns ``{"left_version", "right_version",
        "pairs_touched"}`` (−1 on the initial full build, 0 no-op).

        ``transaction`` (a :class:`~dlt_iceberg_spark.lake.transaction.
        CatalogTransaction`) stages the refresh on the transaction's
        branch, READING both sources' staged states — source mutations
        and the join fold publish as ONE atomic cut.

        An OUTER join refresh writes multiple tables (matched +
        unmatched halves); without a caller-supplied transaction it opens
        its own, so the halves can never publish torn."""
        if self.how != "inner" and transaction is None:
            txn = self.catalog.transaction(self.namespace)
            try:
                r = self._refresh(txn)
                txn.commit()
                return r
            except BaseException:
                txn.rollback()
                raise
        return self._refresh(transaction)

    def _refresh(self, transaction=None) -> dict:
        branch = transaction.branch if transaction is not None else "main"
        left = (
            self.left.for_branch(branch) if transaction is not None else self.left
        )
        right = (
            self.right.for_branch(branch)
            if transaction is not None
            else self.right
        )
        av = left.current_version()
        bv = right.current_version()
        if av is None or bv is None:
            raise FileNotFoundError("both join sources must exist")

        def _write(spec: TableSpec, df: DataFrame, load_id: str) -> None:
            if transaction is not None:
                transaction.write(
                    spec, df, load_id=load_id, namespace=self.namespace
                )
            else:
                self._writer.write(spec, df, load_id=load_id)

        tgt = self._table(branch)
        if tgt is None:
            lcols, rcols = self._project_sides(
                left.read().columns, right.read().columns
            )
            out_cols = self._out_columns(lcols, rcols)
            full = (
                left.read(snapshot_version=av)
                .join(right.read(snapshot_version=bv), on=self.on, how="inner")
                .select(*out_cols)
            )
            _write(
                TableSpec(
                    name=self.name,
                    write_disposition="append",
                    primary_key=self.left_pk + self.right_pk,
                ),
                full,
                self._marker(av, bv),
            )
            if self._keep_left:
                unmatched = left.read(snapshot_version=av).join(
                    right.read(snapshot_version=bv).select(*self.on).distinct(),
                    on=self.on,
                    how="left_anti",
                ).select(*lcols)
                _write(
                    TableSpec(
                        name=self.unmatched_name,
                        write_disposition="append",
                        primary_key=list(self.left_pk),
                    ),
                    unmatched,
                    self._marker(av, bv),
                )
            if self._keep_right:
                unmatched_r = right.read(snapshot_version=bv).join(
                    left.read(snapshot_version=av).select(*self.on).distinct(),
                    on=self.on,
                    how="left_anti",
                ).select(*rcols)
                _write(
                    TableSpec(
                        name=self.unmatched_right_name,
                        write_disposition="append",
                        primary_key=list(self.right_pk),
                    ),
                    unmatched_r,
                    self._marker(av, bv),
                )
            return {"left_version": av, "right_version": bv, "pairs_touched": -1}

        a_cur, b_cur = self._cursors(tgt)
        if a_cur >= av and b_cur >= bv:
            return {
                "left_version": a_cur,
                "right_version": b_cur,
                "pairs_touched": 0,
            }

        lcols, rcols = self._project_sides(
            left.read().columns, right.read().columns
        )
        out_cols = self._out_columns(lcols, rcols)
        if self.select is not None:
            stored = [f.name for f in tgt.schema().fields]
            if set(out_cols) != set(stored):
                raise ValueError(
                    f"view {self.name} stores columns {sorted(stored)} but "
                    f"this handle projects {sorted(out_cols)}; changing "
                    "select between refreshes would corrupt the view — "
                    "rebuild() applies the new projection"
                )

        terms = []
        u_terms = []   # null-extended LEFT half deltas
        ur_terms = []  # null-extended RIGHT half deltas
        persisted = []

        def _transition_keys(d_other: DataFrame, other, other_new_v: int):
            """Keys whose OTHER-side row count crossed zero this window,
            with the flip direction: +1 = key died (kept side's rows
            ENTER its unmatched half), −1 = key came alive (they LEAVE).
            old = new − Δ, both over the delta's keys only."""
            d_counts = d_other.groupBy(*self.on).agg(
                F.sum("__sign").alias("__d")
            )
            new_counts = (
                self._pruned_side(
                    other, other_new_v, d_other.select(*self.on).distinct()
                )
                .groupBy(*self.on)
                .agg(F.count(F.lit(1)).alias("__new"))
            )
            return (
                d_counts.join(new_counts, on=self.on, how="left")
                .withColumn("__new", F.coalesce(F.col("__new"), F.lit(0)))
                .withColumn("__old", F.col("__new") - F.col("__d"))
                .filter((F.col("__old") > 0) != (F.col("__new") > 0))
                .withColumn(
                    "__usign",
                    F.when(F.col("__new") == 0, F.lit(1)).otherwise(
                        F.lit(-1)
                    ),
                )
                .select(*self.on, "__usign")
            )

        try:
            if av > a_cur:
                # project the delta to the view's columns up front: an
                # update touching only unprojected columns folds to a
                # ±0 image and never rewrites the view
                dA = (
                    self._signed(left.read_changes(a_cur, av))
                    .select(*lcols, "__sign")
                    .persist()
                )
                persisted.append(dA)
                dA.count()
                # ΔA ⋈ B2 (the NEW right side, so the ΔA⋈ΔB cross term
                # lands exactly once)
                b2 = self._pruned_side(
                    right, bv, dA.select(*self.on).distinct()
                )
                terms.append(
                    dA.join(b2, on=self.on, how="inner").select(
                        *out_cols, "__sign"
                    )
                )
                if self._keep_left:
                    # ΔA rows whose key has NO match in B2 flow through
                    # the null-extended half with ΔA's own signs (b2 is
                    # pruned to ΔA's keys, so the anti-join is exact)
                    u_terms.append(
                        dA.join(
                            b2.select(*self.on).distinct(),
                            on=self.on,
                            how="left_anti",
                        ).select(*lcols, "__sign")
                    )
                if self._keep_right:
                    # mirror transitions: ΔA may flip B1 rows in or out
                    # of the right unmatched half
                    trans = _transition_keys(dA, left, av)
                    b1t = self._pruned_side(
                        right, b_cur, trans.select(*self.on)
                    )
                    ur_terms.append(
                        b1t.join(trans, on=self.on, how="inner").select(
                            *rcols, F.col("__usign").alias("__sign")
                        )
                    )
            if bv > b_cur:
                dB = (
                    self._signed(right.read_changes(b_cur, bv))
                    .select(*rcols, "__sign")
                    .persist()
                )
                persisted.append(dB)
                dB.count()
                # A1 ⋈ ΔB (the OLD left side)
                a1 = self._pruned_side(
                    left, a_cur, dB.select(*self.on).distinct()
                )
                terms.append(
                    a1.join(dB, on=self.on, how="inner").select(
                        *out_cols, "__sign"
                    )
                )
                if self._keep_left:
                    # per-key match-count TRANSITIONS: a key whose B-row
                    # count crossed zero flips its A1 rows between the
                    # halves (old = new − Δ over ΔB's keys only)
                    trans = _transition_keys(dB, right, bv)
                    a1t = self._pruned_side(
                        left, a_cur, trans.select(*self.on)
                    )
                    u_terms.append(
                        a1t.join(trans, on=self.on, how="inner").select(
                            *lcols, F.col("__usign").alias("__sign")
                        )
                    )
                if self._keep_right:
                    # ΔB rows route by matching against the NEW left side
                    a2 = self._pruned_side(
                        left, av, dB.select(*self.on).distinct()
                    )
                    ur_terms.append(
                        dB.join(
                            a2.select(*self.on).distinct(),
                            on=self.on,
                            how="left_anti",
                        ).select(*rcols, "__sign")
                    )
            delta = terms[0]
            for t in terms[1:]:
                delta = delta.unionByName(t)
            # signed CONTENT fold: stale intermediate images (half-updated
            # pairs, CoW rewrite noise) cancel exactly; what survives is
            # the true row-level diff of the join
            net = (
                delta.groupBy(*out_cols)
                .agg(F.sum("__sign").alias("__n"))
                .filter(F.col("__n") != 0)
            )
            # per view key at most one positive image survives (the join
            # is functional on left_pk + right_pk); a key with ONLY a
            # negative survivor left the join
            pk = self.left_pk + self.right_pk
            payload = [c for c in out_cols if c not in pk]
            merged = (
                net.groupBy(*pk)
                .agg(
                    F.max_by(
                        F.struct(*payload, F.col("__n").alias("__n")),
                        F.col("__n"),
                    ).alias("__img")
                )
                .select(*pk, "__img.*")
            ).persist()
            persisted.append(merged)
            n = merged.count()
            out = merged.withColumn(
                _DELETE_COL, F.when(F.col("__n") < 0, F.lit(True))
            ).drop("__n")
            _write(
                TableSpec(
                    name=self.name,
                    write_disposition={
                        "disposition": "merge",
                        "strategy": "upsert",
                    },
                    primary_key=pk,
                    hard_delete_column=_DELETE_COL,
                ),
                out,
                self._marker(av, bv),
            )
            def _apply_unmatched(terms_u, cols, upk, tname) -> int:
                u_delta = terms_u[0]
                for t in terms_u[1:]:
                    u_delta = u_delta.unionByName(t)
                u_net = (
                    u_delta.groupBy(*cols)
                    .agg(F.sum("__sign").alias("__n"))
                    .filter(F.col("__n") != 0)
                )
                u_payload = [c for c in cols if c not in upk]
                u_merged = (
                    u_net.groupBy(*upk)
                    .agg(
                        F.max_by(
                            F.struct(
                                *u_payload, F.col("__n").alias("__n")
                            ),
                            F.col("__n"),
                        ).alias("__img")
                    )
                    .select(*upk, "__img.*")
                ).persist()
                persisted.append(u_merged)
                u_n = u_merged.count()
                u_out = u_merged.withColumn(
                    _DELETE_COL, F.when(F.col("__n") < 0, F.lit(True))
                ).drop("__n")
                _write(
                    TableSpec(
                        name=tname,
                        write_disposition={
                            "disposition": "merge",
                            "strategy": "upsert",
                        },
                        primary_key=list(upk),
                        hard_delete_column=_DELETE_COL,
                    ),
                    u_out,
                    self._marker(av, bv),
                )
                return u_n

            if u_terms:
                n += _apply_unmatched(
                    u_terms, lcols, self.left_pk, self.unmatched_name
                )
            if ur_terms:
                n += _apply_unmatched(
                    ur_terms, rcols, self.right_pk, self.unmatched_right_name
                )
        finally:
            for df in persisted:
                df.unpersist()
        return {"left_version": av, "right_version": bv, "pairs_touched": n}

    def rebuild(self, transaction=None) -> dict:
        """Recompute the view from a full join (escape hatch for cursors
        older than a source's retained history).

        Same atomicity contract as :meth:`refresh`: an OUTER rebuild
        replaces multiple tables (matched + unmatched halves); without a
        caller-supplied transaction it opens its own, so a concurrent
        reader (or a crash between writes) can never see torn halves.

        A rebuild is also how a CHANGED ``select`` projection takes
        effect: the replace disposition evolves schemas additively (a
        dropped column would linger null-filled), so when the stored
        column set differs from the projection the target tables are
        recreated from scratch first (the one rebuild step that is not
        covered by the transaction — the view is briefly absent, which an
        explicit full rebuild already implies)."""
        if self.select is not None:
            tgt = self._table()
            if tgt is not None:
                lcols, rcols = self._project_sides(
                    self.left.read().columns, self.right.read().columns
                )
                out_cols = self._out_columns(lcols, rcols)
                if {f.name for f in tgt.schema().fields} != set(out_cols):
                    for t in (
                        [self.name]
                        + ([self.unmatched_name] if self._keep_left else [])
                        + ([self.unmatched_right_name] if self._keep_right else [])
                    ):
                        if self.catalog.table_exists(self.namespace, t):
                            self.catalog.drop_table(self.namespace, t)
        if self.how != "inner" and transaction is None:
            txn = self.catalog.transaction(self.namespace)
            try:
                r = self._rebuild(txn)
                txn.commit()
                return r
            except BaseException:
                txn.rollback()
                raise
        return self._rebuild(transaction)

    def _rebuild(self, transaction=None) -> dict:
        branch = transaction.branch if transaction is not None else "main"
        left = (
            self.left.for_branch(branch) if transaction is not None else self.left
        )
        right = (
            self.right.for_branch(branch)
            if transaction is not None
            else self.right
        )
        av = left.current_version()
        bv = right.current_version()

        def _write(spec: TableSpec, df: DataFrame, load_id: str) -> None:
            if transaction is not None:
                transaction.write(
                    spec, df, load_id=load_id, namespace=self.namespace
                )
            else:
                self._writer.write(spec, df, load_id=load_id)

        lcols, rcols = self._project_sides(
            left.read().columns, right.read().columns
        )
        out_cols = self._out_columns(lcols, rcols)
        full = (
            left.read(snapshot_version=av)
            .join(right.read(snapshot_version=bv), on=self.on, how="inner")
            .select(*out_cols)
        )
        _write(
            TableSpec(name=self.name, write_disposition="replace"),
            full,
            self._marker(av, bv),
        )
        if self._keep_left:
            unmatched = left.read(snapshot_version=av).join(
                right.read(snapshot_version=bv)
                .select(*self.on)
                .distinct(),
                on=self.on,
                how="left_anti",
            ).select(*lcols)
            _write(
                TableSpec(name=self.unmatched_name, write_disposition="replace"),
                unmatched,
                self._marker(av, bv),
            )
        if self._keep_right:
            unmatched_r = right.read(snapshot_version=bv).join(
                left.read(snapshot_version=av)
                .select(*self.on)
                .distinct(),
                on=self.on,
                how="left_anti",
            ).select(*rcols)
            _write(
                TableSpec(
                    name=self.unmatched_right_name, write_disposition="replace"
                ),
                unmatched_r,
                self._marker(av, bv),
            )
        return {"left_version": av, "right_version": bv, "pairs_touched": -1}

    def read(self) -> DataFrame:
        """Current view rows.  Outer joins union the matched half with
        the null-extended unmatched half/halves (missing-side columns
        typed NULL)."""
        tgt = self._table()
        if tgt is None:
            raise FileNotFoundError(
                f"join view {self.namespace}.{self.name} not built"
            )
        m = tgt.read()

        def _extend(tname: str) -> DataFrame:
            u = self.catalog.load_table(self.namespace, tname).read()
            for f in m.schema.fields:
                if f.name not in u.columns:
                    u = u.withColumn(f.name, F.lit(None).cast(f.dataType))
            return u.select(*m.columns)

        out = m
        if self._keep_left:
            out = out.unionByName(_extend(self.unmatched_name))
        if self._keep_right:
            out = out.unionByName(_extend(self.unmatched_right_name))
        return out

"""Multi-table transactions — Iceberg REST ``commitTransaction`` parity.

A pipeline load frequently spans tables (fact + dims, data + quality
metrics, table + its rollup); committed one table at a time, a crash in
the middle publishes half the load.  :class:`CatalogTransaction` makes
the N-table publish all-or-nothing by composing two mechanisms the
engine already has:

- **Staging = WAP branches.**  Every write inside the transaction lands
  on a per-transaction branch (``txn-<id>``) through the ordinary
  dispositions — merges, MoR deletes, schema evolution all work
  unchanged, and nothing is visible on ``main`` until commit.  This is
  exactly Iceberg's stage-commit (``spark.wap.branch``) generalized to
  several tables at once.
- **Publish = intent-logged pointer flips.**  Commit writes one durable
  intent record (``<warehouse>/_txns/<id>.json``, O_EXCL) listing every
  (table, expected-main-head, branch-head), then fast-forwards each
  table's ``main``.  The intent is a redo log: a crash between flips is
  ROLLED FORWARD by :func:`recover_transactions` (run automatically on
  the next ``catalog.transaction()``), so readers eventually see either
  every table published or none.

Atomicity grades (stated, not implied):

- **Crash atomicity** on any storage: the intent log guarantees
  roll-forward/roll-back; no torn publish survives recovery.
- **Concurrent-writer atomicity** needs the catalog to own the pointers:
  with a pointer catalog configured, commit goes through ONE
  ``POST /v1/transactions`` multi-ref CAS (the Iceberg-REST
  ``commitTransaction`` shape, applied under the server's lock), so
  racing writers see an indivisible flip.  On plain filesystems the
  per-table fast-forward guards each flip with an ancestry check, but a
  writer racing BETWEEN flips can force a partial state that recovery
  then reports — same as every filesystem Iceberg catalog, which is why
  the spec points multi-table commits at REST.
- Readers between flips (filesystem mode) can observe table A published
  before table B — snapshot isolation across tables requires the
  catalog service.

A conflict on ANY table (its ``main`` advanced past the fork point)
fails the whole transaction with nothing published; the staged branches
are dropped on :meth:`rollback` and staged files are reclaimed by
``remove_orphan_files``.

Reference surface: the reference commits one transaction per table per
load (SURVEY.md §2.2 W1); multi-table atomicity is beyond-parity, shaped
after the Iceberg REST spec's commitTransaction.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame

from dlt_iceberg_spark.errors import CommitConflictError
from dlt_iceberg_spark.lake.table import LakeTable
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec, WriterConfig

if TYPE_CHECKING:
    from dlt_iceberg_spark.lake.catalog import LakeCatalog

_TXN_DIR = "_txns"


class TransactionError(RuntimeError):
    pass


def _raw_branch_head(table: LakeTable, branch: str) -> int | None:
    """The branch ref's OWN head (no fall-through to main): None means the
    transaction never committed to this table."""
    if table._pointer_store is not None:
        return table._pointer_store.get(branch)
    try:
        return int(
            table._io.read_text(
                os.path.join(table.location, "metadata", f"_branch_{branch}")
            ).strip()
        )
    except FileNotFoundError:
        return None


def _flip_main(table: LakeTable, expected: int | None, to: int) -> None:
    """Point ``main`` at ``to`` (pointer write only; caller owns intent)."""
    if table._pointer_store is not None:
        if not table._pointer_store.cas("main", expected, to):
            raise CommitConflictError(
                f"{table.location}: main moved past v{expected}"
            )
        return
    meta = os.path.join(table.location, "metadata")
    tmp = os.path.join(meta, f"_ptr_{uuid.uuid4().hex}")
    table._io.write_text(tmp, str(to))
    table._io.rename(tmp, os.path.join(meta, "_current"))


def _drop_branch_ref(table: LakeTable, branch: str) -> None:
    if table._pointer_store is not None:
        try:
            table._pointer_store.delete_ref(branch)
        except FileNotFoundError:
            pass
        return
    path = os.path.join(table.location, "metadata", f"_branch_{branch}")
    if table._io.exists(path):
        table._io.remove(path)


class CatalogTransaction:
    """All-or-nothing publish of writes to several tables in a namespace.

    Usage::

        txn = catalog.transaction("ds")
        txn.write(TableSpec(name="fact", ...), fact_df)
        txn.write(TableSpec(name="dims", ...), dims_df)
        txn.table("fact").update_where([...], {...})   # branch-pinned view
        txn.commit()        # or txn.rollback()

    Also a context manager: commits on clean exit, rolls back on error.
    """

    def __init__(
        self,
        catalog: "LakeCatalog",
        namespace: str,
        config: WriterConfig | None = None,
    ):
        self.catalog = catalog
        self.namespace = namespace
        self.txn_id = uuid.uuid4().hex[:12]
        self.branch = f"txn-{self.txn_id}"
        self._config = config
        self._writers: dict[str, LakeWriter] = {}
        #: (namespace, table) -> {"fork": main head at first touch, "created": bool}
        self._touched: dict[tuple[str, str], dict[str, Any]] = {}
        self._state = "open"

    # -- staging -----------------------------------------------------------

    def _check_open(self) -> None:
        if self._state != "open":
            raise TransactionError(f"transaction {self.txn_id} is {self._state}")

    def _writer_for(self, namespace: str) -> LakeWriter:
        w = self._writers.get(namespace)
        if w is None:
            w = LakeWriter(
                self.catalog,
                namespace,
                config=self._config,
                branch=self.branch,
                # derived tables the writer lands on its own (expectation
                # quarantines) must publish/roll back with the transaction;
                # post-write tracking records their post-create fork (v0)
                observer=lambda name, ns=namespace: self._track(ns, name),
            )
            self._writers[namespace] = w
        return w

    def _track(self, namespace: str, name: str) -> None:
        if (namespace, name) in self._touched:
            return
        created = not self.catalog.table_exists(namespace, name)
        fork = (
            None
            if created
            else self.catalog.load_table(namespace, name).current_version()
        )
        self._touched[(namespace, name)] = {"fork": fork, "created": created}

    def write(
        self,
        spec: TableSpec,
        df: DataFrame,
        load_id: str | None = None,
        namespace: str | None = None,
    ):
        """Land one batch on the transaction branch through the ordinary
        dispositions.  A table created here exists (empty) on main
        immediately — Iceberg's stage-create caveat — but its DATA stays
        on the branch until commit.  ``namespace`` overrides the
        transaction's default — a transaction can span namespaces, like
        Iceberg REST commitTransaction."""
        self._check_open()
        ns = namespace or self.namespace
        self._track(ns, spec.name)
        out = self._writer_for(ns).write(spec, df, load_id=load_id)
        info = self._touched[(ns, spec.name)]
        if info["created"] and info["fork"] is None:
            # the create committed v0 (schema) on main; that is the fork
            # point the publish must CAS against
            info["fork"] = self.catalog.load_table(
                ns, spec.name
            ).current_version()
        return out

    def table(self, name: str, namespace: str | None = None) -> LakeTable:
        """Branch-pinned view for row-level ops inside the transaction
        (``update_where``, ``position_delete_where``, DDL...)."""
        self._check_open()
        ns = namespace or self.namespace
        self._track(ns, name)
        return self.catalog.load_table(ns, name, branch=self.branch)

    # -- publish -----------------------------------------------------------

    def _entries(self) -> list[dict[str, Any]]:
        out = []
        for (ns, name), info in self._touched.items():
            t = self.catalog.load_table(ns, name)
            head = _raw_branch_head(t, self.branch)
            if head is None:
                continue  # tracked but never committed to: no-op
            out.append(
                {
                    "namespace": ns,
                    "table": name,
                    "location": t.location,
                    "expected": info["fork"],
                    "to": head,
                }
            )
        return out

    def commit(self) -> dict[str, Any]:
        """Publish every staged table head to main, all-or-nothing.

        Raises :class:`CommitConflictError` (nothing published, branches
        kept for inspection/rollback) if any table's main moved past its
        fork point."""
        self._check_open()
        entries = self._entries()
        if not entries:
            self._state = "committed"
            return {"txn": self.txn_id, "tables": []}
        # conflict pre-flight: every main must still be at its fork point
        for e in entries:
            cur = self.catalog.load_table(
                e["namespace"], e["table"]
            ).current_version()
            if cur != e["expected"]:
                raise CommitConflictError(
                    f"table {e['table']!r} advanced to v{cur} past the "
                    f"transaction fork v{e['expected']} — rollback and retry"
                )
        io = self.catalog._io
        txn_dir = os.path.join(self.catalog.warehouse, _TXN_DIR)
        io.makedirs(txn_dir)
        intent_path = os.path.join(txn_dir, f"{self.txn_id}.json")
        intent = {
            "txn": self.txn_id,
            "namespace": self.namespace,
            "branch": self.branch,
            "entries": entries,
        }
        # the intent is the transaction's redo log: durable BEFORE any flip,
        # deleted after the last — recovery rolls the window forward
        io.write_text_exclusive(intent_path, json.dumps(intent))
        try:
            if self.catalog._pointer_url is not None:
                self._commit_via_catalog_cas(entries)
            else:
                for e in entries:
                    t = self.catalog.load_table(e["namespace"], e["table"])
                    _flip_main(t, e["expected"], e["to"])
        finally:
            # flips either all happened or an exception left a partial
            # window; in BOTH cases the intent has served its purpose only
            # when every flip landed.  On failure keep it for recovery.
            done = all(
                self.catalog.load_table(e["namespace"], e["table"]).current_version()
                == e["to"]
                for e in entries
            )
            if done:
                io.remove(intent_path)
        for e in entries:
            _drop_branch_ref(
                self.catalog.load_table(e["namespace"], e["table"]), self.branch
            )
        self._state = "committed"
        return {"txn": self.txn_id, "tables": [e["table"] for e in entries]}

    def _commit_via_catalog_cas(self, entries: list[dict[str, Any]]) -> None:
        """One multi-ref CAS against the pointer catalog — the Iceberg REST
        commitTransaction shape: either every ref flips or none does."""
        from dlt_iceberg_spark.lake.pointers import rest_commit_transaction

        ok = rest_commit_transaction(
            self.catalog._pointer_url,
            [
                {
                    "table": e["location"],
                    "ref": "main",
                    "expected": e["expected"],
                    "new": e["to"],
                }
                for e in entries
            ],
            token=self.catalog._pointer_token,
        )
        if not ok:
            raise CommitConflictError(
                "catalog transaction CAS lost: a ref moved — nothing published"
            )

    def rollback(self) -> None:
        """Drop the staged branches (and any table this transaction
        created).  Staged data files become orphans, reclaimed by
        ``remove_orphan_files``."""
        self._check_open()
        for (ns, name), info in self._touched.items():
            if info["created"]:
                try:
                    t = self.catalog.load_table(ns, name)
                except Exception:
                    continue
                # drop only while the table is still OURS alone: a foreign
                # writer may have committed to the created table since —
                # dropping it would destroy their data, so just shed our
                # branch and leave the (foreign-owned) table standing
                if t.current_version() == info["fork"]:
                    try:
                        self.catalog.drop_table(ns, name)
                    except Exception:
                        pass
                else:
                    _drop_branch_ref(t, self.branch)
                continue
            _drop_branch_ref(
                self.catalog.load_table(ns, name), self.branch
            )
        self._state = "rolled-back"

    def __enter__(self) -> "CatalogTransaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if self._state != "open":
            return
        if exc_type is None:
            self.commit()
        else:
            self.rollback()


def pending_transactions(catalog: "LakeCatalog") -> list[dict[str, Any]]:
    """Pending (crashed or blocked) transaction intents, newest-file last:
    the read-only side of the ops loop (list → :func:`recover_transactions`
    → :func:`abort_transaction`).  Empty list = no torn publishes."""
    io = catalog._io
    txn_dir = os.path.join(catalog.warehouse, _TXN_DIR)
    if not io.isdir(txn_dir):
        return []
    out = []
    for fname in sorted(io.listdir(txn_dir)):
        if fname.endswith(".json"):
            out.append(json.loads(io.read_text(os.path.join(txn_dir, fname))))
    return out


def abort_transaction(catalog: "LakeCatalog", txn_id: str) -> dict[str, Any]:
    """Discard a pending (typically BLOCKED) transaction intent after
    operator inspection: the intent file and the staged branch refs are
    removed.  Tables whose main already flipped STAY published (flips are
    real commits — aborting doesn't rewrite history); un-flipped tables
    keep their current main.  Use when recovery reports ``blocked`` and
    the operator decides the foreign write wins."""
    io = catalog._io
    path = os.path.join(catalog.warehouse, _TXN_DIR, f"{txn_id}.json")
    if not io.exists(path):
        raise FileNotFoundError(f"no pending transaction {txn_id!r}")
    intent = json.loads(io.read_text(path))
    flipped, discarded = [], []
    for e in intent["entries"]:
        t = LakeTable(
            catalog.spark,
            e["location"],
            io=io,
            pointer_store=catalog._pointer_store_for(e["location"]),
        )
        (flipped if t.current_version() == e["to"] else discarded).append(e["table"])
        _drop_branch_ref(t, intent["branch"])
    io.remove(path)
    return {"txn": txn_id, "kept_published": flipped, "discarded": discarded}


def recover_transactions(catalog: "LakeCatalog") -> list[dict[str, Any]]:
    """Resolve transactions interrupted mid-publish.

    For each pending intent: if every table already points at its target,
    finish the cleanup; if SOME do, roll the rest forward (the intent is
    a redo log — durable intent means the commit decision was made); if
    none do and every table still sits at its fork point, roll forward
    too.  Only when a foreign write moved a not-yet-flipped table past
    its fork point is the transaction unrecoverable — reported, intent
    kept for operator inspection.
    """
    io = catalog._io
    txn_dir = os.path.join(catalog.warehouse, _TXN_DIR)
    if not io.isdir(txn_dir):
        return []
    results: list[dict[str, Any]] = []
    for fname in sorted(io.listdir(txn_dir)):
        if not fname.endswith(".json"):
            continue
        intent = json.loads(io.read_text(os.path.join(txn_dir, fname)))
        entries = intent["entries"]
        spark = catalog.spark
        tables = {
            e["table"]: LakeTable(
                spark,
                e["location"],
                io=io,
                pointer_store=catalog._pointer_store_for(e["location"]),
            )
            for e in entries
        }
        heads = {n: t.current_version() for n, t in tables.items()}
        pending = [e for e in entries if heads[e["table"]] != e["to"]]
        blocked = [
            e for e in pending if heads[e["table"]] != e["expected"]
        ]
        if blocked:
            results.append(
                {
                    "txn": intent["txn"],
                    "action": "blocked",
                    "blocked": [e["table"] for e in blocked],
                }
            )
            continue
        for e in pending:
            _flip_main(tables[e["table"]], e["expected"], e["to"])
        for e in entries:
            _drop_branch_ref(tables[e["table"]], intent["branch"])
        io.remove(os.path.join(txn_dir, fname))
        results.append(
            {
                "txn": intent["txn"],
                "action": "rolled-forward" if pending else "completed",
                "tables": [e["table"] for e in entries],
            }
        )
    return results

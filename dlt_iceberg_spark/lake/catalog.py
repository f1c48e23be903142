"""LakeCatalog — namespace/table registry over a warehouse directory.

Catalog surface from SURVEY.md §2.1 S5 / §2.2 W9-W12: list namespaces and
tables, create/load/drop(+purge) tables, register stray tables found on
disk, custom location layouts.  The reference auto-detects REST vs SQL
catalogs from URI schemes (destination_client.py:679-734); this local
catalog is the filesystem analogue (the E2E test harness of the reference
uses exactly such a local sqlite+file:// setup, SURVEY.md §5 layer 2).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from dlt_iceberg_spark.errors import (
    NamespaceNotFoundError,
    TableAlreadyExistsError,
    TableNotFoundError,
)
from dlt_iceberg_spark.lake.fileio import fileio_for
from dlt_iceberg_spark.lake.table import DataFile, DeleteFile, LakeTable

#: table_location_layout default (destination_client.py:736-766)
DEFAULT_LOCATION_LAYOUT = "{namespace}/{table_name}"


class LakeCatalog:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        location_layout: str = DEFAULT_LOCATION_LAYOUT,
        pointer_catalog_url: str | None = None,
        pointer_catalog_token: str | None = None,
    ):
        self.spark = spark
        self.warehouse = warehouse.rstrip("/")
        self.location_layout = location_layout
        # scheme-routed storage (lake/fileio.py): local paths use POSIX I/O,
        # s3a://gs://… warehouses ride the session's Hadoop FileSystem
        self._io = fileio_for(self.warehouse, spark)
        self._io.makedirs(self.warehouse)
        # catalog-owned branch pointers (lake/pointers.py): when a pointer
        # catalog URL is configured, every table's commits swap heads via
        # the service's CAS instead of file rename — REQUIRED for object
        # stores (table.py NonAtomicCommitError), optional elsewhere
        self._pointer_url = pointer_catalog_url
        self._pointer_token = pointer_catalog_token

    def _pointer_store_for(self, location: str):
        if self._pointer_url is None:
            return None
        from dlt_iceberg_spark.lake.pointers import RestPointerStore

        return RestPointerStore(self._pointer_url, location, token=self._pointer_token)

    # -- transactions ------------------------------------------------------

    def transaction(self, namespace: str, config=None):
        """Open a multi-table transaction in ``namespace`` (all staged
        writes publish atomically on ``commit()`` — lake/transaction.py).
        Pending intents from a crashed publish are rolled forward first,
        so a new transaction never builds on a torn state."""
        from dlt_iceberg_spark.lake.transaction import (
            CatalogTransaction,
            recover_transactions,
        )

        recover_transactions(self)
        return CatalogTransaction(self, namespace, config=config)

    # -- namespaces --------------------------------------------------------

    def create_namespace(self, namespace: str) -> None:
        self._io.makedirs(os.path.join(self.warehouse, namespace))

    def list_namespaces(self) -> list[str]:
        return sorted(
            n
            for n in self._io.listdir(self.warehouse)
            if self._io.isdir(os.path.join(self.warehouse, n))
        )

    def namespace_exists(self, namespace: str) -> bool:
        return self._io.isdir(os.path.join(self.warehouse, namespace))

    # -- table addressing --------------------------------------------------

    def table_location(self, namespace: str, table_name: str) -> str:
        rel = self.location_layout.format(namespace=namespace, table_name=table_name)
        if not rel.startswith("/"):
            rel = os.path.join(self.warehouse, rel)
        return rel

    def list_tables(self, namespace: str) -> list[str]:
        ns_dir = os.path.join(self.warehouse, namespace)
        if not self._io.isdir(ns_dir):
            raise NamespaceNotFoundError(namespace)
        return sorted(
            t
            for t in self._io.listdir(ns_dir)
            if LakeTable.exists_at(os.path.join(ns_dir, t), io=self._io)
        )

    def table_exists(self, namespace: str, table_name: str) -> bool:
        loc = self.table_location(namespace, table_name)
        store = self._pointer_store_for(loc)
        if store is not None:
            return store.get("main") is not None
        return LakeTable.exists_at(loc, io=self._io)

    # -- table lifecycle ---------------------------------------------------

    def create_table(
        self,
        namespace: str,
        table_name: str,
        schema: T.StructType,
        partition_spec: list[dict] | None = None,
        properties: dict[str, str] | None = None,
    ) -> LakeTable:
        if self.table_exists(namespace, table_name):
            raise TableAlreadyExistsError(f"{namespace}.{table_name}")
        self.create_namespace(namespace)
        loc = self.table_location(namespace, table_name)
        table = LakeTable(
            self.spark, loc, io=self._io, pointer_store=self._pointer_store_for(loc)
        )
        table.commit(
            files=[],
            schema=schema,
            operation="create",
            expected_parent=None,
            partition_spec=partition_spec or [],
            properties=properties or {},
        )
        return table

    def load_table(
        self, namespace: str, table_name: str, branch: str = "main"
    ) -> LakeTable:
        loc = self.table_location(namespace, table_name)
        store = self._pointer_store_for(loc)
        if store is not None:
            if store.get("main") is None:
                raise TableNotFoundError(f"{namespace}.{table_name}")
        elif not LakeTable.exists_at(loc, io=self._io):
            raise TableNotFoundError(f"{namespace}.{table_name}")
        return LakeTable(self.spark, loc, branch=branch, io=self._io, pointer_store=store)

    def rename_table(
        self,
        namespace: str,
        old: str,
        new: str,
        new_namespace: str | None = None,
    ) -> LakeTable:
        """Catalog-level table rename/move (Iceberg ``catalog.rename_table``)
        — ONE atomic directory rename, any table size.  Data and manifest
        paths inside the table are location-relative, so nothing else
        moves; adopted tables referencing absolute foreign paths keep
        working too.  Refused under a pointer catalog: branch heads are
        keyed by table location at the service, so the rename must go
        through the catalog there (a direct move would strand every
        head)."""
        if self._pointer_url is not None:
            raise ValueError(
                "rename_table under a pointer catalog must go through the "
                "catalog service (branch heads are keyed by table location)"
            )
        src = self.table_location(namespace, old)
        if not LakeTable.exists_at(src, io=self._io):
            raise TableNotFoundError(f"{namespace}.{old}")
        # a live clone references THIS table's storage by absolute path —
        # moving the directory would strand every such reference (silent
        # data loss on the clone's next read).  Dangling refs (dropped
        # clones) don't block; localize live clones (compact) first.
        import json as _json

        refs_dir = os.path.join(src, "metadata", "_clone_refs")
        if self._io.isdir(refs_dir):
            live = []
            for name in sorted(self._io.listdir(refs_dir)):
                try:
                    ref = _json.loads(
                        self._io.read_text(os.path.join(refs_dir, name))
                    )
                    loc = ref["clone"]
                except (ValueError, KeyError):
                    continue
                if LakeTable.exists_at(loc, io=fileio_for(loc, self.spark)):
                    live.append(loc)
            if live:
                raise ValueError(
                    f"renaming {namespace}.{old} would strand {len(live)} "
                    f"live clone(s) referencing its storage by absolute "
                    f"path ({live[:3]}...); compact the clones to localize "
                    "them first"
                )
        dst_ns = new_namespace or namespace
        dst = self.table_location(dst_ns, new)
        if self._io.isdir(dst):
            raise ValueError(f"table {dst_ns}.{new} already exists")
        self.create_namespace(dst_ns)
        self._io.makedirs(os.path.dirname(dst))
        self._io.rename(src, dst)
        moved = self.load_table(dst_ns, new)
        # if the MOVED table is itself a clone, its back-refs on every
        # referenced source still name the old location — rewrite them, or
        # the pins silently release and source retention could reclaim the
        # clone's only bytes.  Roots come from ALL retained snapshots (the
        # same walk clone_pinned_paths does): a source referenced only by
        # an OLDER snapshot (e.g. after compaction localized the head)
        # still pins files the clone's time travel needs.
        if moved.snapshot() is not None:
            roots = set()
            for v in moved._all_versions():
                try:
                    snap = moved.snapshot(v)
                except (FileNotFoundError, ValueError, KeyError):
                    continue
                if snap is None:
                    continue
                if "cloned-from" in snap.properties:
                    roots.add(snap.properties["cloned-from"])
                for e in list(snap.files) + list(snap.delete_files):
                    if os.path.isabs(e.path) and "/data/" in e.path:
                        roots.add(e.path.rsplit("/data/", 1)[0])
            for root in sorted(roots):
                rio = fileio_for(root, self.spark)
                rdir = os.path.join(root, "metadata", "_clone_refs")
                if not rio.isdir(rdir):
                    continue
                for name in sorted(rio.listdir(rdir)):
                    path = os.path.join(rdir, name)
                    try:
                        ref = _json.loads(rio.read_text(path))
                    except ValueError:
                        continue
                    if ref.get("clone") == src:
                        ref["clone"] = dst
                        rio.write_text(path, _json.dumps(ref))
        return moved

    def clone_table(
        self,
        namespace: str,
        table_name: str,
        new_namespace: str,
        new_name: str,
        branch: str = "main",
        version: int | None = None,
        tag: str | None = None,
    ) -> LakeTable:
        """ZERO-COPY clone (Delta ``SHALLOW CLONE`` / Iceberg
        snapshot-reference pattern): a new table whose first snapshot
        references the source's CURRENT data and delete files by absolute
        path — no data bytes move at any table size, only a metadata
        rewrite (same O(files)-entries driver cost as ``rename_column``).

        The clone is a full first-class LakeTable: it evolves, merges,
        compacts, and rolls up independently — every mutation writes into
        the CLONE's location (copy-on-write divergence), the source never
        changes.  Schema, partition spec, stable field ids, table
        properties, NDV sketches, and outstanding MoR delete masks all
        carry over.  Carried sequence numbers are re-stamped
        ORDER-PRESERVINGLY into 1..m and the clone snapshot lands at
        version m+1, so (a) relative delete applicability among carried
        files/masks is bit-identical to the source, and (b) every future
        clone commit outranks every carried sequence — a merge or DELETE
        on a clone of a multi-commit source masks all carried rows, and
        carried equality deletes never mask rows appended to the clone
        later (both were silent misses when source sequences were kept
        verbatim against a version counter restarting at 1).

        Retention is CLONE-AWARE: besides the ``cloned-from`` /
        ``cloned-at-version`` lineage properties, cloning writes a
        back-reference under every referenced source's
        ``metadata/_clone_refs/`` — source-side ``expire_snapshots`` /
        ``remove_orphan_files`` read live clones' metadata and never
        delete a file a clone still references (dropped clones leave
        dangling refs, cleaned on the next maintenance pass).  Compact
        the clone to localize it and release the pins.

        ``version=`` / ``tag=`` clone a HISTORICAL state instead of the
        head (time-travel clone — "give me yesterday's table as a live
        sandbox"); a tag is also the natural retention anchor for the
        caveat above.
        """
        if version is not None and tag is not None:
            raise ValueError("pass version= or tag=, not both")
        src = self.load_table(namespace, table_name)
        if tag is not None:
            tags = src.tags()
            if tag not in tags:
                raise ValueError(f"no such tag {tag!r}")
            version = tags[tag]
        snap = src.snapshot(version)
        if snap is None:
            raise TableNotFoundError(
                f"{namespace}.{table_name}"
                + (f" @ v{version}" if version is not None else "")
            )

        def _abs(rel: str) -> str:
            return rel if os.path.isabs(rel) else os.path.join(src.location, rel)

        # order-preserving compact re-stamp of carried sequences → 1..m:
        # preserves every <=/< comparison among carried files and masks
        # (equal stays equal), while bounding the max carried sequence so
        # the clone commit at m+1 — and everything after — outranks them
        src_seqs = sorted(
            {f.sequence or 0 for f in snap.files}
            | {d.sequence or 0 for d in snap.delete_files}
        )
        seq_map = {s: i + 1 for i, s in enumerate(src_seqs)}
        entries = [
            DataFile(
                **{
                    **vars(f),
                    "path": _abs(f.path),
                    "sequence": seq_map[f.sequence or 0],
                }
            )
            for f in snap.files
        ]
        deletes = [
            DeleteFile(
                **{
                    **vars(d),
                    "path": _abs(d.path),
                    "sequence": seq_map[d.sequence or 0],
                }
            )
            for d in snap.delete_files
        ]
        dst = self.create_table(
            new_namespace,
            new_name,
            snap.schema,
            partition_spec=list(snap.partition_spec or []),
            properties={
                **snap.properties,
                "cloned-from": src.location,
                "cloned-at-version": str(snap.version),
            },
        )
        base = dst.snapshot()
        # publish the clone snapshot ON the requested branch (WAP shape:
        # main holds only the empty create commit until the branch merges)
        dst_ref = dst if branch == "main" else dst.for_branch(branch)
        dst_ref.commit(
            entries,
            snap.schema,
            "clone",
            base.version,
            partition_spec=list(snap.partition_spec or []),
            delete_files=deletes,
            field_ids=dict(snap.field_ids),
            summary={
                "cloned-from": src.location,
                "cloned-at-version": snap.version,
                "cloned-files": len(entries),
            },
            min_version=len(src_seqs) + 1,
        )
        # clone-aware retention: pin every foreign root the carried entries
        # reference (src PLUS any deeper original a clone-of-a-clone still
        # points into) so source-side expiry/orphan removal skips files this
        # clone can read.  O(1) metadata writes; no commit on the source.
        clone_loc = self.table_location(new_namespace, new_name)
        roots = {src.location}
        for e in entries + deletes:
            if "/data/" in e.path:
                roots.add(e.path.rsplit("/data/", 1)[0])
        import json as _json
        import uuid as _uuid

        for root in sorted(roots):
            rio = fileio_for(root, self.spark)
            refs_dir = os.path.join(root, "metadata", "_clone_refs")
            rio.makedirs(refs_dir)
            rio.write_text(
                os.path.join(refs_dir, f"{_uuid.uuid4().hex}.json"),
                _json.dumps(
                    {
                        "clone": clone_loc,
                        "cloned-at-version": snap.version,
                        "source": src.location,
                    }
                ),
            )
        return self.load_table(new_namespace, new_name, branch=branch)

    def drop_table(self, namespace: str, table_name: str, purge: bool = True) -> None:
        """W10: drop (and purge data — the reference prefers purge_table,
        destination_client.py:892-931)."""
        loc = self.table_location(namespace, table_name)
        if not LakeTable.exists_at(loc, io=self._io):
            raise TableNotFoundError(f"{namespace}.{table_name}")
        if purge:
            self._io.rmtree(loc)
        else:
            self._io.rmtree(os.path.join(loc, "metadata"))

    def drop_tables(
        self,
        namespace: str,
        table_names: list[str],
        purge: bool = True,
        missing_ok: bool = True,
    ) -> list[str]:
        """Drop several tables; missing names are a no-op by default — the
        reference contract (tests/test_drop_tables.py:122-153: dlt core may
        pass names for tables never physically created).  Returns the names
        actually dropped."""
        dropped = []
        for t in table_names:
            if not self.table_exists(namespace, t):
                if missing_ok:
                    continue
                raise TableNotFoundError(f"{namespace}.{t}")
            self.drop_table(namespace, t, purge=purge)
            dropped.append(t)
        return dropped

    def drop_storage(self, namespace: str) -> None:
        """Drop every table in the namespace (drop_storage analogue)."""
        ns_dir = os.path.join(self.warehouse, namespace)
        if self._io.isdir(ns_dir):
            self._io.rmtree(ns_dir)

    def register_iceberg_table(
        self,
        namespace: str,
        table_name: str,
        metadata_path: str,
        fold_unsupported_deletes: bool = False,
    ) -> LakeTable:
        """Adopt an existing Iceberg table (v2 TableMetadata JSON) into this
        catalog as a readable table — metadata-only, data referenced in
        place (reference surface: catalog.register_table,
        destination_client.py:768-851).  See lake/iceberg_import.py for
        flavor support and limitations."""
        from dlt_iceberg_spark.lake.iceberg_import import register_iceberg_table

        if self.table_exists(namespace, table_name):
            raise TableAlreadyExistsError(f"{namespace}.{table_name}")
        self.create_namespace(namespace)
        return register_iceberg_table(
            self.spark,
            metadata_path,
            self.table_location(namespace, table_name),
            fold_unsupported_deletes=fold_unsupported_deletes,
        )

    def register_stray_tables(self, namespace: str) -> list[str]:
        """W11 (destination_client.py:768-851): scan the warehouse directory
        for table dirs that have snapshot metadata but aren't 'known' (here:
        everything valid on disk is known, so this validates + returns them;
        kept for interface parity with catalog.register_table)."""
        found = []
        ns_dir = os.path.join(self.warehouse, namespace)
        if not self._io.isdir(ns_dir):
            return found
        for t in sorted(self._io.listdir(ns_dir)):
            if LakeTable.exists_at(os.path.join(ns_dir, t), io=self._io):
                found.append(t)
        return found

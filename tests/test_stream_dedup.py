"""Streaming incremental dedup (streaming/dedup.py): each micro-batch
(= one source snapshot) near-dup checks against everything ingested
strictly before it, flags land per epoch, and the persisted class index
grows by novel classes only."""

import pytest

import os

from dlt_iceberg_spark.lake.catalog import LakeCatalog
from dlt_iceberg_spark.lake.table import LakeTable
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec
from dlt_iceberg_spark.streaming.dedup import run_dedup_backfill


def _write_load(writer, rows, load_id):
    writer.write(
        TableSpec(name="docs", write_disposition="append"),
        writer.catalog.spark.createDataFrame(rows, "doc_id long, text string"),
        load_id=load_id,
    )


def test_stream_dedup_flags_and_index(spark, warehouse, tmp_path):
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    _write_load(writer, [(1, "a b c d"), (2, "x y z w")], "l0")
    _write_load(writer, [(3, "a b c d"), (4, "p q r s")], "l1")
    _write_load(
        writer,
        [(5, "a b c e"), (6, "p q r s"), (7, "x y z w v")],
        "l2",
    )
    src = catalog.load_table("ds", "docs")
    index = LakeTable(spark, str(tmp_path / "idx"))
    run_dedup_backfill(
        spark,
        src.location,
        index,
        writer,
        "doc_dups",
        "text",
        "doc_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
        threshold=0.8,
        strategy="auto",
        query_name="sd",
    )
    flags = {
        (r.corpus_id, r.batch_id): round(r.jaccard, 6)
        for r in catalog.load_table("ds", "doc_dups").read().collect()
    }
    # epoch1: d3 exactly duplicates d1; epoch2: d6 duplicates d4 (flagged
    # against its FIRST ingest, not the epoch-1 dup), d7 vs d2 at 4/5,
    # d5 vs d1 at 3/5 stays below threshold
    assert flags == {(1, 3): 1.0, (4, 6): 1.0, (2, 7): 0.8}
    # index holds novel classes only (d3/d6 never re-added)
    idx = index.read().collect()
    assert len(idx) == 5
    all_ids = sorted(i for r in idx for i in r.ids)
    assert all_ids == [1, 2, 4, 5, 7]

    # a NEW load streams through the same checkpoint: only the new epoch
    # is processed, probing the accumulated index
    _write_load(writer, [(8, "a b c e"), (9, "fresh doc here")], "l3")
    run_dedup_backfill(
        spark,
        src.location,
        index,
        writer,
        "doc_dups",
        "text",
        "doc_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
        threshold=0.8,
        strategy="auto",
        query_name="sd",
    )
    flags2 = {
        (r.corpus_id, r.batch_id): round(r.jaccard, 6)
        for r in catalog.load_table("ds", "doc_dups").read().collect()
    }
    assert flags2 == {(1, 3): 1.0, (4, 6): 1.0, (2, 7): 0.8, (5, 8): 1.0}
    assert index.read().count() == 6  # d9's class is novel, d8's is not
    assert os.path.isdir(str(tmp_path / "ckpt"))


@pytest.mark.slow
def test_stream_dedup_ledger_skips_replayed_epochs(spark, warehouse, tmp_path):
    """With a state ledger, a replayed epoch (fresh checkpoint, same
    query name) is skipped outright — no duplicate flag rows, no index
    churn: the exactly-once contract of stream_write, honored here."""
    from dlt_iceberg_spark.lake.state import StateStore

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    state = StateStore(catalog, "ds")
    _write_load(writer, [(1, "a b c d"), (2, "x y z w")], "l0")
    _write_load(writer, [(3, "a b c d")], "l1")
    src = catalog.load_table("ds", "docs")
    index = LakeTable(spark, str(tmp_path / "idx"))

    def _run(ckpt):
        run_dedup_backfill(
            spark, src.location, index, writer, "doc_dups", "text", "doc_id",
            checkpoint_dir=str(tmp_path / ckpt),
            threshold=0.8, strategy="auto", query_name="sdl", state=state,
        )

    _run("ck1")
    flags_table = catalog.load_table("ds", "doc_dups")
    v0 = flags_table.current_version()
    assert flags_table.read().count() == 1  # (1, 3) exact dup
    idx_v0 = index.current_version()

    # fresh checkpoint: Spark replays every epoch; the ledger skips all
    _run("ck2")
    assert catalog.load_table("ds", "doc_dups").current_version() == v0
    assert catalog.load_table("ds", "doc_dups").read().count() == 1
    assert index.current_version() == idx_v0

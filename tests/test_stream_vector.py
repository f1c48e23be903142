"""Continuous vector-index maintenance (streaming/vector.py): each
micro-batch (= one source snapshot) lands in the persisted IVF index —
bootstrap on the first epoch, frozen-centroid delta appends after."""

import pytest

import json

import numpy as np

from dlt_iceberg_spark.lake.catalog import LakeCatalog
from dlt_iceberg_spark.lake.table import LakeTable
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec
from dlt_iceberg_spark.operators.similarity import cosine_topk_bruteforce
from dlt_iceberg_spark.operators.vector_index import (
    ivf_topk_persisted,
    load_centroids,
)
from dlt_iceberg_spark.streaming.vector import run_index_backfill


def _vectors(spark, n, dim=8, seed=0, start_id=0):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, dim))
    rows = [(start_id + i, [float(x) for x in mat[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _ranked(df):
    return sorted(
        (r.query_id, r.rank, r.neighbor_id, round(r.cosine, 9))
        for r in df.collect()
    )


@pytest.mark.slow
def test_stream_maintains_index_per_load(spark, warehouse, tmp_path):
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    loads = [
        _vectors(spark, 60, seed=1),
        _vectors(spark, 40, seed=2, start_id=60),
    ]
    for i, df in enumerate(loads):
        writer.write(
            TableSpec(name="vecs", write_disposition="append"), df, load_id=f"l{i}"
        )
    src = catalog.load_table("ds", "vecs")
    index = LakeTable(spark, str(tmp_path / "idx"))
    run_index_backfill(
        spark,
        src.location,
        index,
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_centroids=4,
        query_name="vi",
    )
    # both loads indexed; centroids trained ONCE (on the first epoch)
    assert index.read().count() == 100
    sidecar = json.dumps(load_centroids(index))
    # bootstrap epoch = one build commit; later epoch = delta append
    ops = [s.operation for s in index.snapshots()]
    assert ops.count("append") >= 2  # build append + stream append

    # probe-all over the streamed index == brute force over the union
    both = loads[0].unionByName(loads[1])
    queries = loads[0].filter("vec_id < 3")
    got = ivf_topk_persisted(queries, index, k=5, nprobe=4)
    exact = cosine_topk_bruteforce(queries, both, k=5)
    assert _ranked(got) == _ranked(exact)

    # a NEW load through the SAME checkpoint: only the new epoch lands,
    # centroids stay frozen
    third = _vectors(spark, 25, seed=3, start_id=100)
    writer.write(
        TableSpec(name="vecs", write_disposition="append"), third, load_id="l2"
    )
    run_index_backfill(
        spark,
        src.location,
        index,
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_centroids=4,
        query_name="vi",
    )
    assert index.read().count() == 125
    assert json.dumps(load_centroids(index)) == sidecar
    got3 = ivf_topk_persisted(queries, index, k=5, nprobe=4)
    exact3 = cosine_topk_bruteforce(queries, both.unionByName(third), k=5)
    assert _ranked(got3) == _ranked(exact3)


@pytest.mark.slow
def test_stream_replayed_epoch_skipped_by_ledger(spark, warehouse, tmp_path):
    """append_vectors is not naturally idempotent: the load ledger must
    skip a checkpoint-replayed epoch so vectors never duplicate."""
    import shutil

    from dlt_iceberg_spark.lake.state import StateStore

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    writer.write(
        TableSpec(name="vecs", write_disposition="append"),
        _vectors(spark, 30, seed=4),
        load_id="l0",
    )
    src = catalog.load_table("ds", "vecs")
    state = StateStore(catalog, "ds")
    index = LakeTable(spark, str(tmp_path / "idx"))
    ck = str(tmp_path / "ckpt")
    run_index_backfill(
        spark, src.location, index, checkpoint_dir=ck,
        n_centroids=4, state=state, query_name="vi2",
    )
    assert index.read().count() == 30
    # simulate a lost checkpoint (worst-case replay): the ledger still
    # recognizes the epoch and skips it
    shutil.rmtree(ck)
    run_index_backfill(
        spark, src.location, index, checkpoint_dir=ck,
        n_centroids=4, state=state, query_name="vi2",
    )
    assert index.read().count() == 30  # no duplicated vectors


@pytest.mark.slow
def test_stream_bootstraps_ivfpq_with_metadata(spark, warehouse, tmp_path):
    """index_options pass through the stream bootstrap: an IVF-PQ index
    with metadata columns maintains from the stream — appends read the
    frozen contract (codebooks, metadata cols) from table properties."""
    import numpy as np

    from dlt_iceberg_spark.operators.quantization import pq_codebooks_fixed
    from dlt_iceberg_spark.operators.similarity import fixed_centroids
    from dlt_iceberg_spark.operators.vector_index import ivf_pq_topk_persisted

    rng = np.random.default_rng(21)
    mk = lambda n, s: spark.createDataFrame(
        [
            (s + i, int((s + i) % 2), [float(x) for x in rng.normal(size=16)])
            for i in range(n)
        ],
        "vec_id long, label int, embedding array<double>",
    )
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    first, second = mk(60, 0), mk(40, 60)
    writer.write(TableSpec(name="v2", write_disposition="append"), first, load_id="l0")
    src = catalog.load_table("ds", "v2")
    full = first.unionByName(second)
    idx = LakeTable(spark, str(tmp_path / "pqidx"))
    opts = dict(
        n_centroids=4,
        centroids=fixed_centroids(first, n_centroids=4),
        pq=True,
        codebooks=pq_codebooks_fixed(full, m_subspaces=4, k_codes=16),
        metadata_cols=["label"],
        query_name="vpq",
    )
    run_index_backfill(
        spark, src.location, idx, checkpoint_dir=str(tmp_path / "ck"), **opts
    )
    writer.write(TableSpec(name="v2", write_disposition="append"), second, load_id="l1")
    run_index_backfill(
        spark, src.location, idx, checkpoint_dir=str(tmp_path / "ck"), **opts
    )
    assert idx.read().count() == 100
    assert idx.read().filter("pq_code IS NULL OR label IS NULL").count() == 0
    out = ivf_pq_topk_persisted(full.filter("vec_id < 2"), idx, k=3, nprobe=4)
    assert out.count() == 6


@pytest.mark.slow
def test_cdc_multi_version_batch_resolves_latest_image(spark, warehouse, tmp_path):
    """changes=True with max_versions_per_batch=None: ONE epoch spans the
    whole source history.  Each id must resolve to its latest change image
    inside the batch — an id inserted then hard-deleted within the batch
    stays out of the index (no resurrection via the lower-sequence equality
    delete), a twice-updated id lands exactly once with the newest vector,
    and the bootstrap epoch never indexes rows already deleted later in
    the same batch."""
    from pyspark.sql import functions as F

    from dlt_iceberg_spark.operators.similarity import fixed_centroids

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    base = _vectors(spark, 30, seed=31)
    writer.write(
        TableSpec(name="mvecs", write_disposition="append"), base, load_id="l0"
    )
    src = catalog.load_table("ds", "mvecs")
    # insert a doomed row, then hard-delete it (later commit version)
    doomed = _vectors(spark, 1, seed=32, start_id=100)
    writer.write(
        TableSpec(name="mvecs", write_disposition="append"), doomed, load_id="l1"
    )
    src.position_delete_where([("vec_id", "=", 100)])
    # update id=5 TWICE — only the second image may survive
    mid = _vectors(spark, 1, seed=33, start_id=5).collect()[0].embedding
    final = _vectors(spark, 1, seed=34, start_id=5).collect()[0].embedding
    for emb in (mid, final):
        src.update_where(
            [("vec_id", "=", 5)],
            {"embedding": F.array(*[F.lit(float(x)) for x in emb])},
        )

    index = LakeTable(spark, str(tmp_path / "midx"))
    run_index_backfill(
        spark,
        src.location,
        index,
        checkpoint_dir=str(tmp_path / "mckpt"),
        n_centroids=4,
        centroids=fixed_centroids(base, n_centroids=4),
        query_name="mvi",
        changes=True,
        max_versions_per_batch=None,  # the whole history as one epoch
    )
    assert index.read().filter("vec_id = 100").count() == 0  # no resurrection
    rows = index.read().filter("vec_id = 5").collect()
    assert len(rows) == 1 and rows[0].embedding == final
    assert index.read().count() == 30

    # probe-all over the one-epoch index == brute force over the live corpus
    live = base.filter("vec_id != 5").unionByName(
        spark.createDataFrame([(5, final)], "vec_id long, embedding array<double>")
    )
    queries = base.filter("vec_id < 3")
    got = ivf_topk_persisted(queries, index, k=5, nprobe=4)
    exact = cosine_topk_bruteforce(queries, live, k=5)
    assert _ranked(got) == _ranked(exact)


@pytest.mark.slow
def test_cdc_stream_propagates_corpus_deletes(spark, warehouse, tmp_path):
    """changes=True: a hard delete in the source corpus propagates to the
    index in its epoch — the deleted vector stops being a neighbor, and
    an upsert (delete+insert same id) resolves to the new image."""
    from dlt_iceberg_spark.operators.similarity import fixed_centroids

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    first = _vectors(spark, 60, seed=11)
    second = _vectors(spark, 40, seed=12, start_id=60)
    for i, df in enumerate((first, second)):
        writer.write(
            TableSpec(name="cvecs", write_disposition="append"), df, load_id=f"l{i}"
        )
    src = catalog.load_table("ds", "cvecs")
    # corpus takedown: MoR row delete in the source
    src.position_delete_where([("vec_id", "in", [7, 63])])

    index = LakeTable(spark, str(tmp_path / "cidx"))
    run_index_backfill(
        spark,
        src.location,
        index,
        checkpoint_dir=str(tmp_path / "cckpt"),
        n_centroids=4,
        centroids=fixed_centroids(first, n_centroids=4),
        query_name="cvi",
        changes=True,
    )
    assert index.read().count() == 98
    assert index.read().filter("vec_id IN (7, 63)").count() == 0

    live = first.unionByName(second).filter("vec_id NOT IN (7, 63)")
    queries = first.filter("vec_id < 3")
    got = ivf_topk_persisted(queries, index, k=5, nprobe=4)
    exact = cosine_topk_bruteforce(queries, live, k=5)
    assert _ranked(got) == _ranked(exact)

    # an upsert epoch: same id, new vector — index follows the new image
    from pyspark.sql import functions as F

    replacement = _vectors(spark, 1, seed=77, start_id=10)
    src.update_where(
        [("vec_id", "=", 10)],
        {
            "embedding": F.array(
                *[F.lit(float(x)) for x in replacement.collect()[0].embedding]
            )
        },
    )
    run_index_backfill(
        spark,
        src.location,
        index,
        checkpoint_dir=str(tmp_path / "cckpt"),
        n_centroids=4,
        query_name="cvi",
        changes=True,
    )
    rows = index.read().filter("vec_id = 10").collect()
    assert len(rows) == 1
    assert rows[0].embedding == replacement.collect()[0].embedding


def test_cdc_single_version_skip_matches_windowed_resolution(spark, warehouse, tmp_path):
    """PERF r12: with max_versions_per_batch=1 the latest-image window is
    skipped statically (a single commit version cannot have cross-version
    conflicts).  The skip must be a pure execution change: an index
    maintained version-per-epoch (skip path) must hold exactly the rows of
    one maintained with the whole history in a single multi-version epoch
    (windowed path) after the same append -> delete -> upsert history."""
    from pyspark.sql import functions as F

    from dlt_iceberg_spark.operators.similarity import fixed_centroids

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    first = _vectors(spark, 30, seed=31)
    writer.write(TableSpec(name="pv", write_disposition="append"), first, load_id="l0")
    src = catalog.load_table("ds", "pv")
    src.position_delete_where([("vec_id", "in", [3, 17])])  # hard delete
    replacement = _vectors(spark, 1, seed=99, start_id=5)
    src.update_where(  # upsert: delete+insert same id in ONE version
        [("vec_id", "=", 5)],
        {
            "embedding": F.array(
                *[F.lit(float(x)) for x in replacement.collect()[0].embedding]
            )
        },
    )

    results = {}
    for tag, mvpb in (("skip", 1), ("windowed", None)):
        index = LakeTable(spark, str(tmp_path / f"idx_{tag}"))
        run_index_backfill(
            spark,
            src.location,
            index,
            checkpoint_dir=str(tmp_path / f"ck_{tag}"),
            n_centroids=4,
            centroids=fixed_centroids(first, n_centroids=4),
            query_name=f"pv_{tag}",
            changes=True,
            max_versions_per_batch=mvpb,
        )
        results[tag] = sorted(
            (r.vec_id, tuple(round(x, 12) for x in r.embedding))
            for r in index.read().select("vec_id", "embedding").collect()
        )
    assert results["skip"] == results["windowed"]
    ids = [v for v, _ in results["skip"]]
    assert 3 not in ids and 17 not in ids and ids.count(5) == 1

"""Persisted IVF vector index lifecycle (operators/vector_index.py):
build once → append per load without retrain → query sees new vectors;
probing prunes unprobed inverted lists' files."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from dlt_iceberg_spark.lake.catalog import LakeCatalog
from dlt_iceberg_spark.operators.similarity import cosine_topk_bruteforce, fixed_centroids
from dlt_iceberg_spark.operators.vector_index import (
    append_vectors,
    build_vector_index,
    ivf_topk_persisted,
    load_centroids,
)


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


def test_build_append_query_lifecycle(spark, warehouse):
    catalog = LakeCatalog(spark, warehouse)
    first = _vectors(spark, 120, seed=1)
    second = _vectors(spark, 80, seed=2, start_id=120)
    cents = fixed_centroids(first, n_centroids=8)
    idx = build_vector_index(
        catalog, "ann", "emb_idx", first, n_centroids=8, centroids=cents
    )
    queries = first.filter("vec_id < 4")

    # probe-all is exact: equals brute force over the indexed corpus
    got = ivf_topk_persisted(queries, idx, k=5, nprobe=8)
    exact = cosine_topk_bruteforce(queries, first, k=5)
    assert _ranked(got) == _ranked(exact)

    # append a load: NO retrain (centroid sidecar byte-identical), delta
    # commit, new vectors immediately visible to the same probe
    sidecar_before = json.dumps(load_centroids(idx))
    snap_before = idx.snapshot()
    append_vectors(idx, second)
    idx = catalog.load_table("ann", "emb_idx")
    snap = idx.snapshot()
    assert snap.operation == "append"
    assert json.dumps(load_centroids(idx)) == sidecar_before
    # parent manifests carried by reference (delta append, not rewrite)
    assert {r.path for r in snap_before.manifests} <= {r.path for r in snap.manifests}

    both = first.unionByName(second)
    got2 = ivf_topk_persisted(queries, idx, k=5, nprobe=8)
    exact2 = cosine_topk_bruteforce(queries, both, k=5)
    assert _ranked(got2) == _ranked(exact2)


def test_probe_prunes_unprobed_lists(spark, warehouse):
    catalog = LakeCatalog(spark, warehouse)
    corpus = _vectors(spark, 200, seed=3)
    cents = fixed_centroids(corpus, n_centroids=8)
    idx = build_vector_index(
        catalog, "ann", "emb_idx2", corpus, n_centroids=8, centroids=cents
    )
    snap = idx.snapshot()
    n_lists = len({f.partition.get("centroid") for f in snap.files})
    assert n_lists > 1  # the layout actually fans out
    # a 1-list probe plans strictly fewer files than the table holds
    one = snap.files[0].partition["centroid"]
    _, planned = idx._select_files(snap, [("centroid", "in", [int(one)])], "auto")
    assert 0 < len(planned) < len(snap.files)
    assert all(f.partition["centroid"] == one for f in planned)


def test_index_table_is_self_describing(spark, warehouse):
    catalog = LakeCatalog(spark, warehouse)
    corpus = _vectors(spark, 50, seed=4)
    cents = fixed_centroids(corpus, n_centroids=4)
    idx = build_vector_index(
        catalog, "ann", "emb_idx3", corpus, n_centroids=4, centroids=cents
    )
    props = idx.snapshot().properties
    assert props["vector-index.vec-col"] == "embedding"
    assert props["vector-index.id-col"] == "vec_id"
    assert props["vector-index.n-centroids"] == "4"
    assert os.path.exists(
        os.path.join(idx.location, props["vector-index.centroids-file"])
    )
    # a plain table refuses the persisted probe with a clear message
    plain = catalog.create_table(
        "ann", "not_an_index", corpus.schema
    )
    with pytest.raises(ValueError, match="no vector-index metadata"):
        load_centroids(plain)


@pytest.mark.slow
def test_ivfpq_persisted_matches_flat_pq_and_recalls(spark, warehouse):
    """IVF-PQ persisted: codes stored in the index, ADC scoring over probed
    lists; with probe-all the result must equal flat PQ over the full
    corpus (same frozen codebooks), and recall@k vs exact stays high."""
    from dlt_iceberg_spark.operators.quantization import (
        pq_codebooks_fixed,
        pq_encode,
        pq_topk,
    )
    from dlt_iceberg_spark.operators.vector_index import (
        ivf_pq_topk_persisted,
        load_codebooks,
    )

    catalog = LakeCatalog(spark, warehouse)
    corpus = _vectors(spark, 200, dim=16, seed=7)
    cents = fixed_centroids(corpus, n_centroids=4)
    books = pq_codebooks_fixed(corpus, m_subspaces=4, k_codes=16)
    idx = build_vector_index(
        catalog, "ann", "pq_idx", corpus,
        centroids=cents, pq=True, codebooks=books,
    )
    assert load_codebooks(idx) == books
    assert idx.snapshot().properties["vector-index.pq"] == "4,16"
    queries = corpus.filter("vec_id < 4")

    got = ivf_pq_topk_persisted(queries, idx, k=5, nprobe=4)
    flat = pq_topk(queries, pq_encode(corpus, books), books, k=5)
    def _r(df):
        return sorted(
            (r.query_id, r.rank, r.neighbor_id, round(r.adc_dist, 9))
            for r in df.collect()
        )
    assert _r(got) == _r(flat)

    # append against the frozen codebooks: new vectors get codes too
    extra = _vectors(spark, 50, dim=16, seed=8, start_id=200)
    append_vectors(idx, extra)
    idx = catalog.load_table("ann", "pq_idx")
    assert idx.read().filter("pq_code IS NULL").count() == 0
    assert idx.read().count() == 250
    both = corpus.unionByName(extra)
    got2 = ivf_pq_topk_persisted(queries, idx, k=5, nprobe=4)
    flat2 = pq_topk(queries, pq_encode(both, books), books, k=5)
    assert _r(got2) == _r(flat2)

    # (the recall-vs-exact contract for PQ itself is pinned with TRAINED
    # codebooks in test_operators.py::test_pq_recall_vs_bruteforce — these
    # hash-deterministic codebooks exist to make the machinery equality
    # above exact, not to be good quantizers)


def test_orphan_sweep_keeps_live_sidecar_drops_stale(spark, warehouse):
    """remove_orphan_files: the snapshot-referenced centroid sidecar
    survives, an unreferenced leftover (rebuild residue) is swept."""
    from datetime import timedelta

    from dlt_iceberg_spark.lake.maintenance import remove_orphan_files

    catalog = LakeCatalog(spark, warehouse)
    corpus = _vectors(spark, 40, seed=5)
    idx = build_vector_index(
        catalog, "ann", "sweep_idx", corpus,
        n_centroids=4, centroids=fixed_centroids(corpus, n_centroids=4),
    )
    live = idx.snapshot().properties["vector-index.centroids-file"]
    stale_rel = "metadata/ann-centroids-deadbeef.json"
    with open(os.path.join(idx.location, stale_rel), "w") as fh:
        fh.write("[]")
    out = remove_orphan_files(idx, older_than=timedelta(seconds=0))
    assert stale_rel in out["metadata_files"]
    assert live not in out["metadata_files"]
    assert os.path.exists(os.path.join(idx.location, live))
    # index still answers
    assert load_centroids(idx)


def test_ivfpq_persisted_codes_only_index(spark, warehouse):
    """store_vectors=False drops the fp32 column entirely — the ~32x
    smaller codes-only layout still answers ADC queries; the cosine probe
    refuses (no vectors to fold)."""
    from dlt_iceberg_spark.operators.quantization import pq_codebooks_fixed
    from dlt_iceberg_spark.operators.vector_index import ivf_pq_topk_persisted

    catalog = LakeCatalog(spark, warehouse)
    corpus = _vectors(spark, 100, dim=16, seed=9)
    idx = build_vector_index(
        catalog, "ann", "codes_idx", corpus,
        centroids=fixed_centroids(corpus, n_centroids=4),
        pq=True,
        codebooks=pq_codebooks_fixed(corpus, m_subspaces=4, k_codes=16),
        store_vectors=False,
    )
    assert "embedding" not in [f.name for f in idx.snapshot().schema.fields]
    out = ivf_pq_topk_persisted(
        corpus.filter("vec_id < 2"), idx, k=3, nprobe=4
    )
    assert out.count() == 6


def test_index_stats_from_manifests_alone(spark, warehouse, monkeypatch):
    """index_stats answers the list-skew profile from manifest partition
    tuples — zero data reads (pinned by a no-read monkeypatch)."""
    from dlt_iceberg_spark.operators import vector_index as vi

    catalog = LakeCatalog(spark, warehouse)
    corpus = _vectors(spark, 120, seed=6)
    idx = build_vector_index(
        catalog, "ann", "stats_idx", corpus,
        n_centroids=4, centroids=fixed_centroids(corpus, n_centroids=4),
    )
    from dlt_iceberg_spark.lake.table import LakeTable

    def _no_read(self, *a, **k):
        raise AssertionError("index_stats must not scan data")

    monkeypatch.setattr(LakeTable, "read", _no_read)
    monkeypatch.setattr(LakeTable, "read_files", _no_read)
    stats = vi.index_stats(idx)
    assert stats["rows"] == 120
    assert stats["lists"] == len(
        {f.partition["centroid"] for f in idx.snapshot().files}
    )
    assert stats["min_list"] >= 1 and stats["max_list"] <= 120
    assert stats["skew"] >= 1.0
    monkeypatch.undo()
    # agrees with the scan
    by_list = {
        r.centroid: r["count"]
        for r in idx.read().groupBy("centroid").count().collect()
    }
    assert stats["max_list"] == max(by_list.values())
    assert stats["rows"] == sum(by_list.values())


def test_filtered_persisted_search_with_metadata_cols(spark, warehouse):
    """metadata_cols ride into the index rows; a where= probe bounds
    candidates before any distance math and (probe-all) equals brute
    force over the filtered corpus.  Appends carry the metadata too."""
    rng = np.random.default_rng(13)
    rows = [
        (i, int(i % 3), [float(x) for x in rng.normal(size=8)])
        for i in range(150)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    catalog = LakeCatalog(spark, warehouse)
    idx = build_vector_index(
        catalog, "ann", "f_idx",
        corpus.filter("vec_id < 100"),
        n_centroids=4,
        centroids=fixed_centroids(corpus, n_centroids=4),
        metadata_cols=["label"],
    )
    append_vectors(idx, corpus.filter("vec_id >= 100"))
    idx = catalog.load_table("ann", "f_idx")
    assert idx.read().filter("label IS NULL").count() == 0

    queries = corpus.filter("vec_id < 3")
    got = ivf_topk_persisted(
        queries, idx, k=5, nprobe=4, where=[("label", "=", 1)]
    )
    exact = cosine_topk_bruteforce(queries, corpus.filter("label = 1"), k=5)
    assert _ranked(got) == _ranked(exact)


@pytest.mark.slow
def test_ivfpq_rerank_recovers_exact_ranking(spark, warehouse):
    """The FAISS refine step: rerank=N re-scores the ADC top-N with exact
    cosine — with probe-all and N = corpus size the result equals brute
    force exactly (quantization error no longer decides ranks); codes-only
    indexes refuse with the store_vectors remedy."""
    from dlt_iceberg_spark.operators.quantization import pq_codebooks_fixed
    from dlt_iceberg_spark.operators.vector_index import ivf_pq_topk_persisted

    catalog = LakeCatalog(spark, warehouse)
    corpus = _vectors(spark, 150, dim=16, seed=17)
    idx = build_vector_index(
        catalog, "ann", "rr_idx", corpus,
        centroids=fixed_centroids(corpus, n_centroids=4),
        pq=True,
        codebooks=pq_codebooks_fixed(corpus, m_subspaces=4, k_codes=16),
    )
    queries = corpus.filter("vec_id < 3")
    got = ivf_pq_topk_persisted(queries, idx, k=5, nprobe=4, rerank=150)
    exact = cosine_topk_bruteforce(queries, corpus, k=5)
    assert _ranked(got) == _ranked(exact)
    # a bounded rerank is at least as good as raw ADC at k intersection
    raw = ivf_pq_topk_persisted(queries, idx, k=5, nprobe=4)
    assert raw.columns == ["query_id", "neighbor_id", "adc_dist", "rank"]

    codes_only = build_vector_index(
        catalog, "ann", "rr_codes", corpus,
        centroids=fixed_centroids(corpus, n_centroids=4),
        pq=True,
        codebooks=pq_codebooks_fixed(corpus, m_subspaces=4, k_codes=16),
        store_vectors=False,
    )
    with pytest.raises(ValueError, match="store_vectors"):
        ivf_pq_topk_persisted(queries, codes_only, k=5, nprobe=4, rerank=20)


@pytest.mark.slow
def test_delete_vectors_takedown_lifecycle(spark, warehouse):
    """The takedown path: delete_vectors masks ids merge-on-read, every
    probe path excludes them immediately, and compaction folds the masked
    rows away physically while probe results stay bit-identical."""
    from dlt_iceberg_spark.lake.maintenance import compact_table
    from dlt_iceberg_spark.operators.vector_index import delete_vectors, index_stats

    catalog = LakeCatalog(spark, warehouse)
    first = _vectors(spark, 120, seed=21)
    second = _vectors(spark, 80, seed=22, start_id=120)
    cents = fixed_centroids(first, n_centroids=8)
    idx = build_vector_index(
        catalog, "ann", "td_idx", first, n_centroids=8, centroids=cents
    )
    append_vectors(idx, second)
    idx = catalog.load_table("ann", "td_idx")

    doomed = [5, 17, 60, 130, 199]
    gone = spark.createDataFrame([(i,) for i in doomed], "vec_id long")
    snap = delete_vectors(idx, gone)
    assert snap.operation == "delete"
    # MoR: data files untouched, equality-delete file on the id column
    assert any(d.equality_ids == ["vec_id"] for d in snap.delete_files)

    in_list = ", ".join(str(i) for i in doomed)
    live = first.unionByName(second).filter(f"vec_id NOT IN ({in_list})")
    queries = first.filter("vec_id < 4")
    got = ivf_topk_persisted(queries, idx, k=5, nprobe=8)
    exact = cosine_topk_bruteforce(queries, live, k=5)
    assert _ranked(got) == _ranked(exact)
    assert idx.read().filter(f"vec_id IN ({in_list})").count() == 0

    # compaction folds the masks physically; probes are bit-identical
    before = _ranked(got)
    compact_table(idx)
    snap2 = idx.snapshot()
    assert not snap2.delete_files
    assert idx.read().count() == 195
    assert _ranked(ivf_topk_persisted(queries, idx, k=5, nprobe=8)) == before
    # stats valid again from manifests alone after the fold
    assert index_stats(idx)["rows"] == 195


def test_delete_then_append_reinserts_id(spark, warehouse):
    """Equality deletes mask strictly-smaller sequences only: an id
    deleted and later re-appended (the upsert shape) is live with its NEW
    vector."""
    from dlt_iceberg_spark.operators.vector_index import delete_vectors

    catalog = LakeCatalog(spark, warehouse)
    corpus = _vectors(spark, 60, seed=23)
    idx = build_vector_index(
        catalog, "ann", "ri_idx", corpus,
        n_centroids=4, centroids=fixed_centroids(corpus, n_centroids=4),
    )
    delete_vectors(idx, spark.createDataFrame([(7,)], "vec_id long"))
    assert idx.read().filter("vec_id = 7").count() == 0
    new_row = _vectors(spark, 1, seed=99, start_id=7)
    append_vectors(idx, new_row)
    got = idx.read().filter("vec_id = 7").collect()
    assert len(got) == 1
    assert got[0].embedding == new_row.collect()[0].embedding


def test_write_vector_index_refuses_second_build(spark, warehouse):
    """The silent-retrain footgun is closed: a second build on a built
    index raises, naming the rebuild API; append_vectors still works."""
    import pytest as _pytest

    catalog = LakeCatalog(spark, warehouse)
    corpus = _vectors(spark, 50, seed=24)
    idx = build_vector_index(
        catalog, "ann", "rf_idx", corpus,
        n_centroids=4, centroids=fixed_centroids(corpus, n_centroids=4),
    )
    from dlt_iceberg_spark.operators.vector_index import write_vector_index

    with _pytest.raises(ValueError, match="rebuild_vector_index"):
        write_vector_index(idx, corpus, n_centroids=4)
    append_vectors(idx, _vectors(spark, 10, seed=25, start_id=50))
    assert idx.read().count() == 60


@pytest.mark.slow
def test_rebuild_vector_index_atomic_retrain(spark, warehouse):
    """rebuild_vector_index re-trains and re-assigns ALL rows in ONE
    replace snapshot: new sidecar, every row's list = argmax against the
    NEW centroids (old rows included), deletions folded out physically,
    probe-all still exact, and time travel to the pre-rebuild index works."""
    from dlt_iceberg_spark.operators.vector_index import (
        delete_vectors,
        rebuild_vector_index,
    )

    catalog = LakeCatalog(spark, warehouse)
    first = _vectors(spark, 100, seed=26)
    second = _vectors(spark, 100, seed=27, start_id=100)
    idx = build_vector_index(
        catalog, "ann", "rb_idx", first,
        n_centroids=4, centroids=fixed_centroids(first, n_centroids=4),
    )
    append_vectors(idx, second)
    delete_vectors(idx, spark.createDataFrame([(3,), (150,)], "vec_id long"))
    old_rel = idx.snapshot().properties["vector-index.centroids-file"]
    pre_version = idx.current_version()

    live = first.unionByName(second).filter("vec_id NOT IN (3, 150)")
    new_cents = fixed_centroids(live, n_centroids=8)
    snap = rebuild_vector_index(idx, centroids=new_cents)
    assert snap.operation == "replace"
    assert not snap.delete_files  # masks folded into the rewrite
    assert snap.properties["vector-index.n-centroids"] == "8"
    assert snap.properties["vector-index.centroids-file"] != old_rel
    assert idx.read().count() == 198

    # every stored row sits in the argmax list of the NEW centroid matrix
    cmat = np.array(load_centroids(idx))
    cmat = cmat / np.maximum(
        np.sqrt((cmat * cmat).sum(axis=1, keepdims=True)), 1e-12
    )
    for r in idx.read().collect():
        v = np.array(r.embedding)
        v = v / max(float(np.sqrt((v * v).sum())), 1e-12)
        assert int((cmat @ v).argmax()) == r.centroid

    queries = first.filter("vec_id < 4 AND vec_id <> 3")
    got = ivf_topk_persisted(queries, idx, k=5, nprobe=8)
    exact = cosine_topk_bruteforce(queries, live, k=5)
    assert _ranked(got) == _ranked(exact)

    # pre-rebuild snapshot still answers (time travel intact)
    old = idx.read(snapshot_version=pre_version)
    assert old.count() == 198  # same live rows, old layout


def test_rebuild_refuses_codes_only_index(spark, warehouse):
    from dlt_iceberg_spark.operators.quantization import pq_codebooks_fixed
    from dlt_iceberg_spark.operators.vector_index import rebuild_vector_index

    catalog = LakeCatalog(spark, warehouse)
    corpus = _vectors(spark, 60, dim=16, seed=28)
    idx = build_vector_index(
        catalog, "ann", "rbc_idx", corpus,
        centroids=fixed_centroids(corpus, n_centroids=4),
        pq=True,
        codebooks=pq_codebooks_fixed(corpus, m_subspaces=4, k_codes=16),
        store_vectors=False,
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="store_vectors=False"):
        rebuild_vector_index(idx)


def test_rebuild_pq_index_reencodes(spark, warehouse):
    """A PQ index rebuild re-trains codebooks on the live corpus and
    re-encodes every row; ADC probes keep answering."""
    from dlt_iceberg_spark.operators.quantization import pq_codebooks_fixed
    from dlt_iceberg_spark.operators.vector_index import (
        ivf_pq_topk_persisted,
        load_codebooks,
        rebuild_vector_index,
    )

    catalog = LakeCatalog(spark, warehouse)
    corpus = _vectors(spark, 120, dim=16, seed=29)
    idx = build_vector_index(
        catalog, "ann", "rbq_idx", corpus,
        centroids=fixed_centroids(corpus, n_centroids=4),
        pq=True,
        codebooks=pq_codebooks_fixed(corpus, m_subspaces=4, k_codes=16),
    )
    new_books = pq_codebooks_fixed(corpus, m_subspaces=4, k_codes=8)
    rebuild_vector_index(
        idx,
        centroids=fixed_centroids(corpus, n_centroids=4),
        codebooks=new_books,
    )
    assert load_codebooks(idx) == new_books
    assert idx.read().filter("pq_code IS NULL").count() == 0
    out = ivf_pq_topk_persisted(corpus.filter("vec_id < 2"), idx, k=3, nprobe=4)
    assert out.count() == 6


def test_index_compaction_collapses_files_per_list(spark, warehouse):
    """N loads land ~1 file per list each; compact_table collapses the
    per-list file count back to ~1 and probe results are bit-identical —
    the maintenance contract that keeps probe open/footer cost flat over
    a year of daily appends."""
    from dlt_iceberg_spark.lake.maintenance import compact_table
    from dlt_iceberg_spark.operators.vector_index import index_stats

    catalog = LakeCatalog(spark, warehouse)
    first = _vectors(spark, 80, seed=30)
    idx = build_vector_index(
        catalog, "ann", "cp_idx", first,
        n_centroids=4, centroids=fixed_centroids(first, n_centroids=4),
    )
    for i in range(3):
        append_vectors(idx, _vectors(spark, 60, seed=31 + i, start_id=80 + 60 * i))
    stats = index_stats(idx)
    assert stats["max_files_per_list"] >= 3  # one-ish file per list per load

    queries = first.filter("vec_id < 4")
    before = _ranked(ivf_topk_persisted(queries, idx, k=5, nprobe=4))
    res = compact_table(idx)
    assert res.rewritten_files > 0
    after_stats = index_stats(idx)
    assert after_stats["max_files_per_list"] == 1
    assert after_stats["rows"] == stats["rows"]
    # partition layout preserved: every rewritten file keeps its tuple
    assert all("centroid" in f.partition for f in idx.snapshot().files)
    assert _ranked(ivf_topk_persisted(queries, idx, k=5, nprobe=4)) == before


def test_pq_build_encodes_once(spark, warehouse, monkeypatch):
    """store_vectors=True builds run ONE Arrow-batched encode pass (the
    old path encoded twice and threw one away)."""
    from dlt_iceberg_spark.operators import quantization as qz
    from dlt_iceberg_spark.operators import vector_index as vi

    calls = []
    real = qz.pq_encode

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(qz, "pq_encode", counting)
    catalog = LakeCatalog(spark, warehouse)
    corpus = _vectors(spark, 60, dim=16, seed=33)
    idx = build_vector_index(
        catalog, "ann", "se_idx", corpus,
        centroids=fixed_centroids(corpus, n_centroids=4),
        pq=True,
        codebooks=__import__(
            "dlt_iceberg_spark.operators.quantization", fromlist=["pq_codebooks_fixed"]
        ).pq_codebooks_fixed(corpus, m_subspaces=4, k_codes=16),
    )
    assert len(calls) == 1
    assert "embedding" in [f.name for f in idx.snapshot().schema.fields]
    assert idx.read().filter("pq_code IS NULL").count() == 0


@pytest.mark.slow
def test_ivf_sq_persisted_lifecycle(spark, warehouse):
    """IVF-SQ8 (FAISS IVF,SQ8): codes-only index stores one int8 level per
    dimension against frozen exact per-dim stats; ivf_topk_persisted
    decodes JVM-side inside the pruned scan, and with probe-all equals
    flat SQ scoring over the full corpus with the same frozen stats.
    Appends encode against the frozen stats; rebuild re-trains them."""
    from dlt_iceberg_spark.operators.quantization import (
        sq_encode,
        sq_topk,
        sq_train,
    )
    from dlt_iceberg_spark.operators.vector_index import (
        delete_vectors,
        rebuild_vector_index,
    )

    catalog = LakeCatalog(spark, warehouse)
    first = _vectors(spark, 100, seed=41)
    second = _vectors(spark, 60, seed=42, start_id=100)
    cents = fixed_centroids(first, n_centroids=4)
    idx = build_vector_index(
        catalog, "ann", "sq_idx", first,
        n_centroids=4, centroids=cents, sq=True, store_vectors=False,
    )
    snap = idx.snapshot()
    assert snap.properties["vector-index.sq"] == "256"
    assert "embedding" not in [f.name for f in snap.schema.fields]
    append_vectors(idx, second)
    idx = catalog.load_table("ann", "sq_idx")
    assert idx.read().filter("sq_code IS NULL").count() == 0

    both = first.unionByName(second)
    mins, maxs = sq_train(first)  # the frozen build-time stats
    queries = first.filter("vec_id < 4")
    got = ivf_topk_persisted(queries, idx, k=5, nprobe=4)
    flat = sq_topk(queries, sq_encode(both, mins, maxs), mins, maxs, k=5)
    assert _ranked(got) == _ranked(flat)

    # takedown works identically on the SQ layout
    delete_vectors(idx, spark.createDataFrame([(3,)], "vec_id long"))
    got2 = ivf_topk_persisted(queries, idx, k=5, nprobe=4)
    flat2 = sq_topk(
        queries,
        sq_encode(both.filter("vec_id <> 3"), mins, maxs),
        mins, maxs, k=5,
    )
    assert _ranked(got2) == _ranked(flat2)

    # codes-only SQ rebuild refuses (re-assignment needs the vectors)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="store_vectors=False"):
        rebuild_vector_index(idx)

    # a vector-keeping SQ index rebuilds: stats re-train on the live rows
    idx2 = build_vector_index(
        catalog, "ann", "sq_idx2", first,
        n_centroids=4, centroids=cents, sq=True, store_vectors=True,
    )
    append_vectors(idx2, second)
    rebuild_vector_index(
        idx2, centroids=fixed_centroids(both, n_centroids=8)
    )
    snap2 = idx2.snapshot()
    assert snap2.operation == "replace"
    assert snap2.properties["vector-index.n-centroids"] == "8"
    # re-trained stats: the new sidecar's sq mins/maxs cover BOTH loads
    from dlt_iceberg_spark.operators.vector_index import _load_sidecar

    new_sq = _load_sidecar(idx2)["sq"]
    mins_b, maxs_b = sq_train(both)
    assert new_sq["mins"] == mins_b and new_sq["maxs"] == maxs_b
    assert idx2.read().filter("sq_code IS NULL").count() == 0
    # vector-keeping index scores with the EXACT fp32 column (probe-all
    # equals raw brute force, not the decoded approximation)
    got3 = ivf_topk_persisted(queries, idx2, k=5, nprobe=8)
    exact = cosine_topk_bruteforce(queries, both, k=5)
    assert _ranked(got3) == _ranked(exact)


def test_append_conflict_retries_without_restaging(spark, warehouse, monkeypatch):
    """A commit conflict during append_vectors retries against the re-read
    head WITHOUT re-staging files (the writer's optimistic pattern)."""
    from dlt_iceberg_spark.errors import CommitConflictError
    from dlt_iceberg_spark.lake.table import LakeTable

    catalog = LakeCatalog(spark, warehouse)
    corpus = _vectors(spark, 60, seed=51)
    idx = build_vector_index(
        catalog, "ann", "cr_idx", corpus,
        n_centroids=4, centroids=fixed_centroids(corpus, n_centroids=4),
    )
    stage_calls = {"n": 0}
    real_stage = LakeTable.stage_dataframe

    def counting_stage(self, *a, **k):
        stage_calls["n"] += 1
        return real_stage(self, *a, **k)

    conflicts = {"n": 0}
    real_commit = LakeTable.commit

    def flaky_commit(self, *a, **k):
        if "vectors-appended" in (k.get("summary") or {}) and conflicts["n"] == 0:
            conflicts["n"] += 1
            raise CommitConflictError("injected race")
        return real_commit(self, *a, **k)

    monkeypatch.setattr(LakeTable, "stage_dataframe", counting_stage)
    monkeypatch.setattr(LakeTable, "commit", flaky_commit)
    import dlt_iceberg_spark.errors as errs

    monkeypatch.setattr(errs.RetryPolicy, "sleep", staticmethod(lambda s: None))
    append_vectors(idx, _vectors(spark, 20, seed=52, start_id=60))
    assert conflicts["n"] == 1  # the retry happened
    assert stage_calls["n"] == 1  # ...without re-staging
    assert idx.read().count() == 80


def test_append_refuses_after_concurrent_rebuild(spark, warehouse, monkeypatch):
    """If a REBUILD lands between staging and commit, the staged
    assignments were computed under the OLD centroids — the append must
    refuse (re-run), never commit a mixed layout."""
    from dlt_iceberg_spark.lake.table import LakeTable
    from dlt_iceberg_spark.operators.vector_index import rebuild_vector_index

    catalog = LakeCatalog(spark, warehouse)
    corpus = _vectors(spark, 60, seed=53)
    idx = build_vector_index(
        catalog, "ann", "rr2_idx", corpus,
        n_centroids=4, centroids=fixed_centroids(corpus, n_centroids=4),
    )
    real_stage = LakeTable.stage_dataframe
    raced = {"done": False}

    def racing_stage(self, *a, **k):
        files = real_stage(self, *a, **k)
        if not raced["done"]:
            raced["done"] = True  # guard: rebuild stages too
            rebuild_vector_index(
                idx, centroids=fixed_centroids(corpus, n_centroids=8)
            )
        return files

    monkeypatch.setattr(LakeTable, "stage_dataframe", racing_stage)
    with pytest.raises(ValueError, match="rebuilt concurrently"):
        append_vectors(idx, _vectors(spark, 20, seed=54, start_id=60))
    # the rebuilt index is intact: all 60 original rows, 8 lists
    assert idx.read().count() == 60
    assert idx.snapshot().properties["vector-index.n-centroids"] == "8"


def test_probe_recall_monotone_and_exact_at_probe_all(spark, warehouse):
    """probe_recall: recall is 1.0 at probe-all by construction, weakly
    increases with nprobe, and nprobes clamp to n_lists."""
    from dlt_iceberg_spark.operators.vector_index import probe_recall

    catalog = LakeCatalog(spark, warehouse)
    corpus = _vectors(spark, 200, seed=61)
    idx = build_vector_index(
        catalog, "ann", "pr_idx", corpus,
        n_centroids=8, centroids=fixed_centroids(corpus, n_centroids=8),
    )
    sample = corpus.filter("vec_id < 10")
    curve = probe_recall(idx, sample, k=5, nprobes=(1, 2, 4, 8, 99))
    assert [c["nprobe"] for c in curve] == [1, 2, 4, 8]  # 99 clamps to 8
    recalls = [c["recall"] for c in curve]
    assert recalls == sorted(recalls)  # weakly monotone in nprobe
    assert recalls[-1] == 1.0  # probe-all is its own ground truth
    assert recalls[0] < 1.0  # 1 of 8 lists misses someone


def test_filtered_adc_and_rerank_respect_where(spark, warehouse):
    """ivf_pq_topk_persisted(where=...): metadata filters bound ADC
    candidates AND the rerank point-read — a filtered-out row never
    appears, and results equal flat PQ over the filtered corpus."""
    from dlt_iceberg_spark.operators.quantization import (
        pq_codebooks_fixed,
        pq_encode,
        pq_topk,
    )
    from dlt_iceberg_spark.operators.vector_index import ivf_pq_topk_persisted

    rng = np.random.default_rng(62)
    rows = [
        (i, int(i % 2), [float(x) for x in rng.normal(size=16)])
        for i in range(150)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, tenant int, embedding array<double>"
    )
    catalog = LakeCatalog(spark, warehouse)
    books = pq_codebooks_fixed(corpus, m_subspaces=4, k_codes=16)
    idx = build_vector_index(
        catalog, "ann", "fadc_idx", corpus,
        centroids=fixed_centroids(corpus, n_centroids=4),
        pq=True, codebooks=books, metadata_cols=["tenant"],
    )
    queries = corpus.filter("vec_id < 3")
    got = ivf_pq_topk_persisted(queries, idx, k=5, nprobe=4, where=[("tenant", "=", 1)])
    assert got.count() == 15
    ids = {r.neighbor_id for r in got.collect()}
    assert all(i % 2 == 1 for i in ids)  # only tenant 1 survives
    flat = pq_topk(
        queries,
        pq_encode(corpus.filter("tenant = 1"), books),
        books, k=5,
    )
    def _r(df):
        return sorted(
            (r.query_id, r.rank, r.neighbor_id, round(r.adc_dist, 9))
            for r in df.collect()
        )
    assert _r(got) == _r(flat)
    # rerank honors the filter too (exact contract over filtered corpus)
    rr = ivf_pq_topk_persisted(
        queries, idx, k=5, nprobe=4, rerank=150, where=[("tenant", "=", 1)]
    )
    exact = cosine_topk_bruteforce(queries, corpus.filter("tenant = 1"), k=5)
    assert _ranked(rr) == _ranked(exact)


def test_probe_shuffle_fallback_matches_broadcast(spark, warehouse):
    """Past broadcast_budget the probe join falls back to a shuffle on
    centroid — results identical to the broadcast path (the batch-kNN
    shape for query sets too big to broadcast)."""
    catalog = LakeCatalog(spark, warehouse)
    corpus = _vectors(spark, 150, seed=71)
    idx = build_vector_index(
        catalog, "ann", "bb_idx", corpus,
        n_centroids=4, centroids=fixed_centroids(corpus, n_centroids=4),
    )
    queries = corpus.filter("vec_id < 6")
    via_broadcast = ivf_topk_persisted(queries, idx, k=5, nprobe=4)
    via_shuffle = ivf_topk_persisted(
        queries, idx, k=5, nprobe=4, broadcast_budget=2
    )
    # AQE may still pick a broadcast physically (tiny sides) — the pin is
    # that the un-hinted plan returns identical results
    assert _ranked(via_shuffle) == _ranked(via_broadcast)


def test_pq_topk_refuses_oversized_query_set(spark, warehouse):
    from dlt_iceberg_spark.operators.quantization import (
        pq_codebooks_fixed,
        pq_encode,
        pq_topk,
    )

    corpus = _vectors(spark, 60, dim=16, seed=72)
    books = pq_codebooks_fixed(corpus, m_subspaces=4, k_codes=16)
    codes = pq_encode(corpus, books)
    with pytest.raises(ValueError, match="max_queries"):
        pq_topk(corpus, codes, books, k=3, max_queries=10)


def test_maintain_policy_services_the_index_end_to_end(spark, warehouse):
    """One `maintain()` call services the vector index like any LakeTable:
    folds the takedown masks, collapses files-per-list, expires history,
    sweeps orphans — sidecar survives, probe results bit-identical."""
    from datetime import timedelta

    from dlt_iceberg_spark.lake.maintenance import MaintenancePolicy, maintain
    from dlt_iceberg_spark.operators.vector_index import (
        delete_vectors,
        index_stats,
    )

    catalog = LakeCatalog(spark, warehouse)
    first = _vectors(spark, 80, seed=81)
    idx = build_vector_index(
        catalog, "ann", "mt_idx", first,
        n_centroids=4, centroids=fixed_centroids(first, n_centroids=4),
    )
    for i in range(3):
        append_vectors(idx, _vectors(spark, 40, seed=82 + i, start_id=80 + 40 * i))
    delete_vectors(idx, spark.createDataFrame([(9,), (99,)], "vec_id long"))
    queries = first.filter("vec_id < 4")
    before = _ranked(ivf_topk_persisted(queries, idx, k=5, nprobe=4))
    sidecar = idx.snapshot().properties["vector-index.centroids-file"]

    report = maintain(
        idx,
        MaintenancePolicy(
            fold_deletes_over=1,
            expire_older_than=timedelta(seconds=0),
            keep_last_snapshots=1,
            orphans_older_than=timedelta(seconds=0),
        ),
    )
    assert report["compaction"]["rewritten_files"] > 0
    stats = index_stats(idx)
    assert stats["max_files_per_list"] == 1
    assert stats["rows"] == 198
    assert not idx.snapshot().delete_files  # masks folded physically
    assert idx.snapshot().properties["vector-index.centroids-file"] == sidecar
    import os as _os

    assert _os.path.exists(_os.path.join(idx.location, sidecar))
    assert _ranked(ivf_topk_persisted(queries, idx, k=5, nprobe=4)) == before


def _skewed_corpus(spark, dim=8):
    """~104 vectors, ~90 in list 0 (bimodal around ±0.3·e4 so a 2-way
    split separates cleanly), a handful in lists 1-3 — skew > 3."""
    rng = np.random.default_rng(55)
    e = np.eye(dim)

    def cluster(center, n, start):
        return [
            (
                start + i,
                [float(x) for x in center + 0.05 * rng.standard_normal(dim)],
            )
            for i in range(n)
        ]

    rows = (
        cluster(e[0] + 0.3 * e[4], 45, 0)
        + cluster(e[0] - 0.3 * e[4], 45, 45)
        + cluster(e[1], 5, 90)
        + cluster(e[2], 5, 95)
        + cluster(e[3], 4, 100)
    )
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[float(x) for x in e[j]] for j in range(4)]
    return corpus, cents


def test_split_list_rebalances_touching_only_hot_files(spark, warehouse):
    """Incremental re-clustering (VERDICT r10 task 5): a skewed index
    (skew > 3) rebalances by splitting ONE hot list — the file diff shows
    only that list's files removed, every other list's files survive
    byte-identical; probe-all stays EXACT; appends keep working against
    the grown matrix; skew improves."""
    from dlt_iceberg_spark.operators.vector_index import (
        index_stats,
        rebalance_vector_index,
    )

    corpus, cents = _skewed_corpus(spark)
    catalog = LakeCatalog(spark, warehouse)
    idx = build_vector_index(catalog, "ann", "skewed", corpus, centroids=cents)
    stats = index_stats(idx)
    assert stats["skew"] > 3

    before = {f.path: f.partition.get("centroid") for f in idx.snapshot().files}
    hot = {p for p, c in before.items() if c == "0"}
    assert hot and len(before) > len(hot)

    reports = rebalance_vector_index(idx, threshold=3.0, k_split=2)
    assert len(reports) == 1 and reports[0]["split"] == 0

    after = {f.path: f.partition.get("centroid") for f in idx.snapshot().files}
    removed = set(before) - set(after)
    assert removed == hot  # ONLY the hot list's files were rewritten
    added = set(after) - set(before)
    assert added and all(after[p] in {"0", "4"} for p in added)
    # sub 0 inherits id 0, sub 1 appends at id 4; matrix grew by one
    assert idx.snapshot().properties["vector-index.n-centroids"] == "5"
    assert len(load_centroids(idx)) == 5

    queries = corpus.filter("vec_id < 3 OR vec_id IN (92, 101)")
    got = ivf_topk_persisted(queries, idx, k=5, nprobe=5)
    exact = cosine_topk_bruteforce(queries, corpus, k=5)
    assert _ranked(got) == _ranked(exact)  # probe-all exact after split

    extra = _vectors(spark, 10, seed=77, start_id=200)
    append_vectors(idx, extra)
    got2 = ivf_topk_persisted(queries, idx, k=5, nprobe=5)
    exact2 = cosine_topk_bruteforce(queries, corpus.unionByName(extra), k=5)
    assert _ranked(got2) == _ranked(exact2)
    assert index_stats(idx)["skew"] < stats["skew"]


def test_split_list_refusals(spark, warehouse):
    from dlt_iceberg_spark.operators.vector_index import split_list

    corpus, cents = _skewed_corpus(spark)
    catalog = LakeCatalog(spark, warehouse)
    idx = build_vector_index(
        catalog, "ann", "codesonly", corpus, centroids=cents,
        pq=True, m_subspaces=4, k_codes=8, store_vectors=False,
    )
    with pytest.raises(ValueError, match="stored vectors"):
        split_list(idx, 0)
    # centroid on an axis no corpus row is near -> its list gets zero files
    empty_axis = [0.0] * 8
    empty_axis[5] = 1.0
    idx2 = build_vector_index(
        catalog, "ann", "plainref", corpus, centroids=cents + [empty_axis]
    )
    with pytest.raises(ValueError, match="outside"):
        split_list(idx2, 99)
    with pytest.raises(ValueError, match="k_split"):
        split_list(idx2, 0, k_split=1)
    with pytest.raises(ValueError, match="holds no files"):
        split_list(idx2, 4)


def test_maintain_rebalances_skewed_index(spark, warehouse):
    """The rebalance_above_skew policy knob: maintain() on a skewed index
    splits the hot list (manifest-only skew check), then compaction in
    the SAME cycle binpacks the sub-lists; balanced tables skip it."""
    from dlt_iceberg_spark.lake.maintenance import MaintenancePolicy, maintain
    from dlt_iceberg_spark.operators.vector_index import index_stats

    corpus, cents = _skewed_corpus(spark)
    catalog = LakeCatalog(spark, warehouse)
    idx = build_vector_index(catalog, "ann", "mt_skew", corpus, centroids=cents)
    queries = corpus.filter("vec_id < 3")
    exact = _ranked(cosine_topk_bruteforce(queries, corpus, k=5))

    report = maintain(idx, MaintenancePolicy(rebalance_above_skew=3.0))
    assert report["rebalanced"][0]["split"] == 0
    assert idx.snapshot().properties["vector-index.n-centroids"] == "5"
    assert _ranked(ivf_topk_persisted(queries, idx, k=5, nprobe=5)) == exact

    # second cycle: already balanced — no further splits
    report2 = maintain(idx, MaintenancePolicy(rebalance_above_skew=3.0))
    assert "rebalanced" not in report2
    assert index_stats(idx)["skew"] <= 3.0


def test_split_list_on_sq_index_carries_codes(spark, warehouse):
    """Splitting a list of an IVF-SQ index: the stored sq_code column rides
    the partial rewrite untouched (quantization frames are id-independent),
    the sidecar keeps the SAME frozen stats, and probe-all (which decodes
    via the stored fp32 column here) stays exact."""
    from dlt_iceberg_spark.operators.vector_index import (
        load_centroids,
        split_list,
    )

    corpus, cents = _skewed_corpus(spark)
    catalog = LakeCatalog(spark, warehouse)
    idx = build_vector_index(
        catalog, "ann", "sq_split", corpus, centroids=cents, sq=True
    )
    from dlt_iceberg_spark.operators.vector_index import _load_sidecar

    sq_before = _load_sidecar(idx)["sq"]
    codes_before = {
        r.vec_id: r.sq_code for r in idx.read().select("vec_id", "sq_code").collect()
    }
    split_list(idx, 0, k_split=2)
    assert len(load_centroids(idx)) == 5
    assert _load_sidecar(idx)["sq"] == sq_before  # frozen stats carried
    codes_after = {
        r.vec_id: r.sq_code for r in idx.read().select("vec_id", "sq_code").collect()
    }
    assert codes_after == codes_before  # codes rode the rewrite, no re-encode
    queries = corpus.filter("vec_id < 3")
    got = ivf_topk_persisted(queries, idx, k=5, nprobe=5)
    exact = cosine_topk_bruteforce(queries, corpus, k=5)
    assert _ranked(got) == _ranked(exact)


def _expected_residual_codes(idx, books, matrix):
    """Invariant: every stored pq_code equals encode(vec, CURRENT centroid)
    against the frozen residual codebooks."""
    from dlt_iceberg_spark.operators.quantization import pq_encode

    stored = {
        r.vec_id: tuple(r.pq_code)
        for r in idx.read().select("vec_id", "pq_code").collect()
    }
    fresh = pq_encode(
        idx.read().drop("pq_code"), books, keep_vec=True,
        centroids=matrix, centroid_col="centroid",
    )
    expected = {
        r.vec_id: tuple(r.pq_code)
        for r in fresh.select("vec_id", "pq_code").collect()
    }
    return stored, expected


@pytest.mark.slow
def test_residual_pq_persisted_lifecycle(spark, warehouse):
    """Residual IVF-PQ through the persisted lifecycle: build stores
    residual codes, probe-all ADC equals flat residual PQ, appends encode
    against the frozen centroids+codebooks, split_list RE-ENCODES the
    split rows (their list centroid moved) and ONLY those — the stored-
    code invariant `code == encode(vec, current centroid)` holds at every
    step, and rebuild re-trains residual codebooks against the new
    centroids."""
    from dlt_iceberg_spark.operators.quantization import (
        pq_codebooks_fixed,
        pq_encode,
        pq_topk,
    )
    from dlt_iceberg_spark.operators.vector_index import (
        _load_sidecar,
        ivf_pq_topk_persisted,
        load_centroids,
        rebuild_vector_index,
        split_list,
    )

    catalog = LakeCatalog(spark, warehouse)
    corpus = _vectors(spark, 200, dim=16, seed=7)
    cents = fixed_centroids(corpus, n_centroids=4)
    books = pq_codebooks_fixed(corpus, m_subspaces=4, k_codes=16, centroids=cents)
    idx = build_vector_index(
        catalog, "ann", "respq_idx", corpus,
        centroids=cents, pq=True, codebooks=books, pq_residual=True,
    )
    assert idx.snapshot().properties["vector-index.pq-residual"] == "true"
    assert _load_sidecar(idx)["pq_residual"] is True
    queries = corpus.filter("vec_id < 4")

    def _r(df):
        return sorted(
            (r.query_id, r.rank, r.neighbor_id, round(r.adc_dist, 9))
            for r in df.collect()
        )

    # probe-all persisted ADC == flat residual PQ over the same corpus
    from dlt_iceberg_spark.operators.similarity import _nearest_centroids

    a1 = _nearest_centroids(cents, 1)
    flat_codes = pq_encode(
        corpus.withColumn("centroid", a1(F.col("embedding"))[0].cast("int")),
        books, centroids=cents,
    )
    got = ivf_pq_topk_persisted(queries, idx, k=5, nprobe=4)
    flat = pq_topk(queries, flat_codes, books, k=5, centroids=cents)
    assert _r(got) == _r(flat)

    # append: frozen centroids + frozen residual codebooks
    extra = _vectors(spark, 60, dim=16, seed=8, start_id=200)
    append_vectors(idx, extra)
    idx = catalog.load_table("ann", "respq_idx")
    stored, expected = _expected_residual_codes(idx, books, cents)
    assert stored == expected and len(stored) == 260

    # split the hottest list: ONLY its rows re-encode (centroid moved)
    counts = {r["centroid"]: r["count"]
              for r in idx.read().groupBy("centroid").count().collect()}
    hot = max(counts, key=counts.get)
    before_codes = dict(stored)
    moved_ids = {
        r.vec_id for r in idx.read().filter(F.col("centroid") == int(hot))
        .select("vec_id").collect()
    }
    split_list(idx, int(hot), k_split=2)
    matrix = load_centroids(idx)
    assert len(matrix) == 5
    stored2, expected2 = _expected_residual_codes(idx, books, matrix)
    assert stored2 == expected2  # invariant survives the split
    unchanged = set(stored2) - moved_ids
    assert all(stored2[i] == before_codes[i] for i in unchanged)

    # probe still answers through the grown matrix (rerank = exact contract)
    both = corpus.unionByName(extra)
    got2 = ivf_pq_topk_persisted(queries, idx, k=5, nprobe=5, rerank=260)
    exact = cosine_topk_bruteforce(queries, both, k=5)
    assert _ranked(got2) == _ranked(exact)

    # rebuild: re-trains RESIDUAL codebooks against the new centroids
    rebuild_vector_index(idx, centroids=fixed_centroids(both, n_centroids=6))
    side = _load_sidecar(idx)
    assert side["pq_residual"] is True
    assert side["codebooks"] != books  # re-trained, not carried
    stored3, expected3 = _expected_residual_codes(
        idx, side["codebooks"], side["centroids"]
    )
    assert stored3 == expected3
    got3 = ivf_pq_topk_persisted(queries, idx, k=5, nprobe=6, rerank=260)
    assert _ranked(got3) == _ranked(exact)


def test_probe_gated_adc_matches_allowed_pairs_path(spark, warehouse):
    """The probe-gated ADC kernel (probe_sets= — score only probing
    queries, emit local top-k) must return EXACTLY what the legacy
    allowed-pairs formulation returns at nprobe < n_lists: same pairs,
    same distances, same ranks, full k per query — local truncation may
    never lose a global candidate (ties included), and neighbors from
    unprobed lists never appear."""
    from dlt_iceberg_spark.operators.quantization import (
        pq_codebooks_fixed,
        pq_encode,
        pq_topk,
    )
    from dlt_iceberg_spark.operators.similarity import _nearest_centroids
    from dlt_iceberg_spark.operators.vector_index import ivf_pq_topk_persisted

    catalog = LakeCatalog(spark, warehouse)
    corpus = _vectors(spark, 240, dim=16, seed=13)
    cents = fixed_centroids(corpus, n_centroids=6)
    books = pq_codebooks_fixed(corpus, m_subspaces=4, k_codes=16)
    idx = build_vector_index(
        catalog, "ann", "gated_idx", corpus,
        centroids=cents, pq=True, codebooks=books,
    )
    queries = corpus.filter("vec_id < 6")
    got = ivf_pq_topk_persisted(queries, idx, k=5, nprobe=2)

    # legacy reference: flat codes + explicit allowed pairs
    a1 = _nearest_centroids(cents, 1)
    probe2 = _nearest_centroids(cents, 2)
    coded = corpus.withColumn("centroid", a1(F.col("embedding"))[0].cast("int"))
    probes = queries.select(
        F.col("vec_id").alias("query_id"),
        F.explode(probe2(F.col("embedding"))).alias("centroid"),
    )
    allowed = probes.join(
        coded.select(F.col("vec_id").alias("neighbor_id"), "centroid"),
        "centroid",
    ).select("query_id", "neighbor_id")
    ref = pq_topk(queries, pq_encode(coded, books), books, k=5, allowed=allowed)

    def _r(df):
        return sorted(
            (r.query_id, r.rank, r.neighbor_id, round(r.adc_dist, 9))
            for r in df.collect()
        )

    assert _r(got) == _r(ref)
    # full k per query, and every neighbor is in a list its query probed
    rows = got.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.neighbor_id)
    assert all(len(v) == 5 for v in per_q.values())
    probed_map = {
        r.query_id: set()
        for r in probes.collect()
    }
    for r in probes.collect():
        probed_map[r.query_id].add(r.centroid)
    clist = {r.vec_id: r.centroid for r in coded.select("vec_id", "centroid").collect()}
    assert all(
        clist[n] in probed_map[q] for q, ns in per_q.items() for n in ns
    )


@pytest.mark.slow
def test_opq_pq_persisted_lifecycle(spark, warehouse):
    """OPQ + residual IVF-PQ through the persisted lifecycle: the learned
    rotation freezes in the sidecar, appends/splits encode with it, the
    stored-code invariant holds at every step, and probe-all + rerank
    recovers exact brute force."""
    from dlt_iceberg_spark.operators.quantization import pq_encode
    from dlt_iceberg_spark.operators.vector_index import (
        _load_sidecar,
        ivf_pq_topk_persisted,
        load_centroids,
        rebuild_vector_index,
        split_list,
    )

    def _codes_ok(idx):
        side = _load_sidecar(idx)
        stored = {
            r.vec_id: tuple(r.pq_code)
            for r in idx.read().select("vec_id", "pq_code").collect()
        }
        fresh = pq_encode(
            idx.read().drop("pq_code"), side["codebooks"], keep_vec=True,
            centroids=side["centroids"] if side.get("pq_residual") else None,
            centroid_col="centroid", rotation=side.get("rotation"),
        )
        expected = {
            r.vec_id: tuple(r.pq_code)
            for r in fresh.select("vec_id", "pq_code").collect()
        }
        assert stored == expected and len(stored) > 0

    catalog = LakeCatalog(spark, warehouse)
    corpus = _vectors(spark, 180, dim=16, seed=21)
    idx = build_vector_index(
        catalog, "ann", "opq_idx", corpus,
        centroids=fixed_centroids(corpus, n_centroids=4),
        pq=True, pq_residual=True, pq_opq=True, m_subspaces=4, k_codes=16,
    )
    side = _load_sidecar(idx)
    assert idx.snapshot().properties["vector-index.pq-opq"] == "true"
    R = np.array(side["rotation"])
    assert np.allclose(R @ R.T, np.eye(16), atol=1e-9)  # orthogonal
    _codes_ok(idx)

    extra = _vectors(spark, 40, dim=16, seed=22, start_id=200)
    append_vectors(idx, extra)
    idx = catalog.load_table("ann", "opq_idx")
    assert _load_sidecar(idx)["rotation"] == side["rotation"]  # frozen
    _codes_ok(idx)

    queries = corpus.filter("vec_id < 4")
    both = corpus.unionByName(extra)
    got = ivf_pq_topk_persisted(queries, idx, k=5, nprobe=4, rerank=220)
    exact = cosine_topk_bruteforce(queries, both, k=5)
    assert _ranked(got) == _ranked(exact)

    # split re-encodes the moved rows with the FROZEN rotation
    counts = {r["centroid"]: r["count"]
              for r in idx.read().groupBy("centroid").count().collect()}
    split_list(idx, int(max(counts, key=counts.get)), k_split=2)
    assert len(load_centroids(idx)) == 5
    _codes_ok(idx)
    got2 = ivf_pq_topk_persisted(queries, idx, k=5, nprobe=5, rerank=220)
    assert _ranked(got2) == _ranked(exact)

    # rebuild re-learns rotation AND codebooks on the live corpus
    rebuild_vector_index(idx, n_centroids=4)
    side3 = _load_sidecar(idx)
    assert "rotation" in side3 and side3["rotation"] != side["rotation"]
    _codes_ok(idx)
    got3 = ivf_pq_topk_persisted(queries, idx, k=5, nprobe=4, rerank=220)
    assert _ranked(got3) == _ranked(exact)

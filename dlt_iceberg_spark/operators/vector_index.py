"""Persisted IVF vector index — the ANN analogue of the dedup index.

:func:`ivf_topk` (operators/similarity.py) trains centroids per call:
correct, but at 100 TB the index must be built ONCE, stored, and
maintained per load.  This module materializes the IVF layout as a
LakeTable (the layout ivf_topk's docstring names):

- rows are ``(centroid int, <id_col> , <vec_col> array<double>)``,
  hive-partitioned by ``centroid`` — every inverted list is its own
  partition, so probing ``nprobe`` lists is PARTITION PRUNING, not a scan;
- the trained centroid matrix lives in a metadata sidecar file
  (``metadata/ann-centroids-*.json``) referenced from table
  properties — snapshots stay small, the matrix is read once per
  operator call and never rides a commit;
- new loads append through :func:`append_vectors`: vectors are assigned
  to the FROZEN centroids map-side and land as a delta commit (parent
  manifests by reference) — no retrain, no rewrite, O(batch) per load,
  the same lifecycle as ``build_dedup_index``/``append_novel_classes``;
- :func:`ivf_topk_persisted` probes the stored lists with the same
  scoring/ranking contract as ``ivf_topk`` (query-side broadcast, JVM
  cosine fold, per-query window top-k).

Drift: after heavy appends the frozen centroids still partition the
space correctly (assignment is always argmax against the stored matrix)
— recall against the TRUE nearest lists degrades only as the data
distribution moves, the standard FAISS operating assumption; rebuild
with :func:`build_vector_index` when it does.

Reference parity: the reference has no vector surface at all; this is
part of the LLM-training-data layer the build brief adds on top
(SURVEY.md §C similarity search: "IVF or LSH-bucketed variant as the
scale path", made persistent).
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dlt_iceberg_spark.operators.similarity import (
    _as_double,
    _nearest_centroids,
    _train_spherical_kmeans,
    cosine,
)
from dlt_iceberg_spark.operators.util import fan_out

#: table property keys (the index's self-describing contract)
_PROP_FILE = "vector-index.centroids-file"
_PROP_VEC = "vector-index.vec-col"
_PROP_ID = "vector-index.id-col"
_PROP_N = "vector-index.n-centroids"
_PROP_METRIC = "vector-index.metric"


def _assigned(batch: DataFrame, centroids, vec_col: str, id_col: str) -> DataFrame:
    """Map-side list assignment: (id, vector, centroid) — one Arrow-batched
    BLAS argmax against the broadcast centroid matrix, no shuffle."""
    assign1 = _nearest_centroids(centroids, 1)
    return fan_out(_as_double(batch, vec_col)).select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias(vec_col),
        assign1(F.col(vec_col))[0].cast("int").alias("centroid"),
    )


_INDEX_SPEC = [{"column": "centroid", "transform": "identity"}]


def write_vector_index(
    table,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
):
    """Train (bounded sample — O(sample), never O(corpus)) and materialize
    the IVF index into ``table`` (a LakeTable handle; a fresh location gets
    its create commit here — the ``write_dedup_index`` shape, which lets
    the STREAMING maintainer bootstrap the index on its first nonempty
    epoch).  Pass ``centroids=`` to skip training (the gate uses
    hash-deterministic ones).  Returns the index snapshot."""
    if centroids is None:
        centroids = _train_spherical_kmeans(corpus, vec_col, n_centroids, seed)
    assigned = _assigned(corpus, centroids, vec_col, id_col)
    props = {
        _PROP_VEC: vec_col,
        _PROP_ID: id_col,
        _PROP_N: str(len(centroids)),
        _PROP_METRIC: "cosine",
    }
    if table.current_version() is None:
        table.commit(
            [],
            assigned.schema,
            "create",
            None,
            partition_spec=list(_INDEX_SPEC),
            properties=props,
        )
    # centroid matrix as a metadata SIDECAR (Puffin-statistics shape): the
    # snapshot JSON carries only its path — a 4096×1024 float matrix must
    # never ride every commit
    rel = f"metadata/ann-centroids-{uuid.uuid4().hex}.json"
    table._io.write_text(
        os.path.join(table.location, rel), json.dumps(centroids)
    )
    snap = table.snapshot()
    from dlt_iceberg_spark.partition import PartitionField, partition_columns

    pcols = partition_columns([PartitionField(column="centroid", transform="identity")])
    files = table.stage_dataframe(assigned, partition_exprs=pcols)
    return table.commit(
        files,
        assigned.schema,
        "append",
        snap.version,
        partition_spec=snap.partition_spec,
        properties={**snap.properties, **props, _PROP_FILE: rel},
        summary={"vector-index-build": len(centroids)},
    )


def build_vector_index(
    catalog,
    namespace: str,
    name: str,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
):
    """Catalog-level :func:`write_vector_index`: create the table in
    ``catalog`` and materialize the index.  Returns the LakeTable."""
    from dlt_iceberg_spark.errors import TableAlreadyExistsError
    from dlt_iceberg_spark.lake.table import LakeTable

    if catalog.table_exists(namespace, name):
        raise TableAlreadyExistsError(f"{namespace}.{name}")
    catalog.create_namespace(namespace)
    loc = catalog.table_location(namespace, name)
    table = LakeTable(
        corpus.sparkSession,
        loc,
        io=catalog._io,
        pointer_store=catalog._pointer_store_for(loc),
    )
    write_vector_index(
        table,
        corpus,
        vec_col=vec_col,
        id_col=id_col,
        n_centroids=n_centroids,
        seed=seed,
        centroids=centroids,
    )
    return catalog.load_table(namespace, name)


def load_centroids(table) -> list[list[float]]:
    """The index's frozen centroid matrix (metadata sidecar, one read)."""
    snap = table.snapshot()
    rel = snap.properties.get(_PROP_FILE)
    if rel is None:
        raise ValueError(
            f"{table.location} carries no vector-index metadata; was it "
            "created by build_vector_index?"
        )
    return json.loads(table._io.read_text(os.path.join(table.location, rel)))


def append_vectors(table, batch: DataFrame) -> Any:
    """Per-load index maintenance: assign the batch to the FROZEN centroids
    map-side and delta-append into the partitioned layout — parent
    manifests pass by reference, O(batch) work, no retrain.  New vectors
    are immediately visible to :func:`ivf_topk_persisted`."""
    from dlt_iceberg_spark.partition import PartitionField, partition_columns

    snap = table.snapshot()
    centroids = load_centroids(table)
    assigned = _assigned(
        batch, centroids, snap.properties[_PROP_VEC], snap.properties[_PROP_ID]
    )
    pcols = partition_columns([PartitionField(column="centroid", transform="identity")])
    new_files = table.stage_dataframe(assigned, partition_exprs=pcols)
    if not new_files:
        return snap
    return table.commit(
        None,
        snap.schema,
        "append",
        snap.version,
        manifests=snap.manifests,
        new_files=list(snap.inline_files) + new_files,
        summary={"vectors-appended": sum(f.rows for f in new_files)},
    )


def ivf_topk_persisted(
    queries: DataFrame,
    table,
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Top-k over the PERSISTED index: queries probe the ``nprobe`` nearest
    stored lists only.

    Plan shape: the probed centroid ids (≤ n_centroids, tiny) push down as
    a ``(centroid, in, ids)`` predicate — partition/stats pruning keeps
    unprobed lists' files UNREAD — then the probe pairs broadcast onto the
    pruned scan, scored with the JVM cosine fold and ranked per query.
    Same output contract as ``ivf_topk``: (query_id, neighbor_id, cosine,
    rank), ranked by (cosine desc, neighbor_id asc), self-pairs excluded.
    With ``nprobe >= n_centroids`` results are EXACT (probe-all — every
    vector is in exactly one list), which is what lets the gate oracle
    hash-verify the whole persisted machinery against brute force.
    """
    snap = table.snapshot()
    centroids = load_centroids(table)
    vec_col = snap.properties[_PROP_VEC]
    id_col = snap.properties[_PROP_ID]
    probe_n = _nearest_centroids(centroids, min(nprobe, len(centroids)))
    probes = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        F.explode(probe_n(F.col(vec_col))).alias("centroid"),
    )
    # bounded driver collect: ≤ n_centroids ints decide the partition prune
    probed_ids = sorted(
        {r[0] for r in probes.select("centroid").distinct().collect()}
    )
    lists = table.read(where=[("centroid", "in", probed_ids)]).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        "centroid",
    )
    scored = (
        lists.join(F.broadcast(probes), "centroid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )

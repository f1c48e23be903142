"""Product quantization (PQ) for embedding columns.

At 100 TB an fp32 embedding corpus cannot be rescanned per query; PQ
compresses each vector to ``m`` one-byte codes (e.g. 64-dim fp32 = 256 B →
8 B at m=8) so the scored representation fits in a fraction of the space
and distance evaluation becomes table lookups (ADC — asymmetric distance
computation).  The layout mirrors FAISS IVF-PQ:

- **train** on a bounded driver-side sample (same rule as IVF centroids:
  cost O(sample), never O(corpus));
- **encode** distributed: one Arrow-batched matmul per subspace per batch;
- **search** distributed: per query build the m×k lookup table once, score
  each corpus row as a sum of m table entries — no float vector ever
  leaves the executor.

Squared-L2 quantization over unit-normalized vectors ⇒ ranking matches
cosine (‖a−b‖² = 2−2·cos on the unit sphere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pq_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m_subspaces: int = 8,
    k_codes: int = 16,
    sample_size: int = 131_072,
    iters: int = 10,
    seed: int = 42,
) -> list[list[list[float]]]:
    """Per-subspace Lloyd's k-means codebooks (driver-side numpy on a
    bounded sample).  Returns ``m`` codebooks of ``k`` sub-centroids."""
    import numpy as np

    from dlt_iceberg_spark.operators.similarity import _bounded_sample

    rows = _bounded_sample(corpus, vec_col, sample_size).collect()
    mat = np.array([r[0] for r in rows], dtype=np.float64)
    mat = mat / np.maximum(np.sqrt((mat * mat).sum(axis=1, keepdims=True)), 1e-12)
    dim = mat.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    sub = dim // m_subspaces
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m_subspaces):
        x = mat[:, j * sub : (j + 1) * sub]
        cent = x[rng.choice(len(x), size=min(k_codes, len(x)), replace=False)]
        for _ in range(iters):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cent)):
                members = x[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books.append(cent.tolist())
    return books


def pq_codebooks_fixed(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m_subspaces: int = 8,
    k_codes: int = 16,
) -> list[list[list[float]]]:
    """Deterministic, engine-replayable codebooks: the ``k_codes`` corpus
    rows with the smallest ``md5(id)`` (hash-ordered, so any engine picks
    the same rows), L2-normalized and sliced per subspace.

    No training — this exists so the PQ encode/ADC machinery can be
    hash-verified against a SQL oracle end-to-end (the oracle re-derives
    the same codebooks from the same hash order).  ``pq_train`` remains the
    production path; its accuracy is recall-pinned in pytest."""
    import numpy as np

    rows = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v"))
        .withColumn("_h", F.md5(F.col("_id").cast("string")))
        .orderBy("_h", "_id")
        .limit(k_codes)
        .collect()
    )
    mat = np.array([r["_v"] for r in rows], dtype=np.float64)
    mat = mat / np.maximum(np.sqrt((mat * mat).sum(axis=1, keepdims=True)), 1e-12)
    dim = mat.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    sub = dim // m_subspaces
    return [mat[:, j * sub : (j + 1) * sub].tolist() for j in range(m_subspaces)]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """Replace ``vec_col`` with ``pq_code: array<int>`` (length m);
    ``keep_vec=True`` keeps the vector column alongside the codes (the
    store_vectors index layout — one encode pass, never two).

    Vectorized: per Arrow batch, one distance matrix per subspace."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    books = [np.array(b, dtype=np.float64) for b in codebooks]
    sub = books[0].shape[1]

    def encode(v):
        mat = np.array(list(v), dtype=np.float64)
        mat = mat / np.maximum(np.sqrt((mat * mat).sum(axis=1, keepdims=True)), 1e-12)
        codes = np.empty((len(mat), len(books)), dtype=np.int64)
        for j, cb in enumerate(books):
            x = mat[:, j * sub : (j + 1) * sub]
            d2 = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series([row.tolist() for row in codes])

    encode.__annotations__ = {"v": pd.Series, "return": pd.Series}
    udf = pandas_udf("array<int>")(encode)
    coded = df.withColumn("pq_code", udf(F.col(vec_col).cast("array<double>")))
    return coded if keep_vec else coded.drop(vec_col)


def pq_topk(
    queries: DataFrame,
    corpus_codes: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    allowed: DataFrame | None = None,
    max_queries: int = 131_072,
) -> DataFrame:
    """ADC top-k: (query_id, neighbor_id, adc_dist, rank), smaller = closer.

    Queries collect to a driver-side lookup-table set (queries are few; the
    corpus is the big side and never moves), broadcast, and each corpus
    partition scores its rows with integer table lookups.  ADC is
    inherently query-bounded — each query carries an m×k float table — so
    query sets past ``max_queries`` refuse (``limit``-capped count, never
    a full scan) toward the shuffle-capable cosine paths
    (``ivf_topk_persisted`` / ``cosine_topk_bruteforce``), the same
    budget rule as ``all_pairs_cosine_blas``.

    ``allowed`` — optional (query_id, neighbor_id) pairs applied BEFORE
    the ranking window: IVF callers pass their per-query probe sets here
    so a neighbor from an unprobed list can never crowd a real candidate
    out of the top-k (filtering after the window would silently return
    fewer than k rows)."""
    import numpy as np
    import pandas as pd

    if queries.limit(max_queries + 1).count() > max_queries:
        raise ValueError(
            f"pq_topk: query set exceeds max_queries={max_queries}; ADC "
            "builds an m×k distance table per query on the driver — batch "
            "a query set this large through ivf_topk_persisted (shuffle "
            "fallback) or cosine_topk_bruteforce instead"
        )
    books = [np.array(b, dtype=np.float64) for b in codebooks]
    sub = books[0].shape[1]
    q_rows = queries.select(id_col, F.col(vec_col).cast("array<double>")).collect()
    qids = [r[0] for r in q_rows]
    qmat = np.array([r[1] for r in q_rows], dtype=np.float64)
    qmat = qmat / np.maximum(np.sqrt((qmat * qmat).sum(axis=1, keepdims=True)), 1e-12)
    # per query, per subspace: distance to every code -> (nq, m, k) tables
    tables = np.stack(
        [
            ((qmat[:, j * sub : (j + 1) * sub][:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            for j, cb in enumerate(books)
        ],
        axis=1,
    )
    bc = queries.sparkSession.sparkContext.broadcast((qids, tables))

    out_schema = "query_id long, neighbor_id long, adc_dist double"

    def score(batches):
        b_qids, b_tables = bc.value
        nq, m, _ = b_tables.shape
        for pdf in batches:
            codes = np.array(list(pdf["pq_code"]), dtype=np.int64)  # (n, m)
            # dists[q, n] = sum_j tables[q, j, codes[n, j]]
            dists = np.zeros((nq, len(codes)))
            for j in range(m):
                dists += b_tables[:, j, :][:, codes[:, j]]
            nid = pdf["neighbor_id"].to_numpy()
            frames = []
            for qi, qid in enumerate(b_qids):
                frames.append(
                    pd.DataFrame(
                        {"query_id": qid, "neighbor_id": nid, "adc_dist": dists[qi]}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    scored = (
        corpus_codes.select(F.col(id_col).alias("neighbor_id"), "pq_code")
        .mapInPandas(score, out_schema)
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    if allowed is not None:
        scored = scored.join(allowed, ["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    m_subspaces: int = 8,
    k_codes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ: coarse centroids bound WHERE to look, PQ codes bound WHAT is
    stored — the FAISS composite index for corpora that fit neither a full
    scan nor fp32 residence.

    Plan shape at 100 TB: the corpus is scanned once at build time
    (assignment + encode, both Arrow-batched map-side); queries probe
    ``nprobe`` lists so the scored fraction is ~nprobe/n_centroids of the
    table, and each scored row costs ``m`` one-byte table lookups instead
    of a float-vector dot product.  Training stays O(sample) on the driver
    (hash-gated, never ``limit``).

    Returns (query_id, neighbor_id, adc_dist, rank) within probed lists.
    """
    from dlt_iceberg_spark.operators.similarity import (
        _nearest_centroids,
        _train_spherical_kmeans,
    )

    centroids = _train_spherical_kmeans(corpus, vec_col, n_centroids, seed)
    assign1 = _nearest_centroids(centroids, 1)
    probe_n = _nearest_centroids(centroids, nprobe)

    books = pq_train(corpus, vec_col, m_subspaces, k_codes, seed=seed)
    codes = pq_encode(
        corpus.withColumn("_centroid", assign1(F.col(vec_col).cast("array<double>"))[0]),
        books,
        vec_col,
    )

    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(probe_n(F.col(vec_col).cast("array<double>"))).alias("_centroid"),
    )
    # keep only corpus rows in a probed list, then ADC-score the remainder;
    # the semi-join keys on the centroid id (broadcast — queries are few).
    # The per-query probe set gates the ranking INSIDE pq_topk so a
    # neighbor from an unprobed list never crowds a real candidate out of
    # the top-k (a post-window filter would return fewer than k rows).
    probed = codes.join(
        F.broadcast(probes.select("_centroid").distinct()), "_centroid"
    ).drop("_centroid")
    lists = codes.select(F.col(id_col).alias("neighbor_id"), "_centroid")
    allowed = probes.join(lists, "_centroid").select("query_id", "neighbor_id")
    return pq_topk(queries, probed, books, vec_col, id_col, k, allowed=allowed)


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8): int8-per-dimension compression with zero-UDF
# JVM scoring — the middle rung between fp32 residence and PQ codes.
# ---------------------------------------------------------------------------


def sq_train(corpus: DataFrame, vec_col: str = "embedding") -> tuple[list, list]:
    """Per-dimension ``[min, max]`` over the corpus — ONE exact aggregate
    pass with exactly TWO aggregate expressions at ANY dimension: lanes
    ``posexplode`` (a JVM generator fused into the scan stage) into a hash
    aggregate keyed by lane index, and map-side partials keep the shuffle
    at ``dim`` rows per partition.  The previous form built 2·dim scalar
    aggregates in one plan, which blows past whole-stage-codegen limits at
    production embedding dims (1024–4096) and inflates planning time; this
    plans in O(1) expressions with identical results.  No sampling, fully
    deterministic and therefore SQL-oracle-replayable (unlike k-means
    codebooks).  The dimension comes from a bounded 1-row peek; the driver
    collect is ``dim`` rows."""
    peek = corpus.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    if not peek:
        raise ValueError("sq_train on an empty corpus")
    dim = peek[0]["d"]
    lanes = corpus.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x")
    ).filter(F.col("i") < dim)
    rows = lanes.groupBy("i").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    ).collect()
    by = {r["i"]: (r["mn"], r["mx"]) for r in rows}
    return (
        [by.get(i, (None, None))[0] for i in range(dim)],
        [by.get(i, (None, None))[1] for i in range(dim)],
    )


def _sq_arrays(mins, maxs, levels: int):
    scales = [
        ((mx - mn) / (levels - 1)) if mx > mn else 1.0
        for mn, mx in zip(mins, maxs)
    ]
    mins_arr = F.array(*[F.lit(float(m)) for m in mins])
    scales_arr = F.array(*[F.lit(float(s)) for s in scales])
    return mins_arr, scales_arr


def sq_encode(
    df: DataFrame,
    mins: list,
    maxs: list,
    vec_col: str = "embedding",
    levels: int = 256,
    keep_vec: bool = False,
) -> DataFrame:
    """Add ``sq_code: array<int>``: ``code_i = floor((v_i − min_i)/scale_i
    + 0.5)`` clamped to ``[0, levels−1]``, ``scale_i = (max_i − min_i)/
    (levels−1)`` (zero-range dims encode 0).  At levels=256 a 64-dim fp32
    vector shrinks 4× and decode is two flops per lane.

    Entirely JVM — one ``transform`` over the array against broadcast
    literal min/scale arrays; no Python touches a row (whole-stage
    codegen keeps it in the scan pipeline)."""
    mins_arr, scales_arr = _sq_arrays(mins, maxs, levels)
    code = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x, i: F.least(
            F.greatest(
                F.floor((x - F.get(mins_arr, i)) / F.get(scales_arr, i) + F.lit(0.5)),
                F.lit(0),
            ),
            F.lit(levels - 1),
        ).cast("int"),
    )
    out = df.withColumn("sq_code", code)
    return out if keep_vec else out.drop(vec_col)


def sq_decoded(code_col, mins: list, maxs: list, levels: int = 256):
    """Column expression decoding ``sq_code`` back to ``array<double>``
    (``min_i + code_i · scale_i``) — JVM transform, used by scoring."""
    mins_arr, scales_arr = _sq_arrays(mins, maxs, levels)
    return F.transform(
        code_col,
        lambda c, i: F.get(mins_arr, i) + c.cast("double") * F.get(scales_arr, i),
    )


def sq_topk(
    queries: DataFrame,
    corpus_codes: DataFrame,
    mins: list,
    maxs: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    levels: int = 256,
) -> DataFrame:
    """Top-k by ``cosine(query, decode(code))`` — (query_id, neighbor_id,
    cosine, rank), the ``cosine_topk_bruteforce`` contract over the
    4×-compressed representation.

    Plan shape: queries broadcast onto the codes scan; decode + dot +
    norms are ``transform``/``zip_with``/``aggregate`` HOFs — the entire
    scoring pipeline is JVM whole-stage codegen, no UDF of any kind (PQ's
    ADC needs Arrow batches; SQ doesn't even need that).  At 100 TB the
    scan reads int8 lanes instead of fp32 — 4× fewer bytes — and scoring
    cost is unchanged flops on decoded lanes."""
    from pyspark.sql.window import Window as _W

    from dlt_iceberg_spark.operators.similarity import cosine

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus_codes.select(
        F.col(id_col).alias("neighbor_id"),
        sq_decoded(F.col("sq_code"), mins, maxs, levels).alias("cv"),
    )
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).withColumn("cosine", cosine(F.col("qv"), F.col("cv")))
    w = _W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )

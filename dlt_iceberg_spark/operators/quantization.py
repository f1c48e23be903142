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


def _residualize(mat, centroids):
    """numpy residuals: unit-normalized rows minus their nearest centroid
    (argmax dot — first max on ties, matching ``_nearest_centroids``'
    stable argsort).  Returns (residual matrix, assignment ids)."""
    import numpy as np

    C = np.array(centroids, dtype=np.float64)
    assign = np.argmax(mat @ C.T, axis=1)
    return mat - C[assign], assign


def _lloyd_books(mat, m_subspaces: int, k_codes: int, iters: int, rng):
    """Per-subspace Lloyd's k-means over a driver-side sample matrix —
    the shared trainer behind ``pq_train`` and ``opq_train``."""
    import numpy as np

    dim = mat.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    sub = dim // m_subspaces
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
        books.append(cent)
    return books


def _pq_reconstruct(mat, books):
    """numpy encode-then-decode against per-subspace codebooks."""
    import numpy as np

    sub = books[0].shape[1]
    out = np.empty_like(mat)
    for j, cb in enumerate(books):
        x = mat[:, j * sub : (j + 1) * sub]
        codes = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        out[:, j * sub : (j + 1) * sub] = cb[codes]
    return out


def pq_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m_subspaces: int = 8,
    k_codes: int = 16,
    sample_size: int = 131_072,
    iters: int = 10,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> list[list[list[float]]]:
    """Per-subspace Lloyd's k-means codebooks (driver-side numpy on a
    bounded sample).  Returns ``m`` codebooks of ``k`` sub-centroids.

    ``centroids=`` switches to RESIDUAL training (FAISS ``IVFPQ``
    semantics): each sample is replaced by ``x̂ − c(x̂)`` — its offset from
    its nearest coarse centroid — before the per-subspace k-means.
    Residuals concentrate around the origin regardless of which cluster a
    vector lives in, so the same code budget quantizes a far tighter
    distribution than raw vectors whose spread is dominated by the
    BETWEEN-cluster structure the coarse level already captured."""
    import numpy as np

    from dlt_iceberg_spark.operators.similarity import _bounded_sample

    rows = _bounded_sample(corpus, vec_col, sample_size).collect()
    mat = np.array([r[0] for r in rows], dtype=np.float64)
    mat = mat / np.maximum(np.sqrt((mat * mat).sum(axis=1, keepdims=True)), 1e-12)
    if centroids is not None:
        mat, _ = _residualize(mat, centroids)
    rng = np.random.default_rng(seed)
    return [b.tolist() for b in _lloyd_books(mat, m_subspaces, k_codes, iters, rng)]


def opq_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m_subspaces: int = 8,
    k_codes: int = 16,
    sample_size: int = 131_072,
    iters: int = 10,
    opq_iters: int = 8,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """OPQ (Ge et al., CVPR 2013 — FAISS ``OPQMatrix``): learn an
    ORTHOGONAL rotation ``R`` that minimizes PQ reconstruction error,
    then train the codebooks in the rotated frame.  Returns
    ``(rotation, codebooks)``; encode/score apply ``x → x·R`` before the
    per-subspace argmin (rotation is applied AFTER residualization when
    ``centroids=`` is given — the coarse frame stays raw so assignments
    and probe semantics never change, and orthogonality preserves L2 so
    ADC distances still approximate ‖q̂ − x̂‖²).

    Why: plain PQ quantizes each dim-slice independently, so correlated /
    unevenly-spread dimensions waste the code budget; the alternating
    solve (fix R → Lloyd codebooks; fix codes → orthogonal Procrustes
    ``R = U·Vᵀ`` from ``SVD(XᵀY)``) re-balances variance across
    subspaces.  All driver-side numpy on the same bounded sample as
    ``pq_train`` — O(sample·dim²) per iteration, never O(corpus)."""
    import numpy as np

    from dlt_iceberg_spark.operators.similarity import _bounded_sample

    rows = _bounded_sample(corpus, vec_col, sample_size).collect()
    mat = np.array([r[0] for r in rows], dtype=np.float64)
    mat = mat / np.maximum(np.sqrt((mat * mat).sum(axis=1, keepdims=True)), 1e-12)
    if centroids is not None:
        mat, _ = _residualize(mat, centroids)
    dim = mat.shape[1]
    rng = np.random.default_rng(seed)
    R = np.eye(dim)
    books = None
    for _ in range(opq_iters):
        X = mat @ R
        books = _lloyd_books(X, m_subspaces, k_codes, iters, rng)
        Y = _pq_reconstruct(X, books)
        # orthogonal Procrustes: min_R ‖mat·R − Y‖_F over orthogonal R
        U, _, Vt = np.linalg.svd(mat.T @ Y)
        R = U @ Vt
    books = _lloyd_books(mat @ R, m_subspaces, k_codes, iters, rng)
    return R.tolist(), [b.tolist() for b in books]


def pq_codebooks_fixed(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m_subspaces: int = 8,
    k_codes: int = 16,
    centroids: list[list[float]] | None = None,
) -> list[list[list[float]]]:
    """Deterministic, engine-replayable codebooks: the ``k_codes`` corpus
    rows with the smallest ``md5(id)`` (hash-ordered, so any engine picks
    the same rows), L2-normalized and sliced per subspace.

    ``centroids=`` makes them RESIDUAL codebooks — each picked row is
    replaced by its offset from its nearest coarse centroid before
    slicing, the deterministic analogue of ``pq_train(centroids=)`` so
    the residual encode/ADC machinery is SQL-oracle-replayable too.

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
    if centroids is not None:
        mat, _ = _residualize(mat, centroids)
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
    centroids: list[list[float]] | None = None,
    centroid_col: str = "centroid",
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """Replace ``vec_col`` with ``pq_code: array<int>`` (length m);
    ``keep_vec=True`` keeps the vector column alongside the codes (the
    store_vectors index layout — one encode pass, never two).

    ``centroids=`` encodes RESIDUALS (FAISS ``IVFPQ``): each row's
    ``centroid_col`` (its coarse list id, already computed by the IVF
    assignment — no second argmax) picks the centroid to subtract from
    the unit-normalized vector before the per-subspace argmin, and the
    ``codebooks`` must be residual-trained.  Still one Arrow-batched
    pass; the subtraction is a single broadcast numpy gather.

    ``rotation=`` applies the OPQ orthogonal transform (one batch matmul)
    after normalization/residualization — the ``codebooks`` must then be
    the rotated-frame books :func:`opq_train` returns.

    Vectorized: per Arrow batch, one distance matrix per subspace."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    books = [np.array(b, dtype=np.float64) for b in codebooks]
    sub = books[0].shape[1]
    C = None if centroids is None else np.array(centroids, dtype=np.float64)
    R = None if rotation is None else np.array(rotation, dtype=np.float64)

    def _codes_for(mat):
        if R is not None:
            mat = mat @ R
        codes = np.empty((len(mat), len(books)), dtype=np.int64)
        for j, cb in enumerate(books):
            x = mat[:, j * sub : (j + 1) * sub]
            d2 = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series([row.tolist() for row in codes])

    def encode(v):
        mat = np.array(list(v), dtype=np.float64)
        mat = mat / np.maximum(np.sqrt((mat * mat).sum(axis=1, keepdims=True)), 1e-12)
        return _codes_for(mat)

    def encode_res(v, cent):
        mat = np.array(list(v), dtype=np.float64)
        mat = mat / np.maximum(np.sqrt((mat * mat).sum(axis=1, keepdims=True)), 1e-12)
        return _codes_for(mat - C[cent.to_numpy(dtype=np.int64)])

    if C is None:
        encode.__annotations__ = {"v": pd.Series, "return": pd.Series}
        udf = pandas_udf("array<int>")(encode)
        args = (F.col(vec_col).cast("array<double>"),)
    else:
        encode_res.__annotations__ = {
            "v": pd.Series, "cent": pd.Series, "return": pd.Series
        }
        udf = pandas_udf("array<int>")(encode_res)
        args = (F.col(vec_col).cast("array<double>"), F.col(centroid_col))
    coded = df.withColumn("pq_code", udf(*args))
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
    centroids: list[list[float]] | None = None,
    centroid_col: str = "centroid",
    probe_sets: dict | None = None,
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """ADC top-k: (query_id, neighbor_id, adc_dist, rank), smaller = closer.

    ``rotation=`` scores OPQ codes: the lookup tables build over the
    ROTATED query (or query-residual) vectors — orthogonality preserves
    L2, so the distances keep their ‖q̂ − x̂‖² meaning.

    Queries collect to a driver-side lookup-table set (queries are few; the
    corpus is the big side and never moves), broadcast, and each corpus
    partition scores its rows with integer table lookups.  ADC is
    inherently query-bounded — each query carries an m×k float table — so
    query sets past ``max_queries`` refuse (``limit``-capped count, never
    a full scan) toward the shuffle-capable cosine paths
    (``ivf_topk_persisted`` / ``cosine_topk_bruteforce``), the same
    budget rule as ``all_pairs_cosine_blas``.

    ``centroids=`` scores RESIDUAL codes (FAISS ``IVFPQ``): a code now
    means ``x̂ ≈ c_L + codeword``, so the lookup table depends on the
    (query, list) pair — ``T[q, j, k] = ‖(q̂ − c_L)_j − cb_j[k]‖²``.
    Instead of broadcasting |Q|·nprobe tables, the executors get the raw
    query matrix + centroid matrix and build each list's tables LAZILY
    per Arrow batch: the index layout stores one inverted list per
    partition, so a batch is (nearly always) single-list and the table
    build amortizes over the whole batch.  ``corpus_codes`` must carry
    ``centroid_col``.  Broadcast stays O(|Q|·dim); per-batch transient
    memory stays O(|Q|·m·k).

    ``probe_sets=`` ({centroid id → iterable of query ids that probed it})
    moves IVF probe gating INSIDE the kernel — the scale path the
    persisted probes use: a batch scores ONLY the queries that probed its
    list (a query pays flops for nprobe lists, never all of them) and
    emits ONLY each scoring query's local top-(k+1) rows (deterministic —
    rows pre-sorted by neighbor id, stable argsort on distance — so the
    global window sees every global-top-k candidate; +1 absorbs the at-
    most-one self pair filtered later).  Executor output shrinks from
    |batch|·|Q| rows to (k+1)·|probing queries| per batch, which is what
    keeps the post-ADC shuffle bounded by |Q|·nprobe·k instead of
    |Q|·(probed corpus rows).  Requires ``centroid_col`` on
    ``corpus_codes``; mutually exclusive with ``allowed``.

    ``allowed`` — optional (query_id, neighbor_id) pairs applied BEFORE
    the ranking window: per-call IVF composition over arbitrary pair sets
    (filtering after the window would silently return fewer than k
    rows).  Prefer ``probe_sets`` when the pairs are probe-structured."""
    import numpy as np
    import pandas as pd

    if allowed is not None and probe_sets is not None:
        raise ValueError("pass either allowed or probe_sets, not both")
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
    probe_pos = None
    if probe_sets is not None:
        pos = {q: i for i, q in enumerate(qids)}
        probe_pos = {
            int(c): np.array(sorted(pos[q] for q in qs if q in pos), dtype=np.int64)
            for c, qs in probe_sets.items()
        }
    R = None if rotation is None else np.array(rotation, dtype=np.float64)

    def _tables_for(q):
        # per query, per subspace: distance to every code -> (nq, m, k);
        # OPQ rotates into the codebooks' frame first
        if R is not None:
            q = q @ R
        return np.stack(
            [
                ((q[:, j * sub : (j + 1) * sub][:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
                for j, cb in enumerate(books)
            ],
            axis=1,
        )

    out_schema = "query_id long, neighbor_id long, adc_dist double"

    def _emit(b_qids, nid, dists):
        frames = []
        for qi, qid in enumerate(b_qids):
            frames.append(
                pd.DataFrame(
                    {"query_id": qid, "neighbor_id": nid, "adc_dist": dists[qi]}
                )
            )
        return pd.concat(frames, ignore_index=True)

    def _emit_topk(sel_qids, nid, dists, kk):
        # rows arrive pre-sorted by neighbor id, so a STABLE argsort on
        # distance yields (dist asc, neighbor_id asc) — the exact global
        # tie rule — making the local cut deterministic and lossless
        frames = []
        for qi, qid in enumerate(sel_qids):
            order = np.argsort(dists[qi], kind="stable")[:kk]
            frames.append(
                pd.DataFrame(
                    {"query_id": qid, "neighbor_id": nid[order],
                     "adc_dist": dists[qi][order]}
                )
            )
        if not frames:
            return pd.DataFrame(
                {"query_id": np.array([], dtype=np.int64),
                 "neighbor_id": np.array([], dtype=np.int64),
                 "adc_dist": np.array([], dtype=np.float64)}
            )
        return pd.concat(frames, ignore_index=True)

    def _lut_sum(b_tables, codes):
        # dists[q, n] = sum_j tables[q, j, codes[n, j]]
        dists = np.zeros((b_tables.shape[0], len(codes)))
        for j in range(b_tables.shape[1]):
            dists += b_tables[:, j, :][:, codes[:, j]]
        return dists

    residual = centroids is not None
    C = None if not residual else np.array(centroids, dtype=np.float64)

    if probe_pos is not None:
        # probe-gated kernel: per batch, per list — score probing queries
        # only, emit their local top-(k+1)
        payload = (qids, qmat if residual else _tables_for(qmat), C, probe_pos)
        bc = queries.sparkSession.sparkContext.broadcast(payload)
        kk = int(k) + 1

        def score(batches):
            b_qids, b_q, b_C, b_probe = bc.value
            ids_arr = np.asarray(b_qids)
            for pdf in batches:
                nid_raw = pdf["neighbor_id"].to_numpy()
                order_n = np.argsort(nid_raw, kind="stable")
                nid = nid_raw[order_n]
                codes = np.array(list(pdf["pq_code"]), dtype=np.int64)[order_n]
                cents = pdf["_pq_centroid"].to_numpy(dtype=np.int64)[order_n]
                out = []
                for c in np.unique(cents):
                    qsel = b_probe.get(int(c))
                    if qsel is None or not len(qsel):
                        continue
                    rows = cents == c
                    if residual:
                        t = _tables_for(b_q[qsel] - b_C[int(c)])
                    else:
                        t = b_q[qsel]
                    out.append(
                        _emit_topk(
                            ids_arr[qsel], nid[rows],
                            _lut_sum(t, codes[rows]), kk,
                        )
                    )
                yield (
                    pd.concat(out, ignore_index=True)
                    if out
                    else _emit_topk([], nid[:0], np.zeros((0, 0)), kk)
                )

        cols = corpus_codes.select(
            F.col(id_col).alias("neighbor_id"),
            "pq_code",
            F.col(centroid_col).cast("int").alias("_pq_centroid"),
        )
    elif not residual:
        bc = queries.sparkSession.sparkContext.broadcast((qids, _tables_for(qmat)))

        def score(batches):
            b_qids, b_tables = bc.value
            for pdf in batches:
                codes = np.array(list(pdf["pq_code"]), dtype=np.int64)  # (n, m)
                yield _emit(b_qids, pdf["neighbor_id"].to_numpy(),
                            _lut_sum(b_tables, codes))

        cols = corpus_codes.select(F.col(id_col).alias("neighbor_id"), "pq_code")
    else:
        bc = queries.sparkSession.sparkContext.broadcast((qids, qmat, C))

        def score(batches):
            b_qids, b_qmat, b_C = bc.value
            for pdf in batches:
                codes = np.array(list(pdf["pq_code"]), dtype=np.int64)
                cents = pdf["_pq_centroid"].to_numpy(dtype=np.int64)
                dists = np.zeros((len(b_qids), len(codes)))
                for c in np.unique(cents):
                    rows = cents == c
                    # per-list tables against the queries' residuals to THIS
                    # list's centroid — one build per (batch, list)
                    t = _tables_for(b_qmat - b_C[int(c)])
                    dists[:, rows] = _lut_sum(t, codes[rows])
                yield _emit(b_qids, pdf["neighbor_id"].to_numpy(), dists)

        cols = corpus_codes.select(
            F.col(id_col).alias("neighbor_id"),
            "pq_code",
            F.col(centroid_col).cast("int").alias("_pq_centroid"),
        )

    scored = (
        cols.mapInPandas(score, out_schema)
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
    residual: bool = False,
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

    ``residual=True`` trains/encodes/scores RESIDUALS (x̂ − its coarse
    centroid) — the FAISS ``IVFPQ`` default, and strictly the better use
    of the code budget once the coarse level captures real cluster
    structure: raw-vector codebooks re-spend codes on the between-cluster
    spread the centroids already explain.  Recall-vs-raw is pinned in
    pytest; plan shape is unchanged (the per-list lookup tables build
    executor-side per batch).

    Returns (query_id, neighbor_id, adc_dist, rank) within probed lists.
    """
    from dlt_iceberg_spark.operators.similarity import (
        _nearest_centroids,
        _train_spherical_kmeans,
    )

    centroids = _train_spherical_kmeans(corpus, vec_col, n_centroids, seed)
    assign1 = _nearest_centroids(centroids, 1)
    probe_n = _nearest_centroids(centroids, nprobe)

    books = pq_train(
        corpus, vec_col, m_subspaces, k_codes, seed=seed,
        centroids=centroids if residual else None,
    )
    codes = pq_encode(
        corpus.withColumn("_centroid", assign1(F.col(vec_col).cast("array<double>"))[0]),
        books,
        vec_col,
        centroids=centroids if residual else None,
        centroid_col="_centroid",
    )

    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(probe_n(F.col(vec_col).cast("array<double>"))).alias("_centroid"),
    )
    # keep only corpus rows in a probed list, then ADC-score the remainder;
    # the semi-join keys on the centroid id (broadcast — queries are few).
    # The per-query probe sets gate scoring INSIDE the pq_topk kernel so a
    # neighbor from an unprobed list never crowds a real candidate out of
    # the top-k AND a batch never spends flops on queries that didn't
    # probe its list.
    probe_sets = {
        r["_centroid"]: r["qs"]
        for r in probes.groupBy("_centroid")
        .agg(F.collect_list("query_id").alias("qs"))
        .collect()
    }
    probed = codes.join(
        F.broadcast(probes.select("_centroid").distinct()), "_centroid"
    )
    return pq_topk(
        queries, probed, books, vec_col, id_col, k, probe_sets=probe_sets,
        centroids=centroids if residual else None, centroid_col="_centroid",
    )


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

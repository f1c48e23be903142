"""Similarity search over embedding columns (`array<float>`).

Three tiers, trading exactness for scale:

- ``cosine_topk_bruteforce``: exact; broadcast the query set against the
  corpus (linear scan).  Right answer when |queries| is small — at 100 TB
  the corpus side stays partition-parallel and nothing shuffles.
- ``hyperplane_lsh_topk``: random-hyperplane signatures bucket the corpus;
  only same-bucket candidates are scored.  Sub-linear candidate sets; the
  bucket join is an equi-join (shuffle keyed by signature), probing multiple
  rotated signatures recovers recall.
- ``ivf_topk``: IVF — KMeans centroids partition the corpus; queries probe
  the ``nprobe`` nearest centroids only.  The centroid assignment is a
  broadcast join (centroid count ≪ corpus).

All dot products are JVM-side ``zip_with``/``aggregate`` folds over
``array<double>`` — no Python in the scoring loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dlt_iceberg_spark.operators.util import fan_out


def dot(a, b) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def l2_norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k: broadcast(queries) × corpus scan → per-query window.

    Output: (query_id, neighbor_id, cosine, rank)."""
    q = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = _as_double(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).withColumn(
        "cosine", cosine(F.col("qv"), F.col("cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk_blas(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    max_rows: int = 500_000,
) -> DataFrame:
    """Exact top-k with the same contract and tie-breaks as
    :func:`cosine_topk_bruteforce` — ``(query_id, neighbor_id, cosine,
    rank)``, ranked by (cosine desc, neighbor_id asc), self-pairs
    excluded — but scored as one numpy matmul per Arrow batch against the
    broadcast normalized corpus matrix instead of a |Q|·|C| pair
    explosion through a window sort.  The expression form shuffles and
    sorts every pair (the dominant cost); here only k·|Q| rows ever leave
    the executors.  Corpora past broadcast budget (``max_rows``) must go
    through :func:`ivf_topk`; this is the documented drop-to-Pandas-UDF
    case (same rule as :func:`all_pairs_cosine_blas`)."""
    import numpy as np
    import pandas as pd

    n = corpus.count()
    if n > max_rows:
        raise ValueError(
            f"cosine_topk_blas: corpus has {n} rows > max_rows={max_rows}; "
            "the corpus matrix is broadcast — use ivf_topk at this scale"
        )
    rows = corpus.select(id_col, F.col(vec_col).cast("array<double>")).collect()
    c_ids = np.array([r[0] for r in rows], dtype=np.int64)
    c_mat = np.array([r[1] for r in rows], dtype=np.float64)
    c_mat = c_mat / np.sqrt((c_mat * c_mat).sum(axis=1, keepdims=True))
    bc = corpus.sparkSession.sparkContext.broadcast((c_ids, c_mat))
    kk = int(k)

    def score(batches):
        ids, mat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.array(list(pdf["qv"]), dtype=np.float64)
            q = q / np.sqrt((q * q).sum(axis=1, keepdims=True))
            sims = q @ mat.T
            qids = pdf["query_id"].astype("int64").to_numpy()
            oq, on, oc, orr = [], [], [], []
            for r in range(sims.shape[0]):
                keep = np.nonzero(ids != qids[r])[0]
                if not len(keep):
                    continue
                # full lexsort keeps boundary TIES bit-identical to the
                # window form (argpartition could drop an equal-cosine,
                # smaller-id neighbor at the kth slot)
                order = keep[np.lexsort((ids[keep], -sims[r, keep]))][:kk]
                for rank, j in enumerate(order, start=1):
                    oq.append(qids[r])
                    on.append(int(ids[j]))
                    oc.append(float(sims[r, j]))
                    orr.append(rank)
            yield pd.DataFrame(
                {"query_id": oq, "neighbor_id": on, "cosine": oc, "rank": orr}
            )

    src = fan_out(
        _as_double(queries, vec_col).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    return src.mapInPandas(score, "query_id long, neighbor_id long, cosine double, rank int")


def knn_classify(
    queries: DataFrame,
    labeled: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """k-NN label propagation: tag each query vector with the majority
    label of its ``k`` nearest labeled neighbors (cosine) — the standard
    way a small hand-labeled seed set fans out over an unlabeled corpus
    (quality tiers, topic buckets) before training a real classifier.

    Composes :func:`cosine_topk_blas` (broadcast labeled matrix + one
    matmul per Arrow batch; same tie-breaks as the expression form — swap
    in :func:`ivf_topk` past broadcast budget) with a vote aggregate; the
    label join is keyed on neighbor id over k·|queries| rows, never
    corpus-sized.  Ties break by (votes desc, best cosine desc, label
    asc) — deterministic and mirrored in the SQL oracle.

    Output: ``(query_id, predicted, votes, best_cosine)``.
    """
    topk = cosine_topk_blas(queries, labeled, vec_col, id_col, k)
    lab = labeled.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("nl")
    )
    votes = (
        topk.join(lab, "neighbor_id")
        .groupBy("query_id", "nl")
        .agg(F.count("*").alias("votes"), F.max("cosine").alias("best_cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), F.desc("best_cosine"), F.asc("nl")
    )
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("nl").alias("predicted"), "votes", "best_cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side tiny constant)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def hyperplane_signature(vec_col: str, planes: list[list[float]]) -> Column:
    """Bit-string signature: sign of <v, plane_i> per plane (JVM fold)."""
    bits = [
        F.when(dot(F.col(vec_col), F.array(*[F.lit(x) for x in p])) >= 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for p in planes
    ]
    return F.concat(*bits)


def hyperplane_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: equi-join on any of ``n_tables`` independent
    signatures, score candidates only.  Output as bruteforce (rank within
    retrieved candidates)."""
    tables = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    q = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = fan_out(
        _as_double(corpus, vec_col).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        )
    )
    for t, planes in enumerate(tables):
        q = q.withColumn(f"sig{t}", hyperplane_signature("qv", planes))
        c = c.withColumn(f"sig{t}", hyperplane_signature("cv", planes))
    cands = None
    for t in range(n_tables):
        qt = q.select("query_id", "qv", F.col(f"sig{t}").alias("sig"))
        ct = c.select("neighbor_id", "cv", F.col(f"sig{t}").alias("sig"))
        hit = qt.join(ct, "sig").filter(F.col("query_id") != F.col("neighbor_id")).select(
            "query_id", "neighbor_id", "qv", "cv"
        )
        cands = hit if cands is None else cands.unionByName(hit)
    scored = cands.dropDuplicates(["query_id", "neighbor_id"]).withColumn(
        "cosine", cosine(F.col("qv"), F.col("cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _bounded_sample(df: DataFrame, vec_col: str, sample_size: int) -> DataFrame:
    """Deterministic hash-gated sample of up to ``sample_size`` vectors.

    ``limit(n)`` takes the first parquet rows in scan order — at scale that
    is ONE file's data distribution, so centroids/codebooks train on a
    biased slice.  Instead every row gets a stable per-row hash rank and the
    global smallest ``sample_size`` survive: order-independent, seed-free,
    and representative regardless of file layout.  Cost is one pass + a
    top-n (TakeOrdered — no full sort), still O(corpus scan) like any
    sampling, with O(sample) driver memory.
    """
    ranked = df.select(
        F.xxhash64(F.col(vec_col).cast("array<double>").cast("string")).alias("_rk"),
        F.col(vec_col).cast("array<double>").alias(vec_col),
    )
    return ranked.orderBy("_rk").limit(sample_size).select(vec_col)


def _train_spherical_kmeans(
    corpus: DataFrame,
    vec_col: str,
    n_centroids: int,
    seed: int,
    sample_size: int = 131_072,
    iters: int = 10,
) -> list[list[float]]:
    """Train unit-norm centroids on a bounded sample, driver-side numpy.

    Training cost is O(sample), never O(corpus) — the FAISS recipe: at
    100 TB the sample is still ≤ ``sample_size`` rows (a few MB), while the
    expensive parts (assignment, scoring) stay distributed.  Deterministic
    per seed; an iterative MLlib fit would instead launch ``iters`` full
    corpus scans."""
    import numpy as np

    rows = _bounded_sample(corpus, vec_col, sample_size).collect()
    mat = np.array([r[0] for r in rows], dtype=np.float64)
    mat = mat / np.maximum(np.sqrt((mat * mat).sum(axis=1, keepdims=True)), 1e-12)
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    for _ in range(iters):
        assign = (mat @ cent.T).argmax(axis=1)
        for j in range(len(cent)):
            members = mat[assign == j]
            if len(members):
                cent[j] = members.mean(axis=0)
        cent = cent / np.maximum(np.sqrt((cent * cent).sum(axis=1, keepdims=True)), 1e-12)
    return cent.tolist()


def _nearest_centroids(centroids: list[list[float]], n: int):
    """Vectorized top-n centroid ids per vector: Arrow-batched pandas UDF
    doing one float64 BLAS matmul per batch against the (tiny) centroid
    matrix shipped in the closure — the same kernel FAISS uses for coarse
    quantization; a literal-expression formulation is interpreted per row
    and compiles a 1000+-node tree."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ct = np.array(centroids, dtype=np.float64).T  # dim × n_centroids

    def topn(v):
        mat = np.array(list(v), dtype=np.float64)
        mat = mat / np.maximum(np.sqrt((mat * mat).sum(axis=1, keepdims=True)), 1e-12)
        sims = mat @ ct
        idx = np.argsort(-sims, kind="stable", axis=1)[:, :n]
        return pd.Series([row.tolist() for row in idx])

    # real annotation objects: `from __future__ import annotations` would
    # stringify hints that pandas_udf can't resolve from a nested scope
    topn.__annotations__ = {"v": pd.Series, "return": pd.Series}
    # nondeterministic: when the assignment feeds a join key, the planner
    # infers IsNotNull(key) and pushes it below any exchange, re-evaluating
    # the UDF on the full corpus a second time (one extra BLAS pass + Arrow
    # boundary crossing per row).  The function is pure, so the flag cannot
    # change results — it only stops the optimizer duplicating the eval.
    return pandas_udf("array<int>")(topn).asNondeterministic()


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF: spherical-kmeans centroids partition the corpus into inverted
    lists; queries probe the ``nprobe`` nearest lists only.

    Centroids are trained on a bounded sample (see
    :func:`_train_spherical_kmeans`) and enter the plan as literals, so both
    assignment and probing are map-side expressions; the only shuffle is the
    centroid-keyed equi-join, and the query side broadcasts.  The inverted
    lists are realized as a centroid-id column (the 100 TB layout would
    bucket/sort data files by it for partition pruning)."""
    centroids = _train_spherical_kmeans(corpus, vec_col, n_centroids, seed)
    assign1 = _nearest_centroids(centroids, 1)
    probe_n = _nearest_centroids(centroids, nprobe)
    # project to (id, vec) and fan out BEFORE the double cast: the
    # round-robin exchange then carries the narrow float32 lanes (half the
    # bytes of array<double>) and no unused corpus columns.
    assigned = (
        fan_out(
            corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
        )
        .select("neighbor_id", F.col("cv").cast("array<double>").alias("cv"))
        .select("neighbor_id", "cv", assign1(F.col("cv"))[0].alias("centroid"))
    )
    probes = (
        _as_double(queries, vec_col)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.explode(probe_n(F.col(vec_col))).alias("centroid"),
        )
    )
    scored = assigned.join(F.broadcast(probes), "centroid").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).withColumn("cosine", cosine(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def all_pairs_cosine_blas(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    max_rows: int = 500_000,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via broadcast + BLAS matmul.

    The corpus matrix is normalized once, broadcast to executors (a 5000×64
    corpus is ~2.5 MB — same budget rule as a broadcast join), and each
    partition multiplies its rows against it with numpy float64 BLAS inside
    Arrow-batched ``mapInPandas``.  This is the documented "drop to Pandas
    UDF" case: a per-pair expression fold is orders of magnitude slower than
    a matmul for brute-force scoring.  Corpora past broadcast budget go
    through :func:`embedding_near_duplicates` (LSH) instead.

    Output: (a, b, cosine) with a < b.
    """
    import numpy as np
    import pandas as pd

    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"all_pairs_cosine_blas: corpus has {n} rows > max_rows={max_rows}; "
            "the corpus matrix is collected to the driver and broadcast, so this "
            "kernel is for broadcast-budget corpora only — use "
            "all_pairs_cosine_blocked (exact, distributed) or "
            "embedding_near_duplicates (LSH) instead"
        )
    rows = df.select(id_col, F.col(vec_col).cast("array<double>")).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat = mat / np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    bc = df.sparkSession.sparkContext.broadcast((ids, mat))

    out_schema = "a long, b long, cosine double"

    def score(batches):
        b_ids, b_mat = bc.value
        pos = {int(v): i for i, v in enumerate(b_ids)}
        for pdf in batches:
            q = np.array(list(pdf["v"]), dtype=np.float64)
            q = q / np.sqrt((q * q).sum(axis=1, keepdims=True))
            sims = q @ b_mat.T
            qa, qb, qc = [], [], []
            for r, qid in enumerate(pdf["qid"].astype("int64")):
                mask = (sims[r] >= threshold) & (b_ids > qid)
                for j in np.nonzero(mask)[0]:
                    qa.append(qid)
                    qb.append(int(b_ids[j]))
                    qc.append(float(sims[r, j]))
            yield pd.DataFrame({"a": qa, "b": qb, "cosine": qc})

    src = fan_out(
        df.select(F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("v"))
    )
    return src.mapInPandas(score, out_schema)


def all_pairs_cosine_blocked(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    block_rows: int = 4096,
    n_rows: int | None = None,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold, fully distributed (no driver
    collect): block-matrix self-join + per-block-pair BLAS.

    Rows hash into ``ceil(n / block_rows)`` blocks; every unordered block
    pair (i ≤ j) becomes one task that multiplies the two block matrices
    with numpy float64 inside Arrow-batched ``applyInPandas``.  Work is the
    same O(n²) every exact all-pairs algorithm pays, but it is spread over
    B(B+1)/2 independent tasks with O(block_rows²) memory each — the
    executor never sees more than two blocks, the driver never sees any
    vectors.  This is the exact-kernel tier between the broadcast BLAS
    kernel (collects the corpus; ≤ broadcast budget) and LSH
    (:func:`embedding_near_duplicates`, sub-quadratic but approximate):
    right for corpora up to ~10M rows where the answer must be exact.

    Output: (a, b, cosine) with a < b.
    """
    import math

    import numpy as np
    import pandas as pd

    # n sizes the block grid only.  count() on an input behind an opaque
    # map stage (e.g. image decode) re-runs that stage just to count —
    # callers who know the row count (or can count a cheap upstream
    # projection) pass ``n_rows`` and skip the extra pass.
    n = df.count() if n_rows is None else int(n_rows)
    n_blocks = max(1, math.ceil(n / block_rows))
    src = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    ).withColumn("_blk", F.pmod(F.xxhash64(F.col("_id").cast("string")), F.lit(n_blocks)).cast("int"))
    blocks = src.groupBy("_blk").agg(
        F.collect_list(F.struct("_id", "_v")).alias("_items")
    )
    left = blocks.select(
        F.col("_blk").alias("_bl"), F.col("_items").alias("_li")
    )
    right = blocks.select(
        F.col("_blk").alias("_br"), F.col("_items").alias("_ri")
    )
    pairs = left.join(right, F.col("_bl") <= F.col("_br"))

    out_schema = "a long, b long, cosine double"

    def score(batches):
        for pdf in batches:
            qa, qb, qc = [], [], []
            for _, row in pdf.iterrows():
                li, ri = row["_li"], row["_ri"]
                same = row["_bl"] == row["_br"]
                lid = np.array([it["_id"] for it in li], dtype=np.int64)
                rid = np.array([it["_id"] for it in ri], dtype=np.int64)
                lm = np.array([it["_v"] for it in li], dtype=np.float64)
                rm = np.array([it["_v"] for it in ri], dtype=np.float64)
                lm = lm / np.sqrt((lm * lm).sum(axis=1, keepdims=True))
                rm = rm / np.sqrt((rm * rm).sum(axis=1, keepdims=True))
                sims = lm @ rm.T
                mask = sims >= threshold
                if same:
                    # a < b inside one block: keep strictly-upper by id
                    mask &= lid[:, None] < rid[None, :]
                else:
                    mask &= lid[:, None] != rid[None, :]
                for i, j in zip(*np.nonzero(mask)):
                    x, y = int(lid[i]), int(rid[j])
                    qa.append(min(x, y))
                    qb.append(max(x, y))
                    qc.append(float(sims[i, j]))
            yield pd.DataFrame({"a": qa, "b": qb, "cosine": qc})

    return (
        pairs.mapInPandas(score, out_schema)
        .dropDuplicates(["a", "b"])
    )


def embedding_near_duplicates(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (a < b, cosine ≥ threshold) via the
    LSH candidate path — the embedding analogue of MinHash dedup."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    topk = hyperplane_lsh_topk(
        df, df, dim, vec_col, id_col, k=1_000_000, n_planes=n_planes, n_tables=n_tables, seed=seed
    )
    return (
        topk.filter((F.col("cosine") >= threshold) & (F.col("query_id") < F.col("neighbor_id")))
        .select(
            F.col("query_id").alias("a"), F.col("neighbor_id").alias("b"), F.col("cosine")
        )
    )


def fixed_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
) -> list[list[float]]:
    """Deterministic, engine-replayable centroids: the ``n_centroids``
    corpus rows with the smallest ``md5(id)``, unit-normalized.

    No training — the SemDeDup gate query uses these so cluster assignment
    (and therefore the whole dedup output) can be hash-verified against a
    SQL oracle that derives the identical centroid set from the identical
    hash order.  ``_train_spherical_kmeans`` remains the production path;
    its accuracy contract lives in pytest."""
    import numpy as np

    rows = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v"))
        .withColumn("_h", F.md5(F.col("_id").cast("string")))
        .orderBy("_h", "_id")
        .limit(n_centroids)
        .collect()
    )
    mat = np.array([r["_v"] for r in rows], dtype=np.float64)
    mat = mat / np.maximum(np.sqrt((mat * mat).sum(axis=1, keepdims=True)), 1e-12)
    return mat.tolist()


def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int | None = 16,
    threshold: float = 0.9,
    seed: int = 42,
    block_rows: int = 1024,
    max_cluster_rows: int = 4096,
    target_cluster_rows: int = 1024,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the
    embedding space, then search for near-duplicates only WITHIN clusters —
    the standard way to make embedding dedup near-linear on web-scale
    training corpora (the paper prunes LAION/C4 with exactly this shape).

    Scale anatomy:
    - ``n_clusters=None`` auto-scales the cluster count with the corpus
      (≈ corpus / ``target_cluster_rows``, clamped to [16, 65536]) — the
      paper uses tens of thousands of clusters at web scale, and a fixed
      small count would make each cluster O(corpus);
    - centroids train on a bounded sample (:func:`_train_spherical_kmeans`,
      O(sample) driver cost, FAISS recipe);
    - assignment is a map-side Arrow-batched matmul against broadcast
      centroids — no shuffle;
    - clusters at most ``max_cluster_rows`` big group-shuffle once and run a
      per-cluster blocked matmul (``block_rows`` rows at a time, so executor
      memory is O(block × cluster));
    - clusters BIGGER than ``max_cluster_rows`` (skewed centroids, or a
      degenerate corpus where k-means collapses) never materialize whole:
      they split into hash blocks of ≤ ``max_cluster_rows / 2`` rows and
      every within-cluster block pair scores independently (the
      :func:`all_pairs_cosine_blocked` mechanics, keyed by cluster), so
      per-task memory is hard-capped at O(``max_cluster_rows`` × dim)
      regardless of cluster skew;
    - within a cluster, a doc is a duplicate iff some other member has
      cosine ≥ ``threshold``; its canonical is the smallest such member id
      (deterministic star rule — min-id representative, like
      dedup.py's exact/minhash canonicals).  Both paths compute the same
      rule, so capped and uncapped answers are identical.

    Recall caveat (inherent to SemDeDup, documented in the paper): a
    near-dup pair split across two clusters is missed; raising
    ``n_clusters`` trades recall for per-cluster cost.  The exact-recall
    alternative is :func:`all_pairs_cosine_blocked` / the LSH path.

    Returns (id, cluster, canonical_id, is_duplicate).
    """
    import math

    import numpy as np
    import pandas as pd

    if centroids is None:
        if n_clusters is None:
            n_clusters = max(16, min(65_536, df.count() // max(target_cluster_rows, 1) + 1))
        centroids = _train_spherical_kmeans(df, vec_col, n_clusters, seed)
    assign1 = _nearest_centroids(centroids, 1)
    assigned = fan_out(_as_double(df, vec_col)).select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        assign1(F.col(vec_col))[0].alias("cluster"),
    )
    out_schema = f"{id_col} bigint, cluster int, canonical_id bigint, is_duplicate boolean"

    def dedup_one_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = np.array(list(pdf["_v"].iloc[order]), dtype=np.float64)
        mat = mat / np.maximum(np.sqrt((mat * mat).sum(axis=1, keepdims=True)), 1e-12)
        n = len(ids)
        canonical = ids.copy()
        for lo in range(0, n, block_rows):
            hi = min(lo + block_rows, n)
            sims = mat[lo:hi] @ mat.T  # block × cluster
            for bi in range(hi - lo):
                i = lo + bi
                row = sims[bi]
                nbrs = np.flatnonzero(row >= threshold)
                nbrs = nbrs[nbrs != i]
                if len(nbrs):
                    canonical[i] = min(ids[i], ids[nbrs].min())
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster": pdf["cluster"].iloc[0],
                "canonical_id": canonical,
                "is_duplicate": canonical != ids,
            }
        )

    # one tiny aggregation (≤ n_clusters rows) decides which clusters are
    # safe to materialize whole; the vectors themselves never hit the driver
    sizes = assigned.groupBy("cluster").count().collect()
    oversized = {int(r["cluster"]): int(r["count"]) for r in sizes if r["count"] > max_cluster_rows}

    small = assigned
    if oversized:
        small = assigned.filter(~F.col("cluster").isin(list(oversized)))
    small_out = small.groupBy("cluster").applyInPandas(dedup_one_cluster, out_schema)
    if not oversized:
        return small_out

    # --- capped path: within-cluster block-pair scoring -------------------
    # two blocks per task ⇒ block size = cap/2 keeps per-task rows ≤ cap
    blk_rows = max(1, max_cluster_rows // 2)
    spark = df.sparkSession
    nblk = spark.createDataFrame(
        [(c, math.ceil(sz / blk_rows)) for c, sz in oversized.items()],
        "cluster int, _nblk int",
    )
    big = (
        assigned.join(F.broadcast(nblk), "cluster")
        .withColumn(
            "_blk",
            F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.col("_nblk")).cast("int"),
        )
    )
    blocks = big.groupBy("cluster", "_blk").agg(
        F.collect_list(F.struct(F.col(id_col).alias("_id"), "_v")).alias("_items")
    )
    left = blocks.select(
        F.col("cluster"), F.col("_blk").alias("_bl"), F.col("_items").alias("_li")
    )
    right = blocks.select(
        F.col("cluster"), F.col("_blk").alias("_br"), F.col("_items").alias("_ri")
    )
    bpairs = left.join(right, ["cluster"]).filter(F.col("_bl") <= F.col("_br"))

    pair_schema = "id long, cand long"

    def score_pair(batches):
        # emits (x, y) for every within-cluster pair with cosine ≥ threshold
        # and y < x — exactly the candidates the star rule minimizes over
        for pdf in batches:
            xs, ys = [], []
            for _, row in pdf.iterrows():
                li, ri = row["_li"], row["_ri"]
                same = row["_bl"] == row["_br"]
                lid = np.array([it["_id"] for it in li], dtype=np.int64)
                rid = np.array([it["_id"] for it in ri], dtype=np.int64)
                lm = np.array([it["_v"] for it in li], dtype=np.float64)
                rm = np.array([it["_v"] for it in ri], dtype=np.float64)
                lm = lm / np.maximum(np.sqrt((lm * lm).sum(axis=1, keepdims=True)), 1e-12)
                rm = rm / np.maximum(np.sqrt((rm * rm).sum(axis=1, keepdims=True)), 1e-12)
                sims = lm @ rm.T
                mask = sims >= threshold
                mask &= lid[:, None] != rid[None, :]
                for i, j in zip(*np.nonzero(mask)):
                    x, y = int(lid[i]), int(rid[j])
                    # both directions matter: the larger id of the pair
                    # gains the smaller as a canonical candidate
                    xs.append(max(x, y))
                    ys.append(min(x, y))
            yield pd.DataFrame({"id": xs, "cand": ys})

    cands = bpairs.mapInPandas(score_pair, pair_schema)
    best = cands.groupBy("id").agg(F.min("cand").alias("_best"))
    big_out = (
        big.join(best, big[id_col] == best["id"], "left")
        .select(
            F.col(id_col),
            F.col("cluster"),
            F.coalesce(F.col("_best"), F.col(id_col)).alias("canonical_id"),
            F.col("_best").isNotNull().alias("is_duplicate"),
        )
    )
    return small_out.unionByName(big_out)

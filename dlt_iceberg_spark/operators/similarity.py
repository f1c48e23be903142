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
    c = _as_double(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
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
    """IVF: KMeans-partition the corpus, probe nprobe nearest centroids.

    The inverted lists are realized as a centroid-id column (the 100 TB
    layout would bucket/sort data files by it for partition pruning)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    c = _as_double(corpus, vec_col)
    ml_df = c.withColumn("features", array_to_vector(F.col(vec_col)))
    model = KMeans(k=n_centroids, seed=seed, featuresCol="features").fit(ml_df)
    centroids = [list(map(float, ctr)) for ctr in model.clusterCenters()]
    assigned = model.transform(ml_df).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.col("prediction").alias("centroid"),
    )
    # query → nprobe nearest centroids (tiny cross join against constant)
    centroid_rows = [(i, ctr) for i, ctr in enumerate(centroids)]
    cdf = queries.sparkSession.createDataFrame(centroid_rows, ["centroid", "cvec"])
    q = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    qc = (
        q.crossJoin(F.broadcast(cdf))
        .withColumn("dist", -cosine(F.col("qv"), F.col("cvec").cast("array<double>")))
    )
    wq = Window.partitionBy("query_id").orderBy("dist", "centroid")
    probes = (
        qc.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "qv", "centroid")
    )
    scored = probes.join(assigned, "centroid").filter(
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

    src = df.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    return src.mapInPandas(score, out_schema)


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

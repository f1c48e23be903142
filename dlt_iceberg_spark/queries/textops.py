"""Section C — training-data pipeline operators: sampling / text."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dlt_iceberg_spark.queries.registry import _sql_rnd, _t, query, rnd

# ===========================================================================
# C. Training-data pipeline operators (beyond-reference, first-class)
# ===========================================================================


def _sampling_oracles():
    from dlt_iceberg_spark.operators.sampling import sample_oracle_gate, split_oracle_case

    return (
        sample_oracle_gate("doc_id", 0.1),
        split_oracle_case("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}),
    )


_SAMPLE_GATE_SQL, _SPLIT_CASE_SQL = _sampling_oracles()


@query(
    "sample_documents",
    f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {_SAMPLE_GATE_SQL}
    """,
    doc=(
        "Reproducible 10% corpus sample gated on md5(doc_id) — identical "
        "row selection every run, engine, and task retry (rand() resamples "
        "on retry); pure map-side filter, no shuffle "
        "(operators/sampling.py::deterministic_sample)."
    ),
)
def sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dlt_iceberg_spark.operators.sampling import deterministic_sample

    d = _t(spark, sf_dir, "documents")
    return deterministic_sample(d, "doc_id", 0.1).select("doc_id", "lang", "source")


@query(
    "split_documents",
    f"""
    SELECT split, lang, count(*) AS n FROM (
        SELECT {_SPLIT_CASE_SQL} AS split, lang FROM documents
    ) GROUP BY split, lang
    """,
    doc=(
        "Deterministic train/val/test assignment by hash range (80/10/10): "
        "a doc lands in the same split across reruns and incremental loads, "
        "keeping eval data out of training data "
        "(operators/sampling.py::hash_split)."
    ),
)
def split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dlt_iceberg_spark.operators.sampling import hash_split

    d = _t(spark, sf_dir, "documents")
    return (
        hash_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "cap_docs_per_lang",
    """
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn <= 50
    """,
    doc=(
        "Corpus balance: at most 50 docs per language, lowest doc_id wins.  "
        "Two-stage cap — per-input-partition pre-cap, then the exact global "
        "window — so one billion-row language never serializes through a "
        "single window task (operators/sampling.py::stratified_cap)."
    ),
)
def cap_docs_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dlt_iceberg_spark.operators.sampling import stratified_cap

    d = _t(spark, sf_dir, "documents")
    return stratified_cap(d, ["lang"], 50, "doc_id").select("doc_id", "lang")


def _mixture_gate(fraction: float) -> str:
    from dlt_iceberg_spark.operators.sampling import sample_oracle_gate

    return sample_oracle_gate("doc_id", fraction)


@query(
    "mixture_by_source",
    f"""
    SELECT 'src0' AS mixture_source, doc_id FROM documents WHERE source = 'src0'
    UNION ALL
    SELECT 'src1' AS mixture_source, doc_id FROM documents
    WHERE source = 'src1' AND {_mixture_gate(0.5)}
    UNION ALL
    SELECT 'src2' AS mixture_source, doc_id FROM documents
    WHERE source = 'src2' AND {_mixture_gate(0.5)}
    """,
    doc=(
        "Corpus mixture at 50/25/25 weights over three sources, realized by "
        "deterministic down-sampling at rates derived from source counts "
        "(operators/sampling.py::weighted_mixture).  The oracle hard-codes "
        "the keep fractions (1.0/0.5/0.5) the operator derives at runtime: "
        "the fixture's sources are equal-sized and the weights are binary "
        "fractions, so the derivation is exact on any engine."
    ),
)
def mixture_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dlt_iceberg_spark.operators.sampling import weighted_mixture

    d = _t(spark, sf_dir, "documents")
    sources = {
        name: (d.filter(F.col("source") == name), w)
        for name, w in [("src0", 0.5), ("src1", 0.25), ("src2", 0.25)]
    }
    return weighted_mixture(sources, "doc_id").select("mixture_source", "doc_id")


@query(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash,
           CAST(min(doc_id) AS BIGINT) AS canonical_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    doc="Exact dedup: content-hash groupBy; at scale = one shuffle on the hash, no driver state.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.withColumn("content_hash", F.md5(F.encode(F.col("text"), "UTF-8")))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


_TOKENS_SQL = r"string_split_regex(text, '\s+')"
_NTOK_SQL = f"CAST(len({_TOKENS_SQL}) AS DOUBLE)"
_AVG_TOKLEN_SQL = _sql_rnd(f"length(replace(text, ' ', '')) / {_NTOK_SQL}")
_STOPRATIO_SQL = _sql_rnd(
    f"len(list_filter({_TOKENS_SQL}, t -> t IN ('the', 'a'))) / {_NTOK_SQL}", 4
)


@query(
    "text_quality",
    f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tokens,
           {_AVG_TOKLEN_SQL} AS avg_token_len,
           {_STOPRATIO_SQL} AS stopword_ratio
    FROM documents
    """,
    doc="Per-document quality features (length/token/stopword stats), all JVM-side expressions.",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    n_tokens = F.size(toks).cast("long")
    stop = F.size(F.filter(toks, lambda t: t.isin("the", "a"))).cast("double")
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        rnd(
            F.length(F.regexp_replace(F.col("text"), " ", "")).cast("double")
            / n_tokens.cast("double")
        ).alias("avg_token_len"),
        rnd(stop / n_tokens.cast("double"), 4).alias("stopword_ratio"),
    )


_AVG_TOKENS_SQL = _sql_rnd(f"avg(len({_TOKENS_SQL}))")


@query(
    "text_lang_profile",
    f"""
    SELECT lang, source, count(*) AS n_docs,
           {_sql_rnd('avg(n_chars)')} AS avg_chars,
           {_AVG_TOKENS_SQL} AS avg_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM documents GROUP BY lang, source
    """,
    doc="Corpus profile by language/source — the partition-level stats a curation pipeline monitors.",
)
def text_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        rnd(F.avg(F.col("n_chars").cast("double"))).alias("avg_chars"),
        rnd(F.avg(F.size(F.split(F.col("text"), r"\s+")).cast("double"))).alias("avg_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


@query(
    "doc_fingerprint",
    f"""
    SELECT doc_id,
           substr(md5(text), 1, 16) AS fingerprint,
           CAST(greatest(len({_TOKENS_SQL}) - 2, 1) AS BIGINT) AS n_shingles
    FROM documents
    """,
    doc="Document fingerprint (hash prefix) + 3-gram shingle count — input cardinality for MinHash.",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.substring(F.md5(F.encode(F.col("text"), "UTF-8")), 1, 16).alias("fingerprint"),
        F.greatest(F.size(F.split(F.col("text"), r"\s+")) - 2, F.lit(1)).cast("long").alias("n_shingles"),
    )


@query(
    "ann_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 8),
         c AS (SELECT vec_id AS neighbor_id, label, embedding::DOUBLE[] AS ce FROM embeddings),
         scored AS (
           SELECT query_id, neighbor_id, label,
                  list_cosine_similarity(qe, ce) AS cs
           FROM q CROSS JOIN c WHERE query_id <> neighbor_id
         )
    SELECT query_id, neighbor_id, label AS neighbor_label,
           floor(cs * 1000000.0 + 0.5) / 1000000.0 AS cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
    doc=(
        "Brute-force cosine top-k ANN baseline: broadcast queries × candidates, "
        "JVM-side zip_with/aggregate dot product, per-query top-k. Scale path: "
        "LSH/IVF bucketing (operators/similarity.py) replaces the cross join."
    ),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)

    def norm(a):
        return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))

    scored = (
        emb.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .withColumn("cs", dot(F.col("qe"), F.col("e")) / (norm(F.col("qe")) * norm(F.col("e"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cs").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            rnd(F.col("cs"), 6).alias("cosine"),
        )
    )


@query(
    "ann_filtered",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
               FROM embeddings WHERE vec_id < 8),
         c AS (SELECT vec_id AS neighbor_id, label, embedding::DOUBLE[] AS ce
               FROM embeddings
               WHERE label IN (0, 1) AND vec_id % 3 <> 0),
         scored AS (
           SELECT query_id, neighbor_id, label,
                  list_cosine_similarity(qe, ce) AS cs
           FROM q CROSS JOIN c WHERE query_id <> neighbor_id
         )
    SELECT query_id, neighbor_id, CAST(label AS INT) AS neighbor_label,
           floor(cs * 1000000.0 + 0.5) / 1000000.0 AS cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
    doc=(
        "FILTERED vector search (the per-tenant / metadata-constrained ANN "
        "shape): candidates pass a selective predicate BEFORE any distance "
        "math — expressed as a plain scan filter, so Catalyst pushes it to "
        "the parquet read and the distance kernel only ever sees survivors "
        "(at 100 TB the filter, not the top-k, is what bounds the work).  "
        "Brute-force exact here; the LSH/IVF tiers compose the same way "
        "(filter first, bucket the survivors)."
    ),
)
def ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    cand = emb.filter(F.col("label").isin(0, 1) & (F.col("vec_id") % 3 != 0))

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)

    def norm(a):
        return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))

    scored = (
        cand.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .withColumn("cs", dot(F.col("qe"), F.col("e")) / (norm(F.col("qe")) * norm(F.col("e"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cs").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").cast("int").alias("neighbor_label"),
            rnd(F.col("cs"), 6).alias("cosine"),
        )
    )


@query(
    "embedding_label_stats",
    f"""
    SELECT label, count(*) AS n_vecs,
           {_sql_rnd('avg(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])))', 4)} AS avg_norm,
           CAST(min(len(embedding)) AS BIGINT) AS dim
    FROM embeddings GROUP BY label
    """,
    doc="Embedding-space sanity stats per label (norm distribution, dim check).",
)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    norm = F.sqrt(F.aggregate(F.zip_with(e, e, lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v))
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        rnd(F.avg(norm), 4).alias("avg_norm"),
        F.min(F.size("embedding")).cast("long").alias("dim"),
    )




@query(
    "text_bm25_topk",
    f"""
    WITH tok AS (
      SELECT doc_id, t AS term
      FROM (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS t
            FROM documents)
      WHERE t <> ''
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (
      SELECT (SELECT avg(dl) FROM dl) AS avgdl,
             (SELECT count(*) FROM dl) AS n
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN ('spark', 'merge', 'vector')
      GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    idf AS (
      SELECT term, ln((s.n - df + 0.5) / (df + 0.5) + 1.0) AS idf, s.avgdl
      FROM dfreq, stats s
    )
    SELECT tf.doc_id,
           {_sql_rnd("sum(idf.idf * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / idf.avgdl)))", 6)} AS score
    FROM tf JOIN idf USING (term) JOIN dl ON tf.doc_id = dl.doc_id
    GROUP BY tf.doc_id
    """,
    doc=(
        "Okapi BM25 ranking against a bag-of-terms query "
        "(operators/features.py::bm25_rank — Lucene's non-negative IDF): "
        "the lexical-retrieval scorer for query-targeted curation and "
        "contamination triage.  (doc, term) counts are filtered to the "
        "query's terms BEFORE the shuffle, the |q|-row IDF table and "
        "1-row corpus stats broadcast back — no vocabulary-sized state, "
        "so the plan holds at corpus scale for any constant-sized query.  "
        "The oracle replays the full formula (tokenize → dl/avgdl → "
        "tf/df → idf → score) in SQL; every matched document is returned "
        "(no top-k cut) so the hash compare covers the entire ranking."
    ),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dlt_iceberg_spark.operators.features import bm25_rank

    d = _t(spark, sf_dir, "documents")
    out = bm25_rank(d, ["spark", "merge", "vector"])
    return out.select("doc_id", rnd(F.col("score"), 6).alias("score"))


@query(
    "hybrid_search",
    f"""
    WITH tok AS (
      SELECT doc_id, t AS term
      FROM (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS t
            FROM documents)
      WHERE t <> ''
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (
      SELECT (SELECT avg(dl) FROM dl) AS avgdl,
             (SELECT count(*) FROM dl) AS n
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN ('spark', 'merge', 'vector')
      GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    idf AS (
      SELECT term, ln((s.n - df + 0.5) / (df + 0.5) + 1.0) AS idf, s.avgdl
      FROM dfreq, stats s
    ),
    bm25 AS (
      SELECT tf.doc_id,
             sum(idf.idf * (tf.tf * 2.2) /
                 (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / idf.avgdl))) AS score
      FROM tf JOIN idf USING (term) JOIN dl ON tf.doc_id = dl.doc_id
      GROUP BY tf.doc_id
    ),
    lex AS (SELECT doc_id, score / (SELECT max(score) FROM bm25) AS lex FROM bm25),
    q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
    sem AS (
      SELECT vec_id AS doc_id,
             list_cosine_similarity(embedding::DOUBLE[], (SELECT qe FROM q)) AS sem
      FROM embeddings WHERE vec_id <> 0
    )
    SELECT lex.doc_id,
           floor((0.5 * lex.lex + 0.5 * sem.sem) * 1000000.0 + 0.5) / 1000000.0
             AS hybrid
    FROM lex JOIN sem USING (doc_id)
    """,
    doc=(
        "HYBRID retrieval — BM25 lexical score fused with embedding cosine "
        "(the RAG / curation ranking shape): bm25_rank's scores min-max "
        "normalize against the corpus max (one broadcast scalar), the "
        "query vector broadcasts into a JVM-side zip_with dot product over "
        "the embeddings table, and the two signals fuse 50/50 on doc_id "
        "(vec_id-aligned fixture).  Everything stays whole-stage codegen — "
        "no UDFs, no vocabulary- or corpus-sized state; at 100 TB each "
        "side bounds its own work (query-term filter / metadata filter + "
        "IVF tier) before the fuse join.  Oracle replays both signals and "
        "the fusion in SQL over every matched doc."
    ),
)
def hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dlt_iceberg_spark.operators.features import bm25_rank

    d = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    bm25 = bm25_rank(d, ["spark", "merge", "vector"])
    mx = bm25.agg(F.max("score").alias("mx"))
    lex = bm25.crossJoin(F.broadcast(mx)).select(
        "doc_id", (F.col("score") / F.col("mx")).alias("lex")
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("e").alias("qe"))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
        )

    def norm(a):
        return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))

    sem = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            (dot(F.col("e"), F.col("qe")) / (norm(F.col("e")) * norm(F.col("qe")))).alias("sem"),
        )
    )
    return lex.join(sem, "doc_id").select(
        "doc_id",
        rnd(F.lit(0.5) * F.col("lex") + F.lit(0.5) * F.col("sem"), 6).alias("hybrid"),
    )

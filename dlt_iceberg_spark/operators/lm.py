"""N-gram language-model perplexity scoring — the CCNet quality filter.

CCNet (Wenzek et al. 2020) and Gopher/MassiveText (Rae et al. 2021) rank
web documents by perplexity under a language model trained on a trusted
target corpus (Wikipedia), then keep the head/middle buckets.  The
transformer-free, engine-portable form of that filter is an n-gram LM —
this module implements a bigram model with add-k smoothing, entirely as
DataFrame aggregates and joins:

- :func:`train_bigram_lm`: two count tables from the target corpus —
  ``(prev, w) → c`` and ``prev → c_total`` — plus the vocabulary size.
  These are corpus-sized AGGREGATES (bounded by distinct bigrams), not
  broadcast tables; they join by key downstream, so the model "fits" no
  matter how large the target corpus is.
- :func:`lm_score`: per document, mean log probability of its token
  stream: ``mean_i ln((c(prev_i, w_i) + k) / (c(prev_i·) + k·V))``.
  Unseen bigrams/contexts degrade smoothly to the smoothing mass (an
  unseen context scores ``ln(1/V)``).  Lower = more surprising = further
  from the target distribution; CCNet's buckets are quantiles over this.

Plan shape at 100 TB: token-pair explode is map-side; the model lookups
are two key joins (Spark picks broadcast vs sort-merge by table size);
the per-doc mean is one doc-keyed shuffle.  No driver data path — unlike
a KenLM UDF, nothing needs the model materialized per executor in memory.

Everything is exact count arithmetic + ln, so a SQL oracle replays the
whole filter bit-for-bit (queries.py::lm_perplexity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKS = "filter(split({col}, '\\\\s+'), x -> x <> '')"


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, prev, w) for every adjacent token pair — map-side explode.

    PERF: pairs come from zip_with over two slices of a BOUND token column
    — never element_at(tokens_expr, i) inside a lambda, which re-evaluates
    the captured split() per element → O(tokens²) (the text.py:89 trap)."""
    pairs = (
        "CASE WHEN size(_t) >= 2 THEN "
        "zip_with(slice(_t, 1, size(_t) - 1), slice(_t, 2, size(_t) - 1), "
        "(p, w) -> struct(p AS prev, w AS w)) ELSE array() END"
    )
    return (
        df.select(
            F.col(id_col), F.expr(_TOKS.format(col=text_col)).alias("_t")
        )
        .select(F.col(id_col), F.explode(F.expr(pairs)).alias("_p"))
        .select(id_col, F.col("_p.prev").alias("prev"), F.col("_p.w").alias("w"))
    )


def train_bigram_lm(
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist_model: bool | None = None,
) -> tuple[DataFrame, DataFrame, int]:
    """Fit the model: bigram counts, context totals, vocabulary size.

    Returns ``(bigrams, contexts, vocab_size)`` where ``bigrams`` is
    (prev, w, c), ``contexts`` is (prev, c_total).  Two aggregates over one
    token-pair explode; ``vocab_size`` is a scalar count-distinct.

    ``bigrams`` is persisted (DISK_ONLY — bounded by distinct bigrams, far
    smaller than the pair stream): the scoring join consumes BOTH bigrams
    and contexts, and contexts derives from bigrams, so an unpersisted
    plan re-runs the target tokenize/explode/groupBy lineage twice inside
    every scoring job.  Size-adaptive like dsir_select/perplexity_filter
    (``persist_model=None`` gates on PERSIST_MIN_INPUT_BYTES): a toy
    target recomputes cheaper than it materializes, a real one doesn't."""
    from pyspark.storagelevel import StorageLevel

    from dlt_iceberg_spark.operators.dsir import (
        PERSIST_MIN_INPUT_BYTES,
        _plan_size_bytes,
    )

    if persist_model is None:
        persist_model = _plan_size_bytes(target) >= PERSIST_MIN_INPUT_BYTES
    pairs = _doc_bigrams(target, text_col, id_col)
    bigrams = pairs.groupBy("prev", "w").agg(F.count(F.lit(1)).alias("c"))
    if persist_model:
        bigrams = bigrams.persist(StorageLevel.DISK_ONLY)
        contexts = bigrams.groupBy("prev").agg(F.sum("c").alias("c_total"))
    else:
        # Unpersisted, deriving contexts from bigrams re-executes the whole
        # pair-extraction lineage INCLUDING its (prev, w) corpus shuffle.
        # The context totals are just pair counts per prev (Σ_w c(prev, w)
        # == count of pairs with that prev — integer-identical), so count
        # the pair stream directly: the re-extraction stays (no safe cut,
        # see OPTIMIZATION_r12 residuals) but its shuffle shrinks from the
        # (prev, w) stream to ≤ |distinct prev| partial rows per partition
        # (guide §2.3 — aggregate before you shuffle).
        contexts = pairs.groupBy("prev").agg(F.count(F.lit(1)).alias("c_total"))
    toks = _TOKS.format(col=text_col)
    vocab_size = (
        target.select(F.explode(F.expr(toks)).alias("t")).distinct().count()
    )
    return bigrams, contexts, int(vocab_size)


def lm_score(
    df: DataFrame,
    bigrams: DataFrame,
    contexts: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """(id, n_scored, logp_mean): mean token log-prob under the model.

    ``n_scored`` is the number of scored positions (tokens − 1); documents
    with fewer than 2 tokens are absent from the output (nothing to
    score — callers treat them separately, as CCNet drops them)."""
    v = float(vocab_size)
    pairs = _doc_bigrams(df, text_col, id_col)
    scored = (
        pairs.join(bigrams, ["prev", "w"], "left")
        .join(contexts, ["prev"], "left")
        .select(
            F.col(id_col),
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)).cast("double") + k)
                / (F.coalesce(F.col("c_total"), F.lit(0)).cast("double") + k * v)
            ).alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.avg("_lp").alias("logp_mean"),
    )


def perplexity_filter(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
    buckets: int = 3,
    quantile_error: float = 0.001,
    persist_scores: bool | None = None,
) -> DataFrame:
    """CCNet head/middle/tail: score every document against the target LM
    and assign equal-frequency perplexity buckets (1 = closest to target).
    Adds (n_scored, logp_mean, ppl_bucket).

    Bucket boundaries come from distributed Greenwald-Khanna quantiles
    (``approxQuantile``) and assignment is a map-side expression — never a
    global ``ntile`` window, which would sort the whole corpus through one
    task.  ``quantile_error`` trades boundary exactness for sketch size
    (CCNet's buckets are themselves heuristic cuts)."""
    from pyspark.storagelevel import StorageLevel

    from dlt_iceberg_spark.operators.dsir import PERSIST_MIN_INPUT_BYTES, _plan_size_bytes

    bigrams, contexts, vocab = train_bigram_lm(target, text_col, id_col)
    # approxQuantile is an ACTION: without a persist the score lineage
    # (explode + two model joins + doc agg) runs once for the sketch and
    # AGAIN for the bucket projection.  The quantile pass materializes the
    # cache; the returned DataFrame reads it back instead of recomputing.
    # Size-adaptive like dsir_select: toy corpora re-score cheaper than
    # they materialize.
    scores = lm_score(df, bigrams, contexts, vocab, text_col, id_col, k)
    if persist_scores is None:
        persist_scores = _plan_size_bytes(df) >= PERSIST_MIN_INPUT_BYTES
    if persist_scores:
        scores = scores.persist(StorageLevel.DISK_ONLY)
    probs = [i / buckets for i in range(1, buckets)]
    cuts = scores.approxQuantile("logp_mean", probs, quantile_error)
    # higher logp = closer to target = lower bucket number; strict < so a
    # doc sitting exactly on a cut falls into the better bucket
    bucket = F.lit(buckets)
    for c in cuts:
        bucket = bucket - (F.lit(float(c)) < F.col("logp_mean")).cast("int")
    return scores.withColumn("ppl_bucket", bucket)

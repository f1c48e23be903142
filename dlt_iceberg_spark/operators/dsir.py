"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): select pretraining documents whose hashed-n-gram
distribution looks like a TARGET corpus, by importance weights between two
bag-of-n-grams models.

This is the modern replacement for hand-tuned quality heuristics in LLM
data pipelines (the paper selects The-Pile-sized corpora toward
Wikipedia/books targets).  Anatomy, Spark-first:

1. **Features** (:func:`hashed_ngram_features`): per document, unigram +
   bigram counts hashed into ``n_buckets`` — pure map-side expression work
   (split / transform / explode inside whole-stage codegen, md5 hashing so
   any engine replays the bucketing bit-exactly), one doc-keyed shuffle to
   count.
2. **Weights** (:func:`dsir_importance_weights`): two O(n_buckets)
   aggregates (target corpus, raw corpus), Laplace-smoothed
   ``log p̂_target(b) − log p̂_raw(b)`` per bucket.  The weight table is
   ``n_buckets`` rows — broadcast-sized BY CONSTRUCTION at any corpus
   scale (the paper uses 10⁴ buckets for 10⁹ docs).
3. **Scores** (:func:`dsir_scores`): per-doc importance = Σ_b count_b ·
   weight_b — a broadcast join from features to weights plus one doc-keyed
   sum.  No driver data path anywhere; the only O(corpus) work is the
   feature scan.
4. **Selection** (:func:`dsir_select`): the paper resamples with Gumbel
   noise; here the noise is DETERMINISTIC (md5-uniform → Gumbel via
   −ln(−ln u)), so retries/engine replays select the same documents —
   same rule as operators/sampling.py.  ``noise=0`` degrades to plain
   top-k by weight.

At 100 TB: feature extraction is embarrassingly parallel; both model fits
are B-row aggregates; scoring is map-side against a broadcast table; the
only full shuffles are the two groupBys keyed by (doc, bucket) / doc.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: unigram + bigram array over a BOUND token column (`_t`).  PERF: bigrams
#: come from zip_with over two slices — never element_at(tokens_expr, i)
#: inside a lambda, which re-evaluates the captured split() per ELEMENT and
#: turns a document into O(tokens²) work (the text.py:89 trap; hitting it
#: here made dsir_select the slowest query in the suite before this form).
_GRAMS_OVER_T = (
    "concat(_t, CASE WHEN size(_t) >= 2 THEN "
    "zip_with(slice(_t, 1, size(_t) - 1), slice(_t, 2, size(_t) - 1), "
    "(a, b) -> concat(a, ' ', b)) ELSE array() END)"
)


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """(id, bucket, cnt): hashed unigram+bigram bag per document.

    md5-based bucketing (not xxhash) so the oracle replays it; the hash
    cost is per-gram map-side work."""
    grams = df.select(
        F.col(id_col),
        F.expr(f"filter(split({text_col}, '\\\\s+'), x -> x <> '')").alias("_t"),
    ).select(F.col(id_col), F.explode(F.expr(_GRAMS_OVER_T)).alias("_g"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("_g")), 1, 8), 16, 10).cast("bigint")
        % n_buckets
    ).alias("bucket")
    return grams.select(F.col(id_col), bucket).groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def hashed_ngram_bucket_totals(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """(bucket, cnt): corpus-wide gram count per hash bucket — the model-fit
    aggregate computed STRAIGHT from the gram stream (guide §2.3, aggregate
    before you shuffle).  Bit-identical to
    ``hashed_ngram_features(...).groupBy('bucket').sum('cnt')`` (same md5
    bucketing, integer counts, addition is associative), but the shuffle
    carries ≤ ``n_buckets`` partial rows per map partition instead of the
    corpus-sized (doc, bucket) stream — the model fit never needs the
    per-document breakdown."""
    grams = df.select(
        F.expr(f"filter(split({text_col}, '\\\\s+'), x -> x <> '')").alias("_t")
    ).select(F.explode(F.expr(_GRAMS_OVER_T)).alias("_g"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("_g")), 1, 8), 16, 10).cast("bigint")
        % n_buckets
    ).alias("bucket")
    return grams.select(bucket).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def dsir_importance_weights(
    target_feats: DataFrame,
    raw_feats: DataFrame,
    n_buckets: int = 256,
    alpha: float = 1.0,
) -> DataFrame:
    """(bucket, log_w): smoothed log-likelihood ratio per feature bucket.

    ``log((t_b + α)/(T + αB)) − log((r_b + α)/(R + αB))`` — the two model
    fits of the paper.  Output is B rows; both inputs reduce to B-row
    aggregates before anything joins.

    PERF (r12, guide §1.2/§2.4): the totals T and R are computed from the
    B-row bucket tables with ONE single-partition window over their full
    outer join — never as separate ``t.agg(sum)`` / ``r.agg(sum)``
    relations.  Unpersisted, those two extra references re-executed the
    entire feature-extraction lineage (tokenize + explode + md5 + corpus
    shuffle) once EACH — runtime-verified: AQE's exchange reuse deduped
    only the raw-fit branch, so dsir_select paid 2 full corpus
    extractions and 2 target extractions per run.  The window moves ≤2B
    tiny rows to one task; the outer join (instead of the old left join)
    makes the window-sum of ``tc`` exactly T even for target buckets
    outside the raw support; filtering back to the raw support afterwards
    reproduces the left-join output rows bit-for-bit."""
    t = target_feats.groupBy("bucket").agg(F.sum("cnt").alias("tc"))
    r = raw_feats.groupBy("bucket").agg(F.sum("cnt").alias("rc"))
    from pyspark.sql.window import Window

    w_all = Window.partitionBy()
    # raw side is the support (every scored gram appears in the raw corpus);
    # buckets absent from the target get pure-smoothing mass
    joined = (
        r.join(t, "bucket", "full")
        .withColumn("tt", F.sum(F.coalesce(F.col("tc"), F.lit(0))).over(w_all))
        .withColumn("rt", F.sum(F.coalesce(F.col("rc"), F.lit(0))).over(w_all))
        .filter(F.col("rc").isNotNull())
    )
    b = float(n_buckets)
    return joined.select(
        "bucket",
        (
            F.log((F.coalesce(F.col("tc"), F.lit(0)) + alpha) / (F.col("tt") + alpha * b))
            - F.log((F.col("rc") + alpha) / (F.col("rt") + alpha * b))
        ).alias("log_w"),
    )


def dsir_scores(
    feats: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, log_importance): Σ_b cnt_b · log_w_b per document.  The weight
    table broadcasts (B rows); the sum is one doc-keyed shuffle."""
    return (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("log_w")).alias("log_importance"))
    )


def _gumbel_expr(id_col: str, seed: str) -> F.Column:
    """Deterministic standard-Gumbel noise from md5(id || seed): u ∈ (0,1)
    from 13 hex chars (52 bits — exactly a double's mantissa), then
    −ln(−ln u).  Engine-portable: identical arithmetic in SQL."""
    u = (
        F.conv(F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed))), 1, 13), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(float(2**52) + 2.0)
    return -F.log(-F.log(u))


#: size-adaptive caching threshold: below this input size the double
#: feature extraction is cheaper than materializing the feature table
#: (tiny corpora live in the page cache); above it the persist halves the
#: dominant cost.  Same runtime-re-planning philosophy as the dedup
#: strategy probes.
PERSIST_MIN_INPUT_BYTES = 256 << 20


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the input plan; unknown ⇒ assume huge
    (persisting a big input is the safe direction)."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return 1 << 62


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_n: int = 100,
    n_buckets: int = 256,
    alpha: float = 1.0,
    noise: float = 1.0,
    seed: str = "dsir0",
    persist_features: bool | None = None,
) -> DataFrame:
    """Full DSIR pass: fit target/raw models, score every document, keep
    the ``keep_n`` with the highest ``log_importance + noise · Gumbel``.

    Returns (id, log_importance, gumbel_key, rank) for the selected docs.
    ``noise=1`` is the paper's importance resampling (deterministic
    replay); ``noise=0`` is hard top-k by importance."""
    from pyspark.sql.window import Window
    from pyspark.storagelevel import StorageLevel

    # feats feeds BOTH the raw-model fit and the scoring join; unpersisted,
    # Spark re-executes the whole tokenize/explode/hash/groupBy lineage
    # twice — at scale that doubles the dominant cost.  DISK_ONLY (the
    # feature table is O(corpus) rows and must not compete for executor
    # memory), gated on input size (persist_features=None): materializing
    # a page-cache-resident toy corpus costs more than re-extracting it.
    feats = hashed_ngram_features(df, text_col, id_col, n_buckets)
    if persist_features is None:
        persist_features = _plan_size_bytes(df) >= PERSIST_MIN_INPUT_BYTES
    if persist_features:
        feats = feats.persist(StorageLevel.DISK_ONLY)
    # Model fits need only per-BUCKET totals (guide §2.3): the target side
    # never needs a (doc, bucket) aggregate at all, and the raw side only
    # reuses feats when the persist makes that read cheaper than a direct
    # gram-stream aggregation.  Both forms are integer-sum identical.
    tfeats = hashed_ngram_bucket_totals(target, text_col, n_buckets)
    raw_fit = (
        feats
        if persist_features
        else hashed_ngram_bucket_totals(df, text_col, n_buckets)
    )
    weights = dsir_importance_weights(tfeats, raw_fit, n_buckets, alpha)
    scores = dsir_scores(feats, weights, id_col)
    key = F.col("log_importance") + (
        _gumbel_expr(id_col, seed) * noise if noise else F.lit(0.0)
    )
    # top-k via orderBy+limit → TakeOrderedAndProject (per-partition partial
    # top-k, driver merges keep_n rows) — NEVER a global row_number window,
    # which would sort the whole corpus through ONE task.  The rank window
    # then runs over keep_n driver-bounded rows only.  For keep_n too large
    # to TakeOrdered, use the select_top_tokens threshold technique instead.
    top = (
        scores.withColumn("gumbel_key", key)
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col))
        .limit(keep_n)
    )
    w = Window.orderBy(F.col("gumbel_key").desc(), F.col(id_col))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(id_col, "log_importance", "gumbel_key", "rank")
    )

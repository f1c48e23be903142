"""Corpus feature extraction and lightweight text classification.

Training-data pipelines tag and route documents with cheap lexical
models before any GPU touches them: TF-IDF keyword profiles for topic
routing, and fastText-style linear classifiers for language / quality
gating (CCNet trains one against Wikipedia; C4 uses a langid model).
Both are expressible as pure DataFrame aggregations — the "model" is a
small table, training is a groupBy, scoring is a broadcast join — so
the whole path stays JVM-side with zero UDFs and survives a 100 TB
corpus: every shuffle is keyed by (doc, term) or (term), and the model
tables are vocabulary-sized (≪ corpus) broadcasts.

Multinomial Naive Bayes with add-one smoothing replaces the logistic
regression a real pipeline would train — same feature plumbing, but the
training step is a closed-form aggregation, so both engines (Spark and
the DuckDB oracle) can reproduce it exactly.  The smoothing identity
used for scoring:

    score(d, y) = ln p(y) - M_d * ln(C_y + V) + Σ_{t∈d} n_t * ln(c(t,y)+1)

where M_d = token count of d, C_y = total token count of class y, V =
vocabulary size.  Unseen (t, y) pairs contribute ln(0+1) = 0, so an
INNER join against the sparse count table is exact — no dense
vocab × class matrix is ever materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dlt_iceberg_spark.operators.util import fan_out


def _terms(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term) pairs; empty tokens dropped (split artifacts)."""
    return (
        df.select(id_col, F.explode(F.split(F.col(text_col), r"\s+")).alias("term"))
        .filter(F.col("term") != "")
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document top-``k`` terms by TF-IDF (smoothed:
    ``idf = ln((N+1)/(df+1)) + 1`` — never zero, so single-doc corpora
    still rank).

    Plan shape: one shuffle to (doc, term) counts, one vocabulary-keyed
    aggregate for document frequency (vocab ≪ corpus), the IDF table
    broadcast back onto the counts, and a per-doc window for top-k.  Set
    ``broadcast_model=False`` when the vocabulary itself is too large to
    broadcast (e.g. n-gram terms) — the join falls back to a term-keyed
    shuffle.

    Output: ``(id_col, term, tf, tfidf, rank)``; ties rank by term
    ascending in both this plan and the SQL oracle.
    """
    # tf feeds BOTH the document-frequency aggregate and the scoring join —
    # unpersisted, each reference re-tokenizes and re-shuffles the corpus.
    # Persisting it was A/B-measured this round at BOTH scales and LOSES
    # at both (1.13x worse at sf0.1; 1.17-1.55x worse at a 1M-doc / 40M-
    # token corpus): the (doc, term) aggregate has ~no cardinality
    # reduction over the exploded token stream, so the DISK_ONLY round-
    # trip costs more than the map-side re-tokenize it replaces.  Unlike
    # dsir/lm (whose persisted aggregates are vocabulary-sized and keep
    # their r5-measured size gates), token-stream-sized intermediates
    # should be recomputed — see OPTIMIZATION_r11.md "the persist lesson".
    tf = (
        fan_out(_terms(df, text_col, id_col))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    # Document frequency does NOT need the (doc, term) aggregate: distinct
    # terms per doc is map-side work (array_distinct over the split array),
    # so this branch shuffles only vocab-sized partial counts instead of
    # re-running tf's corpus-sized (doc, term) exchange (guide §2.3 —
    # aggregate before you shuffle; same move as nb_train's vocab).
    # Integer-count identical to tf.groupBy(term).count(): a term has a tf
    # row for a doc iff it appears ≥ once nonempty in that doc's split.
    dfreq = (
        fan_out(
            df.select(
                F.explode(
                    F.array_distinct(
                        F.filter(
                            F.split(F.col(text_col), r"\s+"),
                            lambda x: x != F.lit(""),
                        )
                    )
                ).alias("term")
            )
        )
        .groupBy("term")
        .agg(F.count("*").alias("doc_freq"))
    )
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "term",
        (
            F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("doc_freq") + F.lit(1.0)))
            + F.lit(1.0)
        ).alias("idf"),
    )
    scored = tf.join(F.broadcast(idf) if broadcast_model else idf, "term").select(
        id_col, "term", "tf", (F.col("tf") * F.col("idf")).alias("tfidf")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def nb_train(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB: returns ``(token_weights, class_consts)``.

    ``token_weights``: (term, label, w) with ``w = ln(c(t,y)+1)`` — sparse,
    only observed (term, class) pairs.  ``class_consts``: (label,
    ln_prior, ln_denom) with ``ln_denom = ln(C_y + V)``.  Both are
    vocabulary/class-sized model tables, not data-sized.
    """
    toks = fan_out(
        df.select(label_col, F.explode(F.split(F.col(text_col), r"\s+")).alias("term"))
        .filter(F.col("term") != "")
    )
    counts = toks.groupBy(label_col, "term").agg(F.count("*").alias("c"))
    # vocab and class totals do NOT need the heavy (label, term)
    # aggregate (unpersisted, each reference re-runs its whole
    # tokenize+shuffle subtree — 3 heavy passes for 1 logical table).
    # Equal by construction:  V = |distinct terms| comes from a direct
    # distinct over the exploded terms (partial-agg, no (label, term)
    # shuffle);  C_y = Σ_t c(t, y) is the per-label token COUNT — a
    # map-side array-size sum with no explode at all.
    vocab = (
        fan_out(
            df.select(
                F.explode(F.split(F.col(text_col), r"\s+")).alias("term")
            ).filter(F.col("term") != "")
        )
        .select("term")
        .distinct()
        .agg(F.count("*").alias("v"))
    )
    # null text → size() = -1, and labels whose every doc is empty are
    # ABSENT from the counts-based aggregate — guard both so the
    # replacement is exactly equivalent
    # column-API form (ADVICE r11): interpolating text_col into an F.expr
    # SQL string broke for identifiers needing backtick quoting and was an
    # expression-injection hole; F.filter/F.split build the same tree
    n_toks = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
        F.size(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit(""))
        )
    )
    class_tot = (
        df.groupBy(label_col)
        .agg(F.sum(n_toks).alias("cy"))
        .filter(F.col("cy") > 0)
    )
    token_weights = counts.select(
        "term",
        F.col(label_col).alias("label"),
        F.log(F.col("c") + F.lit(1.0)).alias("w"),
    )
    n_total = df.select(F.countDistinct(id_col).alias("n"))
    priors = df.groupBy(label_col).agg(F.countDistinct(id_col).alias("n_y"))
    class_consts = (
        class_tot.join(priors, label_col)
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_total))
        .select(
            F.col(label_col).alias("label"),
            F.log(F.col("n_y") / F.col("n")).alias("ln_prior"),
            F.log(F.col("cy") + F.col("v")).alias("ln_denom"),
        )
    )
    return token_weights, class_consts


def nb_score(
    df: DataFrame,
    token_weights: DataFrame,
    class_consts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document against every class and pick the argmax.

    The doc × class score frame is built from broadcast model tables; the
    unseen-pair term vanishes under add-one smoothing (see module
    docstring), so the evidence join is INNER against the sparse weights.
    Ties break deterministically: higher score, then label ascending.

    Output: ``(id_col, predicted, score)``.
    """
    # NOTE (r12): scoring evidence straight off the token stream
    # (join occurrences to weights, sum w per (id, label)) was A/B'd and
    # LOST (1.09x median, 1.02x min over 3 interleaved blocks): the
    # weight join multiplies every token occurrence by |labels| before the
    # aggregate can collapse it, which costs more than the (id, term) tf
    # exchange it removes. Kept the tf-first form.
    tf = fan_out(_terms(df, text_col, id_col)).groupBy(id_col, "term").agg(
        F.count("*").alias("tf")
    )
    evidence = (
        tf.join(F.broadcast(token_weights), "term")
        .groupBy(id_col, "label")
        .agg(F.sum(F.col("tf") * F.col("w")).alias("ev"))
    )
    # M_d map-side (PERF r12, same move as nb_train's class totals):
    # Σ_term tf == |nonempty tokens| — a size() over the split array, no
    # (id, term) shuffle and no second execution of tf's explode lineage
    # (runtime-verified: unpersisted, the doc_len reference re-ran it).
    # Support is identical by construction: a doc with no nonempty tokens
    # (null/empty/whitespace text) has NO tf rows — explode of an empty
    # array yields nothing — and size() ≤ 0 filters exactly those (size of
    # a null array is -1).
    doc_len = df.select(
        F.col(id_col),
        F.size(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit(""))
        ).cast("long").alias("m"),
    ).filter(F.col("m") > 0)
    grid = doc_len.crossJoin(F.broadcast(class_consts))
    scored = (
        grid.join(evidence, [id_col, "label"], "left")
        .select(
            id_col,
            "label",
            (
                F.col("ln_prior")
                - F.col("m") * F.col("ln_denom")
                + F.coalesce(F.col("ev"), F.lit(0.0))
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("label"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, F.col("label").alias("predicted"), "score")
    )


def nb_classify(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    persist_input: bool | None = None,
) -> DataFrame:
    """Self-train-and-score convenience: fit NB on ``df``'s labels, predict
    for every row, and report agreement — the shape of a language-ID /
    quality-gate audit (how separable are the declared labels under a bag
    of words?).

    Training and scoring each tokenize the corpus, so the combined plan
    scans ``df`` several times; past the :data:`dsir.PERSIST_MIN_INPUT_BYTES`
    threshold the input is pinned DISK_ONLY first (same size-adaptive
    policy as dsir_select — materializing a page-cache-resident toy corpus
    costs more than re-scanning it)."""
    from pyspark.storagelevel import StorageLevel

    from dlt_iceberg_spark.operators.dsir import (
        PERSIST_MIN_INPUT_BYTES,
        _plan_size_bytes,
    )

    if persist_input is None:
        persist_input = _plan_size_bytes(df) >= PERSIST_MIN_INPUT_BYTES
    if persist_input:
        df = df.persist(StorageLevel.DISK_ONLY)
    # Train and score each re-explode the (possibly persisted) corpus.
    # A shared persisted (doc, label, term, c) aggregate deriving counts
    # and tf from one tokenize pass was built and MEASURED this round —
    # it loses at BOTH scales (1.40x worse at sf0.1; 1.26x worse at a
    # 1M-doc / 40M-token corpus with the input persist engaged): the
    # (doc, term) key has ~no cardinality reduction over the exploded
    # token stream, so materializing it to disk costs more than the
    # map-side re-tokenizes it replaces, and counts/tf each pay an EXTRA
    # corpus-sized shuffle over the base.  See OPTIMIZATION_r11.md
    # ("the persist lesson") — keep the unshared form.
    tw, cc = nb_train(df, text_col, label_col, id_col)
    pred = nb_score(df, tw, cc, text_col, id_col)
    return pred.join(
        df.select(id_col, F.col(label_col).alias("actual")), id_col
    ).select(
        id_col,
        "predicted",
        "actual",
        (F.col("predicted") == F.col("actual")).cast("int").alias("match"),
        "score",
    )


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int | None = None,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 ranking of every document against a bag-of-terms query —
    the standard lexical-retrieval scorer training-data pipelines use for
    query-targeted curation and contamination triage (rank the corpus
    against an eval prompt before any embedding model runs).

    Formula (Lucene's non-negative IDF variant):

        idf(t)     = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)
        score(d)   = Σ_{t ∈ q} idf(t) · tf_td·(k1+1) /
                                (tf_td + k1·(1 − b + b·dl_d/avgdl))

    with ``N`` = documents with ≥ 1 token, ``dl`` = the document's token
    count and ``avgdl`` the mean document length.

    Plan shape — ONE corpus scan, ZERO corpus-sized shuffles: each doc's
    length plus a WIDE per-query-term tf column set (|q| columns, not a
    vocabulary) are MAP-SIDE array expressions over the split token array
    (``size(filter(...))`` — no explode, no (doc, term) stream, no
    doc-keyed exchange), the doc-sized result materializes once via an
    eager localCheckpoint (it feeds both the 1-row corpus-stats
    aggregate — n, avgdl, per-term df — and the scoring projection;
    checkpoint storage is freed with the returned plan, unlike persist()'s
    app-lifetime cache), and scoring is a broadcast of that stats row back
    onto the matched docs, fully inside whole-stage codegen.  No joins, no
    vocabulary-sized state, no second corpus read — the shape that
    survives a 100 TB corpus and makes the operator cheap to REUSE (hybrid
    ranking normalizes against the max score without re-reading the
    corpus).

    Output: ``(id_col, score)`` for documents matching ≥ 1 query term.
    With ``k``, the global top-k ordered densest-first (ties by id
    ascending; TakeOrderedAndProject — every partition forwards ≤ k
    candidates); without it, UNORDERED — downstream fusions (hybrid
    ranking) re-key anyway, and a global sort nobody consumes is pure
    shuffle cost at corpus scale.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    q = list(query_terms)
    if "_bm25_toks" in (id_col, text_col):
        raise ValueError("column name collides with bm25 staging column")
    # Per-doc features map-side (guide §2.3/§4.1 — same move as nb_score's
    # doc_len): dl and each query-term tf are array expressions over the
    # split token array, so the old explode + corpus-sized doc-keyed
    # exchange disappears from the plan entirely.  The token array is
    # staged once per row via a projection (Spark CSE skips lambda-bearing
    # expressions — r11 lesson).  Row support is identical to the old
    # explode+groupBy form: docs with no nonempty tokens had no term rows
    # there, and here size(toks) <= 0 filters exactly those (size of a
    # null array is -1; split(null) is null).  Counts are identical:
    # count(*) per doc == size(toks); sum(term = t) == size(filter(= t)).
    staged = fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.filter(
            F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
        ).alias("_bm25_toks"),
    )
    def _matches(term: str):
        # closure, NOT a default arg: a 2-arg lambda would make F.filter
        # pass the array index as the second parameter
        return lambda x: x == F.lit(term)

    cols = [F.size("_bm25_toks").cast("long").alias("_dl")]
    for i, t in enumerate(q):
        cols.append(
            F.size(F.filter(F.col("_bm25_toks"), _matches(t)))
            .cast("long")
            .alias(f"_tf{i}")
        )
    # doc-sized (one row per doc, |q|+1 columns) — tiny next to the corpus.
    # It feeds TWO consumers (the 1-row stats aggregate + scoring), so it
    # must materialize once; an eager localCheckpoint instead of persist()
    # ties the cached partitions' lifetime to the RETURNED DataFrame (the
    # ContextCleaner frees checkpoint storage when the plan is GC'd) —
    # persist() would pin them in the CacheManager for the app lifetime
    # across repeated invocations (gate reruns, hybrid_search reuse).
    per_doc = (
        staged.select(F.col(id_col), *cols)
        .filter(F.col("_dl") > 0)
        .localCheckpoint(eager=True)
    )
    stat_aggs = [
        F.avg("_dl").alias("_avgdl"),
        F.count("*").alias("_n"),
    ]
    for i in range(len(q)):
        stat_aggs.append(
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
        )
    stats = per_doc.agg(*stat_aggs)
    any_tf = F.col("_tf0")
    for i in range(1, len(q)):
        any_tf = any_tf + F.col(f"_tf{i}")
    matched = per_doc.filter(any_tf > 0)
    joined = matched.crossJoin(F.broadcast(stats))
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl")
    )
    score = F.lit(0.0)
    for i in range(len(q)):
        idf = F.log(
            (F.col("_n") - F.col(f"_df{i}") + F.lit(0.5))
            / (F.col(f"_df{i}") + F.lit(0.5))
            + F.lit(1.0)
        )
        score = score + idf * (F.col(f"_tf{i}") * F.lit(k1 + 1.0)) / (
            F.col(f"_tf{i}") + norm
        )
    scored = joined.select(id_col, score.alias("score"))
    if k is not None:
        return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    return scored

"""Reproducible sampling operators for training-data pipelines.

The reference has no sampling surface (its pipelines load everything);
these are the operators a 100 TB corpus pipeline needs to cut data DOWN
deterministically — so a rerun, a different cluster, or a different
engine (the DuckDB oracle) selects the SAME rows.  Three design rules:

- **Hash-gated, not RNG-gated.**  ``rand()`` samples differ run-to-run
  and task-retry-to-task-retry (a retried partition resamples!).  Gating
  on ``md5(key)`` makes the decision a pure function of the row key:
  stable under retries, speculative execution, and engine swaps.
- **Map-side where possible.**  ``deterministic_sample`` and
  ``hash_split`` are single-pass filters/projections — no shuffle, no
  driver coordination; they compose with scan pruning and stay narrow at
  any scale.
- **Skew-proof where a shuffle is needed.**  ``stratified_cap`` bounds
  rows per group; the naive window (one partition per group) serializes
  the hottest group through one task.  The two-stage form caps per
  (group × input-partition) first — hot groups fan out across the
  cluster — then runs the exact global cap over the ≤ cap × n_partitions
  survivors.  Global top-cap rows are each top-cap within their own
  partition, so the result is exactly the naive window's.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: 16^8 — the sample gate compares the first 8 hex chars of md5 (lowercase
#: hex compares lexicographically == numerically) against this scale
_HEX_SPACE = 1 << 32


def _hex_threshold(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(fraction * _HEX_SPACE), _HEX_SPACE - 1), "08x")


def _hash_prefix(key_col: str | Column, salt: str) -> Column:
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by ``md5(key || salt)`` — the
    same rows every run, on every engine, under every retry.

    ``salt`` decorrelates independent samples over the same keys (two
    10% samples with different salts overlap ~1%, not 100%).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:  # keep-everything must not lose hash-prefix ffffffff
        return df
    return df.filter(_hash_prefix(key_col, salt) < F.lit(_hex_threshold(fraction)))


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Assign every row to one named split (train/val/test) by hash range.

    ``splits`` maps name → weight (normalized to 1).  Deterministic and
    disjoint: a key lands in exactly one split, always the same one —
    the property that keeps eval data out of training data across
    reruns and incremental loads.  Adds a ``split`` column; map-side.

    When the input was already gated on the SAME key (e.g. a
    ``deterministic_sample`` upstream), pass a different ``salt`` here —
    with the same salt the two hash gates correlate perfectly and the
    surviving rows all land in the first split.
    """
    if not splits:
        raise ValueError("splits must be non-empty")
    total = sum(splits.values())
    if total <= 0:
        raise ValueError("split weights must sum > 0")
    h = _hash_prefix(key_col, salt)
    expr = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name] / total
        cond = h < F.lit(_hex_threshold(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return df.withColumn("split", last if expr is None else expr.otherwise(names[-1]))


def stratified_cap(
    df: DataFrame,
    group_cols: list[str],
    cap: int,
    order_col: str,
    two_stage: bool = True,
) -> DataFrame:
    """At most ``cap`` rows per group, keeping the lowest ``order_col``
    values (deterministic given a unique order key).

    The canonical balance operator: bound any one source/language/domain
    so it can't dominate the mixture.  ``two_stage=True`` (default) adds
    a per-input-partition pre-cap so a group with a billion rows never
    funnels through a single window task; the final window then sees at
    most ``cap × n_partitions`` rows per group — metadata-sized — and
    produces exactly the single-window result.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    w = Window.partitionBy(*group_cols).orderBy(F.col(order_col))
    if two_stage:
        pre = Window.partitionBy(F.spark_partition_id(), *group_cols).orderBy(
            F.col(order_col)
        )
        df = (
            df.withColumn("_pre_rn", F.row_number().over(pre))
            .filter(F.col("_pre_rn") <= cap)
            .drop("_pre_rn")
        )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def mixture_fractions(
    counts: dict[str, int], weights: dict[str, float]
) -> dict[str, float]:
    """Per-source keep fractions realizing the weight proportions at the
    largest total that needs NO upsampling.

    scale = min_i(n_i / w_i) rows of total mixture; keep_i = w_i·scale/n_i
    (the binding source keeps everything).  Exposed separately so callers
    with known counts (lake manifests make them free) skip the count jobs.
    """
    if set(counts) != set(weights):
        raise ValueError("counts and weights must cover the same sources")
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum > 0")
    norm = {k: w / total_w for k, w in weights.items()}
    eligible = {k: counts[k] / norm[k] for k in norm if norm[k] > 0 and counts[k] > 0}
    if not eligible:
        return {k: 0.0 for k in norm}
    scale = min(eligible.values())
    return {
        k: (min(norm[k] * scale / counts[k], 1.0) if counts[k] > 0 else 0.0)
        for k in norm
    }


def weighted_mixture(
    sources: dict[str, tuple[DataFrame, float]],
    key_col: str,
    counts: dict[str, int] | None = None,
    salt: str = "",
) -> DataFrame:
    """Blend sources to target proportions by DOWN-sampling only — the
    standard corpus-mixture operator (w% web, x% code, ...).

    Each source is hash-gate sampled at its ``mixture_fractions`` rate and
    tagged with a ``mixture_source`` column; the union preserves the weight
    ratios in expectation while every selection stays deterministic.  Pass
    ``counts`` to skip the one count() job per source (lake tables get
    counts free from manifests).  Sampling is map-side; the union adds no
    shuffle.
    """
    if not sources:
        raise ValueError("sources must be non-empty")
    if counts is None:
        counts = {k: df.count() for k, (df, _) in sources.items()}
    fractions = mixture_fractions(counts, {k: w for k, (_, w) in sources.items()})
    parts = []
    for name, (df, _) in sources.items():
        parts.append(
            deterministic_sample(df, key_col, fractions[name], salt=salt).withColumn(
                "mixture_source", F.lit(name)
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def select_top_tokens(
    df: DataFrame,
    score_col: str,
    tokens_col: str,
    budget: int,
    id_col: str = "doc_id",
    id_buckets: int = 1024,
    max_distinct: int = 100_000,
) -> DataFrame:
    """Quality-budget curation: keep rows in (score DESC, id ASC) order
    while the running token total stays ≤ ``budget`` — exactly the rows a
    global sorted cumulative sum would keep, computed WITHOUT a global
    sort.

    The naive form (one window over the full corpus) funnels 100 TB
    through a single sort partition.  This decomposition keeps every job
    metadata-sized:

    1. per-score token totals (one tiny shuffle; requires a QUANTIZED
       score, e.g. rounded to ≤4 decimals, so distinct scores are few) →
       driver cumsum picks the boundary score and its remaining budget;
    2. rows above the boundary score pass with a map-side filter;
    3. boundary-score ties bucket by id range (map-side width_bucket);
       per-bucket totals → driver cumsum picks the boundary bucket;
    4. only that one bucket — 1/``id_buckets`` of the ties — pays an
       exact running-sum window.

    Rows with NULL score are excluded.  Deterministic; the kept set
    matches ``sum(tokens) OVER (ORDER BY score DESC, id) <= budget``.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    from pyspark.storagelevel import StorageLevel

    # steps 1/3/4 are separate driver actions — unpersisted, each one
    # re-runs the full upstream plan (for quality-budget curation that is
    # the corpus tokenize+score pass, 3-4x).  Projected to
    # (id, score, tokens) the pin is ~24 bytes/row at any corpus size.
    #
    # Persist policy (ADVICE r11): a NARROW caller (df is exactly the
    # three columns — every registered query path) pins the filtered input
    # itself, and the output reads the cache, so the caller's single
    # materialization never re-runs the corpus scoring pass (the measured
    # 0.64x win).  That pin must outlive this call — the output's lineage
    # reads it — so it is released on the NEXT call instead (no cross-call
    # accumulation; within one app the leak is bounded at one narrow
    # table, and bench/oracle runs clearCache between queries anyway).
    # A WIDE caller (extra payload columns) must NOT have its payload
    # pinned for the session: the decision collects run on a persisted
    # narrow projection that is unpersisted before returning, and the
    # output is rebuilt from ``df`` with literal boundary predicates
    # (one upstream recompute at materialization — the memory-safe trade).
    while _TOP_TOKENS_PINNED:
        _TOP_TOKENS_PINNED.pop().unpersist(False)
    narrow = set(df.columns) == {id_col, score_col, tokens_col}
    base = df.filter(F.col(score_col).isNotNull())
    if narrow:
        base = base.persist(StorageLevel.MEMORY_AND_DISK)
        _TOP_TOKENS_PINNED.append(base)
        dec = base
    else:
        dec = (
            df.select(id_col, score_col, tokens_col)
            .filter(F.col(score_col).isNotNull())
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    # the driver cumsum in step 1 is O(distinct scores) — only safe when the
    # score is quantized.  A raw float score makes distinct ≈ n and would
    # collect the corpus; the limit bounds the collect so the guard and the
    # totals share ONE job (a separate countDistinct pass would rescan the
    # corpus just to ask a question this aggregation answers anyway).
    totals = (
        dec.groupBy(score_col)
        .agg(F.sum(tokens_col).alias("tok"))
        .limit(max_distinct + 1)
        .collect()
    )
    if len(totals) > max_distinct:
        raise ValueError(
            f"select_top_tokens: more than {max_distinct} distinct values in "
            f"{score_col!r} — the per-score driver cumsum requires a "
            "quantized score; round/bucket the score column first "
            "(e.g. F.round(score, 4))"
        )
    scores = sorted(((r[0], r["tok"]) for r in totals), key=lambda x: -x[0])
    cum = 0
    boundary = None
    r_budget = budget
    for s, tok in scores:
        if cum + tok <= budget:
            cum += tok
        else:
            boundary = s
            r_budget = budget - cum
            break
    if boundary is None:  # everything fits
        if not narrow:
            dec.unpersist(False)
        return base
    dec_ties = dec.filter(F.col(score_col) == F.lit(boundary))
    lo, hi = dec_ties.agg(F.min(id_col), F.max(id_col)).collect()[0]

    def _tb() -> F.Column:
        return F.width_bucket(
            F.col(id_col).cast("double"),
            F.lit(float(lo)),
            F.lit(float(hi) + 1),
            id_buckets,
        )

    btot = {
        r["_tb"]: r["tok"]
        for r in dec_ties.withColumn("_tb", _tb())
        .groupBy("_tb")
        .agg(F.sum(tokens_col).alias("tok"))
        .collect()
    }
    full = base.filter(F.col(score_col) > F.lit(boundary))
    ties = base.filter(F.col(score_col) == F.lit(boundary))
    bucketed = ties.withColumn("_tb", _tb())
    cum2 = 0
    edge_bucket = None
    r2 = r_budget
    full_buckets = []
    for b in sorted(btot):
        if cum2 + btot[b] <= r_budget:
            cum2 += btot[b]
            full_buckets.append(b)
        else:
            edge_bucket = b
            r2 = r_budget - cum2
            break
    parts = [full]
    if full_buckets:
        parts.append(bucketed.filter(F.col("_tb").isin(full_buckets)).drop("_tb"))
    if edge_bucket is not None:
        w = Window.orderBy(F.col(id_col)).rowsBetween(Window.unboundedPreceding, 0)
        parts.append(
            bucketed.filter(F.col("_tb") == edge_bucket)
            .withColumn("_run", F.sum(tokens_col).over(w))
            .filter(F.col("_run") <= r2)
            .drop("_run", "_tb")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if not narrow:
        # every decision is now a Python literal inside `out`'s plan — the
        # narrow pin has no consumer left, release it before returning
        dec.unpersist(False)
    return out


#: the previous narrow-caller call's pinned base (released lazily on the
#: next call — see the persist-policy comment in select_top_tokens)
_TOP_TOKENS_PINNED: list = []


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: str = "",
) -> DataFrame:
    """Deterministic corpus shuffle + sharding for training export.

    Data loaders want (a) a fixed number of shard files, (b) a global
    order uncorrelated with ingest order, (c) bit-identical output on
    rerun.  Hash order delivers all three without ``orderBy(rand())``
    (non-reproducible, global sort): ``shard`` = top bits of md5(key‖seed)
    — so shards are hash-random and equal-sized in expectation — and
    ``shard_pos`` = the remaining hex digits, a reproducible within-shard
    sort key.  Writing is ``repartition(n, shard).sortWithinPartitions
    (shard_pos)`` — one shuffle, no global sort, any engine reproduces it.

    A new ``seed`` reshuffles every epoch deterministically.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = _hash_prefix(key_col, seed)  # first 8 md5 hex chars
    shard = (
        F.conv(h, 16, 10).cast("bigint") % n_shards
    ).cast("int")
    pos = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(seed))), 9, 16
    )
    return df.withColumn("shard", shard).withColumn("shard_pos", pos)


def sample_oracle_gate(key_sql: str, fraction: float, salt: str = "") -> str:
    """The DuckDB-side predicate equivalent to ``deterministic_sample`` —
    exposed so oracle SQL strings stay in lockstep with the operator."""
    return (
        f"substr(md5(CAST({key_sql} AS VARCHAR) || '{salt}'), 1, 8)"
        f" < '{_hex_threshold(fraction)}'"
    )


def split_oracle_case(key_sql: str, splits: dict[str, float], salt: str = "") -> str:
    """The DuckDB CASE expression equivalent to ``hash_split``'s column."""
    total = sum(splits.values())
    h = f"substr(md5(CAST({key_sql} AS VARCHAR) || '{salt}'), 1, 8)"
    names = list(splits)
    acc = 0.0
    arms = []
    for name in names[:-1]:
        acc += splits[name] / total
        arms.append(f"WHEN {h} < '{_hex_threshold(acc)}' THEN '{name}'")
    if not arms:
        return f"'{names[-1]}'"
    return "CASE " + " ".join(arms) + f" ELSE '{names[-1]}' END"

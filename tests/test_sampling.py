"""Sampling operator tests: determinism, rate accuracy, cap exactness."""

import pytest
from pyspark.sql import functions as F

from dlt_iceberg_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    stratified_cap,
)


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.range(20000)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 7).cast("string").alias("lang"),
        )
        .persist()
    )


def test_deterministic_sample_rate_and_stability(docs):
    s1 = deterministic_sample(docs, "doc_id", 0.10)
    n = s1.count()
    assert 0.08 * 20000 < n < 0.12 * 20000
    # identical selection on rerun and under different partitioning
    ids1 = {r.doc_id for r in s1.collect()}
    ids2 = {r.doc_id for r in deterministic_sample(docs.repartition(13), "doc_id", 0.10).collect()}
    assert ids1 == ids2
    # a larger fraction is a superset (hash-gate monotonicity)
    ids20 = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.20).collect()}
    assert ids1 <= ids20
    # salts decorrelate: overlap of two independent 10% samples ≈ 1%
    other = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.10, salt="b").collect()}
    assert len(ids1 & other) < 0.03 * 20000


def test_deterministic_sample_bounds(docs):
    assert deterministic_sample(docs, "doc_id", 0.0).count() == 0
    assert deterministic_sample(docs, "doc_id", 1.0).count() == 20000
    with pytest.raises(ValueError):
        deterministic_sample(docs, "doc_id", 1.5)


def test_hash_split_partitions_every_row_once(docs):
    out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 20000
    assert 0.77 * 20000 < counts["train"] < 0.83 * 20000
    assert 0.08 * 20000 < counts["val"] < 0.12 * 20000
    # stability: same assignment on rerun
    a = {(r.doc_id, r.split) for r in out.collect()}
    b = {(r.doc_id, r.split) for r in hash_split(docs.repartition(7), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert a == b
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {})


def test_stratified_cap_matches_naive_window(docs):
    scattered = docs.repartition(16)  # groups spread across partitions
    two = stratified_cap(scattered, ["lang"], 25, "doc_id", two_stage=True)
    naive = stratified_cap(scattered, ["lang"], 25, "doc_id", two_stage=False)
    assert sorted((r.lang, r.doc_id) for r in two.collect()) == sorted(
        (r.lang, r.doc_id) for r in naive.collect()
    )
    per_group = two.groupBy("lang").count().collect()
    assert all(r["count"] == 25 for r in per_group)
    # keeps the LOWEST order keys per group
    assert two.filter("lang = '0'").agg(F.max("doc_id")).collect()[0][0] == 24 * 7


def test_stratified_cap_under_cap_groups_survive(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "id long, g string")
    out = stratified_cap(df, ["g"], 5, "id")
    assert out.count() == 3
    with pytest.raises(ValueError):
        stratified_cap(df, ["g"], 0, "id")


def test_mixture_fractions_math():
    from dlt_iceberg_spark.operators.sampling import mixture_fractions

    # equal counts, binary weights -> exact keeps
    f = mixture_fractions({"a": 100, "b": 100, "c": 100}, {"a": 0.5, "b": 0.25, "c": 0.25})
    assert f == {"a": 1.0, "b": 0.5, "c": 0.5}
    # binding source keeps everything; others scale to preserve ratios
    f = mixture_fractions({"a": 10, "b": 1000}, {"a": 0.5, "b": 0.5})
    assert f["a"] == 1.0 and abs(f["b"] - 0.01) < 1e-12
    # empty source contributes nothing and doesn't zero the mixture
    f = mixture_fractions({"a": 0, "b": 100}, {"a": 0.5, "b": 0.5})
    assert f["a"] == 0.0 and f["b"] == 1.0
    with pytest.raises(ValueError):
        mixture_fractions({"a": 1}, {"b": 1.0})


def test_weighted_mixture_proportions(spark):
    from dlt_iceberg_spark.operators.sampling import weighted_mixture

    big = spark.range(8000).select(F.col("id").alias("k"))
    small = spark.range(8000, 10000).select(F.col("id").alias("k"))
    out = weighted_mixture({"big": (big, 0.5), "small": (small, 0.5)}, "k").persist()
    n = {r.mixture_source: r.n for r in out.groupBy("mixture_source").agg(F.count("*").alias("n")).collect()}
    assert n["small"] == 2000  # binding source: keep all
    assert 0.85 * 2000 < n["big"] < 1.15 * 2000  # ~matched in expectation
    # deterministic across reruns
    a = sorted((r.mixture_source, r.k) for r in out.collect())
    out2 = weighted_mixture({"big": (big.repartition(5), 0.5), "small": (small, 0.5)}, "k")
    assert a == sorted((r.mixture_source, r.k) for r in out2.collect())


@pytest.mark.slow
def test_select_top_tokens_matches_global_window(spark):
    from pyspark.sql import Window
    from dlt_iceberg_spark.operators.sampling import select_top_tokens

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        # quantized score with heavy ties (4 levels) and nulls
        F.when(F.col("id") % 17 == 0, None).otherwise((F.col("id") % 4) * 0.25).alias("score"),
        (F.col("id") % 90 + 10).alias("n_tok"),
    ).persist()

    for budget in (0, 500, 20000, 10**9):
        got = {r.doc_id for r in select_top_tokens(df, "score", "n_tok", budget).collect()}
        w = Window.orderBy(F.col("score").desc(), F.col("doc_id")).rowsBetween(
            Window.unboundedPreceding, 0
        )
        ref = {
            r.doc_id
            for r in df.filter("score IS NOT NULL")
            .withColumn("run", F.sum("n_tok").over(w))
            .filter(F.col("run") <= budget)
            .collect()
        }
        assert got == ref, f"budget={budget}"

    with pytest.raises(ValueError):
        select_top_tokens(df, "score", "n_tok", -1)


def test_shuffle_shards_deterministic_and_balanced(spark):
    from dlt_iceberg_spark.operators.sampling import shuffle_shards

    df = spark.range(8000).select(F.col("id").alias("doc_id"))
    s1 = shuffle_shards(df, "doc_id", 16, seed="a")
    counts = {r.shard: r.n for r in s1.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(range(16))
    assert all(300 < n < 700 for n in counts.values())  # ~500 each
    # bit-identical on rerun / repartition
    a = sorted((r.doc_id, r.shard, r.shard_pos) for r in s1.collect())
    b = sorted((r.doc_id, r.shard, r.shard_pos)
               for r in shuffle_shards(df.repartition(5), "doc_id", 16, seed="a").collect())
    assert a == b
    # different seed -> different order (epoch reshuffle)
    c = sorted((r.doc_id, r.shard) for r in shuffle_shards(df, "doc_id", 16, seed="b").collect())
    assert c != sorted((r.doc_id, r.shard) for r in s1.collect())
    with pytest.raises(ValueError):
        shuffle_shards(df, "doc_id", 0)


def test_select_top_tokens_wide_caller_keeps_payload_and_unpins(spark):
    """A caller with payload columns beyond (id, score, tokens) must get
    the same kept set WITH its payload intact, and the operator must not
    leave the payload pinned in the cache (the wide path persists only a
    narrow decision projection and unpersists it before returning —
    ADVICE r11)."""
    from pyspark.sql import Window
    from dlt_iceberg_spark.operators.sampling import (
        _TOP_TOKENS_PINNED,
        select_top_tokens,
    )

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 13 == 0, None).otherwise((F.col("id") % 3) * 0.5).alias("score"),
        (F.col("id") % 40 + 5).alias("n_tok"),
        F.concat(F.lit("payload-"), F.col("id")).alias("text"),  # wide!
    ).persist()

    for budget in (0, 700, 10**9):
        out = select_top_tokens(df, "score", "n_tok", budget)
        assert set(out.columns) == {"doc_id", "score", "n_tok", "text"}
        rows = {(r.doc_id, r.text) for r in out.collect()}
        w = Window.orderBy(F.col("score").desc(), F.col("doc_id")).rowsBetween(
            Window.unboundedPreceding, 0
        )
        ref = {
            (r.doc_id, r.text)
            for r in df.filter("score IS NOT NULL")
            .withColumn("run", F.sum("n_tok").over(w))
            .filter(F.col("run") <= budget)
            .collect()
        }
        assert rows == ref, f"budget={budget}"
        # payload round-trips
        assert all(t == f"payload-{d}" for d, t in rows)
        # wide callers never join the cross-call pin list
        assert not _TOP_TOKENS_PINNED
    df.unpersist()


def test_select_top_tokens_narrow_pin_released_on_next_call(spark):
    """Narrow callers pin their filtered base for the caller's one
    materialization; the NEXT call must release the previous pin so a
    long-lived session never accumulates pinned tables."""
    from dlt_iceberg_spark.operators.sampling import (
        _TOP_TOKENS_PINNED,
        select_top_tokens,
    )

    def mk(n):
        # distinct row counts => distinct canonical plans, so the two
        # calls cannot share one CacheManager entry
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            ((F.col("id") % 4) * 0.25).alias("score"),
            F.lit(10).alias("n_tok"),
        )

    select_top_tokens(mk(100), "score", "n_tok", 200).collect()
    assert len(_TOP_TOKENS_PINNED) == 1
    first_pin = _TOP_TOKENS_PINNED[0]
    select_top_tokens(mk(120), "score", "n_tok", 300).collect()
    assert len(_TOP_TOKENS_PINNED) == 1
    assert _TOP_TOKENS_PINNED[0] is not first_pin
    assert first_pin.storageLevel.useMemory is False  # released
    _TOP_TOKENS_PINNED.pop().unpersist()


def test_select_top_tokens_rejects_unquantized_scores(spark):
    """A raw float score would turn the per-score driver cumsum into an
    O(n) collect; the guard must fail loudly instead."""
    import pytest as _pytest
    from dlt_iceberg_spark.operators.sampling import select_top_tokens

    df = spark.range(20).selectExpr(
        "id AS doc_id", "rand(7) AS score", "10 AS n_tokens"
    )
    with _pytest.raises(ValueError, match="quantized"):
        select_top_tokens(df, "score", "n_tokens", budget=50, max_distinct=10)


def test_bounded_sample_is_order_independent(spark):
    """Training samples must not depend on file/scan order (the limit()
    trap: 'first N rows' = one file's distribution on a real table).
    The hash-gated sample returns the SAME set from a sorted, reverse-sorted,
    or shuffled input."""
    from dlt_iceberg_spark.operators.similarity import _bounded_sample

    rows = [(i, [float(i), float(i % 5)]) for i in range(500)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def sample_set(frame):
        return {
            tuple(r[0]) for r in _bounded_sample(frame, "embedding", 50).collect()
        }

    asc = sample_set(df.orderBy("vec_id"))
    desc = sample_set(df.orderBy(df.vec_id.desc()))
    shuffled = sample_set(df.repartition(7))
    assert asc == desc == shuffled
    assert len(asc) <= 50 and len(asc) > 5

"""Function-surface tests: sketches and column helpers."""

from pyspark.sql import functions as F

from dlt_iceberg_spark.functions import (
    approx_distinct,
    approx_quantiles,
    column_profile,
    cosine,
    heavy_hitters,
    rnd,
)


def test_approx_distinct(spark):
    df = spark.range(1000).withColumn("bucket", F.col("id") % 10)
    row = approx_distinct(df, ["id", "bucket"], rsd=0.02).collect()[0]
    assert abs(row.id_approx_distinct - 1000) <= 50
    assert row.bucket_approx_distinct == 10


def test_approx_quantiles(spark):
    df = spark.range(1, 1001).withColumn("v", F.col("id").cast("double"))
    q = approx_quantiles(df, "v", (0.5,), accuracy=10_000).collect()[0].v_quantiles
    assert abs(q[0] - 500.0) <= 2


def test_heavy_hitters(spark):
    vals = ["a"] * 50 + ["b"] * 30 + ["c"] * 20
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    top = heavy_hitters(df, "v", k=2).collect()
    assert [(r.value, r.n) for r in top] == [("a", 50), ("b", 30)]
    assert abs(top[0].share - 0.5) < 1e-9


def test_column_profile(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "y")], "id long, name string"
    )
    prof = {r.column: r for r in column_profile(df).collect()}
    assert prof["name"].nulls == 1
    assert prof["id"].rows == 3
    assert prof["id"].min == "1" and prof["id"].max == "3"


def test_cosine_and_rnd(spark):
    df = spark.createDataFrame([([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])], "a array<double>, b array<double>")
    out = df.select(rnd(cosine(F.col("a"), F.col("b")), 4).alias("c")).collect()
    assert [r.c for r in out] == [1.0, 0.0]


def test_kmv_sketch_exact_below_k(spark):
    from dlt_iceberg_spark.functions.sketches import kmv_overlap_estimate, kmv_sketch

    a = spark.range(100).selectExpr("CAST(id AS STRING) AS v")
    b = spark.range(50, 130).selectExpr("CAST(id AS STRING) AS v")
    ka = kmv_sketch(a, "v", k=256).collect()[0]
    kb = kmv_sketch(b, "v", k=256).collect()[0]
    est = kmv_overlap_estimate(list(ka.ks), list(kb.ks), 256)
    assert est["exact"] is True
    assert est["distinct_a"] == 100 and est["distinct_b"] == 80
    assert est["intersection"] == 50
    assert abs(est["jaccard"] - 50 / 130) < 1e-12


def test_kmv_sketch_estimates_within_theta_error(spark):
    from dlt_iceberg_spark.functions.sketches import kmv_overlap_estimate, kmv_sketch

    n, k = 20_000, 512
    a = spark.range(n).selectExpr("CAST(id AS STRING) AS v")
    b = spark.range(n // 2, n + n // 2).selectExpr("CAST(id AS STRING) AS v")
    ka = kmv_sketch(a, "v", k=k).collect()[0]
    kb = kmv_sketch(b, "v", k=k).collect()[0]
    assert len(ka.ks) == k  # bounded output, never corpus-sized
    est = kmv_overlap_estimate(list(ka.ks), list(kb.ks), k)
    assert est["exact"] is False
    # KMV relative error ~ 1/sqrt(k) ≈ 4.4%; allow 4 sigma
    for key, truth in (("distinct_a", n), ("distinct_b", n), ("intersection", n // 2)):
        assert abs(est[key] - truth) / truth < 0.18, (key, est[key], truth)
    assert abs(est["jaccard"] - (n // 2) / (n + n // 2)) < 0.06


def test_kmv_sketch_plan_is_bounded_topk(spark):
    from dlt_iceberg_spark.functions.sketches import kmv_sketch

    df = spark.range(1000).selectExpr("CAST(id AS STRING) AS v")
    plan = kmv_sketch(df, "v", k=16)._jdf.queryExecution().executedPlan().toString()
    # distinct+orderBy+limit must compile to the two-stage bounded top-k,
    # not a global sort of every distinct hash
    assert "TakeOrderedAndProject" in plan


def test_python_xxh64_matches_spark_xxhash64(spark):
    """functions/xxhash.py must be bit-identical to Spark's xxhash64 for
    the bucket-transform source types the streaming sink supports — a
    single mismatch would land stream files in buckets probe rewriting
    never prunes to."""
    from pyspark.sql import functions as F

    from dlt_iceberg_spark.functions.xxhash import (
        spark_xxhash64_int,
        spark_xxhash64_long,
        spark_xxhash64_string,
    )

    longs = [0, 1, -1, 42, 2**31 - 1, -(2**31), 2**62, -(2**62), 123456789012345]
    rows = (
        spark.createDataFrame([(v,) for v in longs], "v long")
        .select("v", F.xxhash64("v").alias("h"))
        .collect()
    )
    assert all(spark_xxhash64_long(r.v) == r.h for r in rows)

    ints = [0, 1, -1, 42, 2**31 - 1, -(2**31)]
    rows = (
        spark.createDataFrame([(v,) for v in ints], "v int")
        .select("v", F.xxhash64("v").alias("h"))
        .collect()
    )
    assert all(spark_xxhash64_int(r.v) == r.h for r in rows)

    strings = ["", "a", "hello world", "日本語テキスト", "x" * 100, "x" * 31]
    rows = (
        spark.createDataFrame([(v,) for v in strings], "v string")
        .select("v", F.xxhash64("v").alias("h"))
        .collect()
    )
    assert all(spark_xxhash64_string(r.v) == r.h for r in rows)


def test_arrow_string_xxh64_matches_scalar_and_spark(spark):
    """The batched Arrow-buffer string hasher (per-byte-length numpy
    passes over offsets+data — the sink's string-bucket hot path, VERDICT
    r10 task 3) must be bit-identical to the scalar form and to Spark,
    across every chunk-schedule regime (empty, <4, 4–7, 8–31, ≥32 bytes,
    multi-byte UTF-8), with nulls flagged, and survive a SLICED array
    (nonzero arr.offset into the offsets buffer)."""
    import random

    import pyarrow as pa
    from pyspark.sql import functions as F

    from dlt_iceberg_spark.functions.xxhash import (
        spark_xxhash64_string,
        spark_xxhash64_string_arrow,
    )

    rng = random.Random(13)
    alphabet = "abcXYZ019 _-日本語ü€"
    vals = ["", "a", "abc", "abcd", "abcdefg", "abcdefgh", "x" * 31,
            "x" * 32, "y" * 33, "z" * 100, "日本語テキスト", None, "", None]
    vals += [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 80)))
        for _ in range(60)
    ]
    arr = pa.array(vals, type=pa.string())
    h, mask = spark_xxhash64_string_arrow(arr)
    for i, v in enumerate(vals):
        if v is None:
            assert mask[i]
        else:
            assert not mask[i] and h[i] == spark_xxhash64_string(v), (i, v)
    # spark agreement on the non-null subset
    nn = [v for v in vals if v is not None]
    rows = (
        spark.createDataFrame([(v,) for v in nn], "v string")
        .select("v", F.xxhash64("v").alias("h"))
        .collect()
    )
    by_val = {r.v: r.h for r in rows}
    hv = {v: int(x) for v, x, m in zip(vals, h, mask) if not m}
    assert all(hv[v] == by_val[v] for v in set(nn))
    # sliced array: offsets must be read relative to arr.offset
    sl = arr.slice(3, 40)
    hs, ms = spark_xxhash64_string_arrow(sl)
    for i, v in enumerate(vals[3:43]):
        if v is None:
            assert ms[i]
        else:
            assert hs[i] == spark_xxhash64_string(v)
    # large_string takes the int64-offsets path
    hl, ml = spark_xxhash64_string_arrow(pa.array(vals, type=pa.large_string()))
    assert list(hl) == list(h) and list(ml) == list(mask)


def test_heavy_hitters_single_scan(spark):
    """The total rides the counts aggregate via ReusedExchange — one scan
    of the input, not a count() pre-pass (VERDICT r8 task 7)."""
    import tempfile

    from pyspark.sql import functions as F

    from dlt_iceberg_spark.functions.sketches import heavy_hitters

    p = tempfile.mkdtemp() + "/hh.parquet"
    spark.range(1000).select((F.col("id") % 5).alias("c")).write.parquet(p)
    out = heavy_hitters(spark.read.parquet(p), "c", k=2)
    got = {(r.value, r.n, round(r.share, 6)) for r in out.collect()}
    assert got == {(0, 200, 0.2), (1, 200, 0.2)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE echoes the pre-reuse plan
    assert final.count("FileScan parquet") == 1
    assert "ReusedExchange" in final

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

"""Skew-mitigation tests: salted aggregation and salted join equivalence."""

from pyspark.sql import functions as F

from dlt_iceberg_spark.operators.skew import salted_agg, salted_join, with_salt


def test_with_salt_distributes(spark):
    df = with_salt(spark.range(1000), n_salts=8)
    per_salt = {r._salt: r.n for r in df.groupBy("_salt").agg(F.count("*").alias("n")).collect()}
    assert set(per_salt) == set(range(8))
    assert max(per_salt.values()) < 1000 * 0.3  # roughly uniform


def test_salted_agg_matches_plain_agg(spark):
    # hot key: 9000 of 10000 rows share key 0
    df = spark.range(10000).select(
        F.when(F.col("id") < 9000, 0).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    plain = {
        (r.k): (r.n, r.s)
        for r in df.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()
    }
    salted = {
        (r.k): (r.n, r.s)
        for r in salted_agg(
            df,
            keys=["k"],
            partial_aggs=[F.count("*").alias("pn"), F.sum("v").alias("ps")],
            merge_aggs=[F.sum("pn").alias("n"), F.sum("ps").alias("s")],
        ).collect()
    }
    assert salted == plain


def test_salted_agg_collect_list(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k long, x string")
    out = {
        r.k: sorted(r.xs)
        for r in salted_agg(
            df,
            keys=["k"],
            partial_aggs=[F.collect_list("x").alias("pxs")],
            merge_aggs=[F.flatten(F.collect_list("pxs")).alias("xs")],
            n_salts=4,
        ).collect()
    }
    assert out == {1: ["a", "b"], 2: ["c"]}


def test_salted_join_matches_plain_join(spark):
    big = spark.range(5000).select(
        F.when(F.col("id") < 4500, 1).otherwise(F.col("id") % 10).alias("k"),
        F.col("id").alias("row_id"),
    )
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(10)], "k long, label string")
    plain = big.join(small, "k").count()
    salted = salted_join(big, small, on=["k"], n_salts=8)
    assert salted.count() == plain
    assert "_salt" not in salted.columns

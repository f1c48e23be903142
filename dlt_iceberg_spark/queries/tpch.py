"""Section A — TPC-H-adapted relational core (SURVEY.md §2 J3/A6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dlt_iceberg_spark.queries.registry import _sql_rnd, _t, query, rnd

# ===========================================================================
# A. TPC-H-adapted relational core
# ===========================================================================

@query(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_sql_rnd('sum(l_quantity)')} AS sum_qty,
           {_sql_rnd('sum(l_extendedprice)')} AS sum_base_price,
           {_sql_rnd('sum(l_extendedprice * (1 - l_discount))')} AS sum_disc_price,
           {_sql_rnd('sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))')} AS sum_charge,
           {_sql_rnd('avg(l_quantity)')} AS avg_qty,
           {_sql_rnd('avg(l_extendedprice)')} AS avg_price,
           {_sql_rnd('avg(l_discount)', 4)} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1: scan-heavy partial+final hash aggregate; filter pushed to parquet.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rnd(F.sum("l_quantity")).alias("sum_qty"),
            rnd(F.sum("l_extendedprice")).alias("sum_base_price"),
            rnd(F.sum(disc_price)).alias("sum_disc_price"),
            rnd(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            rnd(F.avg("l_quantity")).alias("avg_qty"),
            rnd(F.avg("l_extendedprice")).alias("avg_price"),
            rnd(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_unshipped_revenue",
    f"""
    SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
           {_sql_rnd('sum(l.l_extendedprice * (1 - l.l_discount))')} AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY sum(l.l_extendedprice * (1 - l.l_discount)) DESC, o.o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3: selective dim filter broadcast into fact join; top-k with unique tie-break.",
)
def q3_unshipped_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01 00:00:00").cast("timestamp_ntz")
    )
    revenue_raw = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue_raw.alias("__rev"))
        .orderBy(F.col("__rev").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_orderdate", "o_orderpriority", rnd(F.col("__rev")).alias("revenue"))
    )


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS → left-semi join.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
    )
    l = _t(spark, sf_dir, "lineitem")
    joined = o.join(l, (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate), "left_semi")
    return joined.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q5_nation_revenue",
    f"""
    SELECT n.n_name, {_sql_rnd('sum(l.l_extendedprice * (1 - l.l_discount))')} AS revenue
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
                  JOIN customer c ON c.c_nationkey = n.n_nationkey
                  JOIN orders o ON o.o_custkey = c.c_custkey
                  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                  JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5: 6-table snowflake join, dims broadcast, one fact shuffle.",
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy("n_name")
        .agg(rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


@query(
    "q6_revenue_delta",
    f"""
    SELECT {_sql_rnd('sum(l_extendedprice * l_discount)')} AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure pushed-filter scan + global agg; no shuffle beyond final reduce.",
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q10_returned_customers",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {_sql_rnd('c.c_acctbal')} AS acctbal,
           {_sql_rnd('sum(l.l_extendedprice * (1 - l.l_discount))')} AS revenue
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY sum(l.l_extendedprice * (1 - l.l_discount)) DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10: returned-item revenue per customer, top-20.",
)
def q10_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev"))
        .orderBy(F.col("__rev").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            rnd(F.col("c_acctbal")).alias("acctbal"),
            rnd(F.col("__rev")).alias("revenue"),
        )
    )


@query(
    "q13_order_distribution",
    """
    SELECT c_count, count(*) AS custdist FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
    doc="TPC-H Q13: outer join + double aggregation (count histogram).",
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    f"""
    WITH srev AS (
        SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, {_sql_rnd('r.total_rev')} AS total_revenue
    FROM supplier s JOIN srev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM srev)
    """,
    doc="TPC-H Q15: agg CTE + scalar-subquery max (self-join on agg).",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    s = _t(spark, sf_dir, "supplier")
    srev = l.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev")
    )
    mx = srev.agg(F.max("total_rev").alias("mx"))
    return (
        srev.join(F.broadcast(mx), srev.total_rev == mx.mx)
        .join(F.broadcast(s), s.s_suppkey == srev.l_suppkey)
        .select("s_suppkey", "s_name", rnd(F.col("total_rev")).alias("total_revenue"))
    )


@query(
    "q18_large_orders",
    f"""
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           {_sql_rnd('o.o_totalprice')} AS totalprice,
           {_sql_rnd('sum(l.l_quantity)')} AS sum_qty
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    """,
    doc="TPC-H Q18: HAVING subquery → semi-join on aggregated keys.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
        .select("l_orderkey")
    )
    return (
        l.join(F.broadcast(big.withColumnRenamed("l_orderkey", "bk")), F.col("l_orderkey") == F.col("bk"), "inner")
        .join(F.broadcast(o), F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(rnd(F.sum("l_quantity")).alias("sum_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            rnd(F.col("o_totalprice")).alias("totalprice"),
            "sum_qty",
        )
    )


@query(
    "q22_idle_customers",
    f"""
    WITH avg_bal AS (SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0)
    SELECT c.c_mktsegment, count(*) AS numcust, {_sql_rnd('sum(c.c_acctbal)')} AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    GROUP BY c.c_mktsegment
    """,
    doc="TPC-H Q22 shape: scalar subquery + anti-join.",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("a"))
    f_orders = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(f_orders, c.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("numcust"), rnd(F.sum("c_acctbal")).alias("totacctbal"))
    )


@query(
    "part_brand_stats",
    f"""
    SELECT p_brand, count(*) AS n_parts,
           CAST(sum(p_size) AS BIGINT) AS total_size,
           {_sql_rnd('min(p_retailprice)')} AS min_price,
           {_sql_rnd('max(p_retailprice)')} AS max_price,
           {_sql_rnd('avg(p_retailprice)')} AS avg_price,
           count(DISTINCT p_type) AS n_types
    FROM part GROUP BY p_brand
    """,
    doc="Multi-aggregate with count distinct per group.",
)
def part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("p_size").cast("long").alias("total_size"),
        rnd(F.min("p_retailprice")).alias("min_price"),
        rnd(F.max("p_retailprice")).alias("max_price"),
        rnd(F.avg("p_retailprice")).alias("avg_price"),
        F.countDistinct("p_type").alias("n_types"),
    )


@query(
    "nation_order_stats",
    f"""
    SELECT n.n_name, o.o_orderstatus, count(*) AS n_orders,
           {_sql_rnd('sum(o.o_totalprice)')} AS total_value,
           {_sql_rnd('avg(o.o_totalprice)')} AS avg_value
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
                  JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name, o.o_orderstatus
    """,
    doc="Fact→dim star join with two-level grouping key.",
)
def nation_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("n_name", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            rnd(F.sum("o_totalprice")).alias("total_value"),
            rnd(F.avg("o_totalprice")).alias("avg_value"),
        )
    )


@query(
    "q2_min_unit_price_supplier",
    f"""
    WITH offers AS (
      SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, n.n_name,
             l.l_extendedprice / l.l_quantity AS unit_price
      FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
                  JOIN supplier s ON s.s_suppkey = l.l_suppkey
                  JOIN nation n ON n.n_nationkey = s.s_nationkey
                  JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE' AND p.p_size <= 10 AND p.p_type = 'SMALL'
    )
    SELECT o.p_partkey, o.p_name, o.s_name, o.n_name,
           {_sql_rnd('o.unit_price', 4)} AS unit_price
    FROM offers o
    JOIN (SELECT p_partkey, min(unit_price) AS mn FROM offers GROUP BY p_partkey) m
      ON m.p_partkey = o.p_partkey AND o.unit_price = m.mn
    """,
    doc=(
        "TPC-H Q2 shape (adapted: fixture has no partsupp, so the offer "
        "relation is lineitem unit prices): per-part min-cost supplier in a "
        "region — agg subquery joined back on the min."
    ),
)
def q2_min_unit_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter((F.col("p_size") <= 10) & (F.col("p_type") == "SMALL"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    l = _t(spark, sf_dir, "lineitem")
    offers = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .select(
            "p_partkey", "p_name", "s_name", "n_name",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        )
    )
    mins = offers.groupBy(F.col("p_partkey").alias("mk")).agg(F.min("unit_price").alias("mn"))
    return (
        offers.join(F.broadcast(mins), (offers.p_partkey == mins.mk) & (offers.unit_price == mins.mn))
        .select("p_partkey", "p_name", "s_name", "n_name", rnd(F.col("unit_price"), 4).alias("unit_price"))
    )


@query(
    "q7_volume_shipping",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           {_sql_rnd('sum(l.l_extendedprice * (1 - l.l_discount))')} AS revenue
    FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
                    JOIN orders o ON o.o_orderkey = l.l_orderkey
                    JOIN customer c ON c.c_custkey = o.o_custkey
                    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
                    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
    doc="TPC-H Q7: bidirectional nation-pair trade volume by ship year.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(o), o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("n1_key") == s.s_nationkey)
        .join(F.broadcast(n2), F.col("n2_key") == c.c_nationkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


@query(
    "q8_market_share",
    f"""
    WITH volumes AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
                  JOIN supplier s ON s.s_suppkey = l.l_suppkey
                  JOIN orders o ON o.o_orderkey = l.l_orderkey
                  JOIN customer c ON c.c_custkey = o.o_custkey
                  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
                  JOIN region r ON r.r_regionkey = n1.n_regionkey
                  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'STANDARD'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           {_sql_rnd("sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END) / sum(volume)", 6)} AS mkt_share
    FROM volumes GROUP BY o_year
    """,
    doc="TPC-H Q8: national market share — conditional-sum ratio over a snowflake join.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    l = _t(spark, sf_dir, "lineitem")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(o), o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("n1_key") == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == F.col("n1_region"))
        .join(F.broadcast(n2), F.col("n2_key") == s.s_nationkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            rnd(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(0.0))
                / F.sum(volume),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_type_profit",
    f"""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
           {_sql_rnd('sum(l.l_extendedprice * (1 - l.l_discount))', 0)} AS profit
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
    doc=(
        "TPC-H Q9 shape (adapted: no partsupp/supplycost in fixture, so "
        "profit is discounted revenue): per supplier-nation per year over "
        "name-matched parts."
    ),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(o), o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0).alias("profit"))
    )


@query(
    "q11_important_parts",
    f"""
    WITH vals AS (
      SELECT l.l_partkey, sum(l.l_extendedprice * l.l_quantity) AS value
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
                      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, {_sql_rnd('value')} AS value
    FROM vals
    WHERE value > (SELECT sum(value) * 0.001 FROM vals)
    """,
    doc=(
        "TPC-H Q11 shape (adapted: stock value from lineitem, fixture has "
        "no partsupp): per-part value with HAVING-over-global-scalar cutoff."
    ),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    l = _t(spark, sf_dir, "lineitem")
    vals = (
        l.join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    cutoff = vals.agg((F.sum("value") * 0.001).alias("cut"))
    return (
        vals.join(F.broadcast(cutoff))
        .filter(F.col("value") > F.col("cut"))
        .select("l_partkey", rnd(F.col("value")).alias("value"))
    )


@query(
    "q12_late_shipping_priority",
    """
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 30 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
    doc=(
        "TPC-H Q12 shape (adapted: fixture has no shipmode/commitdate, so "
        "'late' is shipdate ≥ orderdate+30d and the pivot is linestatus): "
        "conditional-count pivot by priority class."
    ),
)
def q12_late_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue",
    f"""
    SELECT {_sql_rnd("100.0 * sum(CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END) / sum(l.l_extendedprice * (1 - l.l_discount))", 4)} AS promo_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
    doc="TPC-H Q14: promo revenue share — conditional-sum ratio, part dim broadcast.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp_ntz"))
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .agg(
            rnd(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0)) / F.sum(disc),
                4,
            ).alias("promo_revenue")
        )
    )


@query(
    "q16_supplier_part_count",
    """
    SELECT p.p_brand, p.p_type, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 10, 15, 20, 25)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc=(
        "TPC-H Q16 shape (adapted: the part-supplier relation is lineitem, "
        "and 'complaint' suppliers are negative-balance): distinct-count "
        "with NOT-IN → anti-join."
    ),
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    f"""
    WITH part_avg AS (
      SELECT l_partkey, 0.5 * avg(l_quantity) AS threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {_sql_rnd('sum(l.l_extendedprice) / 7.0')} AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
                    JOIN part_avg a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND l.l_quantity < a.threshold
    """,
    doc=(
        "TPC-H Q17: small-quantity revenue — correlated avg subquery "
        "decorrelated into a per-part aggregate re-joined to the fact."
    ),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    part_avg = l.groupBy(F.col("l_partkey").alias("ak")).agg(
        (0.5 * F.avg("l_quantity")).alias("threshold")
    )
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .join(part_avg, F.col("ak") == l.l_partkey)
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(rnd(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@query(
    "q19_bracket_revenue",
    f"""
    SELECT {_sql_rnd('sum(l.l_extendedprice * (1 - l.l_discount))')} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc=(
        "TPC-H Q19 shape (adapted: no container/shipmode columns): OR-ed "
        "bracket predicates across the join — Catalyst pushes the part-only "
        "disjuncts to the dim scan."
    ),
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem")
    b1 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#20")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .filter(b1 | b2 | b3)
        .agg(rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


@query(
    "q20_top_volume_suppliers",
    f"""
    WITH vol AS (
      SELECT l.l_suppkey, sum(l.l_quantity) AS qty
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'red%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_suppkey
    )
    SELECT s.s_name, n.n_name, {_sql_rnd('v.qty')} AS qty
    FROM vol v JOIN supplier s ON s.s_suppkey = v.l_suppkey
               JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE v.qty > (SELECT avg(qty) FROM vol)
    """,
    doc=(
        "TPC-H Q20 shape (adapted: availability from shipped volume, no "
        "partsupp): suppliers of name-matched parts above the mean volume — "
        "scalar-subquery threshold over a reused aggregate."
    ),
)
def q20_top_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    vol = (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    vol = vol.persist()
    avg_qty = vol.agg(F.avg("qty").alias("avg_qty"))
    return (
        vol.join(F.broadcast(avg_qty))
        .filter(F.col("qty") > F.col("avg_qty"))
        .join(F.broadcast(s), s.s_suppkey == F.col("l_suppkey"))
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .select("s_name", "n_name", rnd(F.col("qty")).alias("qty"))
    )


@query(
    "q21_waiting_suppliers",
    """
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    doc=(
        "TPC-H Q21 shape (adapted: 'late' is shipdate > orderdate+60d since "
        "the fixture has no receipt/commit dates): the sole-late-supplier "
        "exists/not-exists pair as semi- and anti-joins on (order, supplier)."
    ),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = _t(spark, sf_dir, "lineitem")
    l1 = (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    # EXISTS another supplier in the order → semi-join against all lineitems
    other = l.select(F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2"))
    with_other = l1.join(
        other, (F.col("ok2") == l1.l_orderkey) & (F.col("sk2") != l1.l_suppkey), "left_semi"
    )
    # NOT EXISTS another LATE supplier in the order → anti-join against l1 itself
    late_other = l1.select(F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3"))
    sole_late = with_other.join(
        late_other,
        (F.col("ok3") == with_other.l_orderkey) & (F.col("sk3") != with_other.l_suppkey),
        "left_anti",
    )
    return (
        sole_late.join(F.broadcast(s), s.s_suppkey == sole_late.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@query(
    "rollup_nation_status",
    f"""
    SELECT coalesce(n.n_name, 'ALL') AS nation,
           coalesce(o.o_orderstatus, 'ALL') AS status,
           count(*) AS n_orders,
           {_sql_rnd('sum(o.o_totalprice)')} AS total_value
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
                  JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY ROLLUP (n.n_name, o.o_orderstatus)
    """,
    doc=(
        "ROLLUP hierarchy totals (nation → status → grand total) — the "
        "grouping-sets surface the reference gets from DuckDB, native in "
        "Spark (SURVEY §2.5 A6)."
    ),
)
def rollup_nation_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .rollup("n_name", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"), rnd(F.sum("o_totalprice")).alias("total_value"))
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "total_value",
        )
    )


@query(
    "cube_brand_size",
    f"""
    SELECT coalesce(p_brand, 'ALL') AS brand,
           coalesce(cast(p_size AS varchar), 'ALL') AS size,
           count(*) AS n_parts,
           {_sql_rnd('avg(p_retailprice)')} AS avg_price
    FROM part
    GROUP BY CUBE (p_brand, p_size)
    """,
    doc=(
        "CUBE over two dimensions (every grouping-set combination) — "
        "completes the grouping-sets surface next to ROLLUP (SURVEY §2.5 A6); "
        "Spark plans one Expand + single hash aggregation, no per-set rescan."
    ),
)
def cube_brand_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.cube("p_brand", "p_size")
        .agg(F.count(F.lit(1)).alias("n_parts"), rnd(F.avg("p_retailprice")).alias("avg_price"))
        .select(
            F.coalesce("p_brand", F.lit("ALL")).alias("brand"),
            F.coalesce(F.col("p_size").cast("string"), F.lit("ALL")).alias("size"),
            "n_parts",
            "avg_price",
        )
    )


@query(
    "groupingsets_priority_status",
    f"""
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL') AS status,
           count(*) AS n_orders,
           {_sql_rnd('sum(o_totalprice)')} AS total_value
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
    doc=(
        "Explicit GROUPING SETS (neither ROLLUP nor CUBE): per-priority, "
        "per-status, and grand-total marginals in ONE pass via Spark 4's "
        "DataFrame.groupingSets — a single Expand + hash aggregate instead "
        "of three scans unioned (SURVEY §2.5 A6)."
    ),
)
def groupingsets_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(F.count(F.lit(1)).alias("n_orders"), rnd(F.sum("o_totalprice")).alias("total_value"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "total_value",
        )
    )


@query(
    "pivot_priority_status",
    """
    SELECT o_orderpriority AS priority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
    FROM orders GROUP BY 1
    """,
    doc=(
        "PIVOT: order-status counts spread to columns per priority.  With "
        "the pivot values declared up front, Spark compiles this to one "
        "pass of conditional aggregates — no distinct-value pre-scan and no "
        "second shuffle (SURVEY §2.5)."
    ),
)
def pivot_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "priority",
            F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
            F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
            F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
        )
    )


@query(
    "pctl_order_value",
    f"""
    SELECT o_orderpriority AS priority,
           count(*) AS n_orders,
           {_sql_rnd('quantile_cont(o_totalprice, 0.50)')} AS p50,
           {_sql_rnd('quantile_cont(o_totalprice, 0.90)')} AS p90,
           {_sql_rnd('quantile_cont(o_totalprice, 0.99)')} AS p99
    FROM orders GROUP BY 1
    """,
    doc=(
        "Exact linear-interpolated percentiles of order value per priority "
        "(SURVEY §2.5 aggregations).  One `percentile(col, array(...))` "
        "aggregate computes all three cut points in a single shuffle; at "
        "scale swap to approx_percentile for a fixed-memory sketch."
    ),
)
def pctl_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    pct = F.expr("percentile(o_totalprice, array(0.50D, 0.90D, 0.99D))")
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_orders"), pct.alias("pct"))
        .select(
            "priority",
            "n_orders",
            rnd(F.element_at("pct", 1)).alias("p50"),
            rnd(F.element_at("pct", 2)).alias("p90"),
            rnd(F.element_at("pct", 3)).alias("p99"),
        )
    )


@query(
    "setop_customer_segments",
    """
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    doc="Set operations (INTERSECT / EXCEPT) over keyed selections (SURVEY §2.5).",
)
def setop_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    with_f = c.join(
        o.filter(F.col("o_orderstatus") == "F"), c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey")
    positive = c.filter(F.col("c_acctbal") > 0).select("c_custkey")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return with_f.intersect(positive).exceptAll(building.distinct())


@query(
    "sql_delegated_join",
    f"""
    SELECT s.s_name, n.n_name,
           count(*) AS n_items,
           {_sql_rnd('sum(l.l_extendedprice)')} AS total_price
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
                    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE l.l_quantity > 45
    GROUP BY s.s_name, n.n_name
    """,
    doc=(
        "Arbitrary-SQL parity (SURVEY §2.4 J3): executed as a literal "
        "spark.sql() text over registered views — the reference's "
        "dataset.query(sql) surface, with Catalyst instead of DuckDB."
    ),
)
def sql_delegated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "supplier", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    # NB: Spark SQL parses `100.0` as a DECIMAL literal (DuckDB: double), so
    # the normalization needs an explicit double cast to keep dtypes aligned
    return spark.sql(
        """
        SELECT s.s_name, n.n_name,
               count(*) AS n_items,
               cast(floor(sum(l.l_extendedprice) * 100.0 + 0.5) as double) / 100.0d AS total_price
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
                        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE l.l_quantity > 45
        GROUP BY s.s_name, n.n_name
        """
    )



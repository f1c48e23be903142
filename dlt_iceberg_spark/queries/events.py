"""Section B — window / event-stream analytics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dlt_iceberg_spark.queries.registry import _sql_rnd, _t, query, rnd

# ===========================================================================
# B. Window / event-stream analytics
# ===========================================================================

@query(
    "window_customer_rank",
    f"""
    WITH spend AS (
        SELECT n.n_name, c.c_custkey,
               {_sql_rnd('sum(o.o_totalprice)')} AS total_spend
        FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
                        JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY n.n_name, c.c_custkey
    )
    SELECT n_name, c_custkey, total_spend,
           rank() OVER (PARTITION BY n_name ORDER BY total_spend DESC, c_custkey) AS spend_rank
    FROM spend
    QUALIFY spend_rank <= 5
    """,
    doc="Window rank over aggregated spend; ranks on normalized doubles for determinism.",
)
def window_customer_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    spend = (
        o.join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("n_name", "c_custkey")
        .agg(rnd(F.sum("o_totalprice")).alias("total_spend"))
    )
    w = Window.partitionBy("n_name").orderBy(F.col("total_spend").desc(), F.col("c_custkey"))
    return (
        spend.withColumn("spend_rank", F.rank().over(w))
        .filter(F.col("spend_rank") <= 5)
    )


@query(
    "window_running_total",
    f"""
    SELECT o_custkey, o_orderkey,
           {_sql_rnd('sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)')} AS running_spend
    FROM orders
    """,
    doc="Per-customer running total: ordered window accumulation (deterministic order ⇒ identical fp sequence).",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        rnd(F.sum("o_totalprice").over(w)).alias("running_spend"),
    )


@query(
    "events_hourly",
    f"""
    SELECT date_trunc('hour', ts::TIMESTAMP) AS hour, event_type,
           count(*) AS n_events, count(DISTINCT user_id) AS n_users,
           {_sql_rnd('sum("value")')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling-window (hourly) event rollup — batch analogue of a streaming windowed agg.",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            rnd(F.sum("value")).alias("total_value"),
        )
    )


@query(
    "events_funnel",
    """
    WITH e AS (SELECT user_id, event_type, ts::TIMESTAMP AS ts FROM events),
    s AS (SELECT user_id, min(ts) AS t_signup FROM e WHERE event_type = 'signup' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t_click
          FROM e JOIN s ON s.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts > s.t_signup GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t_purchase
          FROM e JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM s) AS n_signup,
           (SELECT count(*) FROM c) AS n_click_after_signup,
           (SELECT count(*) FROM p) AS n_purchase_after_click
    """,
    doc=(
        "Ordered funnel (signup → click → purchase): ONE shuffle on user_id. "
        "Per-user conditional aggregation collects each stage's candidate "
        "times; strict ordering resolves JVM-side via array filter/min. No "
        "joins — the broadcast-per-stage formulation dies at 100 TB because "
        "the per-user stage tables are not broadcastable."
    ),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .filter(F.col("event_type").isin("signup", "click", "purchase"))
    )
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.collect_list(F.when(F.col("event_type") == "click", F.col("ts"))).alias("clicks"),
        F.collect_list(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "purchases"
        ),
    )
    staged = per_user.withColumn(
        "t_click",
        F.array_min(F.filter("clicks", lambda t: t > F.col("t_signup"))),
    ).withColumn(
        "t_purchase",
        F.array_min(F.filter("purchases", lambda t: t > F.col("t_click"))),
    )
    return staged.agg(
        F.count("t_signup").alias("n_signup"),
        F.count("t_click").alias("n_click_after_signup"),
        F.count("t_purchase").alias("n_purchase_after_click"),
    )


@query(
    "events_retention_cohorts",
    """
    WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts FROM events),
    cohort AS (SELECT user_id, date_trunc('day', min(ts)) AS cohort_day FROM e GROUP BY user_id),
    activity AS (SELECT DISTINCT e.user_id, co.cohort_day,
                        datediff('day', co.cohort_day, date_trunc('day', e.ts)) AS day_offset
                 FROM e JOIN cohort co ON co.user_id = e.user_id)
    SELECT cohort_day, day_offset, count(*) AS n_users
    FROM activity GROUP BY cohort_day, day_offset
    """,
    doc=(
        "Retention cohorts: users grouped by first-seen day, counted per "
        "active day offset — first-touch aggregation + distinct activity "
        "matrix, the standard cohort-retention shape."
    ),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select("user_id", "ts")
    cohort = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("timestamp_ntz").alias("cohort_day")
    )
    activity = (
        e.join(F.broadcast(cohort), "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@query(
    "stream_windowed_counts",
    f"""
    SELECT time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS window_start,
           time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) + INTERVAL '1 hour' AS window_end,
           event_type, count(*) AS n_events, {_sql_rnd('sum("value")')} AS total_value
    FROM events GROUP BY 1, 2, 3
    """,
    doc=(
        "The streaming windowed-count operator (streaming/micro_batch.py::"
        "windowed_event_counts) run in batch mode — the SAME plan serves "
        "readStream inputs with a watermark; this entry is its oracle check."
    ),
)
def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dlt_iceberg_spark.streaming import windowed_event_counts

    e = _t(spark, sf_dir, "events")
    out = windowed_event_counts(e, watermark=None)
    return out.select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        F.col("window_end").cast("timestamp_ntz").alias("window_end"),
        "event_type",
        "n_events",
        rnd(F.col("total_value")).alias("total_value"),
    )


@query(
    "stream_dedup_users",
    """
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
    doc=(
        "Streaming ingest dedup (streaming/micro_batch.py::streaming_dedup "
        "— dropDuplicatesWithinWatermark on stream input, dropDuplicates in "
        "batch) keyed on (user_id, event_type), aggregated to per-type user "
        "counts.  The kept ROW per key is arrival-dependent; the per-key "
        "COUNT is deterministic, so the oracle checks count(DISTINCT)."
    ),
)
def stream_dedup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dlt_iceberg_spark.streaming import streaming_dedup

    e = _t(spark, sf_dir, "events")
    deduped = streaming_dedup(e, ["user_id", "event_type"])
    return deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "events_gapfill",
    f"""
    WITH b AS (
      SELECT event_type,
             time_bucket(INTERVAL '15 minutes', ts::TIMESTAMP) AS bucket,
             avg("value") AS avg_value, count(*) AS n_events
      FROM events GROUP BY 1, 2
    ), span AS (SELECT min(bucket) AS mn, max(bucket) AS mx FROM b),
    grid AS (
      SELECT unnest(generate_series(mn, mx, INTERVAL '15 minutes')) AS bucket
      FROM span
    ), dense AS (
      SELECT k.event_type, g.bucket
      FROM (SELECT DISTINCT event_type FROM events) k CROSS JOIN grid g
    )
    SELECT d.event_type, d.bucket,
           {_sql_rnd('''last_value(b.avg_value IGNORE NULLS) OVER (
               PARTITION BY d.event_type ORDER BY d.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')}
             AS avg_locf,
           COALESCE(b.n_events, 0) AS n_events,
           (b.event_type IS NULL) AS is_gap
    FROM dense d
    LEFT JOIN b ON b.event_type = d.event_type AND b.bucket = d.bucket
    """,
    doc=(
        "Time-series gap-fill (operators/timeseries.py — TimescaleDB "
        "time_bucket_gapfill + locf parity): events downsample into "
        "15-minute buckets per type, the grid densifies over the observed "
        "span (~half the 14.4k slots are empty at sf0.01), empty buckets "
        "are synthesized with zero-filled counts and last-observation-"
        "carried-forward averages, and is_gap marks them.  One data "
        "shuffle (the bucketed agg); the grid is a broadcast 1-row "
        "sequence; the oracle rebuilds the dense frame with DuckDB "
        "generate_series + IGNORE NULLS windows."
    ),
)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dlt_iceberg_spark.operators.timeseries import gapfill

    e = _t(spark, sf_dir, "events")
    out = gapfill(
        e,
        on="ts",
        by="event_type",
        bucket_width="15 minutes",
        aggs={"avg_value": ("avg", "value"), "n_events": ("count",)},
        fill={"avg_value": "locf", "n_events": "zero"},
    )
    return out.select(
        "event_type",
        F.col("bucket").cast("timestamp_ntz").alias("bucket"),
        rnd(F.col("avg_value")).alias("avg_locf"),
        F.col("n_events").cast("long").alias("n_events"),
        "is_gap",
    )


@query(
    "events_asof_last_signup",
    f"""
    WITH l AS (SELECT user_id, ts::TIMESTAMP AS ts, event_id FROM events),
         r AS (SELECT user_id, ts::TIMESTAMP AS ts, "value" FROM events
               WHERE event_type = 'signup')
    SELECT l.user_id, l.ts, l.event_id,
           {_sql_rnd('r."value"', 2)} AS value_right, r.ts AS ts_right
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    doc=(
        "As-of (point-in-time) join: every event gets the most recent prior "
        "signup's value per user — union + single keyed sort, no join node "
        "(operators/asof.py). Oracle is DuckDB's native ASOF LEFT JOIN."
    ),
)
def events_asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dlt_iceberg_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    left = e.select("user_id", "ts", "event_id")
    right = e.filter(F.col("event_type") == "signup").select("user_id", "ts", "value")
    out = asof_join(left, right, on="ts", by="user_id", value_cols=["value"])
    return out.select(
        "user_id", "ts", "event_id", rnd(F.col("value_right"), 2).alias("value_right"), "ts_right"
    )


@query(
    "events_interval_join",
    """
    WITH e AS (SELECT event_id, user_id, event_type, ts::TIMESTAMP AS ts FROM events),
         s AS (SELECT event_id AS signup_id, user_id, ts AS w_start,
                      ts + INTERVAL 1 HOUR AS w_end
               FROM e WHERE event_type = 'signup')
    SELECT s.signup_id, count(*) AS n_follow
    FROM s JOIN e ON e.user_id = s.user_id
                 AND e.ts >= s.w_start AND e.ts <= s.w_end
                 AND e.event_id <> s.signup_id
    GROUP BY s.signup_id
    """,
    doc=(
        "Interval (range) join: same-user events within 1 hour after each "
        "signup, via bucketed equi-join + refine (operators/range_join.py) — "
        "the scalable form of an inequality join that Spark would otherwise "
        "plan as a nested loop."
    ),
)
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dlt_iceberg_spark.operators.range_join import interval_join

    e = _t(spark, sf_dir, "events")
    points = e.select("event_id", "user_id", "ts")
    windows = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("w_end"),
    )
    joined = interval_join(
        points, windows, point_ts="ts", start_col="w_start", end_col="w_end", by="user_id"
    ).filter(F.col("event_id") != F.col("signup_id"))
    return joined.groupBy("signup_id").agg(F.count(F.lit(1)).alias("n_follow"))


@query(
    "events_heavy_hitters",
    f"""
    SELECT event_type AS value, count(*) AS n,
           {_sql_rnd('count(*) / (SELECT count(*) FROM events)::DOUBLE', 6)} AS share
    FROM events GROUP BY event_type
    ORDER BY n DESC, value LIMIT 5
    """,
    doc=(
        "Heavy-hitters profile (functions/sketches.py::heavy_hitters): "
        "frequency top-k whose shuffle carries one row per distinct value."
    ),
)
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dlt_iceberg_spark.functions import heavy_hitters

    e = _t(spark, sf_dir, "events")
    out = heavy_hitters(e, "event_type", k=5)
    return out.select("value", "n", rnd(F.col("share"), 6).alias("share"))


@query(
    "corpus_overlap_kmv",
    f"""
    WITH a AS (SELECT DISTINCT text FROM documents WHERE doc_id % 2 = 0),
         b AS (SELECT DISTINCT text FROM documents WHERE doc_id % 2 = 1),
         i AS (SELECT count(*) AS c FROM (SELECT text FROM a INTERSECT SELECT text FROM b)),
         u AS (SELECT count(*) AS c FROM (SELECT text FROM a UNION SELECT text FROM b))
    SELECT CAST((SELECT count(*) FROM a) AS DOUBLE) AS distinct_a,
           CAST((SELECT count(*) FROM b) AS DOUBLE) AS distinct_b,
           CAST((SELECT c FROM i) AS DOUBLE) AS intersection,
           {_sql_rnd('(SELECT c FROM i) / CAST((SELECT c FROM u) AS DOUBLE)', 6)} AS jaccard,
           TRUE AS exact
    """,
    doc=(
        "Cross-corpus overlap via KMV (theta) sketches — the pre-flight "
        "for cross-corpus dedup: estimate how much two document sets "
        "share before paying for the full similarity join.  "
        "functions/sketches.py::kmv_sketch keeps the k smallest distinct "
        "md5 hashes per side (distinct -> TakeOrderedAndProject: every "
        "partition forwards <= k candidates, no corpus-sized aggregation "
        "state); kmv_overlap_estimate combines two k-row sketches "
        "driver-side.  At sf0.01 the distinct count sits below k, so the "
        "sketch is EXACT and the oracle is plain set algebra; the "
        "estimator path is pytest-checked against known cardinalities "
        "with theta-sketch tolerance."
    ),
)
def corpus_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dlt_iceberg_spark.functions.sketches import (
        kmv_overlap_estimate,
        kmv_sketch,
    )

    d = _t(spark, sf_dir, "documents")
    k = 4096
    a = d.filter(F.col("doc_id") % 2 == 0)
    b = d.filter(F.col("doc_id") % 2 == 1)
    ka = kmv_sketch(a, "text", k=k, hash_mode="md5").collect()[0]
    kb = kmv_sketch(b, "text", k=k, hash_mode="md5").collect()[0]
    est = kmv_overlap_estimate(list(ka.ks), list(kb.ks), k, hash_mode="md5")
    import math

    jacc = math.floor(est["jaccard"] * 10**6 + 0.5) / 10**6  # rnd() convention
    return spark.createDataFrame(
        [
            (
                float(est["distinct_a"]),
                float(est["distinct_b"]),
                float(est["intersection"]),
                jacc,
                bool(est["exact"]),
            )
        ],
        "distinct_a double, distinct_b double, intersection double, "
        "jaccard double, exact boolean",
    )


@query(
    "events_user_latest",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
    FROM (
        SELECT user_id, event_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    doc="Latest-event-per-key dedup (row_number top-1) — the scalable 'current state' pattern.",
)
def events_user_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
        )
    )


@query(
    "events_sessions",
    """
    WITH marked AS (
        SELECT user_id, event_id, ts::TIMESTAMP AS tsu,
               CASE WHEN ts::TIMESTAMP <= lag(ts::TIMESTAMP) OVER w + INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)
    ), sessioned AS (
        SELECT user_id,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked
    )
    SELECT user_id, count(*) AS n_sessions,
           CAST(max(session_len) AS BIGINT) AS max_session_events
    FROM (SELECT user_id, session_id, count(*) AS session_len
          FROM sessioned GROUP BY user_id, session_id)
    GROUP BY user_id
    """,
    doc="Gap-based sessionization (30 min) via lag + cumulative sum — batch twin of applyInPandasWithState.",
)
def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Interval arithmetic on TimestampNTZ: timezone- and DST-independent,
    # matching the oracle's naive-timestamp comparison exactly.
    marked = e.withColumn(
        "new_session",
        F.when(
            F.col("ts") <= F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES"),
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    sessioned = marked.withColumn("session_id", F.sum("new_session").over(wcum))
    per_session = sessioned.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("session_len")
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("session_len").cast("long").alias("max_session_events"),
    )


@query(
    "events_json_props",
    f"""
    SELECT event_type,
           {_sql_rnd("avg(CAST(json_extract_string(props, '$.k') AS BIGINT))")} AS avg_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="Semi-structured extraction: JSON prop parsed JVM-side (get_json_object), no Python UDF.",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        rnd(F.avg(k)).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )



"""Engine-extra OLAP queries (SURVEY §2.8 notes the reference has no
ranking/analytic window functions — these are the extras a warehouse
user expects on top of reference parity, each with an exact oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmall_flink_210726_spark.functions.scalar import money, money_sum
from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table, register_views


@register(
    "w1_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, rnk
    FROM (SELECT o_custkey, o_orderkey,
                 CAST(row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
          FROM orders)
    WHERE rnk <= 3
    """,
    doc="Top-K per group via ranking window function (engine extra — "
    "reference has none, SURVEY §2.8)",
    tags=("extras", "window"),
)
def w1_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


@register(
    "w2_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_revenue
    FROM orders
    """,
    doc="Cumulative frame-spec window aggregate (running total per "
    "customer in order-date order)",
    tags=("extras", "window"),
)
def w2_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(money("o_totalprice")).over(w).cast("double").alias("running_revenue"),
    )


@register(
    "w3_asof_last_view_before_purchase",
    oracle="""
    SELECT p_id AS purchase_id, v_id AS view_id
    FROM (SELECT p.event_id AS p_id, v.event_id AS v_id,
                 row_number() OVER (PARTITION BY p.event_id
                      ORDER BY v.ts DESC, v.event_id DESC) AS rn
          FROM events p JOIN events v
            ON p.user_id = v.user_id
           AND p.event_type = 'purchase' AND v.event_type = 'view'
           AND v.ts <= p.ts)
    WHERE rn = 1
    """,
    doc="As-of join (custom operator — Spark lacks a native one): the "
    "most recent prior view for each purchase, via range join + "
    "latest-row ranking (pyspark guide 'as-of join' pattern)",
    tags=("extras", "join"),
)
def w3_asof_last_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    v = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"), F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    joined = p.join(v, (F.col("p_user") == F.col("v_user")) & (F.col("v_ts") <= F.col("p_ts")))
    w = Window.partitionBy("p_id").orderBy(F.col("v_ts").desc(), F.col("v_id").desc())
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("p_id").alias("purchase_id"), F.col("v_id").alias("view_id"))
    )


@register(
    "w4_sessionization",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS val_sum
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="Sessionization (30 min inactivity gap): lag + cumulative-sum "
    "session ids, then per-session aggregates — the batch twin of "
    "streaming session_window",
    tags=("extras", "stateful", "bench"),
)
def w4_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.expr("unix_micros(ts)")
    is_start = F.when(
        F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > 1_800_000_000), 1
    ).otherwise(0)
    marked = events.withColumn("is_start", is_start)
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = marked.withColumn("session_id", F.sum("is_start").over(w2).cast("long"))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"), money_sum("value", "val_sum")
    )


@register(
    "w5_rollup_revenue",
    oracle="""
    SELECT COALESCE(r_name, '<all>') AS r_name,
           COALESCE(n_name, '<all>') AS n_name,
           COUNT(*) AS order_ct,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="ROLLUP hierarchy totals (region → nation → grand total) over "
    "the broadcast-enriched star",
    tags=("extras", "agg"),
)
def w5_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    wide = (
        orders.join(F.broadcast(customer.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey", "r_name")), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        wide.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("order_ct"), money_sum("o_totalprice", "revenue"))
        .select(
            F.coalesce("r_name", F.lit("<all>")).alias("r_name"),
            F.coalesce("n_name", F.lit("<all>")).alias("n_name"),
            "order_ct",
            "revenue",
        )
    )


@register(
    "w6_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    GROUP BY event_type
    """,
    doc="Exact percentiles (linear interpolation — Spark percentile ≡ "
    "DuckDB quantile_cont); approx_percentile is the streaming-scale "
    "variant behind the same shape",
    tags=("extras", "agg"),
)
def w6_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


@register(
    "w7_session_window_native",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked)
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    """,
    doc="Native session_window (30 min gap): Spark's built-in merging "
    "session windows; oracle derives identical sessions via the "
    "lag+cumsum construction — window bounds are [min ts, max ts + gap)",
    tags=("extras", "stateful"),
)
def w7_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy(
        F.session_window("ts", "30 minutes").alias("sw"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return agg.select(
        "user_id",
        F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
        F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
        "n_events",
    )


@register(
    "s3_sql_surface",
    oracle="""
    SELECT event_type, COUNT(*) AS ct,
           COUNT(DISTINCT user_id) AS users
    FROM events
    GROUP BY event_type
    """,
    doc="S3 — the declarative SQL surface: tables registered as views, "
    "query text handed to spark.sql (≈ the reference's Flink SQL DDL "
    "path, dws/ProvinceStatsSqlApp.java:31-52)",
    tags=("extras", "sql"),
)
def s3_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type, COUNT(*) AS ct,
               COUNT(DISTINCT user_id) AS users
        FROM events
        GROUP BY event_type
        """
    )

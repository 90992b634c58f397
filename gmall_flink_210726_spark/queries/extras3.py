"""Extras wave 3: time-series regularization (gap-fill + LOCF),
rolling z-score anomaly flags, and fixed-iteration PageRank over the
nation trade graph.

Oracle notes:
- Cents reconstruction: ``round(value*100)`` — the product is never a
  .5 tie, so Spark's HALF_UP and DuckDB's rounding agree on every row.
- PageRank is integer fixed-point throughout (operators/graph.py):
  Spark ``div`` ≡ DuckDB ``//`` on non-negative BIGINTs, so the
  3-iteration chain is bit-identical without any float tolerance.
- generate_series/sequence are both end-inclusive with INTERVAL steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_210726_spark.operators.graph import pagerank
from gmall_flink_210726_spark.operators.timeseries import (
    gap_fill_locf,
    rolling_zscore,
)
from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "x13_gap_fill_locf",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             date_trunc('hour', ts) AS bucket_ts
      FROM events),
    obs AS (
      SELECT user_id, bucket_ts, cents FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, bucket_ts
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM e) WHERE rn = 1),
    sp0 AS (SELECT user_id,
                   date_trunc('hour', MIN(ts)) AS b0,
                   date_trunc('hour', MAX(ts)) AS b1
            FROM events GROUP BY user_id),
    sp AS (SELECT user_id,
                  unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket_ts
           FROM sp0)
    SELECT sp.user_id, sp.bucket_ts,
           last_value(obs.cents IGNORE NULLS)
             OVER (PARTITION BY sp.user_id ORDER BY sp.bucket_ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled_cents,
           obs.cents IS NOT NULL AS is_observed
    FROM sp LEFT JOIN obs
      ON sp.user_id = obs.user_id AND sp.bucket_ts = obs.bucket_ts
    """,
    doc="Hourly time-spine gap-fill with last-observation-carried-"
    "forward per user (regular-grid resampling for a 100 TB metrics "
    "store): per-(user, hour) last-event reduction, per-user sequence "
    "explode spine, one LOCF window shuffle on user_id. Rows scale "
    "with users x span, not events; exact integer cents throughout",
    tags=("extras", "timeseries"),
)
def x13_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gap_fill_locf(load_table(spark, sf_dir, "events"), bucket="hour")


@register(
    "x14_anomaly_zscore",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, ts,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events),
    w AS (
      SELECT *,
             CAST(COUNT(*) OVER win AS BIGINT) AS n,
             CAST(SUM(cents) OVER win AS BIGINT) AS s,
             CAST(SUM(cents * cents) OVER win AS BIGINT) AS ss
      FROM e
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id, ts, cents,
           round(CASE WHEN sqrt(greatest(
                        (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                         / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE), 0.0)) > 0
                 THEN (CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                      / sqrt(greatest(
                        (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                         / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE), 0.0))
                 ELSE 0.0 END, 6) AS zscore,
           (abs(CASE WHEN sqrt(greatest(
                        (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                         / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE), 0.0)) > 0
                 THEN (CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                      / sqrt(greatest(
                        (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                         / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE), 0.0))
                 ELSE 0.0 END) > 2.0 AND n >= 5) AS is_anomaly
    FROM w
    """,
    doc="Per-user rolling z-score anomaly detection: each event "
    "against its trailing 20-event mean/stddev — ONE window shuffle "
    "on user_id over exact integer cents; mean/var/std/z are "
    "fixed-order IEEE double expressions over exact operands, "
    "bit-identical on both engines",
    tags=("extras", "timeseries"),
)
def x14_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_zscore(
        load_table(spark, sf_dir, "events"), window_rows=20, z_thresh=2.0, min_n=5
    )


_PR_EDGES = """
    ed AS (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2),
    nodes AS (SELECT n_nationkey AS id FROM nation),
    p AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM ed GROUP BY src),
    pr0 AS (SELECT id, 1000000000000 // n AS pr FROM nodes, p)
"""


def _pr_iter(i: int) -> str:
    return f"""
    s{i} AS (
      SELECT ed.dst,
             CAST(SUM((pr{i - 1}.pr // outw.ow) * ed.w) AS BIGINT) AS inw
      FROM pr{i - 1}
      JOIN outw ON pr{i - 1}.id = outw.src
      JOIN ed ON ed.src = outw.src
      GROUP BY ed.dst),
    pr{i} AS (
      SELECT nodes.id,
             (150000000000 // n) + (85 * COALESCE(s{i}.inw, 0)) // 100 AS pr
      FROM nodes CROSS JOIN p LEFT JOIN s{i} ON nodes.id = s{i}.dst)
"""


@register(
    "x15_pagerank_trade",
    oracle=f"""
    WITH {_PR_EDGES},
    {_pr_iter(1)},
    {_pr_iter(2)},
    {_pr_iter(3)}
    SELECT n_nationkey, n_name, CAST(pr3.pr AS BIGINT) AS pr_scaled
    FROM nation JOIN pr3 ON n_nationkey = pr3.id
    """,
    doc="3-iteration weighted PageRank over the supplier-nation -> "
    "customer-nation trade graph (edge weight = lineitem count). "
    "Integer fixed-point rank mass (scale 10^12) with truncating "
    "division makes every iteration order-free and engine-identical — "
    "no float tolerance. Per iteration: one equi-join + one groupBy on "
    "bare (id, long) pairs (the label-propagation cost model)",
    tags=("extras", "graph"),
)
def x15_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    edges = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(supplier), lineitem["l_suppkey"] == supplier["s_suppkey"])
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    nodes = nation.select(F.col("n_nationkey").alias("id"))
    pr = pagerank(nodes, edges, iterations=3, damping_pct=85)
    return nation.join(pr, nation["n_nationkey"] == pr["id"]).select(
        "n_nationkey", "n_name", "pr_scaled"
    )

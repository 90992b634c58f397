"""More classic OLAP plan shapes: semi-join, anti-join, 6-table join,
and the salted-aggregation skew path (result provably equal to the
direct plan — same oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_210726_spark.functions.scalar import money, money_sum
from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "tpch_q4_semi_join",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS decorrelated to a left-semi join "
    "(no row multiplication, single shuffle on the join key)",
    tags=("tpch", "join"),
)
def tpch_q4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    matched = orders.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "tpch_q22_anti_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS customer_count,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    GROUP BY c_mktsegment
    """,
    doc="TPC-H Q22 shape: NOT EXISTS as a left-anti join "
    "(customers with no large order)",
    tags=("tpch", "join"),
)
def tpch_q22_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    silent = customer.join(
        orders.filter(F.col("o_totalprice") > 300000),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_anti",
    )
    return silent.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("customer_count"),
        money_sum("c_acctbal", "total_bal"),
    )


@register(
    "tpch_q5_local_supplier",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: 6-table join with local-supplier predicate; "
    "dims broadcast, one fact shuffle on the orderkey join",
    tags=("tpch", "join", "bench"),
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    price, disc = F.col("l_extendedprice"), F.col("l_discount")
    asia = region.filter(F.col("r_name") == "ASIA")
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(asia.select("r_regionkey")), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("n_name").agg(
        F.sum(money(price * (F.lit(1.0) - disc))).cast("double").alias("revenue")
    )


@register(
    "skew_salted_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS ct,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS val_sum
    FROM events
    GROUP BY event_type
    """,
    doc="Hot-key skew path: two-phase salted aggregation (16 salts) — "
    "identical result to the direct groupBy (same oracle), largest "
    "partition bounded at ~1/16 of the hottest key",
    tags=("extras", "skew"),
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.skew import salted_agg

    events = load_table(spark, sf_dir, "events")
    return salted_agg(
        events,
        ["event_type"],
        [F.count(F.lit(1)).alias("ct_p"), F.sum(money("value")).alias("vs_p")],
        [
            F.sum("ct_p").cast("long").alias("ct"),
            F.sum("vs_p").cast("double").alias("val_sum"),
        ],
    )

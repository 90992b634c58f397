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


@register(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape (volume shipping between two nations): the "
    "fact table streams once through four BROADCAST dim joins (orders "
    "is fact-sized and shuffles on the join key; customer/supplier/"
    "nation broadcast), with the OR-pair nation predicate applied "
    "after enrichment and the nation filter pushed into both "
    "broadcast sides to shrink them first",
    tags=("tpch", "join"),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    pair = nation.filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    n1 = pair.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = pair.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    price, disc = F.col("l_extendedprice"), F.col("l_discount")
    joined = (
        lineitem.join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(F.sum(money(price * (F.lit(1.0) - disc))).cast("double").alias("revenue"))


@register(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (top returned-item customers): returnflag + "
    "order-date filters push to the scans, lineitem⋈orders shuffles "
    "on orderkey, customer/nation broadcast, top-20 via TakeOrdered "
    "(no global sort); c_custkey tiebreak keeps the limit "
    "deterministic",
    tags=("tpch", "join"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    price, disc = F.col("l_extendedprice"), F.col("l_discount")
    joined = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1996-04-01")
            ).select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer.select("c_custkey", "c_name", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(money(price * (F.lit(1.0) - disc))).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT CAST(100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
           AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-02-01'
    """,
    doc="TPC-H Q14 shape (promo revenue share): month filter pushed to "
    "the lineitem scan, part broadcast, conditional aggregation — two "
    "exact decimal sums, one final double division (deterministic in "
    "both engines)",
    tags=("tpch", "agg"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    price, disc = F.col("l_extendedprice"), F.col("l_discount")
    rev = price * (F.lit(1.0) - disc)
    joined = lineitem.filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-02-01")
    ).join(F.broadcast(part.select("p_partkey", "p_type")), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(money(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))).cast("double")
            / F.sum(money(rev)).cast("double")
        )
        .cast("double")
        .alias("promo_revenue")
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 260)
    GROUP BY 1, 2, 3, 4, 5
    """,
    doc="TPC-H Q18 shape (large-quantity orders): the HAVING subquery "
    "IS the aggregate the output needs, so lineitem scans and "
    "aggregates exactly once on its natural key (map-side partials); "
    "the filtered per-order sums — a tiny set — then join orders on "
    "the shuffle key and broadcast-join customer. No second fact scan, "
    "no re-aggregation after the join.",
    tags=("tpch", "join"),
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    per_order = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(money("l_quantity")).alias("q"))
        .filter(F.col("q") > 260)
    )
    return (
        per_order.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_name")), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("q").cast("double").alias("sum_qty"),
        )
    )

"""TPC-H plan-shape wave 2: scan-only aggregation, market-share ratio,
outer-join distribution, scalar-subquery max, decorrelated correlated
aggregate, disjunctive pushdown, and double-EXISTS anti-join — the
remaining classic OLAP shapes the engine should prove out (the fixture
set has no partsupp table, so Q12/Q21 predicates are adapted to the
available columns while keeping the plan shape intact; adaptations are
noted per query).

Exactness: money arithmetic follows the repo-wide contract — per-row
double expression cast to DECIMAL(18,6) before SUM (exact, order-free),
cast to double after — so Spark and DuckDB hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_210726_spark.functions.scalar import money, money_sum
from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (forecasting revenue change): scan-only "
    "conditional aggregation — every predicate reaches the parquet scan "
    "(PushedFilters), zero joins, zero shuffles beyond the final "
    "single-row agg; the canonical 'is pushdown working' probe",
    tags=("tpch", "agg"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(money_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


@register(
    "tpch_q8_market_share",
    oracle="""
    WITH rev AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA')
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                              ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM rev GROUP BY o_year
    """,
    doc="TPC-H Q8 shape (national market share): nation/region/customer/"
    "supplier all broadcast, the fact shuffles once on orderkey, and the "
    "share is a conditional-over-total ratio of two exact decimal sums "
    "in one grouped aggregation (no second pass)",
    tags=("tpch", "join"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    asia_nations = (
        nation.join(
            region.filter(F.col("r_name") == "ASIA").select("r_regionkey"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").alias("cn_key"))
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    volume = money(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    rev = (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return rev.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(zero)).cast("double")
            / F.sum("volume").cast("double")
        )
        .cast("double")
        .alias("mkt_share")
    )


@register(
    "tpch_q12_priority_class",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
    GROUP BY l_returnflag
    """,
    doc="TPC-H Q12 shape (shipping-mode priority classes; the fixture "
    "has no l_shipmode, so l_returnflag plays the grouping column — "
    "same plan): date filter pushed to the lineitem scan, one shuffle "
    "join on orderkey, conditional two-way counts in a single agg",
    tags=("tpch", "join", "agg"),
)
def tpch_q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = lineitem.filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).join(
        orders.select("o_orderkey", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return joined.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


@register(
    "tpch_q13_custdist",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count
    """,
    doc="TPC-H Q13 shape (customer order-count distribution): LEFT "
    "OUTER join with an extra non-key join predicate (customers with "
    "zero qualifying orders stay, counted as c_count=0 via "
    "COUNT(o_orderkey) null-skipping), then a second aggregation over "
    "the first's output — the two-level histogram shape",
    tags=("tpch", "join", "agg"),
)
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.select("c_custkey")
        .join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT").select(
                "o_custkey", "o_orderkey"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    doc="TPC-H Q15 shape (top supplier): the revenue view aggregates "
    "once; the scalar MAX subquery becomes a broadcast single-row "
    "cross-join + equality filter over the SAME aggregated child (plan "
    "reuses the agg, no second lineitem scan). Exact-decimal revenue "
    "makes the double equality deterministic on both engines",
    tags=("tpch", "join", "agg"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            money_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "total_revenue",
            )
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("s_suppkey") == F.col("supplier_no"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q17_small_quantity",
    oracle="""
    WITH thresh AS (
      SELECT l_partkey AS t_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)) AS t_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN thresh ON t_partkey = l_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < t_qty
    """,
    doc="TPC-H Q17 shape (small-quantity-order revenue): the correlated "
    "scalar AVG subquery is decorrelated into one per-part aggregate "
    "joined back on partkey — lineitem scans twice (once aggregated, "
    "once probed) instead of once per row. The threshold is an exact "
    "decimal sum / count (not a float AVG) so both engines compute the "
    "identical double and the boundary comparison matches",
    tags=("tpch", "join", "agg"),
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    thresh = lineitem.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2)
            * (F.sum(money("l_quantity")).cast("double") / F.count(F.lit(1)))
        ).alias("t_qty")
    )
    brand = part.filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    return (
        lineitem.join(F.broadcast(brand), F.col("p_partkey") == F.col("l_partkey"))
        .join(thresh, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("t_qty"))
        .agg(
            (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "tpch_q19_disjunctive",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (discounted revenue, disjunctive predicates): "
    "the OR-of-conjunctions mixes columns from both sides; Catalyst "
    "extracts the common per-side implications (brand∈{...} to the "
    "broadcast part side, quantity∈[1,30] to the lineitem scan) so "
    "both scans still prune before the join evaluates the full "
    "disjunction",
    tags=("tpch", "join"),
)
def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("p_partkey") == F.col("l_partkey"),
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(cond).agg(
        money_sum(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), "revenue"
        )
    )


@register(
    "tpch_q21_waiting_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting; the "
    "fixture has no commit/receipt dates, so l_returnflag='R' stands "
    "in for 'late' — identical EXISTS + NOT EXISTS plan): the sole-"
    "blamed-supplier condition is a left-semi then left-anti join on "
    "orderkey with a suppkey-inequality residual; top-10 via "
    "TakeOrdered with s_name tiebreak",
    tags=("tpch", "join"),
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    l1 = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(
            orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey")
    )
    l2 = lineitem.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = lineitem.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    blamed = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("l2_orderkey"))
        & (F.col("l_suppkey") != F.col("l2_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("l3_orderkey"))
        & (F.col("l_suppkey") != F.col("l3_suppkey")),
        "left_anti",
    )
    return (
        blamed.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )

"""TPC-H completion wave: the five partsupp-family queries (Q2, Q9,
Q11, Q16, Q20), adapted to the fixture schema — the testdata has no
partsupp table, so the (partkey, suppkey) supply relation is derived
from lineitem (every shipped pair IS a supply relationship) and
ps_supplycost/ps_availqty analogs are deterministic expressions over
available columns. Each adaptation preserves the ORIGINAL plan shape —
that is what these queries exist to prove out:

- Q2  : correlated scalar MIN subquery → per-group min + equality
        join-back (the decorrelation every engine must do).
- Q9  : profit star — 5-way join with two fact-side keys (part AND
        supplier), grouped by nation × year.
- Q11 : grouped HAVING against a global scalar aggregate (broadcast
        single-row cross join, no second scan of the grouped side).
- Q16 : distinct-count aggregation over an anti-joined supply relation.
- Q20 : nested correlated-aggregate threshold → two-level aggregate
        join feeding a left-semi chain into the supplier dim.

Exactness follows the repo-wide money contract: per-row double math is
cast to DECIMAL(18,6) BEFORE aggregation (exact, order-free), cast to
double after, so Spark and DuckDB hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_210726_spark.functions.scalar import money, money_sum
from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table

# Derived supply relation shared by the adaptations: distinct shipped
# (part, supplier) pairs with the min unit price as the ps_supplycost
# analog. The unit price is kept in EXACT INTEGER form — floor(10000 ·
# price / qty) ("hundredths of a cent") — because a DECIMAL(18,6) cast
# of a full-entropy quotient is a cross-engine hazard: Spark rounds the
# exact binary double (BigDecimal half-up) while DuckDB rounds via a
# double multiply, and a quotient landing within an ulp of a 0.5·10⁻⁶
# boundary flips differently (observed once in 52k pairs at sf0.01).
# floor() of the identical IEEE quotient is exact in both engines.
_PS_SQL = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           MIN(CAST(floor(10000 * l_extendedprice / l_quantity) AS BIGINT)) AS ps_supplycost
    FROM lineitem
    GROUP BY 1, 2
"""


def _ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        ).agg(
            F.min(
                F.floor(
                    F.lit(10000.0) * F.col("l_extendedprice") / F.col("l_quantity")
                ).cast("long")
            ).alias("ps_supplycost")
        )
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    cand AS (
      SELECT p_partkey, ps_suppkey, ps_supplycost
      FROM part JOIN ps ON p_partkey = ps_partkey
      WHERE p_size <= 5 AND p_type = 'STANDARD'
        AND ps_suppkey IN (SELECT s_suppkey FROM eu)),
    best AS (SELECT p_partkey, MIN(ps_supplycost) AS min_cost
             FROM cand GROUP BY 1)
    SELECT c.p_partkey, e.s_name, e.n_name,
           CAST(e.s_acctbal AS DOUBLE) AS s_acctbal,
           c.ps_supplycost AS supplycost_c
    FROM cand c
    JOIN best b ON c.p_partkey = b.p_partkey AND c.ps_supplycost = b.min_cost
    JOIN eu e ON c.ps_suppkey = e.s_suppkey
    """,
    doc="TPC-H Q2 shape (minimum-cost supplier, ref plan: correlated "
    "scalar subquery over partsupp): supply relation derived from "
    "lineitem (min exact-decimal unit price per shipped pair = "
    "ps_supplycost analog); the correlated MIN decorrelates to a "
    "per-part min aggregate equality-joined back against the candidate "
    "set — one shuffle on partkey for agg + join (colocated), EUROPE "
    "suppliers and the part filter both broadcast",
    tags=("tpch", "join"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    ps = _ps(spark, sf_dir)

    eu = (
        supplier.join(
            nation, F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            region.filter(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    wanted_parts = part.filter(
        (F.col("p_size") <= 5) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey")
    cand = (
        ps.join(F.broadcast(wanted_parts), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(eu.select("s_suppkey")),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .select("p_partkey", "ps_suppkey", "ps_supplycost")
    )
    best = cand.groupBy("p_partkey").agg(F.min("ps_supplycost").alias("min_cost"))
    return (
        cand.join(
            best,
            (cand["p_partkey"] == best["p_partkey"])
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .drop(best["p_partkey"])
        .join(F.broadcast(eu), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "s_name",
            "n_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            F.col("ps_supplycost").alias("supplycost_c"),
        )
    )


@register(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - 0.6 * p_retailprice * l_quantity
                    AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape (product-type profit; ps_supplycost adapted to "
    "the deterministic 0.6·p_retailprice proxy — partsupp absent): "
    "5-way star where the fact joins on THREE keys — part and supplier "
    "broadcast (with the p_name filter pruning part before broadcast), "
    "orders is the one shuffle partner — grouped by nation × order "
    "year with a single exact-decimal sum",
    tags=("tpch", "join", "bench"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")

    profit = money(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(
            F.broadcast(
                part.filter(F.col("p_name").like("%gear%")).select(
                    "p_partkey", "p_retailprice"
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@register(
    "tpch_q11_important_stock",
    oracle="""
    WITH v AS (
      SELECT l_partkey AS partkey,
             SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6))) AS value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY 1),
    t AS (SELECT SUM(value) AS total FROM v)
    SELECT partkey, CAST(value AS DOUBLE) AS part_value
    FROM v, t
    WHERE value > 0.001 * total
    """,
    doc="TPC-H Q11 shape (important stock identification; the nation "
    "filter widened to region ASIA so every fixture scale has "
    "qualifying suppliers): per-part supply value (exact decimal) for "
    "the region's suppliers, kept only "
    "when above a fraction of the GLOBAL total — the scalar subquery is "
    "a single-row aggregate cross-joined (broadcast) against the "
    "grouped rows, so the grouped side is computed once and never "
    "rescanned; supplier/nation broadcast into the fact scan",
    tags=("tpch", "agg"),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    nat_supp = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    v = (
        l.join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(money(F.col("l_extendedprice") * F.col("l_quantity"))).alias("value"))
    )
    total = v.agg(F.sum("value").alias("total"))
    return (
        v.join(F.broadcast(total))
        .filter(F.col("value") > F.lit(0.001) * F.col("total"))
        .select("partkey", F.col("value").cast("double").alias("part_value"))
    )


@register(
    "tpch_q16_supplier_count",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM ps
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO' AND p_size <= 10
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 shape (supplier-part relationship count; the "
    "'customer complaints' supplier exclusion adapted to s_acctbal < 0 "
    "— supplier has no comment column): distinct supply pairs from "
    "lineitem, excluded suppliers removed by a broadcast anti-join "
    "BEFORE the distinct (smaller dedup state), part attributes "
    "broadcast in, then COUNT(DISTINCT) per (brand, type, size) — "
    "Spark plans the distinct-agg as a two-level partial expand, no "
    "row explosion",
    tags=("tpch", "agg"),
)
def tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")

    bad_supp = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    wanted = part.filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size") <= 10)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    ps = (
        l.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(wanted), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return ps.groupBy("p_brand", "p_type", "p_size").agg(
        F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt")
    )


@register(
    "tpch_q20_dominant_supplier",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,6))) AS supp_qty
      FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      GROUP BY 1, 2),
    part_total AS (
      SELECT l_partkey, SUM(supp_qty) AS part_qty
      FROM shipped GROUP BY 1)
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (
        SELECT sh.l_suppkey
        FROM shipped sh JOIN part_total pt ON sh.l_partkey = pt.l_partkey
        WHERE CAST(sh.supp_qty AS DOUBLE) > 0.3 * CAST(pt.part_qty AS DOUBLE))
    """,
    doc="TPC-H Q20 shape (parts-promotion supplier screen; availqty > "
    "½·shipped adapted to 'supplier shipped >30% of a small-part's "
    "1997 volume' — partsupp absent): the nested correlated aggregate "
    "decorrelates into a two-level aggregate pair (per-(part,supp) and "
    "per-part, the second derived FROM the first — one fact scan, one "
    "shuffle) joined on partkey, feeding a left-semi into the "
    "region-filtered supplier dim; part filter and dims broadcast",
    tags=("tpch", "join"),
)
def tpch_q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    small_parts = part.filter(F.col("p_name").like("small%")).select("p_partkey")
    shipped = (
        l.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(F.broadcast(small_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(money("l_quantity")).alias("supp_qty"))
    )
    part_total = shipped.groupBy("l_partkey").agg(F.sum("supp_qty").alias("part_qty"))
    dominant = (
        shipped.join(part_total, "l_partkey")
        .filter(
            F.col("supp_qty").cast("double")
            > F.lit(0.3) * F.col("part_qty").cast("double")
        )
        .select("l_suppkey")
    )
    return (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
    )

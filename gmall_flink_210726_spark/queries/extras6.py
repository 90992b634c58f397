r"""Extras wave 6: time-series smoothing on aggregated frames and
graph degree assortativity.

Determinism notes (repo-wide contract):
- EWMA tap weights are round(pow(0.7, k), 6) cast to DECIMAL(8,6) —
  the same double pow and 6-dp rounding on both engines; the weighted
  term is an EXACT DECIMAL(18,2) x DECIMAL(8,6) product (a double
  product rounded at 6 dp sits on .5e-6 boundaries and flips between
  engines — observed on 30/8623 rows at sf0.01), sums are exact, and
  the only float op is the final already-bit-identical quotient,
  emitted unrounded.
- Assortativity moments are EXACT integer/decimal sums (degree
  products cast to DECIMAL(38,0) before summation — overflow-safe at
  100 TB edge counts); the Pearson formula then runs in double with
  the identical operation order on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "x21_ewma_smoothing",
    oracle="""
    WITH b AS (SELECT o_orderpriority AS prio,
                      CAST(o_orderdate AS DATE) AS day,
                      CAST(SUM(o_totalprice) AS DECIMAL(18,2)) AS x
               FROM orders GROUP BY 1, 2),
    t AS (SELECT prio, day + CAST(k AS INTEGER) AS tday,
                 x * CAST(round(pow(0.7, k), 6) AS DECIMAL(8,6)) AS term,
                 CAST(round(pow(0.7, k), 6) AS DECIMAL(8,6)) AS wk
          FROM b, range(30) AS u(k))
    SELECT t.prio, strftime(t.tday, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_taps,
           CAST(SUM(term) AS DOUBLE)
             / CAST(SUM(wk) AS DOUBLE) AS ewma
    FROM t JOIN b ON t.prio = b.prio AND t.tday = b.day
    GROUP BY 1, 2
    """,
    doc="Truncated-EWMA smoothing (30-tap exponentially-weighted FIR, "
    "alpha-style decay 0.7^k, weights renormalized over the taps whose "
    "source day exists) of daily revenue per order priority — the "
    "trend-smoothing pass of a metrics/anomaly pipeline. Scale shape: "
    "smoothing runs entirely on the AGGREGATED (group, day) frame "
    "(time-bounded cardinality however big the fact table), "
    "checkpointed so the fan-out and the existence semi-join share one "
    "aggregation; the 30x tap explode never touches raw rows.",
    tags=("extras", "timeseries"),
)
def x21_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    b = (
        orders.groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(F.sum("o_totalprice").cast("decimal(18,2)").alias("x"))
        .localCheckpoint(eager=False)
    )
    wk = F.round(F.pow(F.lit(0.7), F.col("k")), 6)
    taps = b.select(
        "prio",
        F.explode(F.sequence(F.lit(0), F.lit(29))).alias("k"),
        F.col("day").alias("sday"),
        "x",
    ).select(
        "prio",
        F.date_add("sday", F.col("k")).alias("tday"),
        # DECIMAL(18,2) x DECIMAL(8,6) — exact product, no
        # boundary-prone double round anywhere before the final division
        (F.col("x") * wk.cast("decimal(8,6)")).alias("term"),
        wk.cast("decimal(8,6)").alias("wk"),
    )
    present = b.select("prio", F.col("day").alias("tday"))
    return (
        taps.join(present, ["prio", "tday"], "left_semi")
        .groupBy("prio", F.date_format("tday", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_taps"),
            # NO final 6-dp round: the two operands are DECIMAL-exact,
            # so the raw IEEE quotient is already bit-identical across
            # engines, while round(q, 6) can differ by 1 ulp when the
            # quotient sits on a .5e-6 boundary (30/8623 rows at sf0.01)
            (F.sum("term").cast("double") / F.sum("wk").cast("double"))
            .alias("ewma"),
        )
    )


@register(
    "x22_degree_assortativity",
    oracle="""
    WITH e AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
               FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    dc AS (SELECT c, COUNT(*) AS dx FROM e GROUP BY c),
    ds AS (SELECT s, COUNT(*) AS dy FROM e GROUP BY s),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
                 SUM(CAST(dx AS DECIMAL(38,0))) AS sx,
                 SUM(CAST(dy AS DECIMAL(38,0))) AS sy,
                 SUM(CAST(dx * dx AS DECIMAL(38,0))) AS sxx,
                 SUM(CAST(dy * dy AS DECIMAL(38,0))) AS syy,
                 SUM(CAST(dx * dy AS DECIMAL(38,0))) AS sxy
          FROM e JOIN dc USING (c) JOIN ds USING (s))
    SELECT m AS m_edges,
           round(CAST(sx AS DOUBLE) / m, 6) AS mean_deg_cust,
           round(CAST(sy AS DOUBLE) / m, 6) AS mean_deg_supp,
           round((m * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(m * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(m * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 6) AS assortativity
    FROM m
    """,
    doc="Degree assortativity of the customer-supplier trade graph "
    "(Newman 2002): Pearson correlation of endpoint degrees across "
    "distinct edges — disassortative networks (hubs link to leaves) "
    "behave differently under dedup/sampling than assortative ones, "
    "so this is the one-number graph-shape screen. All five moments "
    "are EXACT integer sums in DECIMAL(38,0) (no float accumulation); "
    "shape: one distinct-edge frame (checkpointed, three plan legs "
    "read it), two node-sized degree aggs joined back by key, one "
    "scalar output row.",
    tags=("extras", "graph"),
)
def x22_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    e = (
        orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    dc = e.groupBy("c").agg(F.count(F.lit(1)).alias("dx"))
    ds = e.groupBy("s").agg(F.count(F.lit(1)).alias("dy"))
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    mom = (
        e.join(dc, "c")
        .join(ds, "s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("m"),
            F.sum(dec(F.col("dx"))).alias("sx"),
            F.sum(dec(F.col("dy"))).alias("sy"),
            F.sum(dec(F.col("dx") * F.col("dx"))).alias("sxx"),
            F.sum(dec(F.col("dy") * F.col("dy"))).alias("syy"),
            F.sum(dec(F.col("dx") * F.col("dy"))).alias("sxy"),
        )
    )
    md = F.col("m").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxxd, syyd = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxyd = F.col("sxy").cast("double")
    return mom.select(
        F.col("m").alias("m_edges"),
        F.round(sxd / F.col("m"), 6).alias("mean_deg_cust"),
        F.round(syd / F.col("m"), 6).alias("mean_deg_supp"),
        F.round(
            (F.col("m") * sxyd - sxd * syd)
            / (
                F.sqrt(F.col("m") * sxxd - sxd * sxd)
                * F.sqrt(F.col("m") * syyd - syd * syd)
            ),
            6,
        ).alias("assortativity"),
    )

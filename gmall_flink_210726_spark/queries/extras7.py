r"""Extras wave 7: data-quality digit audit, time-bucket gap-fill, and
bounded k-core graph peeling.

Determinism notes (repo-wide contract):
- Benford expectation log10(1 + 1/d) and the chi-square terms are
  computed in double with the IDENTICAL operation order on both
  engines over exact integer counts — bit-identical without rounding.
- Gap-fill sums event values as exact integer cents
  (round(value*100)) so the carried-forward metric is
  summation-order-independent; only the final /100.0 is float.
- k-core peel rounds operate on exact distinct edge sets; all outputs
  are integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "x23_benford_audit",
    oracle="""
    WITH v AS (SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
               WHERE o_totalprice > 0),
    d AS (SELECT CAST(floor(x / power(10.0, floor(log10(x)))) AS BIGINT)
            AS digit FROM v),
    c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY 1),
    t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM c)
    SELECT c.digit, c.n_obs,
           log10(1.0 + 1.0 / c.digit) AS exp_p,
           (c.n_obs - t.n * log10(1.0 + 1.0 / c.digit))
             * (c.n_obs - t.n * log10(1.0 + 1.0 / c.digit))
             / (t.n * log10(1.0 + 1.0 / c.digit)) AS chi2_term
    FROM c CROSS JOIN t
    """,
    doc="Benford first-significant-digit conformance audit (the "
    "classic fraud/data-quality screen): observed digit counts of "
    "order totals vs the Benford expectation log10(1+1/d), with "
    "per-digit chi-square contributions. Scale shape: one scan "
    "collapses to a 9-row digit frame; the total joins back as a "
    "1-row broadcast — all double arithmetic runs on the 9-row frame "
    "with engine-identical operation order over exact integer counts.",
    tags=("extras", "quality"),
)
def x23_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    x = F.col("o_totalprice").cast("double")
    digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))).cast("long")
    c = (
        orders.filter(F.col("o_totalprice") > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    t = c.agg(F.sum("n_obs").cast("long").alias("n"))
    exp_p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    dev = F.col("n_obs") - F.col("n") * exp_p
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n_obs",
        exp_p.alias("exp_p"),
        (dev * dev / (F.col("n") * exp_p)).alias("chi2_term"),
    )


@register(
    "x24_time_gapfill",
    oracle="""
    WITH b AS (SELECT event_type,
                      date_trunc('hour', ts) AS hr,
                      CAST(COUNT(*) AS BIGINT) AS n_events,
                      CAST(SUM(CAST(round(value * 100, 0) AS BIGINT))
                           AS BIGINT) AS cents
               FROM events GROUP BY 1, 2),
    rng AS (SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM b),
    spine AS (SELECT t.event_type, g.hr
              FROM (SELECT DISTINCT event_type FROM b) t
              CROSS JOIN (SELECT unnest(generate_series(lo, hi,
                            INTERVAL 1 HOUR)) AS hr FROM rng) g),
    f AS (SELECT s.event_type, s.hr,
                 COALESCE(b.n_events, 0) AS n_events,
                 b.cents,
                 CASE WHEN b.hr IS NULL THEN 1 ELSE 0 END AS filled
          FROM spine s LEFT JOIN b USING (event_type, hr))
    SELECT event_type, strftime(hr, '%Y-%m-%d %H') AS hour,
           n_events, filled,
           COALESCE(LAST_VALUE(cents IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             0) / 100.0 AS carried_value
    FROM f
    """,
    doc="Time-bucket gap-fill with carry-forward (the hypertable "
    "resample primitive): hourly per-type event rollups joined against "
    "a dense (type x hour) spine generated from the observed range; "
    "missing buckets appear with n_events=0, filled=1, and the last "
    "observed value carried forward (LAST ... IGNORE NULLS). Scale "
    "shape: the fact scan collapses FIRST to the (type, hour) frame "
    "(time-bounded cardinality however big the table), the 1-row "
    "range agg broadcasts, the spine is types x hours, and the "
    "carry-forward window partitions per type over bounded rows — no "
    "raw row ever meets the spine. Values are summed as exact integer "
    "cents so carry-forward is summation-order-independent.",
    tags=("extras", "timeseries"),
)
def x24_time_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    b = (
        events.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hr")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .localCheckpoint(eager=False)
    )
    rng = b.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    hours = rng.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("hr")
    )
    spine = (
        b.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(hours))
        # spine and b share lineage (both derive from the aggregated
        # frame); break the ambiguity with explicit aliases
        .select(
            F.col("event_type").alias("sp_type"), F.col("hr").alias("sp_hr")
        )
    )
    f = spine.join(
        b,
        (F.col("sp_type") == F.col("event_type"))
        & (F.col("sp_hr") == F.col("hr")),
        "left",
    ).select(
        F.col("sp_type").alias("event_type"),
        F.col("sp_hr").alias("hr"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "cents",
        F.when(F.col("hr").isNull(), 1).otherwise(0).alias("filled"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return f.select(
        "event_type",
        F.date_format("hr", "yyyy-MM-dd HH").alias("hour"),
        "n_events",
        "filled",
        (
            F.coalesce(F.last("cents", ignorenulls=True).over(w), F.lit(0))
            / 100.0
        ).alias("carried_value"),
    )


# one peel round, unrolled in the oracle for rounds 1..3: keep parts
# and suppliers whose CURRENT degree is >= k, then restrict the edge
# set to kept endpoints
_KCORE_K = 3
_PEEL_ROUND = f"""
    dp{{r}} AS (SELECT p FROM e{{prev}} GROUP BY p
                HAVING COUNT(*) >= {_KCORE_K}),
    ds{{r}} AS (SELECT s FROM e{{prev}} GROUP BY s
                HAVING COUNT(*) >= {_KCORE_K}),
    e{{r}} AS (SELECT e.p, e.s FROM e{{prev}} e
             JOIN dp{{r}} USING (p) JOIN ds{{r}} USING (s))"""


@register(
    "an10_kcore_peel",
    oracle="WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s"
    " FROM lineitem WHERE l_quantity >= 49),"
    + ",".join(_PEEL_ROUND.format(r=r, prev=r - 1) for r in (1, 2, 3))
    + "".join(
        f"""
    {'SELECT' if r == 0 else 'UNION ALL SELECT'}
           CAST({r} AS BIGINT) AS round,
           CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(COUNT(DISTINCT p) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT s) AS BIGINT) AS n_supps
    FROM e{r}"""
        for r in (0, 1, 2, 3)
    ),
    doc="Bounded k-core peeling (k=3, 3 rounds) of the bipartite "
    "part-supplier graph over high-quantity line items (the sparse "
    "slice where peeling cascades): each round drops endpoints whose "
    "current degree is below k and restricts the edge set to "
    "survivors; the "
    "output is the per-round (edges, part-nodes, supplier-nodes) "
    "shrinkage curve — the standard dense-subgraph screen before "
    "community detection. Scale shape: the graph is the DISTINCT "
    "edge projection (pair-bounded however big the fact table); each "
    "round is two degree HashAggregates plus two semi-joins on bare "
    "keys, a constant number of rounds with no lineage growth worth "
    "checkpointing at 3 rounds (the >=6-round pattern in "
    "operators/graph.py:pagerank applies beyond that).",
    tags=("extras", "graph"),
)
def an10_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    e = (
        li.filter(F.col("l_quantity") >= 49)
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
    )

    def stats(edges: DataFrame, rnd: int) -> DataFrame:
        return edges.agg(
            F.lit(rnd).cast("long").alias("round"),
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.count_distinct("p").cast("long").alias("n_parts"),
            F.count_distinct("s").cast("long").alias("n_supps"),
        )

    # the edge frame feeds both the stats agg and the next round's
    # degree aggs: materialize once per round
    e = e.localCheckpoint(eager=False)
    out = [stats(e, 0)]
    for rnd in (1, 2, 3):
        keep_p = e.groupBy("p").agg(F.count(F.lit(1)).alias("d")).filter(
            F.col("d") >= _KCORE_K
        )
        keep_s = e.groupBy("s").agg(F.count(F.lit(1)).alias("d")).filter(
            F.col("d") >= _KCORE_K
        )
        e = (
            e.join(keep_p.select("p"), "p", "left_semi")
            .join(keep_s.select("s"), "s", "left_semi")
            .localCheckpoint(eager=False)
        )
        out.append(stats(e, rnd))
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


@register(
    "x25_seasonal_profile",
    oracle="""
    WITH b AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                      CAST(COUNT(*) AS BIGINT) AS ct
               FROM events GROUP BY 1, 2),
    s AS (SELECT event_type, EXTRACT(hour FROM hr) AS hod,
                 CAST(SUM(ct) AS BIGINT) AS tot,
                 CAST(COUNT(*) AS BIGINT) AS n_days
          FROM b GROUP BY 1, 2)
    SELECT b.event_type, strftime(b.hr, '%Y-%m-%d %H') AS hour,
           b.ct AS n_events,
           CAST(s.tot AS DOUBLE) / s.n_days AS seasonal,
           b.ct - CAST(s.tot AS DOUBLE) / s.n_days AS residual
    FROM b JOIN s ON b.event_type = s.event_type
                 AND EXTRACT(hour FROM b.hr) = s.hod
    """,
    doc="Hour-of-day seasonal decomposition (the additive profile + "
    "residual split behind seasonality-aware anomaly detection): per "
    "(type, hour-of-day) the seasonal component is the mean hourly "
    "count across observed days, and each bucket's residual is actual "
    "minus seasonal. Scale shape: the fact scan collapses to the "
    "(type, hour) frame first; the seasonal profile is a <= types x 24 "
    "row aggregate joined back broadcast — raw rows never meet the "
    "profile. Exactness: seasonal = int-sum / int-count, ONE double "
    "division identical on both engines; the residual subtraction is "
    "the only other float op, same order both sides.",
    tags=("extras", "timeseries"),
)
def x25_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    b = (
        events.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hr")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("ct"))
        .localCheckpoint(eager=False)
    )
    s = b.groupBy(
        F.col("event_type").alias("s_type"),
        F.hour("hr").alias("hod"),
    ).agg(
        F.sum("ct").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    seasonal = F.col("tot").cast("double") / F.col("n_days")
    return (
        b.join(
            F.broadcast(s),
            (b["event_type"] == F.col("s_type"))
            & (F.hour(b["hr"]) == F.col("hod")),
        )
        .select(
            "event_type",
            F.date_format("hr", "yyyy-MM-dd HH").alias("hour"),
            F.col("ct").alias("n_events"),
            seasonal.alias("seasonal"),
            (F.col("ct") - seasonal).alias("residual"),
        )
    )


@register(
    "x26_group_ols_trend",
    oracle="""
    WITH p AS (SELECT o_orderpriority AS prio,
                      CAST(date_diff('day', DATE '1995-01-01',
                                     CAST(o_orderdate AS DATE))
                           AS BIGINT) AS x,
                      CAST(round(o_totalprice * 100, 0) AS BIGINT) AS y
               FROM orders),
    m AS (SELECT prio,
                 CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
                 CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
                 CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
                 CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
                 CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy
          FROM p GROUP BY 1)
    SELECT prio, CAST(n AS BIGINT) AS n_orders,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_day,
           (CAST(sy AS DOUBLE)
            - (CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE))
              * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) AS intercept_cents
    FROM m
    """,
    doc="Per-group OLS trend line (closed form): revenue-vs-time "
    "slope and intercept per order priority from the five exact "
    "moments (n, Sx, Sy, Sxx, Sxy) — x centered as days since "
    "1995-01-01 and y as exact integer cents so every moment is an "
    "exact integer; the normal-equation cross products run in "
    "DECIMAL(38,0) (n*Sxy ~ 10^23 at sf0.1 overflows BIGINT) and the "
    "single double division per coefficient is engine-identical. "
    "Scale shape: one scan collapsing to 5 moments per group "
    "(map-side partial agg); the closed form is a projection over "
    "the <= |groups| frame — the regression never re-scans or "
    "iterates.",
    tags=("extras", "analytics"),
)
def x26_group_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    x = F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01")).cast(
        "long"
    )
    y = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    m = orders.select(
        F.col("o_orderpriority").alias("prio"),
        x.alias("x"),
        y.alias("y"),
    ).groupBy("prio").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    slope = num / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return m.select(
        "prio",
        F.col("n").cast("long").alias("n_orders"),
        slope.alias("slope_cents_per_day"),
        intercept.alias("intercept_cents"),
    )


@register(
    "an11_market_basket",
    oracle="""
    WITH i AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
               FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM i),
    ic AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS ct FROM i GROUP BY 1),
    pr AS (SELECT a.p AS p_a, b.p AS p_b,
                  CAST(COUNT(*) AS BIGINT) AS pair_ct
           FROM i a JOIN i b ON a.o = b.o AND a.p < b.p
           GROUP BY 1, 2 HAVING COUNT(*) >= 3)
    SELECT pr.p_a, pr.p_b, pr.pair_ct,
           ca.ct AS ct_a, cb.ct AS ct_b,
           pr.pair_ct / CAST(n.n_orders AS DOUBLE) AS support,
           pr.pair_ct / CAST(ca.ct AS DOUBLE) AS conf_a_to_b,
           pr.pair_ct / CAST(cb.ct AS DOUBLE) AS conf_b_to_a,
           (pr.pair_ct * n.n_orders)
             / CAST(ca.ct * cb.ct AS DOUBLE) AS lift
    FROM pr
    JOIN ic ca ON ca.p = pr.p_a
    JOIN ic cb ON cb.p = pr.p_b
    CROSS JOIN n
    """,
    doc="Association rules / market-basket mining (the A-Priori "
    "2-itemset pass): co-occurring part pairs within orders with "
    "support, both confidences, and lift, pruned at min pair count 3. "
    "Scale shape: pair generation is the per-basket self-join on the "
    "ORDER key — fan-out is bounded by basket size squared (<= 13 "
    "items/order here; a pathological mega-basket would need the "
    "max_df-style cap the dedup ops use), never a part x part cross "
    "product; item counts join back as a broadcast-size dimension and "
    "the corpus-size scalar is a 1-row cross join. Exactness: every "
    "ratio is one int/int double division (lift's numerator and "
    "denominator are exact integer products), engine-identical.",
    tags=("extras", "analytics"),
)
def an11_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    i = (
        li.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = i.agg(F.count_distinct("o").cast("long").alias("n_orders"))
    ic = i.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("ct"))
    a = i.select(F.col("o"), F.col("p").alias("p_a"))
    b = i.select(F.col("o").alias("o2"), F.col("p").alias("p_b"))
    pr = (
        a.join(b, (a["o"] == b["o2"]) & (F.col("p_a") < F.col("p_b")))
        .groupBy("p_a", "p_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_ct"))
        .filter(F.col("pair_ct") >= 3)
    )
    out = (
        pr.join(ic.select(F.col("p").alias("p_a"), F.col("ct").alias("ct_a")), "p_a")
        .join(ic.select(F.col("p").alias("p_b"), F.col("ct").alias("ct_b")), "p_b")
        .crossJoin(F.broadcast(n))
    )
    return out.select(
        "p_a",
        "p_b",
        "pair_ct",
        "ct_a",
        "ct_b",
        (F.col("pair_ct") / F.col("n_orders").cast("double")).alias("support"),
        (F.col("pair_ct") / F.col("ct_a").cast("double")).alias("conf_a_to_b"),
        (F.col("pair_ct") / F.col("ct_b").cast("double")).alias("conf_b_to_a"),
        (
            (F.col("pair_ct") * F.col("n_orders"))
            / (F.col("ct_a") * F.col("ct_b")).cast("double")
        ).alias("lift"),
    )


@register(
    "x27_gini_distributed",
    oracle="""
    WITH p AS (SELECT o_orderpriority AS prio,
                      CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
               FROM orders),
    r AS (SELECT prio, cents,
                 ROW_NUMBER() OVER (PARTITION BY prio ORDER BY cents)
                   AS rn
          FROM p)
    SELECT prio,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(cents) AS DECIMAL(38,0)) AS DOUBLE) / 100.0
             AS total_value,
           (2.0 * CAST(CAST(SUM(rn * cents) AS DECIMAL(38,0)) AS DOUBLE))
             / (CAST(COUNT(*) AS DOUBLE)
                * CAST(CAST(SUM(cents) AS DECIMAL(38,0)) AS DOUBLE))
             - (CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*)) AS gini
    FROM r GROUP BY prio
    """,
    doc="Exact per-group Gini coefficient (inequality / concentration "
    "audit): G = 2*Sum(rank_i * x_i) / (n * Sum(x)) - (n+1)/n over "
    "value-ascending ranks. The oracle states the semantic with one "
    "window; the Spark plan computes the SAME exact rank WITHOUT a "
    "single-task per-group sort — the shard_binpack distributed-rank "
    "decomposition: 256 value-monotone integer buckets per group "
    "(exact integer bucket arithmetic), per-(group, bucket) counts -> "
    "a <= 256-row per-group exclusive prefix window (tiny), broadcast "
    "offsets joined back, within-bucket ROW_NUMBER over ~n/256 rows. "
    "Tie order inside equal values cannot change Sum(rank*x) (equal "
    "values occupy a contiguous rank block), so the decomposition is "
    "deterministic. Rank-product sums run in DECIMAL(38,0) "
    "(Sum(i*x) ~ 10^20 at sf0.1 overflows bigint); the Gini formula "
    "is the identical double operation sequence on both engines.",
    tags=("extras", "analytics"),
)
def x27_gini_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderpriority").alias("prio"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    ).localCheckpoint(eager=False)
    rng = base.groupBy(F.col("prio").alias("r_prio")).agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi")
    )
    # value-monotone integer bucketing: floor((c - lo) * 256 / span)
    # in exact long arithmetic (range * 256 ~ 1.5e12 << 2^63)
    b = base.join(
        F.broadcast(rng), F.col("prio") == F.col("r_prio")
    ).select(
        "prio",
        "cents",
        F.least(
            F.floor(
                (F.col("cents") - F.col("lo"))
                * 256
                / (F.col("hi") - F.col("lo") + 1)
            ),
            F.lit(255),
        )
        .cast("int")
        .alias("bkt"),
    )
    bc = b.groupBy(
        F.col("prio").alias("o_prio"), F.col("bkt").alias("o_bkt")
    ).agg(F.count(F.lit(1)).alias("ct"))
    w_off = (
        W.partitionBy("o_prio")
        .orderBy("o_bkt")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offs = bc.select(
        "o_prio",
        "o_bkt",
        F.coalesce(F.sum("ct").over(w_off), F.lit(0)).alias("off"),
    )
    w_local = W.partitionBy("prio", "bkt").orderBy("cents")
    ranked = (
        b.join(
            F.broadcast(offs),
            (F.col("prio") == F.col("o_prio"))
            & (F.col("bkt") == F.col("o_bkt")),
        )
        .select(
            "prio",
            "cents",
            (F.col("off") + F.row_number().over(w_local)).alias("rn"),
        )
    )
    n = F.count(F.lit(1))
    s_cents = F.sum("cents").cast("decimal(38,0)").cast("double")
    s_rank = (
        F.sum(F.col("rn") * F.col("cents")).cast("decimal(38,0)").cast("double")
    )
    return ranked.groupBy("prio").agg(
        n.cast("long").alias("n_orders"),
        (s_cents / F.lit(100.0)).alias("total_value"),
        (
            (F.lit(2.0) * s_rank) / (n.cast("double") * s_cents)
            - ((n + F.lit(1)).cast("double") / n)
        ).alias("gini"),
    )

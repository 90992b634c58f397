r"""Analytics wave 10: classical inference screens + graph features +
exact quota allocation.

Arithmetic discipline (engine-portability rules the whole repo
follows): every statistic reduces to EXACT integer/decimal sums first
(Spark DECIMAL(38,0) == DuckDB HUGEINT), scaled integer division uses
``div`` / ``//`` (both truncate for non-negative operands), and the
single final float expression is built from those exact terms with the
same IEEE op tree in both engines, then rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "an18_anova_f",
    oracle="""
    WITH x AS (SELECT o_orderpriority AS grp,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS c
               FROM orders),
    g AS (SELECT grp, COUNT(*) AS n, SUM(c) AS s, SUM(c * c) AS q
          FROM x GROUP BY grp),
    t AS (SELECT grp, n, s, q, (s * s * 1000000) // n AS tg FROM g),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(n) AS BIGINT) AS nn,
                   SUM(s) AS ss, SUM(q) AS qq, SUM(tg) AS st
            FROM t)
    SELECT k AS n_groups, nn AS n_rows,
           round((CAST(st - (ss * ss * 1000000) // nn AS DOUBLE)
                  / CAST(k - 1 AS DOUBLE))
                 / (CAST(qq * 1000000 - st AS DOUBLE)
                    / CAST(nn - k AS DOUBLE)), 6) AS f_stat
    FROM tot
    """,
    doc="One-way ANOVA F across order priorities over o_totalprice "
    "cents. Between/within sums of squares from EXACT per-group "
    "moments: cents and cents-squared sum in DECIMAL(38,0)/HUGEINT, "
    "the per-group term s_g^2/n_g becomes the exact scaled integer "
    "(s_g^2*10^6) div n_g — no float enters until the final F ratio "
    "of two exact integers, rounded 6 dp. One scan, k=5 aggregated "
    "rows; headroom note: s^2*10^6 needs < 10^38, i.e. holds to "
    "~10^15 rows of 10^7-cent orders.",
    tags=("analytics", "stats"),
)
def an18_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .cast("decimal(38,0)")
        .alias("c"),
    )
    g = x.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("decimal(38,0)").alias("q"),
    )
    # exact integer division of a DECIMAL(38,0): Spark's `div` returns
    # LONG (wraps past 2^63), so strip the remainder first — the
    # quotient is then integral and decimal division represents it
    # exactly
    t = g.withColumn(
        "a", F.expr("CAST(s * s * 1000000 AS DECIMAL(38,0))")
    ).withColumn(
        "tg", F.expr("CAST((a - a % n) / n AS DECIMAL(38,0))")
    )
    tot = t.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("decimal(38,0)").alias("ss"),
        F.sum("q").cast("decimal(38,0)").alias("qq"),
        F.sum("tg").cast("decimal(38,0)").alias("st"),
    )
    tot = tot.withColumn(
        "aa", F.expr("CAST(ss * ss * 1000000 AS DECIMAL(38,0))")
    ).withColumn(
        "tall", F.expr("CAST((aa - aa % nn) / nn AS DECIMAL(38,0))")
    )
    return tot.select(
        F.col("k").alias("n_groups"),
        F.col("nn").alias("n_rows"),
        F.round(
            (
                F.expr("CAST(st - tall AS DOUBLE)")
                / F.expr("CAST(k - 1 AS DOUBLE)")
            )
            / (
                F.expr("CAST(qq * 1000000 - st AS DOUBLE)")
                / F.expr("CAST(nn - k AS DOUBLE)")
            ),
            6,
        ).alias("f_stat"),
    )


@register(
    "an19_cochran_armitage",
    oracle="""
    WITH e AS (SELECT user_id % 5 AS dose,
                      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                        AS resp
               FROM events),
    d AS (SELECT dose, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(resp) AS BIGINT) AS r
          FROM e GROUP BY dose),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
                   CAST(SUM(r) AS BIGINT) AS rr,
                   CAST(SUM(dose * r) AS BIGINT) AS sr,
                   CAST(SUM(dose * n) AS BIGINT) AS sn,
                   CAST(SUM(dose * dose * n) AS BIGINT) AS s2n
            FROM d)
    SELECT nn AS n_trials, rr AS n_hits,
           round(CAST(nn * sr - rr * sn AS DOUBLE)
                 / sqrt(CAST(rr AS DOUBLE) * CAST(nn - rr AS DOUBLE)
                        * (CAST(nn AS DOUBLE) * CAST(s2n AS DOUBLE)
                           - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE))
                        / CAST(nn AS DOUBLE)), 6) AS z_trend
    FROM tot
    """,
    doc="Cochran-Armitage trend test: does purchase propensity trend "
    "monotonically across the 5 ordered user cohorts (user_id %% 5 as "
    "dose score)? The 2xk contingency reduces to five integer "
    "(n_i, r_i) pairs; T = N*sum(s_i r_i) - R*sum(s_i n_i) and the "
    "variance term are exact BIGINT expressions, and z is one double "
    "expression over those exact terms (identical IEEE tree both "
    "engines), rounded 6 dp. The dose-response screen an A/B sibling "
    "of x34's two-arm z-test.",
    tags=("analytics", "stats"),
)
def an19_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 5).alias("dose"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "resp"
        ),
    )
    d = e.groupBy("dose").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("resp").cast("long").alias("r"),
    )
    tot = d.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("r").cast("long").alias("rr"),
        F.sum(F.col("dose") * F.col("r")).cast("long").alias("sr"),
        F.sum(F.col("dose") * F.col("n")).cast("long").alias("sn"),
        F.sum(F.col("dose") * F.col("dose") * F.col("n"))
        .cast("long")
        .alias("s2n"),
    )
    z = F.expr("CAST(nn * sr - rr * sn AS DOUBLE)") / F.sqrt(
        F.expr("CAST(rr AS DOUBLE)")
        * F.expr("CAST(nn - rr AS DOUBLE)")
        * (
            F.expr("CAST(nn AS DOUBLE) * CAST(s2n AS DOUBLE)")
            - F.expr("CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE)")
        )
        / F.expr("CAST(nn AS DOUBLE)")
    )
    return tot.select(
        F.col("nn").alias("n_trials"),
        F.col("rr").alias("n_hits"),
        F.round(z, 6).alias("z_trend"),
    )


@register(
    "x43_two_hop_features",
    oracle="""
    WITH e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
               FROM lineitem),
    deg AS (SELECT p, COUNT(*) AS dp FROM e GROUP BY p),
    ecap AS (SELECT e.p, e.s FROM e JOIN deg USING (p)
             WHERE deg.dp <= 100),
    one AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n_parts
            FROM e GROUP BY s),
    two AS (SELECT a.s AS s, CAST(COUNT(DISTINCT b.s) AS BIGINT)
                     AS n_cosuppliers
            FROM ecap a JOIN ecap b ON a.p = b.p AND a.s <> b.s
            GROUP BY a.s)
    SELECT one.s AS suppkey, one.n_parts,
           COALESCE(two.n_cosuppliers, 0) AS n_cosuppliers
    FROM one LEFT JOIN two ON one.s = two.s
    """,
    doc="Two-hop graph feature extraction over the part-supplier "
    "bipartite graph (the neighborhood features a graph-ML pipeline "
    "materializes): per supplier, 1-hop degree (distinct parts) and "
    "2-hop co-supplier count (suppliers sharing >=1 part). A dp<=100 "
    "hub cap bounds fan-out exactly like containment_pairs' df cap — "
    "the skew guard IS the operator contract at 100 TB, stated in "
    "the oracle too. The distinct count runs as BITMAP OR-aggregation "
    "(x32's word packing): each part's supplier set packs into "
    "sparse 64-bit words once, per-supplier merges are bit_or with "
    "map-side combine, so the shuffle carries <=|S|/64 words per "
    "supplier instead of the sum(d_p^2) candidate pairs (17.4M at "
    "sf0.1; measured ~2x faster than distinct-pair counting). The "
    "checkpointed edge list feeds all three consumers with one scan.",
    tags=("extras", "graph"),
)
def x43_two_hop_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the distinct edge set feeds three consumers (degree cap, 1-hop
    # counts, 2-hop self-join) — checkpoint it so the lineitem scan +
    # distinct shuffle run once, not three times (a real graph
    # pipeline persists its edge list the same way)
    e = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("p").agg(F.count(F.lit(1)).alias("dp"))
    ecap = e.join(deg.filter(F.col("dp") <= 100), "p").select("p", "s")
    one = e.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts")
    )
    # 2-hop via BITMAP OR-aggregation (the x32 word-packing trick)
    # instead of pair dedup + count_distinct: each part's supplier set
    # packs into sparse 64-bit words once, each edge pulls its part's
    # words, and the per-supplier merge is bit_or with map-side
    # combine — the shuffle carries <=|S|/64 words per supplier, never
    # the sum(d_p^2) candidate pairs (17.4M at sf0.1, measured ~2x
    # slower as distinct-pair counting)
    pw = ecap.groupBy(
        "p", F.expr("s div 64").alias("w")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(s % 64 AS INT))")
        ).alias("bits")
    )
    merged = (
        ecap.join(pw, "p")
        .groupBy("s", "w")
        .agg(F.bit_or("bits").alias("bits"))
    )
    # clear the supplier's own bit in its home word before counting
    cleared = merged.select(
        "s",
        F.when(
            F.col("w") == F.expr("s div 64"),
            F.expr(
                "bits & ~shiftleft(CAST(1 AS BIGINT), CAST(s % 64 AS INT))"
            ),
        )
        .otherwise(F.col("bits"))
        .alias("bits"),
    )
    two = cleared.groupBy("s").agg(
        F.sum(F.bit_count("bits")).cast("long").alias("n_cosuppliers")
    )
    return (
        one.join(two, "s", "left")
        .select(
            F.col("s").alias("suppkey"),
            "n_parts",
            F.coalesce(F.col("n_cosuppliers"), F.lit(0))
            .cast("long")
            .alias("n_cosuppliers"),
        )
    )


@register(
    "x44_quota_allocation",
    oracle="""
    WITH g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY lang),
    tot AS (SELECT SUM(n_docs) AS nn FROM g),
    b AS (SELECT lang, n_docs,
                 (1000 * n_docs) // nn AS base,
                 (1000 * n_docs) % nn AS rem
          FROM g, tot),
    d AS (SELECT CAST(1000 - SUM(base) AS BIGINT) AS deficit FROM b),
    r AS (SELECT lang, n_docs, base,
                 ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rk
          FROM b)
    SELECT lang, n_docs,
           CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END
                AS BIGINT) AS quota
    FROM r, d
    """,
    doc="Largest-remainder quota allocation (exact proportional "
    "sampling): split a fixed budget of 1000 docs across languages "
    "proportional to corpus share so quotas sum to EXACTLY the "
    "budget — floor shares first, then +1 to the largest remainders "
    "(ties broken by lang, deterministic). Pure integer div/mod on "
    "the bounded per-language frame; the allocation step a stratified "
    "training-mix builder runs before text_stratified_sample draws "
    "the rows.",
    tags=("extras", "sampling"),
)
def x44_quota_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    tot = g.agg(F.sum("n_docs").cast("long").alias("nn"))
    b = g.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.expr("(1000 * n_docs) div nn").alias("base"),
        ((1000 * F.col("n_docs")) % F.col("nn")).alias("rem"),
    )
    d = b.agg((F.lit(1000) - F.sum("base")).cast("long").alias("deficit"))
    r = b.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("rem").desc(), F.col("lang"))
        ),
    )
    return r.crossJoin(F.broadcast(d)).select(
        "lang",
        "n_docs",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("deficit"), 1).otherwise(0)
        )
        .cast("long")
        .alias("quota"),
    )


@register(
    "an20_last_touch_attribution",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts,
                      CAST(round(value * 100) AS BIGINT) AS cents
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT p.event_id, p.cents, e.event_type,
                 ROW_NUMBER() OVER (PARTITION BY p.event_id
                                    ORDER BY e.ts DESC, e.event_id DESC)
                   AS rk
          FROM p JOIN events e
            ON e.user_id = p.user_id
           AND e.event_type <> 'purchase'
           AND epoch_us(e.ts) >= epoch_us(p.ts) - 600000000
           AND epoch_us(e.ts) < epoch_us(p.ts)),
    att AS (SELECT event_id, cents, event_type FROM c WHERE rk = 1
            UNION ALL
            SELECT event_id, cents, 'direct' AS event_type FROM p
            WHERE event_id NOT IN (SELECT event_id FROM c))
    SELECT event_type AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS attributed_cents
    FROM att GROUP BY 1
    """,
    doc="Last-touch revenue attribution: each purchase's cents go to "
    "the LAST same-user non-purchase event within the preceding 10 "
    "minutes ('direct' when none) — the marketing-analytics "
    "composition of the as-of join (w3) and an aggregation, kept "
    "deterministic by the (ts DESC, event_id DESC) argmax tiebreak. "
    "The interval self-join shuffles on user_id with candidate rows "
    "bounded by the 10-minute window; the rank window partitions per "
    "purchase over that bounded candidate set; revenue sums are "
    "exact cents.",
    tags=("analytics", "join", "asof"),
)
def an20_last_touch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_uid"),
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    c = (
        p.join(
            ev.select(
                F.col("event_id").alias("e_id"),
                F.col("user_id").alias("e_uid"),
                F.col("ts").alias("e_ts"),
                F.col("event_type").alias("e_type"),
            ),
            (F.col("e_uid") == F.col("p_uid"))
            & (F.col("e_type") != "purchase")
            & (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 600 SECOND"))
            & (F.col("e_ts") < F.col("p_ts")),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("p_id").orderBy(
                    F.col("e_ts").desc(), F.col("e_id").desc()
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("p_id", "cents", F.col("e_type").alias("channel"))
    )
    direct = p.join(c.select("p_id"), "p_id", "left_anti").select(
        "p_id", "cents", F.lit("direct").alias("channel")
    )
    return (
        c.unionByName(direct)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum("cents").cast("long").alias("attributed_cents"),
        )
    )


@register(
    "sketch_ams_f2",
    oracle="""
    WITH f AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS ct
               FROM events GROUP BY user_id),
    est AS (SELECT j,
                   CAST(SUM(CASE WHEN ascii(substr(md5(
                          CAST(user_id AS VARCHAR) || '|'
                          || CAST(j AS VARCHAR)), 1, 1)) % 2 = 0
                        THEN ct ELSE -ct END) AS BIGINT) AS s
            FROM f, (SELECT unnest(range(0, 16)) AS j) GROUP BY j),
    agg AS (SELECT CAST(SUM(s * s) AS BIGINT) AS sum_sq FROM est),
    ex AS (SELECT CAST(SUM(ct * ct) AS BIGINT) AS f2_exact FROM f)
    SELECT CAST(16 AS BIGINT) AS n_estimators,
           ex.f2_exact,
           CAST(agg.sum_sq AS DOUBLE) / 16.0 AS f2_estimate
    FROM agg, ex
    """,
    doc="AMS (Alon-Matias-Szegedy) F2 sketch: the second frequency "
    "moment (join-size / self-join-size predictor) estimated by 16 "
    "independent +/-1 hash projections — md5-parity signs make the "
    "sign function identical in both engines, so the oracle "
    "recomputes the EXACT estimator, not a statistical neighbor. "
    "Each estimator is one signed integer sum over the per-key count "
    "frame (map-side combinable; 16 integers of state total — the "
    "sketch the streaming family would maintain additively), "
    "squared and averaged against the exact F2 for calibration. "
    "Completes the sketch-algebra family: CMS (point counts), HLL/"
    "KMV/theta (distinct), Bloom (membership), AMS (moments).",
    tags=("sketch", "agg"),
)
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("ct"))
    )
    js = spark.range(16).select(F.col("id").cast("int").alias("j"))
    signed = f.crossJoin(F.broadcast(js)).select(
        "j",
        F.when(
            F.ascii(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.col("user_id").cast("string"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    1,
                )
            )
            % 2
            == 0,
            F.col("ct"),
        )
        .otherwise(-F.col("ct"))
        .alias("sct"),
    )
    est = signed.groupBy("j").agg(F.sum("sct").cast("long").alias("s"))
    agg = est.agg(
        F.sum(F.col("s") * F.col("s")).cast("long").alias("sum_sq")
    )
    ex = f.agg(
        F.sum(F.col("ct") * F.col("ct")).cast("long").alias("f2_exact")
    )
    return agg.crossJoin(F.broadcast(ex)).select(
        F.lit(16).cast("long").alias("n_estimators"),
        "f2_exact",
        (F.col("sum_sq").cast("double") / F.lit(16.0)).alias("f2_estimate"),
    )


@register(
    "x45_bucketed_colocated_join",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
    doc="Bucketed CO-LOCATED join — the storage-layout lever that "
    "removes the shuffle from a fact-fact join too big to broadcast: "
    "both sides are written bucketBy(8, custkey) sortBy(custkey) "
    "(hash-partitioned AT REST), so the join plans with ZERO "
    "Exchange operators — each task reads bucket i of both tables "
    "and joins locally (tests/test_plans.py pins the exchange-free "
    "plan). At 100 TB this is the difference between re-shuffling "
    "the fact table on every query and paying the partitioning once "
    "at ingest; the same layout serves every custkey-keyed join and "
    "aggregation downstream. The query writes the bucketed layout "
    "into a scratch warehouse, joins, aggregates per market segment "
    "in exact cents, and drops the scratch tables.",
    tags=("extras", "join", "layout"),
)
def x45_bucketed_colocated_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile
    import uuid

    wh = tempfile.mkdtemp(prefix="x45_wh_")
    tag = uuid.uuid4().hex[:8]
    t_orders, t_cust = f"x45_orders_{tag}", f"x45_customer_{tag}"
    try:
        (
            load_table(spark, sf_dir, "orders")
            .select(
                "o_custkey",
                F.round(F.col("o_totalprice") * 100)
                .cast("long")
                .alias("cents"),
            )
            .write.bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .option("path", f"{wh}/orders")
            .saveAsTable(t_orders)
        )
        (
            load_table(spark, sf_dir, "customer")
            .select("c_custkey", "c_mktsegment")
            .write.bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .option("path", f"{wh}/customer")
            .saveAsTable(t_cust)
        )
        joined = spark.table(t_orders).join(
            spark.table(t_cust),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        result = (
            joined.groupBy(F.col("c_mktsegment").alias("mktsegment"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.sum("cents").cast("long").alias("revenue_cents"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        for t in (t_orders, t_cust):
            try:
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
        shutil.rmtree(wh, ignore_errors=True)
    return result


@register(
    "x46_geo_grid_join",
    oracle="""
    WITH pts AS (SELECT c_custkey AS id,
                        (c_custkey * 7919) % 1000000 AS lat,
                        (c_custkey * 104729) % 1000000 AS lon
                 FROM customer),
    cells AS (SELECT id, lat, lon, lat // 50000 AS cy, lon // 50000 AS cx
              FROM pts),
    cand AS (SELECT a.id AS id_a, b.id AS id_b,
                    b.lat - a.lat AS dlat,
                    ((b.lon - a.lon) * 766044) // 1000000 AS dlon_s
             FROM cells a
             JOIN cells b
               ON b.cy BETWEEN a.cy - 1 AND a.cy + 1
              AND b.cx BETWEEN a.cx - 1 AND a.cx + 1
              AND a.id < b.id)
    SELECT id_a, id_b,
           CAST(dlat * dlat + dlon_s * dlon_s AS BIGINT) AS d2
    FROM cand
    WHERE dlat * dlat + dlon_s * dlon_s <= 2500000000
    """,
    doc="Geospatial distance self-join via GRID BLOCKING — the "
    "geo-family primitive Spark has no native operator for: points "
    "land in 0.05-degree cells, candidates come from the 3x3 "
    "neighbor-cell equi-join (never the all-pairs product), and the "
    "exact planar distance check runs in pure integer microdegrees "
    "with a fixed cos(40)=0.766044 longitude scaling (scaled-then-"
    "truncated BEFORE squaring — deterministic in both engines, no "
    "float anywhere). Synthetic city-box coordinates derive from "
    "custkey so the oracle recomputes everything blind. Cell size = "
    "radius guarantees zero false negatives; the 9-cell fan-out is "
    "the bounded candidate cost, exactly the geohash-bucketing shape "
    "used at planet scale.",
    tags=("extras", "join", "geo"),
)
def x46_geo_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 7919) % 1000000).alias("lat"),
        ((F.col("c_custkey") * 104729) % 1000000).alias("lon"),
    )
    cells = pts.select(
        "id",
        "lat",
        "lon",
        F.expr("lat div 50000").alias("cy"),
        F.expr("lon div 50000").alias("cx"),
    )
    # one side explodes to its 3x3 neighborhood so the join is a pure
    # hash equi-join on the cell key (a BETWEEN theta-join would plan
    # as a nested loop)
    a = cells.select(
        F.col("id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        F.explode(
            F.expr(
                "flatten(transform(sequence(cy - 1, cy + 1), "
                "y -> transform(sequence(cx - 1, cx + 1), "
                "x -> struct(y, x))))"
            )
        ).alias("cell"),
    ).select("id_a", "lat_a", "lon_a", "cell.y", "cell.x")
    b = cells.select(
        F.col("id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("cy").alias("y"),
        F.col("cx").alias("x"),
    )
    cand = a.join(b, ["y", "x"]).filter(F.col("id_a") < F.col("id_b"))
    scored = cand.select(
        "id_a",
        "id_b",
        (
            (F.col("lat_b") - F.col("lat_a"))
            * (F.col("lat_b") - F.col("lat_a"))
            + F.expr("((lon_b - lon_a) * 766044) div 1000000")
            * F.expr("((lon_b - lon_a) * 766044) div 1000000")
        )
        .cast("long")
        .alias("d2"),
    )
    return scored.filter(F.col("d2") <= 2500000000)


@register(
    "x47_kendall_tau",
    oracle="""
    WITH d AS (SELECT o_orderdate AS day,
                      CAST(COUNT(*) AS BIGINT) AS x,
                      CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS BIGINT) AS y
               FROM orders GROUP BY 1),
    p AS (SELECT CAST(SUM(CASE WHEN (a.x < b.x AND a.y < b.y)
                               OR (a.x > b.x AND a.y > b.y)
                          THEN 1 ELSE 0 END) AS BIGINT) AS c,
                 CAST(SUM(CASE WHEN (a.x < b.x AND a.y > b.y)
                               OR (a.x > b.x AND a.y < b.y)
                          THEN 1 ELSE 0 END) AS BIGINT) AS dd
          FROM d a JOIN d b ON a.day < b.day),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
    tx AS (SELECT CAST(SUM(ct * (ct - 1) / 2) AS BIGINT) AS n1
           FROM (SELECT COUNT(*) AS ct FROM d GROUP BY x)),
    ty AS (SELECT CAST(SUM(ct * (ct - 1) / 2) AS BIGINT) AS n2
           FROM (SELECT COUNT(*) AS ct FROM d GROUP BY y))
    SELECT n.n AS n_days,
           round(CAST(p.c - p.dd AS DOUBLE)
                 / sqrt(CAST(n.n * (n.n - 1) / 2 - tx.n1 AS DOUBLE)
                        * CAST(n.n * (n.n - 1) / 2 - ty.n2 AS DOUBLE)),
                 6) AS tau_b
    FROM p, n, tx, ty
    """,
    doc="Kendall tau-b between daily order count and daily revenue — "
    "the pairwise-concordance complement of x36's Spearman (rank "
    "sums) and x33's Theil-Sen (median slopes). The day_a < day_b "
    "theta join plans as BroadcastNestedLoopJoin BY CONSTRUCTION — "
    "deliberate, not an oversight: its input is the aggregated "
    "daily frame (|days| rows, ~2.4k at any corpus size; same "
    "bounded-frame discipline as Theil-Sen), checkpointed so the "
    "orders scan runs once, and tests/test_plans.py pins that the "
    "BNLJ's inputs are LocalTableScans of the bounded frame. "
    "Concordant/discordant/tie counts are exact BIGINTs, and tau_b "
    "is one double expression with the standard tie correction, "
    "rounded 6 dp.",
    tags=("analytics", "stats", "timeseries"),
)
def x47_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("y"),
        )
        .localCheckpoint(eager=True)
    )
    a = d.select(
        F.col("day").alias("day_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
    )
    b = d.select(
        F.col("day").alias("day_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    conc = (
        ((F.col("xa") < F.col("xb")) & (F.col("ya") < F.col("yb")))
        | ((F.col("xa") > F.col("xb")) & (F.col("ya") > F.col("yb")))
    )
    disc = (
        ((F.col("xa") < F.col("xb")) & (F.col("ya") > F.col("yb")))
        | ((F.col("xa") > F.col("xb")) & (F.col("ya") < F.col("yb")))
    )
    p = (
        a.join(b, F.col("day_a") < F.col("day_b"))
        .agg(
            F.sum(F.when(conc, 1).otherwise(0)).cast("long").alias("c"),
            F.sum(F.when(disc, 1).otherwise(0)).cast("long").alias("dd"),
        )
    )
    n = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    tx = (
        d.groupBy("x")
        .agg(F.count(F.lit(1)).alias("ct"))
        .agg(
            F.sum(F.expr("ct * (ct - 1) / 2")).cast("long").alias("n1")
        )
    )
    ty = (
        d.groupBy("y")
        .agg(F.count(F.lit(1)).alias("ct"))
        .agg(
            F.sum(F.expr("ct * (ct - 1) / 2")).cast("long").alias("n2")
        )
    )
    tau = F.expr("CAST(c - dd AS DOUBLE)") / F.sqrt(
        F.expr("CAST(n * (n - 1) / 2 - n1 AS DOUBLE)")
        * F.expr("CAST(n * (n - 1) / 2 - n2 AS DOUBLE)")
    )
    return (
        p.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .select(
            F.col("n").alias("n_days"), F.round(tau, 6).alias("tau_b")
        )
    )


@register(
    "x48_bitmap_semijoin_filter",
    oracle="""
    WITH urgent AS (SELECT o_orderkey, o_orderdate FROM orders
                    WHERE o_orderpriority = '1-URGENT')
    SELECT strftime(u.o_orderdate, '%Y-%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN urgent u ON l.l_orderkey = u.o_orderkey
    GROUP BY 1
    """,
    doc="EXACT bitmap runtime filter (semi-join pushdown): before the "
    "big lineitem-orders shuffle join, the urgent orderkeys pack into "
    "a dense 64-bit-word bitmap (keys div 64 -> bit_or of shifted "
    "bits, ~n/64 longs) that BROADCASTS to the lineitem scan — each "
    "row probes its word and drops before ever reaching the exchange. "
    "Unlike a Bloom runtime filter this is exact (zero false "
    "positives), so the downstream join only re-associates payload "
    "columns; the result is bit-identical to the plain semi-join the "
    "oracle runs. The hand-rolled version of Spark's "
    "InjectRuntimeFilter, usable where AQE cannot see the selectivity "
    "(tests/test_plans.py pins the filter below the join). At 100 TB "
    "the bitmap for 10^9 urgent keys is ~2 GB — the dense-domain "
    "regime; sparse domains switch to the Bloom variant "
    "(sketch_bloom_calibration's operator).",
    tags=("extras", "join", "skew"),
)
def x48_bitmap_semijoin_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_orderdate")
    words = urgent.groupBy(
        F.expr("o_orderkey div 64").alias("w")
    ).agg(
        F.bit_or(
            F.expr(
                "shiftleft(CAST(1 AS BIGINT),"
                " CAST(o_orderkey % 64 AS INT))"
            )
        ).alias("bits")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("cents"),
        F.expr("l_orderkey div 64").alias("w"),
    )
    filtered = (
        li.join(F.broadcast(words), "w")
        .filter(
            F.expr(
                "bits & shiftleft(CAST(1 AS BIGINT),"
                " CAST(l_orderkey % 64 AS INT)) <> 0"
            )
        )
        .select("l_orderkey", "cents")
    )
    return (
        filtered.join(
            urgent, filtered["l_orderkey"] == urgent["o_orderkey"]
        )
        .groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )

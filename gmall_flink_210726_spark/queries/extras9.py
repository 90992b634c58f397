r"""Extras wave 9: classical statistical screens, exact-arithmetic edition.

The reference warehouse's DWS layer feeds BI dashboards
(`/root/reference/gmall-publisher`); the screens here are the statistical
layer a data-quality/experimentation team runs on the same aggregates:
autocorrelation of traffic, rank correlation between engagement metrics,
and a nonparametric two-sample location test.

Determinism notes (repo-wide contract, see extras8.py):
- No float ever touches a rank or a deviation: series deviations are
  scaled by n (``n*x - S`` instead of ``x - S/n``), ranks use the
  2x-scaled average-rank trick (``2*rank_min + ties - 1`` is an exact
  integer even when the average rank is a .5), and every cross-row sum
  is over exact BIGINTs.
- The final statistic is a fixed-order IEEE double expression over
  exact integer operands (CAST-to-double, multiply, divide, sqrt are
  all correctly-rounded and engine-identical), rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "x35_acf",
    oracle="""
    WITH d AS (SELECT date_trunc('hour', ts) AS bucket,
                      CAST(COUNT(*) AS BIGINT) AS x
               FROM events GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s FROM d),
    v AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY bucket) AS BIGINT) AS rn,
                 n * x - s AS dev
          FROM d, tot),
    den AS (SELECT CAST(SUM(dev * dev) AS BIGINT) AS den FROM v),
    ks AS (SELECT UNNEST(range(1, 25)) AS lag_k),
    num AS (SELECT ks.lag_k,
                   CAST(SUM(a.dev * b.dev) AS BIGINT) AS num,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM ks
            JOIN v a ON TRUE
            JOIN v b ON b.rn = a.rn + ks.lag_k
            GROUP BY ks.lag_k)
    SELECT num.lag_k, tot.n AS n_buckets, num.n_pairs,
           round(CAST(num.num AS DOUBLE) / den.den, 6) AS acf
    FROM num, den, tot
    """,
    doc="Autocorrelation function of hourly event volume at lags 1-24 "
    "(the traffic-seasonality screen behind x25's seasonal profile: "
    "a daily cycle shows up as an ACF peak at lag 24). Deviations are "
    "n-scaled integers (n*x - S), so numerator and denominator are "
    "exact BIGINT sums; acf_k = num_k/den evaluates in one defined "
    "double division. Scale shape: the series frame is one "
    "time-bucket reduction (|hours| rows however large the event "
    "log); the lag alignment is a self-equi-join on row offset over "
    "that bounded frame, and the single-partition row_number window "
    "only ever sees |hours| rows — the x28 breakpoint discipline.",
    tags=("extras", "timeseries", "stats"),
)
def x35_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    # the series frame is bucket-cardinality; the global window is bounded
    v = d.crossJoin(F.broadcast(tot)).select(
        F.row_number().over(Window.orderBy("bucket")).cast("long").alias("rn"),
        (F.col("n") * F.col("x") - F.col("s")).alias("dev"),
        "n",
    )
    den = v.agg(F.sum(F.col("dev") * F.col("dev")).cast("long").alias("den"))
    ks = spark.range(1, 25).select(F.col("id").alias("lag_k"))
    a = v.select("rn", "dev", "n")
    b = v.select(
        F.col("rn").alias("rn_b"), F.col("dev").alias("dev_b")
    )
    num = (
        ks.crossJoin(a)
        .join(b, F.col("rn_b") == F.col("rn") + F.col("lag_k"))
        .groupBy("lag_k")
        .agg(
            F.sum(F.col("dev") * F.col("dev_b")).cast("long").alias("num"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.max("n").alias("n_buckets"),
        )
    )
    return num.crossJoin(F.broadcast(den)).select(
        "lag_k",
        "n_buckets",
        "n_pairs",
        F.round(F.col("num").cast("double") / F.col("den"), 6).alias("acf"),
    )


@register(
    "x36_spearman",
    oracle="""
    WITH m AS (
      SELECT c.c_mktsegment AS segment, o.o_custkey,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS spend_cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    r AS (
      SELECT segment,
             2 * RANK() OVER wx
               + CAST(COUNT(*) OVER twx AS BIGINT) - 1 AS rx2,
             2 * RANK() OVER wy
               + CAST(COUNT(*) OVER twy AS BIGINT) - 1 AS ry2
      FROM m
      WINDOW wx AS (PARTITION BY segment ORDER BY n_orders),
             twx AS (PARTITION BY segment, n_orders),
             wy AS (PARTITION BY segment ORDER BY spend_cents),
             twy AS (PARTITION BY segment, spend_cents)),
    s AS (
      SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rx2) AS BIGINT) AS sx, CAST(SUM(ry2) AS BIGINT) AS sy,
             CAST(SUM(rx2 * rx2) AS BIGINT) AS sxx,
             CAST(SUM(ry2 * ry2) AS BIGINT) AS syy,
             CAST(SUM(rx2 * ry2) AS BIGINT) AS sxy
      FROM r GROUP BY segment)
    SELECT segment, n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
             AS rho_spearman
    FROM s
    """,
    doc="Spearman rank correlation between per-customer order count and "
    "total spend, per market segment — the monotone-association screen "
    "(Pearson on ranks; robust to the heavy-tailed spend "
    "distribution). Tied values take average ranks via the exact "
    "2x-scaled integer form 2*rank_min + ties - 1, so every moment "
    "(Sx, Sxx, Sxy) is an exact BIGINT and rho is one defined "
    "double expression. Exactness bound: n*Sxy <= 8n^4 must fit "
    "BIGINT, true through ~30M customers per segment; past that the "
    "moments switch to DECIMAL(38,0). Scale shape: ranks are "
    "per-segment windows (state bounded by one segment's customers), "
    "moments collapse map-side to |segments| rows.",
    tags=("extras", "analytics", "stats"),
)
def x36_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    m = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("spend_cents"),
        )
    )

    def rank2(col: str) -> F.Column:
        w = Window.partitionBy("segment").orderBy(col)
        tw = Window.partitionBy("segment", col)
        return (
            2 * F.rank().over(w) + F.count(F.lit(1)).over(tw).cast("long") - 1
        )

    r = m.select(
        "segment",
        rank2("n_orders").alias("rx2"),
        rank2("spend_cents").alias("ry2"),
    )
    s = r.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx2").cast("long").alias("sx"),
        F.sum("ry2").cast("long").alias("sy"),
        F.sum(F.col("rx2") * F.col("rx2")).cast("long").alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).cast("long").alias("syy"),
        F.sum(F.col("rx2") * F.col("ry2")).cast("long").alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        "segment", "n", F.round(num / F.sqrt(dx * dy), 6).alias("rho_spearman")
    )


@register(
    "x37_mann_whitney",
    oracle="""
    WITH e AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS variant,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE user_id IS NOT NULL),
    r AS (
      SELECT variant,
             2 * RANK() OVER (ORDER BY cents)
               + CAST(COUNT(*) OVER (PARTITION BY cents) AS BIGINT) - 1
               AS r2
      FROM e),
    g AS (SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
                 CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n2,
                 CAST(SUM(CASE WHEN variant = 0 THEN r2 ELSE 0 END) AS BIGINT)
                   AS r1_2x
          FROM r),
    t AS (SELECT CAST(SUM(tc * tc * tc - tc) AS BIGINT) AS t3t
          FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tc
                FROM e GROUP BY cents)),
    u AS (SELECT n1, n2, n1 + n2 AS n, r1_2x - n1 * (n1 + 1) AS u1_2x, t3t
          FROM g, t)
    SELECT n1, n2, u1_2x,
           round((CAST(u1_2x - n1 * n2 AS DOUBLE) / 2)
                 / sqrt(CAST(n1 AS DOUBLE) * n2 / 12
                        * (CAST(n + 1 AS DOUBLE)
                           - CAST(t3t AS DOUBLE) / (CAST(n AS DOUBLE)
                                                    * (n - 1)))), 6)
             AS z_score
    FROM u
    """,
    doc="Mann-Whitney U test comparing event-value distributions "
    "between the two A/B variants of x34 (user_id parity) — the "
    "nonparametric sibling of x34's proportion z-test, for the "
    "continuous metric. Pooled ranks use the exact 2x average-rank "
    "integers; U is carried doubled (u1_2x = R1_2x - n1(n1+1)) so it "
    "stays integral through .5 average ranks; the normal "
    "approximation includes the exact-integer tie correction "
    "sum(t^3 - t) over per-value tie counts. Scale shape: the "
    "rank-sum depends only on per-value counts, so events collapse "
    "map-side to the DISTINCT-value frame (same discipline as x38's "
    "ECDF): each variant-0 row at value v has doubled average rank "
    "2*cum_before(v) + ct(v) + 1, so R1_2x = sum c1*(2*cum - ct + 1) "
    "over one bounded cumulative window on |distinct cents| rows — "
    "no raw-row total order anywhere; output is one row.",
    tags=("extras", "analytics", "stats"),
)
def x37_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.where(F.col("user_id").isNotNull()).select(
        (F.col("user_id") % 2).cast("long").alias("variant"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    # collapse to the distinct-value frame: rank-sum needs only counts
    c = e.groupBy("cents").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    wcum = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    c = c.select(
        "c1",
        (F.col("c1") + F.col("c2")).alias("ct"),
        F.sum(F.col("c1") + F.col("c2")).over(wcum).cast("long").alias("cum"),
    )
    # doubled average rank of every row at value v: 2*cum_before + ct + 1
    g = c.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum(F.col("ct") - F.col("c1")).cast("long").alias("n2"),
        F.sum(
            F.col("c1")
            * (2 * F.col("cum") - F.col("ct") + F.lit(1))
        )
        .cast("long")
        .alias("r1_2x"),
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct"))
        .cast("long")
        .alias("t3t"),
    )
    u = g.select(
        "n1",
        "n2",
        (F.col("n1") + F.col("n2")).alias("n"),
        (F.col("r1_2x") - F.col("n1") * (F.col("n1") + 1)).alias("u1_2x"),
        "t3t",
    )
    sigma = F.sqrt(
        F.col("n1").cast("double")
        * F.col("n2")
        / 12
        * (
            (F.col("n") + 1).cast("double")
            - F.col("t3t").cast("double")
            / (F.col("n").cast("double") * (F.col("n") - 1))
        )
    )
    return u.select(
        "n1",
        "n2",
        "u1_2x",
        F.round(
            ((F.col("u1_2x") - F.col("n1") * F.col("n2")).cast("double") / 2)
            / sigma,
            6,
        ).alias("z_score"),
    )


@register(
    "x38_ks_test",
    oracle="""
    WITH e AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS variant,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE user_id IS NOT NULL),
    c AS (SELECT cents,
                 CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c1,
                 CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c2
          FROM e GROUP BY cents),
    cum AS (SELECT CAST(SUM(c1) OVER (ORDER BY cents) AS BIGINT) AS cum1,
                   CAST(SUM(c2) OVER (ORDER BY cents) AS BIGINT) AS cum2
            FROM c),
    tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                   CAST(SUM(c2) AS BIGINT) AS n2 FROM c)
    SELECT n1, n2,
           CAST(MAX(abs(n2 * cum1 - n1 * cum2)) AS BIGINT) AS d_num,
           round(CAST(MAX(abs(n2 * cum1 - n1 * cum2)) AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * n2), 6) AS d_stat
    FROM cum, tot GROUP BY n1, n2
    """,
    doc="Two-sample Kolmogorov-Smirnov statistic comparing the "
    "event-value distributions of the two A/B variants (completes the "
    "x34/x37 experimentation trio: proportions, location, whole "
    "distribution). The ECDF difference is kept exact by "
    "cross-scaling: D_num = max|n2*F1 - n1*F2| over per-value "
    "cumulative counts is a BIGINT, and D = D_num/(n1*n2) is one "
    "defined double division. Scale shape: counts collapse map-side "
    "to the distinct-value frame; the single-partition cumulative "
    "window runs over |distinct cents| rows, not |events| (the ccnet "
    "frequency-weighted discipline) — at 100 TB this window "
    "range-partitions by value with per-partition offset fixup.",
    tags=("extras", "analytics", "stats"),
)
def x38_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.where(F.col("user_id").isNotNull()).select(
        (F.col("user_id") % 2).cast("long").alias("variant"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    c = e.groupBy("cents").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    # cumulative over the DISTINCT-value frame (bounded), never the raw rows
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = c.select(
        F.sum("c1").over(w).cast("long").alias("cum1"),
        F.sum("c2").over(w).cast("long").alias("cum2"),
    )
    tot = c.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    d = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.max(
                F.abs(F.col("n2") * F.col("cum1") - F.col("n1") * F.col("cum2"))
            )
            .cast("long")
            .alias("d_num")
        )
    )
    return d.select(
        "n1",
        "n2",
        "d_num",
        F.round(
            F.col("d_num").cast("double")
            / (F.col("n1").cast("double") * F.col("n2")),
            6,
        ).alias("d_stat"),
    )


@register(
    "x39_mutual_information",
    oracle="""
    WITH c AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_obs
               FROM documents GROUP BY 1, 2),
    r AS (SELECT lang, CAST(SUM(n_obs) AS BIGINT) AS n_row FROM c GROUP BY 1),
    k AS (SELECT source, CAST(SUM(n_obs) AS BIGINT) AS n_col FROM c GROUP BY 1),
    t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM c)
    SELECT c.lang, c.source, c.n_obs,
           round(ln(CAST(c.n_obs * t.n AS DOUBLE)
                    / CAST(r.n_row * k.n_col AS DOUBLE)), 6) AS pmi,
           round(CAST(c.n_obs AS DOUBLE) / t.n
                 * round(ln(CAST(c.n_obs * t.n AS DOUBLE)
                            / CAST(r.n_row * k.n_col AS DOUBLE)), 6), 6)
             AS mi_term
    FROM c JOIN r USING (lang) JOIN k USING (source) CROSS JOIN t
    """,
    doc="Pointwise mutual information per (lang, source) cell plus its "
    "MI contribution — the information-theoretic view of the an15 "
    "contingency table (which language over-concentrates in which "
    "source). The log ratio takes exact integer products "
    "(n_obs*N vs n_row*n_col) through one defined double division, "
    "ln is rounded to 6 dp before the weighted term (the slice_kl "
    "log discipline). Scale shape identical to an15: |langs|x"
    "|sources| cells, broadcast marginals, broadcast 1-row total.",
    tags=("extras", "analytics", "stats"),
)
def x39_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs")
    )
    r = c.groupBy("lang").agg(F.sum("n_obs").cast("long").alias("n_row"))
    k = c.groupBy("source").agg(F.sum("n_obs").cast("long").alias("n_col"))
    t = c.agg(F.sum("n_obs").cast("long").alias("n"))
    pmi = F.round(
        F.log(
            (F.col("n_obs") * F.col("n")).cast("double")
            / (F.col("n_row") * F.col("n_col")).cast("double")
        ),
        6,
    )
    return (
        c.join(F.broadcast(r), "lang")
        .join(F.broadcast(k), "source")
        .crossJoin(F.broadcast(t))
        .select(
            "lang",
            "source",
            "n_obs",
            pmi.alias("pmi"),
            F.round(F.col("n_obs").cast("double") / F.col("n") * pmi, 6).alias(
                "mi_term"
            ),
        )
    )


@register(
    "an16_frequent_sequences",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type AS e1,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events WHERE user_id IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    c AS (SELECT e1, e2, e3,
                 CAST(COUNT(*) AS BIGINT) AS n_occurrences,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
          FROM s WHERE e3 IS NOT NULL GROUP BY 1, 2, 3)
    SELECT * FROM c WHERE n_occurrences >= 2
    """,
    doc="Frequent consecutive 3-event sequences (PrefixSpan-style "
    "contiguous patterns, support counted by occurrence AND by "
    "distinct user) — extends an12's first-order transitions to "
    "length-3 motifs for funnel discovery. Scale shape: the two "
    "LEADs share ONE per-user window (state bounded by a user's "
    "history), sequences collapse to at most |types|^3 groups, and "
    "the distinct-user count is a two-level aggregation on the "
    "already-shuffled frame.",
    tags=("extras", "analytics"),
)
def an16_frequent_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = (
        ev.where(F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .where(F.col("e3").isNotNull())
    )
    c = s.groupBy("e1", "e2", "e3").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    return c.where(F.col("n_occurrences") >= 2)


@register(
    "sketch_theta_anotb",
    oracle="""
    WITH dv AS (SELECT DISTINCT o_orderpriority AS g,
                       md5(CAST(o_custkey AS VARCHAR)) AS h
                FROM orders WHERE o_custkey IS NOT NULL),
    bk AS (SELECT g, h FROM (
             SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS r
             FROM dv) z WHERE r <= 64),
    gs AS (SELECT DISTINCT g FROM dv),
    pr AS (SELECT x.g AS g_a, y.g AS g_b FROM gs x JOIN gs y ON x.g <> y.g),
    u AS (SELECT DISTINCT g_a, g_b, h FROM (
            SELECT pr.g_a, pr.g_b, bk.h FROM pr JOIN bk ON bk.g = pr.g_a
            UNION ALL
            SELECT pr.g_a, pr.g_b, bk.h FROM pr JOIN bk ON bk.g = pr.g_b) z),
    uk AS (SELECT g_a, g_b, h,
                  ROW_NUMBER() OVER (PARTITION BY g_a, g_b ORDER BY h) AS r
           FROM u QUALIFY r <= 64),
    st AS (SELECT uk.g_a, uk.g_b,
              CAST(MAX(uk.r) AS BIGINT) AS union_k,
              MAX(CASE WHEN uk.r = 64 THEN uk.h END) AS kth,
              CAST(SUM(CASE WHEN a.h IS NOT NULL AND b.h IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS cnt_aonly
           FROM uk
           LEFT JOIN bk a ON a.g = uk.g_a AND a.h = uk.h
           LEFT JOIN bk b ON b.g = uk.g_b AND b.h = uk.h
           GROUP BY 1, 2),
    sz AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_a FROM dv GROUP BY g),
    ix AS (SELECT a.g AS g_a, b.g AS g_b, CAST(COUNT(*) AS BIGINT) AS ei
           FROM dv a JOIN dv b ON a.h = b.h AND a.g <> b.g GROUP BY 1, 2)
    SELECT st.g_a, st.g_b,
           CAST(sz.n_a - COALESCE(ix.ei, 0) AS BIGINT) AS exact_anotb,
           st.union_k,
           round((CAST(cnt_aonly AS DOUBLE) / union_k) *
                 CASE WHEN union_k < 64 THEN CAST(union_k AS DOUBLE)
                      ELSE 63.0 / (CAST(('0x' || substring(kth, 1, 12))
                                         AS BIGINT) / 281474976710656.0)
                 END, 4) AS kmv_anotb_est
    FROM st LEFT JOIN ix USING (g_a, g_b) JOIN sz ON sz.g = st.g_a
    """,
    doc="Theta-sketch a-not-b: estimated |A \\ B| of customer sets for "
    "every ORDERED order-priority pair, calibrated against the exact "
    "difference (|A| - |A∩B|). Within bottomk(A∪B) a hash's absence "
    "from B is decidable from B's bottom-k alone (h_(K)(A∪B) <= "
    "h_(K)(B)), so — like kmv_overlap — every directed pair runs on "
    "<=2k-row frames after the cutoff-gated per-group bottom-k pass; "
    "nothing corpus-sized is ranked or broadcast. "
    "operators/sketch.py:kmv_anotb",
    tags=("llm", "sketch"),
)
def sketch_theta_anotb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.sketch import kmv_anotb

    orders = load_table(spark, sf_dir, "orders")
    tagged = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_custkey").cast("string").alias("v"),
    )
    return kmv_anotb(tagged, group_col="grp", value_col="v", k=64)


@register(
    "an17_survival_km",
    oracle="""
    WITH r AS (
      SELECT o_custkey,
             CAST(o_orderdate AS DATE) AS d,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders),
    mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax FROM orders),
    subj AS (
      SELECT f.o_custkey,
             CASE WHEN s.d IS NULL
                  THEN date_diff('day', f.d, mx.dmax)
                  ELSE date_diff('day', f.d, s.d) END AS t_day,
             CASE WHEN s.d IS NULL THEN 0 ELSE 1 END AS ev
      FROM (SELECT o_custkey, d FROM r WHERE rn = 1) f
      LEFT JOIN (SELECT o_custkey, d FROM r WHERE rn = 2) s
             USING (o_custkey)
      CROSS JOIN mx),
    c AS (SELECT t_day,
                 CAST(SUM(ev) AS BIGINT) AS d_i,
                 CAST(COUNT(*) AS BIGINT) AS c_all
          FROM subj GROUP BY t_day),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_subj FROM subj),
    rsk AS (SELECT t_day, d_i,
                   n_subj - CAST(COALESCE(SUM(c_all) OVER (
                       ORDER BY t_day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS BIGINT) AS n_risk
            FROM c, n),
    km AS (SELECT t_day, n_risk, d_i,
                  CAST(round(ln(CAST(n_risk - d_i AS DOUBLE) / n_risk), 6)
                       AS DECIMAL(18,6)) AS term
           FROM rsk WHERE d_i > 0 AND n_risk > d_i)
    SELECT t_day, n_risk, d_i AS n_events,
           round(CAST(SUM(term) OVER (ORDER BY t_day) AS DOUBLE), 6)
             AS log_survival
    FROM km
    """,
    doc="Kaplan-Meier estimator of time-to-repeat-purchase: per "
    "customer, days from first to second order (censored at the "
    "dataset horizon when no second order exists); output is the KM "
    "curve in the LOG domain — log S(t) = sum ln((n_i-d_i)/n_i) — "
    "because the log-survival is an exact DECIMAL cumulative sum of "
    "6-dp-rounded per-step terms (the slice_kl log discipline), "
    "where the multiplicative product form would accumulate "
    "engine-dependent double error. Each ln argument is one defined "
    "double division of exact integers. Scale shape: the per-subject "
    "frame is a per-customer window (first two order dates), the "
    "curve frames are |distinct day| rows however many customers "
    "flow in, and the two cumulative windows run on that bounded "
    "frame (ccnet discipline).",
    tags=("extras", "analytics", "stats"),
)
def an17_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    r = orders.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        F.row_number().over(w).alias("rn"),
    )
    mx = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("dmax")
    )
    f = r.where(F.col("rn") == 1).select("o_custkey", "d")
    s = r.where(F.col("rn") == 2).select(
        "o_custkey", F.col("d").alias("d2")
    )
    subj = (
        f.join(s, "o_custkey", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(
                F.col("d2").isNull(), F.datediff(F.col("dmax"), F.col("d"))
            )
            .otherwise(F.datediff(F.col("d2"), F.col("d")))
            .cast("long")
            .alias("t_day"),
            F.when(F.col("d2").isNull(), 0).otherwise(1).alias("ev"),
        )
    )
    c = subj.groupBy("t_day").agg(
        F.sum("ev").cast("long").alias("d_i"),
        F.count(F.lit(1)).cast("long").alias("c_all"),
    )
    n = subj.agg(F.count(F.lit(1)).cast("long").alias("n_subj"))
    # cumulative windows over the DISTINCT-day frame (bounded)
    wprev = Window.orderBy("t_day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    rsk = c.crossJoin(F.broadcast(n)).select(
        "t_day",
        "d_i",
        (
            F.col("n_subj")
            - F.coalesce(F.sum("c_all").over(wprev), F.lit(0))
        )
        .cast("long")
        .alias("n_risk"),
    )
    km = rsk.where(
        (F.col("d_i") > 0) & (F.col("n_risk") > F.col("d_i"))
    ).select(
        "t_day",
        "n_risk",
        "d_i",
        F.round(
            F.log(
                (F.col("n_risk") - F.col("d_i")).cast("double")
                / F.col("n_risk")
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("term"),
    )
    wcum = Window.orderBy("t_day").rowsBetween(Window.unboundedPreceding, 0)
    return km.select(
        "t_day",
        "n_risk",
        F.col("d_i").alias("n_events"),
        F.round(F.sum("term").over(wcum).cast("double"), 6).alias(
            "log_survival"
        ),
    )


def _x40_oracle() -> str:
    from gmall_flink_210726_spark.operators.layout import hilbert_key_sql_ctes

    ctes = hilbert_key_sql_ctes(
        x="(o_custkey & 255)",
        y="(o_orderkey & 255)",
        base="b0",
        key_cols="o_orderkey",
        bits=8,
    )
    return f"""
    WITH b0 AS (SELECT o_orderkey, o_custkey FROM orders),
    {ctes}
    SELECT o_orderkey, hkey AS hilbert_key FROM h8
    """


@register(
    "x40_hilbert_keys",
    oracle=_x40_oracle(),
    doc="Hilbert-curve clustering keys over (o_custkey, o_orderkey) low "
    "8 bits — the stronger-locality upgrade of x6's Morton key: "
    "consecutive Hilbert keys are always ADJACENT cells (Morton order "
    "teleports across the square at power-of-two boundaries), so a "
    "range-partitioned layout gets a tighter per-file bounding box in "
    "both dimensions and strictly better min-max pruning. Implemented "
    "as an MSB-first 4-state machine in pure JVM arithmetic (array-"
    "literal lookups, expression size linear in bits); the oracle CTE "
    "chain is generated from the SAME state tables so they cannot "
    "drift. operators/layout.py:hilbert_key",
    tags=("extras", "layout"),
)
def x40_hilbert_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.layout import hilbert_key

    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        hilbert_key(
            F.col("o_custkey").bitwiseAND(F.lit(255)),
            F.col("o_orderkey").bitwiseAND(F.lit(255)),
            bits=8,
        ).alias("hilbert_key"),
    )


@register(
    "x41_holt_smoothing",
    oracle="""
    WITH RECURSIVE d AS (
      SELECT event_type,
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    s AS (SELECT event_type, day, y,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY day) AS rn
          FROM d),
    rec AS (
      SELECT event_type, rn, day, y,
             CAST(y AS DECIMAL(18,6)) AS l,
             CAST(0 AS DECIMAL(18,6)) AS b
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.event_type, s.rn, s.day, s.y,
             CAST(round(CAST(0.5 AS DECIMAL(2,1)) * s.y
                        + 0.5 * (rec.l + rec.b), 6) AS DECIMAL(18,6)) AS l,
             CAST(round(0.5 * (CAST(round(CAST(0.5 AS DECIMAL(2,1)) * s.y
                                          + 0.5 * (rec.l + rec.b), 6)
                                    AS DECIMAL(18,6)) - rec.l)
                        + 0.5 * rec.b, 6) AS DECIMAL(18,6)) AS b
      FROM rec JOIN s ON s.event_type = rec.event_type
                     AND s.rn = rec.rn + 1)
    SELECT event_type, day, y,
           CAST(l AS DOUBLE) AS level,
           CAST(b AS DOUBLE) AS trend,
           CAST(round(l + b, 6) AS DOUBLE) AS forecast
    FROM rec
    """,
    doc="Holt double-exponential (linear-trend) smoothing of daily "
    "event volume per type, alpha=beta=0.5 — extends x21's EWMA with "
    "a trend component for short-horizon forecasting (forecast = "
    "level + trend). Serial state is made engine-portable by ROUNDING "
    "level and trend to 6-dp DECIMAL after every step (both engines "
    "execute the identical exact-decimal recurrence; an unrounded "
    "double recurrence diverges in the last ulp and compounds). The "
    "Spark side runs the recurrence per key in an Arrow-batched "
    "applyInPandas over python Decimals — each group's state is one "
    "(level, trend) pair, groups parallelize across executors (the "
    "t4/t5 keyed-state discipline); the oracle is a recursive CTE "
    "advancing all keys one step per iteration.",
    tags=("extras", "timeseries", "stats"),
)
def x41_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        ),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))

    schema = (
        "event_type string, day string, y long, "
        "level double, trend double, forecast double"
    )

    def holt(pdf: "pd.DataFrame") -> "pd.DataFrame":
        from decimal import ROUND_HALF_UP, Decimal

        q6 = Decimal("0.000001")
        half = Decimal("0.5")

        def r6(x: Decimal) -> Decimal:
            return x.quantize(q6, rounding=ROUND_HALF_UP)

        pdf = pdf.sort_values("day").reset_index(drop=True)
        levels, trends, fcs = [], [], []
        lvl = trd = None
        for y in pdf["y"]:
            yd = Decimal(int(y))
            if lvl is None:
                lvl, trd = yd, Decimal(0)
            else:
                new_l = r6(half * yd + half * (lvl + trd))
                trd = r6(half * (new_l - lvl) + half * trd)
                lvl = new_l
            levels.append(float(lvl))
            trends.append(float(trd))
            fcs.append(float(r6(lvl + trd)))
        out = pdf[["event_type", "day", "y"]].copy()
        out["level"] = levels
        out["trend"] = trends
        out["forecast"] = fcs
        return out

    return daily.groupBy("event_type").applyInPandas(holt, schema)

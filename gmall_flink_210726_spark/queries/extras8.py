r"""Extras wave 8: range-join decomposition and robust winsorized stats.

Determinism notes (repo-wide contract):
- x28's block breakpoints come from an odd-multiplier hash
  (k·2654435761 mod 2^32 — a bijection on the 32-bit ring, so
  breakpoints are distinct and LEAD is unambiguous); all join keys and
  aggregates are exact integers.
- x29's percentile thresholds use the nearest-rank definition with
  PURE INTEGER ceil arithmetic ((p·n + 99) div 100) — a double 0.05·n
  disagrees between engines when n is a multiple of 20 (binary double
  vs DuckDB DECIMAL), so no float touches a rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table

_RING = 4294967296  # 2^32


@register(
    "x28_range_join_blocks",
    oracle="""
    WITH bp AS (SELECT p_partkey AS block_id,
                       (p_partkey * 2654435761) % 4294967296 AS lo
                FROM part),
    r AS (SELECT block_id, lo,
                 COALESCE(LEAD(lo) OVER (ORDER BY lo), 4294967296) AS hi
          FROM bp),
    pt AS (SELECT (user_id * 1099087573) % 4294967296 AS addr,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events WHERE user_id IS NOT NULL),
    j AS (SELECT r.block_id, pt.cents
          FROM pt JOIN r ON pt.addr >= r.lo AND pt.addr < r.hi)
    SELECT block_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM j GROUP BY block_id
    """,
    doc="Point-in-range enrichment (the geo-IP/CIDR-block join): event "
    "addresses land in half-open hash blocks keyed by part, then "
    "aggregate per block. The Spark side runs the chunked EQUI-join "
    "decomposition (operators/joins.py:range_join) — each range "
    "explodes into fixed-granularity chunks, each point computes one "
    "chunk key, hash join + residual filter — because the naive theta "
    "join plans as BroadcastNestedLoopJoin, O(P×R) with a "
    "driver-killing broadcast once the range table outgrows a dim. "
    "The oracle runs the BETWEEN join directly: same semantics, "
    "different physical strategy.",
    tags=("extras", "join"),
)
def x28_range_join_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.joins import range_join

    part = load_table(spark, sf_dir, "part")
    events = load_table(spark, sf_dir, "events")
    bp = part.select(
        F.col("p_partkey").alias("block_id"),
        ((F.col("p_partkey") * F.lit(2654435761)) % F.lit(_RING)).alias("lo"),
    )
    # breakpoints are dim-cardinality (10^6 blocks in a real geo-IP
    # table), so the single-partition LEAD window is bounded; the
    # POINTS side never sees a window
    ranges = bp.withColumn(
        "hi",
        F.coalesce(F.lead("lo").over(Window.orderBy("lo")), F.lit(_RING)),
    )
    pt = events.where(F.col("user_id").isNotNull()).select(
        ((F.col("user_id") * F.lit(1099087573)) % F.lit(_RING)).alias("addr"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    joined = range_join(pt, ranges, "addr", "lo", "hi", granularity=1 << 18)
    return joined.groupBy("block_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )


@register(
    "x29_winsorized_stats",
    oracle="""
    WITH v AS (SELECT c_mktsegment AS segment,
                      CAST(round(c_acctbal * 100) AS BIGINT) AS cents
               FROM customer),
    g AS (SELECT segment, cents, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM v GROUP BY 1, 2),
    t AS (SELECT segment, CAST(SUM(cnt) AS BIGINT) AS n FROM g GROUP BY 1),
    c AS (SELECT g.*, SUM(cnt) OVER (PARTITION BY segment ORDER BY cents
                                     ROWS UNBOUNDED PRECEDING) AS cum
          FROM g),
    th AS (SELECT c.segment,
             MIN(CASE WHEN cum >= (5 * n + 99) // 100 THEN cents END) AS lo_thr,
             MIN(CASE WHEN cum >= (95 * n + 99) // 100 THEN cents END) AS hi_thr
           FROM c JOIN t USING (segment) GROUP BY 1),
    w AS (SELECT g.segment,
            SUM(cnt * LEAST(GREATEST(cents, lo_thr), hi_thr)) AS ws,
            SUM(CASE WHEN cents < lo_thr THEN cnt ELSE 0 END) AS nlo,
            SUM(CASE WHEN cents > hi_thr THEN cnt ELSE 0 END) AS nhi
          FROM g JOIN th USING (segment) GROUP BY 1)
    SELECT w.segment, t.n, th.lo_thr, th.hi_thr,
           round(CAST(ws AS DOUBLE) / n / 100.0, 6) AS win_mean,
           CAST(nlo AS BIGINT) AS n_clip_lo,
           CAST(nhi AS BIGINT) AS n_clip_hi
    FROM w JOIN th USING (segment) JOIN t USING (segment)
    """,
    doc="Winsorized (5%/95%) robust per-segment balance stats — the "
    "outlier-tolerant mean a metrics pipeline reports instead of the "
    "raw mean. Thresholds are EXACT nearest-rank percentiles computed "
    "scale-safely: groupBy(segment, cents) collapses the corpus to "
    "distinct-value counts (bounded by the value domain), a cumulative "
    "window over that bounded frame finds the rank thresholds, and "
    "the clamped re-aggregation is one more pass over the same "
    "distinct-value frame — no corpus-cardinality percentile() buffer "
    "(the ccnet r5 lesson), no corpus sort. All rank arithmetic is "
    "integer; the only double is the final mean.",
    tags=("extras", "quality"),
)
def x29_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    v = customer.select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    g = v.groupBy("segment", "cents").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    t = g.groupBy("segment").agg(F.sum("cnt").cast("long").alias("n"))
    cum_w = Window.partitionBy("segment").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = g.withColumn("cum", F.sum("cnt").over(cum_w))
    th = (
        c.join(t, "segment")
        .groupBy("segment")
        .agg(
            F.min(
                F.when(F.col("cum") >= F.expr("(5 * n + 99) div 100"), F.col("cents"))
            ).alias("lo_thr"),
            F.min(
                F.when(F.col("cum") >= F.expr("(95 * n + 99) div 100"), F.col("cents"))
            ).alias("hi_thr"),
        )
    )
    clamped = F.least(F.greatest(F.col("cents"), F.col("lo_thr")), F.col("hi_thr"))
    w = (
        g.join(th, "segment")
        .groupBy("segment")
        .agg(
            F.sum(F.col("cnt") * clamped).alias("ws"),
            F.sum(
                F.when(F.col("cents") < F.col("lo_thr"), F.col("cnt")).otherwise(
                    F.lit(0)
                )
            ).alias("nlo"),
            F.sum(
                F.when(F.col("cents") > F.col("hi_thr"), F.col("cnt")).otherwise(
                    F.lit(0)
                )
            ).alias("nhi"),
        )
    )
    return (
        w.join(th, "segment")
        .join(t, "segment")
        .select(
            "segment",
            "n",
            "lo_thr",
            "hi_thr",
            F.round(F.col("ws").cast("double") / F.col("n") / F.lit(100.0), 6).alias(
                "win_mean"
            ),
            F.col("nlo").cast("long").alias("n_clip_lo"),
            F.col("nhi").cast("long").alias("n_clip_hi"),
        )
    )


@register(
    "an12_markov_transitions",
    oracle="""
    WITH s AS (SELECT user_id, event_type AS cur_type,
                      LEAD(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts) AS next_type
               FROM events),
    c AS (SELECT cur_type, next_type, CAST(COUNT(*) AS BIGINT) AS n_trans
          FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
    t AS (SELECT cur_type, CAST(SUM(n_trans) AS BIGINT) AS tot
          FROM c GROUP BY 1)
    SELECT c.cur_type, c.next_type, c.n_trans,
           round(CAST(c.n_trans AS DOUBLE) / t.tot, 6) AS prob
    FROM c JOIN t USING (cur_type)
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: P(next event type | current type), the sequence-"
    "analytics sibling of an8's journey paths (journeys rank whole "
    "paths; this estimates the chain itself — feed for next-event "
    "prediction, anomaly scoring, simulation). Scale shape: the lag "
    "window partitions BY USER (state bounded by one user's history, "
    "the t4/t5 discipline), transitions collapse map-side to a "
    "|types|^2 frame, and the row-normalization joins the 5x5 "
    "transition counts against per-state totals — everything after "
    "the window is constant-size.",
    tags=("extras", "analytics"),
)
def an12_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    s = (
        ev.select("user_id", F.col("event_type").alias("cur_type"), "ts")
        .withColumn("next_type", F.lead("cur_type").over(w))
        .where(F.col("next_type").isNotNull())
    )
    c = s.groupBy("cur_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_trans")
    )
    t = c.groupBy("cur_type").agg(F.sum("n_trans").cast("long").alias("tot"))
    return c.join(t, "cur_type").select(
        "cur_type",
        "next_type",
        "n_trans",
        F.round(F.col("n_trans").cast("double") / F.col("tot"), 6).alias("prob"),
    )


@register(
    "x30_salted_skew_join",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
    doc="Skew-breaking SALTED equi-join: lineitem joins orders on "
    "(orderkey, salt) after replicating the orders side across 16 "
    "salts and salting each lineitem row by its line number — "
    "bit-identical output to the plain join (the oracle IS the plain "
    "join), but a hot orderkey's fan-in spreads over 16 reducers "
    "instead of melting one. This is the JOIN sibling of "
    "skew_salted_agg, for when AQE's skew-split can't apply (the "
    "join's partitioning feeds a downstream stateful op). Revenue is "
    "summed as exact per-row cents (round before sum, the repo-wide "
    "double discipline). operators/skew.py:salted_join",
    tags=("extras", "join", "skew"),
)
def x30_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.skew import salted_join

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    fact = lineitem.select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_linenumber",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        ).cast("long").alias("cents"),
    )
    joined = salted_join(
        fact,
        orders.select("o_orderkey", "o_orderpriority"),
        "o_orderkey",
        F.col("l_linenumber"),
        n_salts=16,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


@register(
    "x31_scd2_history",
    oracle="""
    WITH s AS (SELECT user_id, event_type,
                      CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                      LAG(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts) AS prev_type
               FROM events),
    ch AS (SELECT user_id, event_type, ts_us
           FROM s WHERE prev_type IS NULL OR event_type <> prev_type),
    v AS (SELECT user_id, event_type, ts_us AS valid_from_us,
                 LEAD(ts_us) OVER (PARTITION BY user_id
                                   ORDER BY ts_us) AS valid_to_us,
                 CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY ts_us) AS BIGINT) AS version_n
          FROM ch)
    SELECT user_id, event_type, valid_from_us,
           CAST(COALESCE(valid_to_us, 0) AS BIGINT) AS valid_to_us, version_n
    FROM v
    """,
    doc="SCD2 history with RUN COLLAPSE — the missing half of x7's "
    "interval build: x7 emits one validity interval per CHANGE ROW "
    "(correct when every row IS a change), but a raw changelog "
    "re-asserts unchanged values, and true type-2 semantics must "
    "collapse runs of equal values into ONE version (else as-of joins "
    "return phantom versions and history tables bloat by the "
    "re-assert rate). Per user: a lag filter keeps only genuine "
    "change points, then LEAD chains half-open [valid_from, valid_to) "
    "intervals with 0 marking the open current version plus a dense "
    "version_n. Scale shape: both windows partition BY USER (state "
    "bounded by one user's history), and the change filter runs "
    "before the interval window so the second pass sees only change "
    "points.",
    tags=("extras", "cdc", "analytics"),
)
def x31_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    s = ev.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    ch = s.where(
        F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts_us")
    return ch.select(
        "user_id",
        "event_type",
        F.col("ts_us").alias("valid_from_us"),
        F.coalesce(F.lead("ts_us").over(w2), F.lit(0))
        .cast("long")
        .alias("valid_to_us"),
        F.row_number().over(w2).cast("long").alias("version_n"),
    )


@register(
    "x32_bitmap_intersect",
    oracle="""
    WITH d AS (SELECT DISTINCT event_type AS g, user_id AS u
               FROM events WHERE user_id IS NOT NULL),
    w AS (SELECT g, u // 32 AS word,
                 bit_or(CAST(1 AS BIGINT) << CAST(u % 32 AS INTEGER)) AS bm
          FROM d GROUP BY 1, 2),
    p AS (SELECT a.g AS type_a, b.g AS type_b,
                 CAST(SUM(bit_count(a.bm & b.bm)) AS BIGINT) AS n_inter
          FROM w a JOIN w b ON a.word = b.word AND a.g < b.g
          GROUP BY 1, 2),
    c AS (SELECT g, CAST(SUM(bit_count(bm)) AS BIGINT) AS card
          FROM w GROUP BY 1)
    SELECT p.type_a, p.type_b, p.n_inter,
           ca.card AS card_a, cb.card AS card_b
    FROM p JOIN c ca ON ca.g = p.type_a JOIN c cb ON cb.g = p.type_b
    """,
    doc="Bitmap-index set intersection: per event type, the distinct "
    "user set packs into 32-bit blocks carried in BIGINT words (DuckDB "
    "checked-shift forbids bit 63; word = id div 32, one bit_or "
    "aggregate per word — the roaring/bitmap-index representation), "
    "and EXACT pairwise audience overlap is then popcount(a AND b) "
    "summed over co-present words. Scale shape: after the pack, "
    "cardinality and every set operation run on words (64x fewer rows "
    "than members, 8-byte keys), the pairwise join is word-aligned "
    "equi-join — this is the exact-set-ops complement of the KMV "
    "sketch (sketch_kmv_overlap) for when exactness is required.",
    tags=("extras", "analytics", "agg"),
)
def x32_bitmap_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.where(F.col("user_id").isNotNull())
        .select(F.col("event_type").alias("g"), F.col("user_id").alias("u"))
        .distinct()
    )
    w = d.select(
        "g",
        (F.col("u") / 32).cast("long").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(u % 32 AS INT))").alias("m"),
    ).groupBy("g", "word").agg(F.bit_or("m").alias("bm"))
    a, b = w.alias("a"), w.alias("b")
    p = (
        a.join(b, (F.col("a.word") == F.col("b.word")) & (F.col("a.g") < F.col("b.g")))
        .groupBy(F.col("a.g").alias("type_a"), F.col("b.g").alias("type_b"))
        .agg(
            F.sum(F.bit_count(F.col("a.bm").bitwiseAND(F.col("b.bm"))))
            .cast("long")
            .alias("n_inter")
        )
    )
    c = w.groupBy("g").agg(F.sum(F.bit_count("bm")).cast("long").alias("card"))
    return (
        p.join(c.select(F.col("g").alias("type_a"), F.col("card").alias("card_a")), "type_a")
        .join(c.select(F.col("g").alias("type_b"), F.col("card").alias("card_b")), "type_b")
        .select("type_a", "type_b", "n_inter", "card_a", "card_b")
    )


@register(
    "an13_rfm_segments",
    oracle="""
    WITH c AS (SELECT o_custkey AS ck,
                      CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS BIGINT) AS m,
                      CAST(COUNT(*) AS BIGINT) AS f,
                      MAX(o_orderdate) AS cmax
               FROM orders GROUP BY 1),
    gm AS (SELECT MAX(o_orderdate) AS gmax FROM orders),
    base AS (SELECT ck, m, f,
                    (epoch_us(gm.gmax) - epoch_us(cmax)) // 86400000000 AS r
             FROM c, gm),
    lng AS (SELECT ck, 'r' AS metric, r AS v FROM base
            UNION ALL SELECT ck, 'f', f FROM base
            UNION ALL SELECT ck, 'm', m FROM base),
    g AS (SELECT metric, v, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM lng GROUP BY 1, 2),
    t AS (SELECT metric, CAST(SUM(cnt) AS BIGINT) AS n FROM g GROUP BY 1),
    cu AS (SELECT g.*, SUM(cnt) OVER (PARTITION BY metric ORDER BY v
                                      ROWS UNBOUNDED PRECEDING) AS cum
           FROM g),
    th AS (SELECT cu.metric,
             MIN(CASE WHEN cum >= (1 * n + 3) // 4 THEN v END) AS t1,
             MIN(CASE WHEN cum >= (2 * n + 3) // 4 THEN v END) AS t2,
             MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS t3
           FROM cu JOIN t USING (metric) GROUP BY 1),
    bk AS (SELECT lng.ck, lng.metric,
                  1 + CASE WHEN lng.v > th.t1 THEN 1 ELSE 0 END
                    + CASE WHEN lng.v > th.t2 THEN 1 ELSE 0 END
                    + CASE WHEN lng.v > th.t3 THEN 1 ELSE 0 END AS q
           FROM lng JOIN th USING (metric)),
    pv AS (SELECT ck,
                  CAST(MAX(CASE WHEN metric = 'r' THEN q END) AS BIGINT) AS r_q,
                  CAST(MAX(CASE WHEN metric = 'f' THEN q END) AS BIGINT) AS f_q,
                  CAST(MAX(CASE WHEN metric = 'm' THEN q END) AS BIGINT) AS m_q
           FROM bk GROUP BY 1)
    SELECT pv.r_q, pv.f_q, pv.m_q,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(base.m) AS BIGINT) AS sum_m_cents
    FROM pv JOIN base ON base.ck = pv.ck
    GROUP BY 1, 2, 3
    """,
    doc="RFM (recency / frequency / monetary) customer segmentation — "
    "the classic marketing-analytics cube: per customer, days since "
    "last order (exact integer epoch-day arithmetic), order count, "
    "and lifetime cents; each metric quartiled by EXACT nearest-rank "
    "thresholds computed scale-safely (the x29 machinery over a "
    "stacked metric long-form: distinct-value counts -> per-metric "
    "cumulative window -> 9 boundary values broadcast back; no global "
    "row_number sort, no corpus-cardinality percentile buffer), then "
    "customers roll up into the 4x4x4 segment cube. Quartile "
    "assignment is pure value comparison against the 3 thresholds — "
    "deterministic and engine-identical under ties.",
    tags=("extras", "analytics"),
)
def an13_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("m"),
        F.count(F.lit(1)).cast("long").alias("f"),
        F.max("o_orderdate").alias("cmax"),
    )
    gm = orders.agg(F.max("o_orderdate").alias("gmax"))
    base = c.crossJoin(F.broadcast(gm)).select(
        "ck",
        "m",
        "f",
        F.expr(
            "(unix_micros(gmax) - unix_micros(cmax)) div 86400000000"
        ).alias("r"),
    )
    lng = (
        base.select("ck", F.lit("r").alias("metric"), F.col("r").alias("v"))
        .unionAll(base.select("ck", F.lit("f"), F.col("f")))
        .unionAll(base.select("ck", F.lit("m"), F.col("m")))
    )
    g = lng.groupBy("metric", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    t = g.groupBy("metric").agg(F.sum("cnt").cast("long").alias("n"))
    cum_w = Window.partitionBy("metric").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cu = g.withColumn("cum", F.sum("cnt").over(cum_w))
    th = (
        cu.join(t, "metric")
        .groupBy("metric")
        .agg(
            *[
                F.min(
                    F.when(
                        F.col("cum") >= F.expr(f"({q} * n + 3) div 4"),
                        F.col("v"),
                    )
                ).alias(f"t{q}")
                for q in (1, 2, 3)
            ]
        )
    )
    qcol = (
        F.lit(1)
        + F.when(F.col("v") > F.col("t1"), 1).otherwise(0)
        + F.when(F.col("v") > F.col("t2"), 1).otherwise(0)
        + F.when(F.col("v") > F.col("t3"), 1).otherwise(0)
    )
    bk = lng.join(F.broadcast(th), "metric").select(
        "ck", "metric", qcol.alias("q")
    )
    pv = bk.groupBy("ck").agg(
        *[
            F.max(F.when(F.col("metric") == mname, F.col("q")))
            .cast("long")
            .alias(f"{mname}_q")
            for mname in ("r", "f", "m")
        ]
    )
    return (
        pv.join(base, "ck")
        .groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("m").cast("long").alias("sum_m_cents"),
        )
    )


_DAILY_CENTS = """
    SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY 1, 2
"""


@register(
    "an14_cusum_changepoint",
    oracle=f"""
    WITH d AS ({_DAILY_CENTS}),
    t AS (SELECT event_type, CAST(SUM(cents) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM d GROUP BY 1),
    c AS (SELECT d.event_type, d.day,
                 SUM(d.cents) OVER (PARTITION BY d.event_type ORDER BY d.day
                                    ROWS UNBOUNDED PRECEDING) AS pfx,
                 ROW_NUMBER() OVER (PARTITION BY d.event_type
                                    ORDER BY d.day) AS ti
          FROM d),
    s AS (SELECT c.event_type, c.day, t.n,
                 (t.n * c.pfx - c.ti * t.total) AS s_scaled
          FROM c JOIN t USING (event_type)),
    mx AS (SELECT event_type, MAX(abs(s_scaled)) AS peak FROM s GROUP BY 1)
    SELECT s.event_type,
           CAST(MAX(s.n) AS BIGINT) AS n_days,
           MIN(s.day) AS peak_day,
           CAST(MAX(mx.peak) AS BIGINT) AS peak_scaled
    FROM s JOIN mx ON mx.event_type = s.event_type
                  AND abs(s.s_scaled) = mx.peak
    GROUP BY 1
    """,
    doc="CUSUM changepoint screen per event-type daily revenue series "
    "(Page 1954): the peak |cumulative deviation from the series "
    "mean| and the EARLIEST day attaining it — the standard 'where "
    "did the level shift' detector a data-quality pipeline runs over "
    "ingest volumes. Exactness trick: CUSUM_t = prefix_t - t*mean is "
    "rational, so both engines compare n-SCALED integers "
    "(n*prefix_t - t*total) — no float ever enters the argmax, ties "
    "break by earliest day. Scale shape: the window runs over the "
    "AGGREGATED (type, day) frame (bounded series length), never raw "
    "events.",
    tags=("extras", "quality", "timeseries"),
)
def an14_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        ),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    t = d.groupBy("event_type").agg(
        F.sum("cents").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    c = d.withColumn(
        "pfx", F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("ti", F.row_number().over(w))
    s = c.join(t, "event_type").select(
        "event_type",
        "day",
        "n",
        (F.col("n") * F.col("pfx") - F.col("ti") * F.col("total")).alias(
            "s_scaled"
        ),
    )
    mx = s.groupBy("event_type").agg(F.max(F.abs("s_scaled")).alias("peak"))
    return (
        s.join(mx, "event_type")
        .where(F.abs("s_scaled") == F.col("peak"))
        .groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_days"),
            F.min("day").alias("peak_day"),
            F.max("peak").cast("long").alias("peak_scaled"),
        )
    )


@register(
    "x33_theil_sen",
    oracle=f"""
    WITH d AS ({_DAILY_CENTS}),
    ix AS (SELECT event_type, cents,
                  ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY day) AS i
           FROM d),
    p AS (SELECT a.event_type,
                 round(CAST(b.cents - a.cents AS DOUBLE) / (b.i - a.i), 6)
                   AS slope
          FROM ix a JOIN ix b
            ON a.event_type = b.event_type AND a.i < b.i),
    r AS (SELECT event_type, slope,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY slope) AS rk,
                 COUNT(*) OVER (PARTITION BY event_type) AS np
          FROM p)
    SELECT event_type, CAST(np AS BIGINT) AS n_pairs,
           slope AS ts_slope_cents_per_day
    FROM r WHERE rk = (np + 1) // 2
    """,
    doc="Theil-Sen robust trend per event-type daily revenue series: "
    "the median of all pairwise slopes — up to ~29% contamination "
    "tolerance where x26's OLS slope is dragged by a single spike "
    "day. Median is the deterministic lower nearest-rank ((np+1) div "
    "2); slopes are one double division of exact integers rounded to "
    "6 dp, identical in both engines. Scale shape: the O(n^2) pair "
    "join runs on the AGGREGATED per-day frame (bounded series "
    "length per group — 30 days here, ~400 pairs), never on raw "
    "events; groups parallelize independently.",
    tags=("extras", "timeseries"),
)
def x33_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        ),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    ix = d.select(
        "event_type", "cents", F.row_number().over(w).alias("i")
    )
    a, b = ix.alias("a"), ix.alias("b")
    p = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.i") < F.col("b.i")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.round(
            (F.col("b.cents") - F.col("a.cents")).cast("double")
            / (F.col("b.i") - F.col("a.i")),
            6,
        ).alias("slope"),
    )
    wr = Window.partitionBy("event_type").orderBy("slope")
    r = p.withColumn("rk", F.row_number().over(wr)).withColumn(
        "np", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    return r.where(F.col("rk") == F.expr("(np + 1) div 2")).select(
        "event_type",
        F.col("np").cast("long").alias("n_pairs"),
        F.col("slope").alias("ts_slope_cents_per_day"),
    )


@register(
    "x34_ab_test_ztest",
    oracle="""
    WITH u AS (SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d')
                        AS day,
                      user_id % 2 AS variant,
                      MAX(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS converted
               FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2, 3),
    v AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(converted) AS BIGINT) AS x
          FROM u GROUP BY 1),
    w AS (SELECT
            MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
            MAX(CASE WHEN variant = 0 THEN x END) AS x_a,
            MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
            MAX(CASE WHEN variant = 1 THEN x END) AS x_b
          FROM v)
    SELECT n_a, x_a, n_b, x_b,
           round(CAST(x_a AS DOUBLE) / n_a, 6) AS p_a,
           round(CAST(x_b AS DOUBLE) / n_b, 6) AS p_b,
           round((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
                 / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 6) AS z_score
    FROM w
    """,
    doc="Two-proportion z-test — the A/B-experiment readout every "
    "product-analytics warehouse serves: (user, day) sessions split "
    "into variants by user-id parity, conversion = the session "
    "contains a purchase, pooled-variance "
    "z-score. All counts are exact integers from one per-session "
    "reduction; the single double formula evaluates in the IDENTICAL "
    "textual operation order in both engines (the repo-wide float "
    "contract), so even the 6-dp-rounded z hash-matches. Scale "
    "shape: per-session groupBy (bounded per-key state) collapsing to a "
    "2-row variant frame; the test statistic is driver-free scalar "
    "arithmetic on that frame.",
    tags=("extras", "analytics", "stats"),
)
def x34_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy(
            "user_id",
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
            .alias("day"),
            (F.col("user_id") % 2).alias("variant"),
        )
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted")
        )
    )
    v = u.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("converted").cast("long").alias("x"),
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("x"))).alias("x_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("x"))).alias("x_b"),
    )
    pa = F.col("x_a").cast("double") / F.col("n_a")
    pb = F.col("x_b").cast("double") / F.col("n_b")
    pp = (F.col("x_a") + F.col("x_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (pa - pb) / F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return w.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        F.round(z, 6).alias("z_score"),
    )


@register(
    "an15_chi2_independence",
    oracle="""
    WITH c AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_obs
               FROM documents GROUP BY 1, 2),
    r AS (SELECT lang, CAST(SUM(n_obs) AS BIGINT) AS n_row FROM c GROUP BY 1),
    k AS (SELECT source, CAST(SUM(n_obs) AS BIGINT) AS n_col FROM c GROUP BY 1),
    t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM c)
    SELECT c.lang, c.source, c.n_obs,
           round(CAST(r.n_row AS DOUBLE) * k.n_col / t.n, 6) AS expected,
           round((c.n_obs - CAST(r.n_row AS DOUBLE) * k.n_col / t.n)
                 * (c.n_obs - CAST(r.n_row AS DOUBLE) * k.n_col / t.n)
                 / (CAST(r.n_row AS DOUBLE) * k.n_col / t.n), 6)
             AS chi2_term
    FROM c JOIN r USING (lang) JOIN k USING (source) CROSS JOIN t
    """,
    doc="Chi-square test of independence on the lang x source "
    "contingency table — the categorical-drift screen a corpus "
    "pipeline runs to detect a source whose language mix shifted. "
    "Observed counts are exact integers from one (lang, source) "
    "reduction; expected = row*col/total and the per-cell chi-square "
    "term evaluate in the identical double operation order in both "
    "engines. Scale shape: the contingency frame is "
    "|langs| x |sources| rows however large the corpus; marginals "
    "join back as broadcast dims and the 1-row total as a broadcast "
    "cross join (the x23 Benford shape).",
    tags=("extras", "analytics", "stats"),
)
def an15_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs")
    )
    r = c.groupBy("lang").agg(F.sum("n_obs").cast("long").alias("n_row"))
    k = c.groupBy("source").agg(F.sum("n_obs").cast("long").alias("n_col"))
    t = c.agg(F.sum("n_obs").cast("long").alias("n"))
    exp = F.col("n_row").cast("double") * F.col("n_col") / F.col("n")
    return (
        c.join(F.broadcast(r), "lang")
        .join(F.broadcast(k), "source")
        .crossJoin(F.broadcast(t))
        .select(
            "lang",
            "source",
            "n_obs",
            F.round(exp, 6).alias("expected"),
            F.round(
                (F.col("n_obs") - exp) * (F.col("n_obs") - exp) / exp, 6
            ).alias("chi2_term"),
        )
    )

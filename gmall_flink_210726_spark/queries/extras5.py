r"""Extras wave 5: MinHash-vs-exact Jaccard calibration (completing
the sketch-calibration trio with HLL and CMS) and incremental
materialized-view maintenance.

Oracle notes:
- The portable MinHash base hash is the first 32 bits of
  md5(shingle) — DuckDB parses the hex via the '0x' cast (the simhash
  precedent, queries/llm.py) — permuted per slot by the affine family
  ((2i+1)*h + 7919*(i+1)) mod 2^31-1; estimate = agreeing-slot
  fraction, an exact multiple of 1/16 (no float tolerance needed).
- The MV oracle re-aggregates from scratch: algebraic merge of
  base partials + delta partials must be IDENTICAL to the full
  aggregate — that identity is the whole correctness claim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_210726_spark.operators.analytics import incremental_agg_refresh
from gmall_flink_210726_spark.operators.dedup import ngram_jaccard_pairs
from gmall_flink_210726_spark.operators.sketch import minhash_jaccard_calibration
from gmall_flink_210726_spark.queries.llm import _SHINGLES
from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table

_J = (
    "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)"
    " / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))"
)


@register(
    "sketch_minhash_calibration",
    oracle=f"""
    WITH g AS ({_SHINGLES}),
    pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, {_J} AS j
           FROM g a JOIN g b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh)) > 0 AND {_J} >= 0.3),
    hs AS (SELECT doc_id,
                  CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) AS h
           FROM (SELECT doc_id, unnest(sh) AS s FROM g) t),
    sg AS (SELECT doc_id, i,
             MIN(((2 * i + 1) * h + 7919 * (i + 1)) % 2147483647) AS mh
           FROM hs, (SELECT unnest(range(16)) AS i) r
           GROUP BY doc_id, i),
    agg AS (SELECT pr.id_a, pr.id_b, round(pr.j, 6) AS jaccard_exact,
                   CAST(SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END)
                        AS DOUBLE) / 16.0 AS minhash_est
            FROM pr
            JOIN sg sa ON sa.doc_id = pr.id_a
            JOIN sg sb ON sb.doc_id = pr.id_b AND sb.i = sa.i
            GROUP BY 1, 2, 3)
    SELECT * FROM agg
    """,
    doc="MinHash estimate vs exact Jaccard on near-dup candidate pairs "
    "(J >= 0.3) — the third sketch-calibration query (HLL, CMS, now "
    "MinHash; Broder 1997: E[agreeing-slot fraction] = J). Slots are "
    "md5-portable so the oracle rebuilds the identical 16-slot "
    "signatures; pairs broadcast against the signature table (near-dup "
    "pairs are sparse at any scale), signatures never shuffle. "
    "Bench note: this is the registry's slowest entry (~7.5 s idle at "
    "sf0.1) because the calibration CONTRACT needs exact Jaccard on "
    "the verify side — two pair-membership-pushed shingle scans "
    "(operators/sketch.py pair-membership semi-join) — not because the "
    "sketch path is slow; the estimate side is one banded groupBy. "
    "operators/sketch.py:minhash_jaccard_calibration",
    tags=("sketch", "llm", "dedup"),
)
def q_minhash_cal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.3, max_df=100).select(
        "id_a", "id_b", "jaccard"
    )
    return minhash_jaccard_calibration(docs, pairs, k=16)


@register(
    "an6_mv_incremental_refresh",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS ev_ct,
           CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS cents_sum
    FROM events GROUP BY 1, 2
    """,
    doc="Incremental materialized-view maintenance: the (day, "
    "event_type) rollup is materialized from history (rows before "
    "2024-01-20, checkpointed as the stored MV), then refreshed by "
    "algebraically merging ONLY the delta partition's partials — "
    "refresh cost O(delta), no history re-scan. The oracle aggregates "
    "everything from scratch: merge(base, delta) must be bit-identical "
    "to the full recompute. operators/analytics.py:incremental_agg_refresh",
    tags=("analytics", "agg"),
)
def q_mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("_cents"),
    )
    partials = [
        F.count(F.lit(1)).alias("ev_ct"),
        F.sum("_cents").alias("cents_sum"),
    ]
    merges = [
        F.sum("ev_ct").cast("long").alias("ev_ct"),
        F.sum("cents_sum").cast("long").alias("cents_sum"),
    ]
    base = (
        ev.where(F.col("day") < "2024-01-20")
        .groupBy("day", "event_type")
        .agg(*partials)
        .localCheckpoint(eager=True)  # the stored MV — history scanned once
    )
    delta = ev.where(F.col("day") >= "2024-01-20")
    return incremental_agg_refresh(
        base, delta, ["day", "event_type"], partials, merges
    )


@register(
    "text_tfidf_cosine_pairs",
    oracle=r"""
    WITH tok AS (SELECT doc_id AS id,
                   unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                      x -> x <> '')) AS w
                 FROM documents),
    tf AS (SELECT id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
    dfq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w
            HAVING COUNT(*) <= 100),
    n AS (SELECT COUNT(*) AS nd FROM documents),
    wg AS (SELECT id, w,
             CAST(round(CAST(tf AS DOUBLE)
                        * ln(CAST(nd AS DOUBLE) / CAST(df AS DOUBLE)), 6)
                  AS DECIMAL(18,6)) AS wt
           FROM tf JOIN dfq USING (w), n),
    nm AS (SELECT id, SUM(wt * wt) AS n2 FROM wg GROUP BY id),
    dt AS (SELECT a.id AS id_a, b.id AS id_b, SUM(a.wt * b.wt) AS s12
           FROM wg a JOIN wg b ON a.w = b.w AND a.id < b.id GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(CAST(s12 AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE))
                 * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cosine
    FROM dt JOIN nm na ON na.id = dt.id_a JOIN nm nb ON nb.id = dt.id_b
    WHERE round(CAST(s12 AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE))
                * sqrt(CAST(nb.n2 AS DOUBLE))), 6) >= 0.3
    """,
    doc="Sparse TF-IDF cosine document similarity (cos >= 0.3) — the "
    "bag-of-words sibling of the dense-embedding threshold join: "
    "candidates from a token co-occurrence equi-join with the df <= "
    "100 stopword-prune bounding fan-out (the ngram_jaccard skew "
    "guard), weights rounded-then-DECIMAL so dot products and norms "
    "are exact order-free sums. operators/text3.py:tfidf_cosine_pairs",
    tags=("llm", "text", "similarity"),
)
def q_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.text3 import tfidf_cosine_pairs

    return tfidf_cosine_pairs(load_table(spark, sf_dir, "documents"))


@register(
    "an7_entity_clusters",
    oracle="""
    WITH RECURSIVE names AS (SELECT p_name, MIN(p_partkey) AS nid,
                                    CAST(COUNT(*) AS BIGINT) AS n_keys
                             FROM part GROUP BY p_name),
    nb AS (SELECT p_name, nid, n_keys,
                  regexp_extract(p_name, '(\\S+)$', 1) AS blk
           FROM names),
    pr AS (SELECT a.nid AS id_a, b.nid AS id_b FROM nb a JOIN nb b
           ON a.blk = b.blk AND a.p_name < b.p_name
           WHERE abs(length(a.p_name) - length(b.p_name)) <= 3
             AND levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3),
    e AS (SELECT id_a AS u, id_b AS v FROM pr
          UNION SELECT id_b, id_a FROM pr),
    reach AS (SELECT u, u AS lbl FROM (SELECT DISTINCT u FROM e)
              UNION SELECT e.u, r.lbl FROM e JOIN reach r ON e.v = r.u),
    comp AS (SELECT u, MIN(lbl) AS cluster_id FROM reach GROUP BY u)
    SELECT nb.p_name, COALESCE(c.cluster_id, nb.nid) AS cluster_id, nb.n_keys
    FROM nb LEFT JOIN comp c ON c.u = nb.nid
    """,
    doc="End-to-end entity resolution: blocked Levenshtein pairs over "
    "distinct names -> connected components (min-label propagation) -> "
    "every name mapped to its entity cluster's minimum part key, with "
    "carry counts. The composition a master-data pipeline runs "
    "(fuzzy_match_names feeds the SAME clustering operator the "
    "near-dup corpus uses). operators/analytics.py + operators/dedup.py:"
    "connected_components",
    tags=("analytics", "dedup"),
)
def q_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.analytics import fuzzy_match_names
    from gmall_flink_210726_spark.operators.dedup import connected_components

    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(
        F.min("p_partkey").alias("nid"), F.count(F.lit(1)).alias("n_keys")
    )
    pairs = fuzzy_match_names(
        part, "p_name", lambda n: F.regexp_extract(n, r"(\S+)$", 1), max_dist=3
    )
    edges = (
        pairs.join(
            names.select(F.col("p_name").alias("name1"), F.col("nid").alias("id_a")),
            "name1",
        )
        .join(
            names.select(F.col("p_name").alias("name2"), F.col("nid").alias("id_b")),
            "name2",
        )
        .select("id_a", "id_b")
    )
    cc = connected_components(edges, names.select(F.col("nid").alias("id")))
    return names.join(cc, names.nid == cc.id).select(
        "p_name", "cluster_id", "n_keys"
    )


@register(
    "sketch_histogram_quantiles",
    oracle="""
    WITH s AS (SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx,
                      COUNT(*) AS n
               FROM orders),
    h AS (SELECT LEAST(CAST(FLOOR((o_totalprice - mn) / ((mx - mn) / 256.0))
                            AS INTEGER), 255) AS b,
                 COUNT(*) AS ct
          FROM orders, s GROUP BY 1),
    cw AS (SELECT b, ct, SUM(ct) OVER (ORDER BY b) AS cum FROM h),
    q AS (SELECT unnest([0.5, 0.9, 0.99]) AS pct),
    sel AS (SELECT q.pct,
                   round(s.mn + cw.b * ((s.mx - s.mn) / 256.0)
                         + (round(q.pct * s.n, 6) - (cw.cum - cw.ct)) / cw.ct
                           * ((s.mx - s.mn) / 256.0), 6) AS est_quantile
            FROM q, cw, s
            WHERE (cw.cum - cw.ct) < round(q.pct * s.n, 6)
              AND round(q.pct * s.n, 6) <= cw.cum),
    ex AS (SELECT 0.5 AS pct, round(quantile_cont(o_totalprice, 0.5), 6)
                    AS exact_quantile FROM orders
           UNION ALL
           SELECT 0.9, round(quantile_cont(o_totalprice, 0.9), 6) FROM orders
           UNION ALL
           SELECT 0.99, round(quantile_cont(o_totalprice, 0.99), 6) FROM orders)
    SELECT sel.pct, sel.est_quantile, ex.exact_quantile
    FROM sel JOIN ex ON sel.pct = ex.pct
    """,
    doc="Histogram-sketch quantile estimation with exact percentiles "
    "alongside — the fourth sketch-calibration query (distinct/HLL, "
    "frequency/CMS, similarity/MinHash, now rank): a fixed 256-bucket "
    "equi-width histogram (bounded state per column at any scale), "
    "linear interpolation inside the rank-containing bucket; exact "
    "side via percentile() == quantile_cont (the w6 contract). "
    "operators/sketch.py:histogram_quantiles",
    tags=("sketch", "stats"),
)
def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.sketch import histogram_quantiles

    return histogram_quantiles(
        load_table(spark, sf_dir, "orders"), "o_totalprice"
    )


@register(
    "an8_user_journeys",
    oracle="""
    WITH seq AS (
      SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts, event_id)),
    paths AS (SELECT event_type || '>' || e2 || '>' || e3 AS path
              FROM seq WHERE e3 IS NOT NULL)
    SELECT path, COUNT(*) AS path_ct
    FROM paths GROUP BY path
    ORDER BY path_ct DESC, path ASC LIMIT 10
    """,
    doc="User-journey path mining: top 3-step event sequences within "
    "(user, day) sessions — the product-analytics flow report. One "
    "window shuffle on the session key (per-key data, never global), "
    "lead() builds the paths in-plan, deterministic top-10 via the "
    "(count, path) total order.",
    tags=("analytics",),
)
def q_user_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        "ts",
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    path = F.concat_ws(">", "event_type", "e2", "e3").alias("path")
    return (
        seq.select(path)
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("path_ct"))
        .orderBy(F.desc("path_ct"), F.asc("path"))
        .limit(10)
    )


@register(
    "x17_quality_checks",
    oracle="""
    WITH s AS (SELECT COUNT(*) AS n,
                      COUNT(o_orderkey) AS nn_key,
                      COUNT(DISTINCT o_orderkey) AS nd_key,
                      COUNT(CASE WHEN o_totalprice > 0 THEN 1 END) AS n_pos,
                      COUNT(CASE WHEN o_orderstatus IN ('O','F','P')
                                 THEN 1 END) AS n_dom,
                      COUNT(CASE WHEN o_orderdate >= TIMESTAMP '1992-01-01'
                                  AND o_orderdate < TIMESTAMP '2026-01-01'
                                 THEN 1 END) AS n_range
               FROM orders)
    SELECT col, chk, passed, CAST(observed AS BIGINT) AS observed,
           CAST(n AS BIGINT) AS n_rows FROM (
      SELECT 'o_orderkey' AS col, 'complete' AS chk, nn_key = n AS passed,
             nn_key AS observed, n FROM s
      UNION ALL
      SELECT 'o_orderkey', 'unique', nd_key = n, nd_key, n FROM s
      UNION ALL
      SELECT 'o_totalprice', 'positive', n_pos = n, n_pos, n FROM s
      UNION ALL
      SELECT 'o_orderstatus', 'in_domain', n_dom = n, n_dom, n FROM s
      UNION ALL
      SELECT 'o_orderdate', 'in_range', n_range = n, n_range, n FROM s)
    """,
    doc="Declarative data-quality checks (the Deequ/Great-Expectations "
    "primitive, the validation sibling of x11 profiling): completeness, "
    "uniqueness, positivity, domain membership and range checks as "
    "parallel aggregate expressions in ONE scan, reshaped to the "
    "(col, check, passed, observed) long form a quality monitor stores.",
    tags=("extras", "quality"),
)
def q_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    agg = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderkey").alias("nn_key"),
        F.count_distinct("o_orderkey").alias("nd_key"),
        F.count(F.when(F.col("o_totalprice") > 0, 1)).alias("n_pos"),
        F.count(
            F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("n_dom"),
        F.count(
            F.when(
                (F.col("o_orderdate") >= F.lit("1992-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("2026-01-01").cast("timestamp")),
                1,
            )
        ).alias("n_range"),
    )
    # stack to long form in one guaranteed evaluation (the x11 shape)
    return agg.select(
        F.expr(
            "stack(5, "
            "'o_orderkey', 'complete', nn_key = n, nn_key, "
            "'o_orderkey', 'unique', nd_key = n, nd_key, "
            "'o_totalprice', 'positive', n_pos = n, n_pos, "
            "'o_orderstatus', 'in_domain', n_dom = n, n_dom, "
            "'o_orderdate', 'in_range', n_range = n, n_range) "
            "AS (col, chk, passed, observed)"
        ),
        F.col("n").alias("n_rows"),
    )


@register(
    "x18_khop_reachability",
    oracle="""
    WITH RECURSIVE ed AS (
      SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey),
    reach AS (
      SELECT CAST(0 AS INTEGER) AS id, 0 AS d
      UNION ALL
      SELECT CAST(ed.dst AS INTEGER), r.d + 1
      FROM ed JOIN reach r ON ed.src = r.id WHERE r.d < 3)
    SELECT n.n_nationkey, n.n_name, CAST(MIN(reach.d) AS INTEGER) AS hop
    FROM reach JOIN nation n ON n.n_nationkey = reach.id
    GROUP BY 1, 2
    """,
    doc="Bounded k-hop reachability (BFS, 3 hops) from nation 0 over "
    "the distinct supplier->customer trade graph — the neighborhood "
    "expansion primitive next to PageRank (x15) and connected "
    "components. Fixed-iteration frontier joins on bare (id, dist) "
    "pairs; per round one equi-join + one min-groupBy, the "
    "label-propagation cost model.",
    tags=("extras", "graph"),
)
def q_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    edges = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(supplier, lineitem["l_suppkey"] == supplier["s_suppkey"])
        .select(
            supplier["s_nationkey"].alias("src"),
            customer["c_nationkey"].alias("dst"),
        )
        .distinct()
    )
    dist = spark.createDataFrame([(0, 0)], "id int, d int")
    for _ in range(3):
        step = (
            dist.join(edges, dist["id"] == edges["src"])
            .select(F.col("dst").cast("int").alias("id"), (F.col("d") + 1).alias("d"))
        )
        dist = (
            dist.unionByName(step).groupBy("id").agg(F.min("d").alias("d"))
        )
    return dist.join(nation, dist["id"] == nation["n_nationkey"]).select(
        "n_nationkey", "n_name", F.col("d").cast("int").alias("hop")
    )


@register(
    "x19_k_anonymity",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           COUNT(*) AS grp_ct,
           COUNT(*) >= 5 AS meets_k
    FROM customer
    GROUP BY 1, 2
    """,
    doc="k-anonymity audit (k=5) over the (nationkey, mktsegment) "
    "quasi-identifier: equivalence-class sizes with a pass flag — the "
    "privacy/governance check a training-data pipeline runs before "
    "release. One partial+final hash aggregate.",
    tags=("extras", "quality"),
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("grp_ct"),
        (F.count(F.lit(1)) >= 5).alias("meets_k"),
    )


@register(
    "an9_snapshot_diff",
    oracle="""
    WITH o AS (SELECT o_orderkey, o_orderstatus AS st,
                      CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
               FROM orders WHERE o_orderkey % 50 != 0),
    n AS (SELECT o_orderkey,
                 CASE WHEN o_orderkey % 23 = 0 THEN 'X'
                      ELSE o_orderstatus END AS st,
                 CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
          FROM orders WHERE o_orderkey % 37 != 0),
    j AS (SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
                 CASE WHEN o.o_orderkey IS NULL THEN 'added'
                      WHEN n.o_orderkey IS NULL THEN 'removed'
                      WHEN o.st IS DISTINCT FROM n.st
                           OR o.cents IS DISTINCT FROM n.cents
                      THEN 'changed' END AS change,
                 o.st AS old_st, n.st AS new_st,
                 o.cents AS old_cents, n.cents AS new_cents
          FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
    SELECT * FROM j WHERE change IS NOT NULL
    """,
    doc="Snapshot table-diff (CDC validation / backfill reconciliation): "
    "two keyed snapshots full-outer-joined, every key classified "
    "added / removed / changed (null-safe compare) with before/after "
    "values; unchanged keys absent. The fixture derives both snapshots "
    "deterministically from orders so all three classes are exercised. "
    "operators/analytics.py:snapshot_diff",
    tags=("analytics", "cdc"),
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.analytics import snapshot_diff

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("st"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    old = base.where(F.col("o_orderkey") % 50 != 0)
    new = orders.where(F.col("o_orderkey") % 37 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 23 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("st"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    return snapshot_diff(old, new, ["o_orderkey"], ["st", "cents"])


@register(
    "x20_mad_outliers",
    oracle="""
    WITH med AS (SELECT event_type,
                        quantile_cont(value, 0.5) AS med
                 FROM events GROUP BY event_type),
    dev AS (SELECT e.event_type, e.value, m.med,
                   abs(e.value - m.med) AS ad
            FROM events e JOIN med m ON e.event_type = m.event_type),
    mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad
            FROM dev GROUP BY event_type)
    SELECT dev.event_type,
           round(MIN(dev.med), 6) AS median_val,
           round(MIN(mad.mad), 6) AS mad_val,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN round(dev.ad, 6)
                              > round(4.4478 * mad.mad, 6)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev JOIN mad ON dev.event_type = mad.event_type
    GROUP BY dev.event_type
    """,
    doc="Robust outlier screen via median absolute deviation (the "
    "breakdown-resistant sibling of x14's rolling z-score): per-group "
    "median, MAD, and the count beyond 3 scaled MADs (1.4826 = "
    "consistency constant for normal data). Two grouped exact-"
    "percentile passes + one flag aggregation; both compare sides are "
    "rounded to 6 dp so the threshold is engine-identical "
    "(percentile == quantile_cont, the w6 contract).",
    tags=("extras", "stats", "quality"),
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(med, "event_type").select(
        "event_type", "value", "med",
        F.abs(F.col("value") - F.col("med")).alias("ad"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad")
    )
    flagged = dev.join(mad, "event_type")
    return flagged.groupBy("event_type").agg(
        F.round(F.min("med"), 6).alias("median_val"),
        F.round(F.min("mad"), 6).alias("mad_val"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(
                # pre-evaluated 3*1.4826 literal: DuckDB would compute
                # 3*1.4826 in exact DECIMAL before the double multiply,
                # Python in double — same literal on both sides makes
                # the threshold arithmetic bit-identical
                F.round("ad", 6) > F.round(F.lit(4.4478) * F.col("mad"), 6),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_outliers"),
    )

r"""Extras wave 5: MinHash-vs-exact Jaccard calibration (completing
the sketch-calibration trio with HLL and CMS) and incremental
materialized-view maintenance.

Oracle notes:
- The portable MinHash slot value is the first 32 hash bits of
  md5('i:shingle') — DuckDB parses the hex via the '0x' cast (the
  simhash precedent, queries/llm.py); estimate = agreeing-slot
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
    sg AS (SELECT doc_id, i,
             MIN(CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || s), 1, 8))
                      AS BIGINT)) AS mh
           FROM (SELECT doc_id, unnest(sh) AS s FROM g) t,
                (SELECT unnest(range(16)) AS i) r
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

r"""LLM-data-pipeline queries, wave 10: KMV bottom-k distinct sketch
and prefix-filtered set-similarity join.

Oracle notes:
- KMV: md5 hex is fixed-width lowercase, so DuckDB's lexicographic
  ROW_NUMBER order over hashes IS the numeric bottom-k order; only the
  single k-th hash is converted to a number, with the identical
  hex-prefix/2^48 double arithmetic on both engines.
- Prefix filtering is LOSSLESS for the Jaccard threshold (Bayardo et
  al. 2007 prefix-filter principle), so the oracle is the plain exact
  Jaccard pair query — same semantics, radically different physical
  plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_210726_spark.queries.llm import _JACCARD_PAIRS
from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "sketch_kmv_distinct",
    oracle="""
    WITH cols AS (
      SELECT 'events.user_id' AS col_name, CAST(user_id AS VARCHAR) AS v
      FROM events WHERE user_id IS NOT NULL
      UNION ALL
      SELECT 'orders.o_custkey', CAST(o_custkey AS VARCHAR)
      FROM orders WHERE o_custkey IS NOT NULL
      UNION ALL
      SELECT 'lineitem.l_partkey', CAST(l_partkey AS VARCHAR)
      FROM lineitem WHERE l_partkey IS NOT NULL
    ),
    d AS (SELECT DISTINCT col_name, md5(v) AS h FROM cols),
    ex AS (SELECT col_name, CAST(COUNT(*) AS BIGINT) AS exact_distinct
           FROM d GROUP BY 1),
    rk AS (SELECT col_name, h,
                  ROW_NUMBER() OVER (PARTITION BY col_name ORDER BY h) AS r
           FROM d),
    kth AS (SELECT col_name,
                   CAST(('0x' || substring(h, 1, 12)) AS BIGINT)
                     / 281474976710656.0 AS frac
            FROM rk WHERE r = 256)
    SELECT ex.col_name, ex.exact_distinct,
           COALESCE(round(255.0 / kth.frac, 4),
                    CAST(ex.exact_distinct AS DOUBLE)) AS kmv_estimate
    FROM ex LEFT JOIN kth USING (col_name)
    """,
    doc="KMV / bottom-k distinct-count sketch (Bar-Yossef et al. 2002; "
    "the theta-sketch base) calibrated against the exact count, for "
    "three profiling columns at once. The Spark side never ranks the "
    "full distinct-hash set: an approx_count_distinct pre-pass sets a "
    "per-group hash cutoff so only ~8k candidate minima reach the rank "
    "window (operators/sketch.py:kmv_distinct) — the oracle ranks "
    "everything (fine at oracle scale) and reads the same k-th hash, "
    "because the cutoff only PRUNES above the k-th value, never "
    "changes it. Groups with <k distinct values fall back to exact.",
    tags=("llm", "sketch"),
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.sketch import kmv_distinct

    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    tagged = (
        events.select(
            F.lit("events.user_id").alias("col_name"),
            F.col("user_id").cast("string").alias("v"),
        )
        .unionAll(
            orders.select(
                F.lit("orders.o_custkey").alias("col_name"),
                F.col("o_custkey").cast("string").alias("v"),
            )
        )
        .unionAll(
            lineitem.select(
                F.lit("lineitem.l_partkey").alias("col_name"),
                F.col("l_partkey").cast("string").alias("v"),
            )
        )
    )
    return kmv_distinct(tagged, k=256)


@register(
    "dedup_prefix_filter_pairs",
    oracle=f"""
    SELECT id_a, id_b, jaccard FROM ({_JACCARD_PAIRS}) j
    WHERE jaccard >= 0.6
    """,
    doc="Exact word-3-gram Jaccard pairs at J >= 0.6 via All-Pairs/"
    "PPJoin PREFIX FILTERING (Bayardo et al. WWW'07; Xiao et al. "
    "WWW'08): under the rarest-token-first global order, only the "
    "first (n - ceil(t*n) + 1) shingles of each doc are indexed and "
    "self-joined — lossless for the threshold, and the high-df hot "
    "shingles that dominate co-occurrence fan-out are exactly the ones "
    "pruned from prefixes, so the skew cap falls out of the algorithm "
    "instead of a max_df heuristic. Candidates are exact-verified by "
    "the shared hash-based pass (operators/dedup.py:"
    "exact_jaccard_verify). The oracle is the plain exact-Jaccard "
    "pair query: identical output, no prefix mechanics to mirror.",
    tags=("llm", "dedup"),
)
def dedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.dedup import prefix_filter_pairs

    docs = load_table(spark, sf_dir, "documents")
    return prefix_filter_pairs(docs, t_num=3, t_den=5)


@register(
    "multimodal_wav_ulaw",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      (24 + doc_id % 40) * (1 + doc_id % 2) AS n,
                      doc_id % 13 = 0 AS corrupt
               FROM documents),
    v AS (SELECT media_id, corrupt,
            [255 - ((media_id * 29 + 11 * k) % 256)
             for k in range(0, n)] AS us
          FROM m),
    w AS (SELECT media_id, corrupt,
            [CASE WHEN u >= 128
                  THEN 132 - (((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)))
                  ELSE (((u % 16) * 8 + 132) * (1 << ((u // 16) % 8))) - 132
             END for u in us] AS vals
          FROM v)
    SELECT media_id,
      CASE WHEN corrupt THEN 'unknown' ELSE 'ulaw' END AS format,
      CAST(CASE WHEN corrupt THEN 0 ELSE len(vals) END AS BIGINT)
        AS n_samples,
      CAST(CASE WHEN corrupt THEN 0
           ELSE list_sum([abs(x) for x in vals]) END AS BIGINT) AS abs_sum,
      CAST(CASE WHEN corrupt THEN 0
           ELSE list_sum([x * x for x in vals]) END AS BIGINT) AS energy,
      CAST(CASE WHEN corrupt THEN 0
           ELSE list_max([abs(x) for x in vals]) END AS BIGINT) AS max_abs
    FROM w
    """,
    doc="G.711 mu-law WAV decode (ITU-T G.711 expansion: u = ~byte, "
    "t = ((mantissa<<3)+132)<<segment, sample = sign ? 132-t : t-132) "
    "+ amplitude stats — the telephony-audio decode leg (call-center/"
    "voicemail corpora arrive companded, peak magnitude 32124, NOT "
    "linear PCM). The fixture writes real RIFF files with fmt tag 7 "
    "and an LCG byte stream; the oracle expands every sample blind "
    "through the same integer formula, so a decoder that forgets the "
    "complement, mis-splits segment/mantissa bits, or assumes PCM "
    "rails mismatches. Every 13th id is truncated mid-header and must "
    "degrade to 'unknown'. operators/audio.py:audio_ulaw_stats",
    tags=("llm", "multimodal"),
)
def multimodal_wav_ulaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.audio import (
        audio_ulaw_stats,
        synthesize_wav_ulaw,
    )

    media = synthesize_wav_ulaw(load_table(spark, sf_dir, "documents"))
    return audio_ulaw_stats(media)


@register(
    "multimodal_bmp_rle",
    oracle="""
    WITH m AS (SELECT doc_id AS i, 16 + doc_id % 9 AS w, 4 + doc_id % 5 AS h,
                      doc_id % 3 AS stripe, doc_id % 11 = 0 AS corrupt
               FROM documents),
    yfs AS (
      SELECT i, w, h, stripe, UNNEST(range(0, h)) AS yf
      FROM m WHERE NOT corrupt
    ),
    rows AS (
      SELECT i, w, h, stripe, yf,
             3 + (i + yf) % 5 AS a,
             (i * 7 + yf) % 256 AS v1,
             (i * 11 + 3 * yf) % 256 AS v2,
             4 + yf % 3 AS ln
      FROM yfs
    ),
    wg AS (
      SELECT *,
        ((3*v1 + 3*i) % 256) + 2*((5*v1 + 2*i) % 256)
          + 3*((7*v1 + i) % 256) AS w1,
        ((3*v2 + 3*i) % 256) + 2*((5*v2 + 2*i) % 256)
          + 3*((7*v2 + i) % 256) AS w2,
        ((3*i) % 256) + 2*((2*i) % 256) + 3*(i % 256) AS w0,
        CASE WHEN stripe = 1
             THEN list_sum([(i*5 + yf + 3*j) % 256 for j in range(0, ln)])
             ELSE 0 END AS absum,
        CASE WHEN stripe = 1
             THEN list_sum([
                    ((3*((i*5 + yf + 3*j) % 256) + 3*i) % 256)
                    + 2*((5*((i*5 + yf + 3*j) % 256) + 2*i) % 256)
                    + 3*((7*((i*5 + yf + 3*j) % 256) + i) % 256)
                  for j in range(0, ln)])
             ELSE 0 END AS abw
      FROM rows
    ),
    agg AS (
      SELECT i,
        CAST(SUM(CASE stripe
          WHEN 0 THEN a*v1 + (w - a)*v2
          WHEN 1 THEN a*v1 + absum + (w - a - ln)*v2
          ELSE a*v1 + (w - a - 2)*v2 END) AS BIGINT) AS idx_sum,
        CAST(SUM((h - yf) * CASE stripe
          WHEN 0 THEN a*w1 + (w - a)*w2
          WHEN 1 THEN a*w1 + abw + (w - a - ln)*w2
          ELSE a*w1 + 2*w0 + (w - a - 2)*w2 END) AS BIGINT) AS weighted_sum
      FROM wg GROUP BY 1
    )
    SELECT m.i AS media_id,
      CASE WHEN m.corrupt THEN 'unknown' ELSE 'bmp' END AS format,
      CAST(CASE WHEN m.corrupt THEN 0 ELSE m.w END AS BIGINT) AS width,
      CAST(CASE WHEN m.corrupt THEN 0 ELSE m.h END AS BIGINT) AS height,
      CAST(COALESCE(agg.idx_sum, 0) AS BIGINT) AS idx_sum,
      CAST(COALESCE(agg.weighted_sum, 0) AS BIGINT) AS weighted_sum
    FROM m LEFT JOIN agg ON agg.i = m.i
    """,
    doc="REAL Windows-BMP BI_RLE8 decode: BITMAPFILEHEADER/"
    "BITMAPINFOHEADER walk, 256-entry BGRX palette read, and the full "
    "RLE8 escape grammar — encoded runs, ABSOLUTE mode (16-bit "
    "word-padded), DELTA skips (zero-filled, the GDI convention), "
    "end-of-line, end-of-bitmap. Rows are stored BOTTOM-UP; the "
    "image-row-weighted palette checksum catches a decoder that skips "
    "the vertical flip, mis-pads absolute segments, or fills deltas "
    "wrong. The fixture cycles all three grammars by id stripe; every "
    "11th id is truncated mid-palette and must degrade to 'unknown'. "
    "The oracle recomputes both checksums blind from the (id, row) "
    "LCGs. operators/bmp.py:bmp_rle_stats",
    tags=("llm", "multimodal"),
)
def multimodal_bmp_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.bmp import (
        bmp_rle_stats,
        synthesize_bmp_rle_media,
    )

    media = synthesize_bmp_rle_media(load_table(spark, sf_dir, "documents"))
    return bmp_rle_stats(media)

r"""LLM-data-pipeline queries, wave 8: distributed linear algebra
(exact Gram matrix) and DSIR importance-resampling weights.

Both follow the repo-wide determinism contract: 6-dp rounding BEFORE
any cross-row reduction, DECIMAL (order-free exact) sums, identical
arithmetic on the DuckDB side — so the driver's value-hash gate is
bit-stable under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "emb_gram_matrix",
    oracle="""
    WITH lng AS (
      SELECT vec_id, unnest(range(len(embedding))) AS dim,
             unnest(embedding::DOUBLE[]) AS x
      FROM embeddings
    )
    SELECT CAST(a.dim AS INTEGER) AS dim_i, CAST(b.dim AS INTEGER) AS dim_j,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           round(CAST(SUM(CAST(round(a.x, 6) AS DECIMAL(10,6))
                          * CAST(round(b.x, 6) AS DECIMAL(10,6))) AS DOUBLE),
                 6) AS gram
    FROM lng a JOIN lng b USING (vec_id)
    WHERE a.dim <= b.dim
    GROUP BY 1, 2
    """,
    doc="Exact upper-triangle Gram matrix (X'X) of the embedding "
    "corpus — the d x d moment matrix behind PCA whitening, covariance "
    "estimation and drift monitors. Scale shape: each row emits its "
    "d*(d+1)/2 outer-product terms MAP-SIDE (array expression, no "
    "self-join), partial aggregation collapses every partition to at "
    "most 2080 groups, so the shuffle is constant-size however many "
    "vectors flow through; products/sums are DECIMAL-exact. The "
    "oracle's self-join formulation is the semantic spec only. "
    "operators/linalg.py:gram_matrix",
    tags=("llm", "similarity", "agg"),
)
def emb_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.linalg import gram_matrix

    return gram_matrix(load_table(spark, sf_dir, "embeddings"))


@register(
    "dsir_importance",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, source,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS w
      FROM documents
    ),
    tb AS (
      SELECT doc_id, source,
             CAST(('0x' || substring(md5(w), 1, 15)) AS BIGINT) % 1024 AS b
      FROM tok
    ),
    bs AS (SELECT b,
             SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS ct_t,
             SUM(CASE WHEN source <> 'src1' THEN 1 ELSE 0 END) AS ct_r
           FROM tb GROUP BY b),
    n AS (SELECT SUM(ct_t) AS nt, SUM(ct_r) AS nr FROM bs),
    lr AS (SELECT b,
             CAST(round(
               ln((ct_t + 1) / CAST(nt + 1024 AS DOUBLE))
             - ln((ct_r + 1) / CAST(nr + 1024 AS DOUBLE)), 6)
             AS DECIMAL(18,6)) AS lr
           FROM bs, n),
    db AS (SELECT doc_id, b, COUNT(*) AS ct FROM tb GROUP BY 1, 2)
    SELECT doc_id, CAST(SUM(ct) AS BIGINT) AS n_tokens,
           CAST(SUM(ct * lr) AS DOUBLE) AS log_weight
    FROM db JOIN lr USING (b)
    GROUP BY doc_id
    """,
    doc="DSIR importance-resampling weight per document (Xie et al. "
    "2023): ln p_target - ln p_raw over md5-hashed unigram buckets "
    "(B=1024, add-1 smoothing), target slice source='src1'. The two "
    "bucket LMs are ONE B-row frame built by a single conditional "
    "groupBy; scoring joins that frame broadcast onto per-doc bucket "
    "counts, so only (doc_id, bucket) int pairs ever shuffle. "
    "operators/selection.py:dsir_importance",
    tags=("llm", "text", "quality"),
)
def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.selection import dsir_importance

    return dsir_importance(load_table(spark, sf_dir, "documents"))


@register(
    "multimodal_audio_zcr",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, 1 + doc_id % 2 AS ch,
                      32 + doc_id % 64 AS ns
               FROM documents WHERE doc_id % 2 = 1),
    s AS (SELECT media_id, ch, ns,
            [((media_id * 13 + 5 * k) % 65536) - 32768
             for k in range(0, ns * ch)] AS x
          FROM m)
    SELECT media_id, 'wav' AS format,
           CAST(ns AS BIGINT) AS n_frames,
           CAST(list_sum(
             [list_sum([CASE WHEN (x[(f - 1) * ch + c + 1] >= 0)
                                  <> (x[f * ch + c + 1] >= 0)
                             THEN 1 ELSE 0 END
                        for f in range(1, ns)])
              for c in range(0, ch)]) AS BIGINT) AS n_zero_cross,
           CAST(list_sum([abs(v) for v in x]) AS BIGINT) AS abs_sum
    FROM s
    """,
    doc="Zero-crossing rate + absolute amplitude from real WAV bytes — "
    "the voiced/unvoiced + silence screen of an audio curation "
    "pipeline. Crossings are per-channel (x >= 0) sign flips between "
    "consecutive frames over the FULL data chunk; the oracle "
    "recomputes from the interleaved fixture LCG blind, so a decoder "
    "that miscounts channels or strides through interleaved samples "
    "mismatches. operators/audio.py:audio_zero_crossings",
    tags=("llm", "multimodal"),
)
def multimodal_audio_zcr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.audio import audio_zero_crossings
    from gmall_flink_210726_spark.operators.multimodal import synthesize_media

    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    return audio_zero_crossings(media.filter(F.col("meta.format") == "wav"))


@register(
    "dedup_containment",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(ws) >= 3
               THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                     for i in range(1, len(ws) - 1)]
               ELSE [] END) AS sh
      FROM (SELECT doc_id,
                   list_filter(string_split(
                     regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),
                     ' '), x -> x <> '') AS ws
            FROM documents)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / least(len(a.sh), len(b.sh)) AS containment,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (len(a.sh) + len(b.sh)
                - len(list_intersect(a.sh, b.sh))) AS jaccard
    FROM g a JOIN g b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh)) > 0
      AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / least(len(a.sh), len(b.sh)) >= 0.8
    """,
    doc="Shingle containment / overlap-coefficient pairs (Broder 1997): "
    "inter / min(|A|,|B|) >= 0.8 — the SUB-document duplication screen "
    "Jaccard misses (boilerplate around a copied article has low "
    "Jaccard, containment ~1). Same co-occurrence-join scale shape as "
    "dedup_ngram_jaccard, registered with the max_df=100 hot-shingle "
    "fan-out cap. operators/dedup.py:containment_pairs",
    tags=("llm", "dedup"),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.dedup import containment_pairs

    return containment_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.8, max_df=100
    )


@register(
    "slice_kl_divergence",
    oracle=r"""
    WITH tok AS (
      SELECT source AS slc,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS w
      FROM documents
    ),
    sw AS (SELECT slc, w, COUNT(*) AS ct_sw FROM tok GROUP BY 1, 2),
    wtot AS (SELECT w, SUM(ct_sw) AS ct_w FROM sw GROUP BY 1),
    stot AS (SELECT slc, SUM(ct_sw) AS n_s, COUNT(*) AS n_vocab
             FROM sw GROUP BY 1),
    n1 AS (SELECT SUM(ct_sw) AS n FROM sw)
    SELECT slc AS slice_key,
           CAST(MIN(n_s) AS BIGINT) AS n_tokens,
           CAST(MIN(n_vocab) AS BIGINT) AS n_vocab,
           round(CAST(SUM(CAST(round(
               ln((CAST(ct_sw AS DOUBLE) / n_s)
                  / (CAST(ct_w AS DOUBLE) / n)), 6)
             AS DECIMAL(18,6)) * ct_sw) AS DOUBLE) / MIN(n_s), 6)
             AS kl_vs_corpus
    FROM sw JOIN wtot USING (w) JOIN stot USING (slc), n1
    GROUP BY slc
    """,
    doc="Per-source KL(p_slice || p_corpus) over unigrams — the "
    "pretraining-mix diagnostic (which sources deviate most from the "
    "blend). One corpus tokenization feeds a (slice, word) count "
    "frame; word/slice totals re-aggregate THAT frame (no second "
    "scan); log-ratios rounded then DECIMAL-weighted for order-free "
    "exact sums; output is |sources| rows. "
    "operators/selection.py:slice_kl_divergence",
    tags=("llm", "text", "quality"),
)
def q_slice_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.selection import slice_kl_divergence

    return slice_kl_divergence(load_table(spark, sf_dir, "documents"))


@register(
    "multimodal_jpeg_progressive",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      1 + doc_id % 5 AS bw, 1 + doc_id % 4 AS bh,
                      doc_id % 4 AS wp, doc_id % 3 AS hp,
                      doc_id % 12 = 0 AS bad
               FROM documents),
    s AS (SELECT media_id, bad, 8 * bw - wp AS w, 8 * bh - hp AS h,
            list_sum([((media_id * 43 + 17 * b) % 256)
                      * (CASE WHEN b % bw = bw - 1 THEN 8 - wp ELSE 8 END)
                      * (CASE WHEN b // bw = bh - 1 THEN 8 - hp ELSE 8 END)
                      for b in range(0, bw * bh)]) AS vsum
          FROM m)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'jpeg' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE w END AS BIGINT) AS width,
           CAST(CASE WHEN bad THEN 0 ELSE h END AS BIGINT) AS height,
           CAST(CASE WHEN bad THEN 0 ELSE w * h END AS BIGINT) AS n_pixels,
           CAST(CASE WHEN bad THEN 0 ELSE vsum END AS BIGINT) AS pixel_sum
    FROM s
    """,
    doc="REAL progressive (SOF2) JPEG decode: four-scan accumulation — "
    "DC first with point transform Al=1, a DC successive-approximation "
    "refinement scan carrying each block's low bit, then two "
    "spectral-selection AC band scans whose all-zero bands are EOBn "
    "runs with appended bits spanning blocks. A decoder that ignores "
    "the point transform, drops the refinement bits, or mis-tracks "
    "EOB runs mismatches; truncated blobs degrade to 'unknown'. The "
    "oracle recomputes pixel sums blind from the block LCG "
    "(crop-weighted). operators/jpeg.py:_make_progressive_jpeg",
    tags=("llm", "multimodal"),
)
def multimodal_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.jpeg import (
        jpeg_pixel_stats,
        synthesize_progressive_jpeg_media,
    )

    media = synthesize_progressive_jpeg_media(
        load_table(spark, sf_dir, "documents")
    )
    return jpeg_pixel_stats(media)


@register(
    "sketch_bloom_calibration",
    oracle="""
    WITH mem AS (SELECT DISTINCT o_custkey AS k FROM orders),
    pr AS (SELECT DISTINCT c_custkey AS k FROM customer),
    mb AS (SELECT DISTINCT
             CAST(('0x' || substring(
               md5(CAST(j AS VARCHAR) || ':' || CAST(k AS VARCHAR)),
               1, 15)) AS BIGINT) % 8192 AS bit
           FROM mem, range(4) AS u(j)),
    pb AS (SELECT k, j,
             CAST(('0x' || substring(
               md5(CAST(j AS VARCHAR) || ':' || CAST(k AS VARCHAR)),
               1, 15)) AS BIGINT) % 8192 AS bit
           FROM pr, range(4) AS u(j)),
    hits AS (SELECT pb.k,
               COUNT(mb.bit) = 4 AS bloom_pass
             FROM pb LEFT JOIN mb USING (bit) GROUP BY pb.k),
    truth AS (SELECT h.k, h.bloom_pass, m.k IS NOT NULL AS is_member
              FROM hits h LEFT JOIN mem m ON h.k = m.k)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_members,
           CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pass,
           CAST(SUM(CASE WHEN bloom_pass AND NOT is_member
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           CAST(SUM(CASE WHEN is_member AND NOT bloom_pass
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg
    FROM truth
    """,
    doc="Bloom-filter membership calibration (fourth of the "
    "sketch-vs-exact family after HLL/CMS/MinHash): 8192-bit filter "
    "over customers-with-orders, probed with ALL customers (TPC-H "
    "leaves ~1/3 of customers order-less — a natural negative set), "
    "k=4 salted md5 bit positions recomputed identically by the "
    "oracle. n_false_neg must be 0 (Bloom filters never false-"
    "negative); n_false_pos is the observed FPR numerator. The filter "
    "is the distinct set-bit frame (<= m rows however many members), "
    "broadcast to the probe side; only (key, bit) ints shuffle. "
    "operators/sketch.py:bloom_filter_calibration",
    tags=("llm", "sketch"),
)
def q_bloom_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.sketch import (
        bloom_filter_calibration,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key")
    )
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key")
    )
    return bloom_filter_calibration(orders, customer)


@register(
    "emb_kmeans_iteration",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    c AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < 8),
    t AS (SELECT e.vec_id, c.cid, e.emb AS emb, c.cemb AS cemb,
                 unnest(range(len(e.emb))) AS i
          FROM e, c),
    d AS (SELECT vec_id, cid,
            SUM((CAST(round(emb[CAST(i AS INTEGER) + 1], 6) AS DECIMAL(10,6))
               - CAST(round(cemb[CAST(i AS INTEGER) + 1], 6) AS DECIMAL(10,6)))
              * (CAST(round(emb[CAST(i AS INTEGER) + 1], 6) AS DECIMAL(10,6))
               - CAST(round(cemb[CAST(i AS INTEGER) + 1], 6) AS DECIMAL(10,6))))
              AS dist
          FROM t GROUP BY 1, 2),
    a AS (SELECT vec_id, cid
          FROM (SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dist, cid) AS rn
                FROM d)
          WHERE rn = 1),
    l AS (SELECT a.cid, unnest(range(len(e.emb))) AS dim,
                 unnest(e.emb) AS x
          FROM a JOIN e USING (vec_id))
    SELECT CAST(cid AS INTEGER) AS cluster_id, CAST(dim AS INTEGER) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           round(CAST(CAST(SUM(CAST(round(x, 6) AS DECIMAL(18,6))) AS DOUBLE)
                      / COUNT(*) AS DOUBLE), 6) AS centroid
    FROM l GROUP BY 1, 2
    """,
    doc="One EXACT Lloyd iteration of k-means (k=8, init = lowest-id "
    "vectors): nearest-centroid assignment on DECIMAL-exact squared "
    "distances (6-dp-rounded elements, ties to the smallest centroid "
    "id), then per-(cluster, dim) exact means. Scale shape: the k x d "
    "codebook is a bounded collect embedded as map-side literals, so "
    "assignment is a pure projection fused into the scan — no "
    "join/explode of the corpus against centroids; the only shuffle "
    "is the <= k*d-group mean agg. A full k-means loop iterates this "
    "operator. operators/embed.py:kmeans_lloyd_iteration",
    tags=("llm", "similarity", "agg"),
)
def q_kmeans_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.embed import kmeans_lloyd_iteration

    return kmeans_lloyd_iteration(load_table(spark, sf_dir, "embeddings"))


@register(
    "multimodal_jpeg_restart",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      2 + doc_id % 4 AS bw, 1 + doc_id % 3 AS bh,
                      doc_id % 3 AS wp, doc_id % 4 AS hp,
                      doc_id % 14 = 0 AS bad
               FROM documents),
    s AS (SELECT media_id, bad, 8 * bw - wp AS w, 8 * bh - hp AS h,
            list_sum([((media_id * 47 + 23 * b) % 256)
                      * (CASE WHEN b % bw = bw - 1 THEN 8 - wp ELSE 8 END)
                      * (CASE WHEN b // bw = bh - 1 THEN 8 - hp ELSE 8 END)
                      for b in range(0, bw * bh)]) AS vsum
          FROM m)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'jpeg' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE w END AS BIGINT) AS width,
           CAST(CASE WHEN bad THEN 0 ELSE h END AS BIGINT) AS height,
           CAST(CASE WHEN bad THEN 0 ELSE w * h END AS BIGINT) AS n_pixels,
           CAST(CASE WHEN bad THEN 0 ELSE vsum END AS BIGINT) AS pixel_sum
    FROM s
    """,
    doc="Baseline JPEG decode WITH DRI restart intervals: an RSTm "
    "marker every 3 MCUs — byte-aligned resynchronization points with "
    "modulo-8 sequence numbers, DC predictor resets, and EOB runs "
    "that never cross the boundary (T.81 E.2.4). Restart markers are "
    "what make huge scans chunk-parallel decodable, so this closes "
    "the last rejected sequential-JPEG feature. A decoder that "
    "forgets the predictor reset gets every post-restart block wrong "
    "and hash-mismatches; the oracle recomputes pixel sums blind from "
    "a fresh LCG. operators/jpeg.py:_make_restart_jpeg",
    tags=("llm", "multimodal"),
)
def multimodal_jpeg_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.jpeg import (
        jpeg_pixel_stats,
        synthesize_restart_jpeg_media,
    )

    media = synthesize_restart_jpeg_media(load_table(spark, sf_dir, "documents"))
    return jpeg_pixel_stats(media)


@register(
    "multimodal_jpeg_420",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      1 + doc_id % 3 AS mw, 1 + doc_id % 2 AS mh,
                      doc_id % 5 AS wp, doc_id % 3 AS hp,
                      doc_id % 15 = 0 AS bad
               FROM documents),
    s AS (SELECT media_id, bad, mw, mh,
                 16 * mw - wp AS w, 16 * mh - hp AS h FROM m),
    t AS (SELECT media_id, bad, w, h,
            list_sum([
              (LEAST(255, GREATEST(0, CAST(floor(
                 ((media_id * 53 + 29 * b) % 256)
                 + CAST(1.402 AS DOUBLE)
                   * (((media_id * 23 + 13 * ((b // (2 * mw) // 2) * mw
                        + (b % (2 * mw)) // 2)) % 256) - 128)
                 + 0.5) AS BIGINT)))
             + LEAST(255, GREATEST(0, CAST(floor(
                 ((media_id * 53 + 29 * b) % 256)
                 - CAST(0.344136 AS DOUBLE)
                   * (((media_id * 19 + 7 * ((b // (2 * mw) // 2) * mw
                        + (b % (2 * mw)) // 2)) % 256) - 128)
                 - CAST(0.714136 AS DOUBLE)
                   * (((media_id * 23 + 13 * ((b // (2 * mw) // 2) * mw
                        + (b % (2 * mw)) // 2)) % 256) - 128)
                 + 0.5) AS BIGINT)))
             + LEAST(255, GREATEST(0, CAST(floor(
                 ((media_id * 53 + 29 * b) % 256)
                 + CAST(1.772 AS DOUBLE)
                   * (((media_id * 19 + 7 * ((b // (2 * mw) // 2) * mw
                        + (b % (2 * mw)) // 2)) % 256) - 128)
                 + 0.5) AS BIGINT))))
              * LEAST(8, w - (b % (2 * mw)) * 8)
              * LEAST(8, h - (b // (2 * mw)) * 8)
              for b in range(0, 4 * mw * mh)]) AS vsum
          FROM s)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'jpeg' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE w END AS BIGINT) AS width,
           CAST(CASE WHEN bad THEN 0 ELSE h END AS BIGINT) AS height,
           CAST(CASE WHEN bad THEN 0 ELSE w * h END AS BIGINT) AS n_pixels,
           CAST(CASE WHEN bad THEN 0 ELSE vsum END AS BIGINT) AS pixel_sum
    FROM t
    """,
    doc="REAL 4:2:0 chroma-subsampled color JPEG decode: Y at 2x2 "
    "sampling with Cb/Cr at 1x1, MCU-interleaved entropy stream "
    "(4 Y blocks + Cb + Cr per MCU), per-component DC predictors, "
    "replicate chroma upsampling, BT.601 YCbCr->RGB with the "
    "floor(x+0.5) rounding convention the oracle reproduces with "
    "plain double arithmetic (Y varies per 8x8 block, chroma per "
    "16x16 MCU, so mis-interleaving or wrong chroma mapping changes "
    "the RGB sums). The oracle recomputes per-Y-block crop-weighted "
    "RGB contributions blind from the LCGs — it never sees a byte. "
    "operators/jpeg.py:_make_jpeg420",
    tags=("llm", "multimodal"),
)
def multimodal_jpeg_420(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.jpeg import (
        jpeg_pixel_stats,
        synthesize_jpeg420_media,
    )

    media = synthesize_jpeg420_media(load_table(spark, sf_dir, "documents"))
    return jpeg_pixel_stats(media)


@register(
    "multimodal_gif_animation",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      3 + doc_id % 9 AS w, 2 + doc_id % 7 AS h,
                      2 + doc_id % 3 AS nf,
                      doc_id % 13 = 0 AS bad
               FROM documents),
    s AS (SELECT media_id, bad, w, h, nf,
            [list_sum([(media_id * 31 + 23 * f + 11 * p) % 4
                       for p in range(0, w * h)])
             for f in range(0, nf)] AS fs
          FROM m)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'gif' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE w END AS BIGINT) AS width,
           CAST(CASE WHEN bad THEN 0 ELSE h END AS BIGINT) AS height,
           CAST(CASE WHEN bad THEN 0 ELSE nf END AS BIGINT) AS n_frames,
           CAST(CASE WHEN bad THEN 0 ELSE list_sum(fs) END AS BIGINT)
             AS idx_sum,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([(f + 1) * fs[f + 1] for f in range(0, nf)])
                END AS BIGINT) AS idx_framesum
    FROM s
    """,
    doc="Multi-frame GIF89a ANIMATION decode: NETSCAPE looping app "
    "extension + per-frame Graphic Control Extensions + one LZW "
    "stream per frame, walked to the trailer. The frame-order-"
    "weighted checksum (sum of (f+1) * frame-index-sum) catches frame "
    "permutation or merged-stream errors that the plain sum cannot; "
    "truncated-mid-animation blobs degrade to 'unknown'. The oracle "
    "recomputes both checksums blind from the (frame, position) LCG. "
    "operators/gif.py:gif_animation_stats",
    tags=("llm", "multimodal"),
)
def multimodal_gif_animation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.gif import (
        gif_animation_stats,
        synthesize_gif_animated_media,
    )

    media = synthesize_gif_animated_media(load_table(spark, sf_dir, "documents"))
    return gif_animation_stats(media)


@register(
    "multimodal_audio_depths",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, 1 + doc_id % 2 AS ch,
                      32 + doc_id % 48 AS ns,
                      CASE doc_id % 3 WHEN 0 THEN 256
                                      WHEN 1 THEN 16777216
                                      ELSE 65536 END AS md
               FROM documents),
    d AS (SELECT media_id, ch, ns, md, md // 2 AS off,
                 ns // 16 AS nw FROM m),
    e AS (SELECT media_id, nw, off,
       [list_sum([CAST(((media_id * 13 + 5 * (wi * 16 * ch + k)) % md)
                       - off AS BIGINT)
                  * CAST(((media_id * 13 + 5 * (wi * 16 * ch + k)) % md)
                         - off AS BIGINT)
                  for k in range(0, 16 * ch)])
        for wi in range(0, nw)] AS en,
       list_sum([CASE WHEN abs(((media_id * 13 + 5 * k) % md) - off)
                           >= off - 1 THEN 1 ELSE 0 END
                 for k in range(0, nw * 16 * ch)]) AS ncl
       FROM d)
    SELECT media_id, 'wav' AS format, CAST(nw AS BIGINT) AS n_windows,
           CAST(list_sum(en) AS BIGINT) AS total_energy,
           CAST(list_max(en) AS BIGINT) AS max_energy,
           CAST(COALESCE(ncl, 0) AS BIGINT) AS n_clipped
    FROM e
    """,
    doc="Windowed audio energy across WAV BIT DEPTHS: 8-bit unsigned "
    "(128-centered), 24-bit two's-complement little-endian, and "
    "16-bit PCM, with depth-scaled clipping rails (2^(bits-1) - 1). "
    "The fixture cycles depth by id with one shared sample LCG, so "
    "the oracle recomputes every integer with ONE formula "
    "parameterized by the modulus — a decoder that mis-assembles "
    "3-byte samples, forgets 8-bit's unsigned center, or scales the "
    "rail wrong mismatches. operators/audio.py:synthesize_wav_depths",
    tags=("llm", "multimodal"),
)
def multimodal_audio_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.audio import (
        audio_window_energy,
        synthesize_wav_depths,
    )

    media = synthesize_wav_depths(load_table(spark, sf_dir, "documents"))
    return audio_window_energy(media, win=16)

r"""LLM-data-pipeline queries, wave 7: real GIF89a decode.

Oracle notes (the multimodal_headers / jpeg contract, queries/llm.py
and llm5.py): the oracle recomputes width/height, palette-index sums
and RGB sums blind from the fixture LCG formulas in (id, position) —
it never sees a byte of the LZW stream. A decoder that mispacks bits,
mishandles a CLEAR reset or the KwKwK case, or misparses any header
offset hash-mismatches. Truncated (corrupt) blobs must degrade to the
'unknown' zeroed row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "multimodal_gif_pixels",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      3 + doc_id % 13 AS w, 2 + doc_id % 9 AS h,
                      doc_id % 11 = 0 AS bad
               FROM documents),
    s AS (SELECT media_id, bad, w, h,
            list_sum([(media_id * 29 + 13 * p) % 4
                      for p in range(0, w * h)]) AS isum,
            list_sum([list_sum([(media_id * 17
                                 + 31 * ((media_id * 29 + 13 * p) % 4)
                                 + 7 * ch) % 256
                                for ch in range(0, 3)])
                      for p in range(0, w * h)]) AS rsum
          FROM m)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'gif' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE w END AS BIGINT) AS width,
           CAST(CASE WHEN bad THEN 0 ELSE h END AS BIGINT) AS height,
           CAST(CASE WHEN bad THEN 0 ELSE w * h END AS BIGINT) AS n_pixels,
           CAST(CASE WHEN bad THEN 0 ELSE isum END AS BIGINT) AS idx_sum,
           CAST(CASE WHEN bad THEN 0 ELSE rsum END AS BIGINT) AS rgb_sum
    FROM s
    """,
    doc="REAL GIF89a decode with stdlib alone: header/LSD/GCT parse, "
    "extension skipping, FULL variable-width LZW (LSB-first packing "
    "across sub-blocks, width growth, CLEAR resets, the KwKwK case — "
    "the fixture uses a real dictionary-building encoder so those "
    "paths execute), palette-index and RGB pixel sums; mid-stream-"
    "truncated blobs degrade to 'unknown'. The oracle recomputes "
    "every value blind from the LCG formulas. "
    "operators/gif.py:gif_pixel_stats",
    tags=("llm", "multimodal"),
)
def multimodal_gif_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.gif import (
        gif_pixel_stats,
        synthesize_gif_media,
    )

    media = synthesize_gif_media(load_table(spark, sf_dir, "documents"))
    return gif_pixel_stats(media)


@register(
    "ann_quantized_topk",
    oracle="""
    WITH l AS (SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
                      unnest(range(len(embedding))) AS d
               FROM embeddings),
    cb AS (SELECT d, MIN(x) AS mn, MAX(x) AS mx FROM l GROUP BY d),
    qv AS (SELECT vec_id, l.d,
                  CASE WHEN mx = mn THEN 0
                       ELSE CAST(round((x - mn) * 255 / (mx - mn), 0) AS BIGINT)
                  END AS q
           FROM l JOIN cb USING (d)),
    probes AS (SELECT * FROM qv WHERE vec_id IN
                 (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 3)),
    dots AS (SELECT p.vec_id AS query_id, qv.vec_id AS neighbor_id,
                    CAST(SUM(p.q * qv.q) AS BIGINT) AS qdot
             FROM probes p JOIN qv ON p.d = qv.d AND qv.vec_id != p.vec_id
             GROUP BY 1, 2),
    rk AS (SELECT query_id, neighbor_id, qdot,
                  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY qdot DESC, neighbor_id ASC) AS INTEGER) AS rank
           FROM dots)
    SELECT query_id, neighbor_id, rank, qdot FROM rk WHERE rank <= 5
    """,
    doc="int8-quantized ANN top-k: the search path the "
    "emb_quantize_int8 codebook exists for — per-dimension min/max "
    "affine quantization applied MAP-SIDE from a literal 64-entry "
    "codebook (corpus scanned once, never exploded for the quantize), "
    "3 broadcast probes, INTEGER dot-product scores so ranking is "
    "bit-deterministic with id tiebreaks. "
    "operators/embed.py:quantized_ann_topk",
    tags=("llm", "similarity", "sketch"),
)
def ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.embed import quantized_ann_topk

    return quantized_ann_topk(load_table(spark, sf_dir, "embeddings"))


@register(
    "sample_systematic_weighted",
    oracle="""
    WITH t AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
                      md5(CAST(doc_id AS VARCHAR)) AS hk
               FROM documents),
    c AS (SELECT doc_id, w,
                 COALESCE(SUM(w) OVER (ORDER BY hk, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS excl
          FROM t)
    SELECT doc_id, w AS weight,
           CAST((excl + w) // 5000 - excl // 5000 AS BIGINT) AS n_hits
    FROM c WHERE (excl + w) // 5000 - excl // 5000 > 0
    """,
    doc="Systematic probability-proportional-to-size sampling: weights "
    "laid on the md5-ordered cumulative line, select docs whose weight "
    "interval crosses a multiple of the step — inclusion probability "
    "~ w/step in EXACT integer arithmetic (Efraimidis-Spirakis "
    "priority sampling needs float pow/ln ordering, which is not "
    "engine-portable; this is the deterministic PPS alternative). "
    "Same distributed prefix-sum plan as shard_binpack: "
    "bucket-partitioned windows + a 256-row broadcast offset table, no "
    "global sort. operators/sketch.py:systematic_weighted_sample",
    tags=("llm", "sketch"),
)
def sample_systematic_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from gmall_flink_210726_spark.operators.sketch import (
        systematic_weighted_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return systematic_weighted_sample(docs, "doc_id", F.col("n_chars"), step=5000)


@register(
    "multimodal_tiff_pixels",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      2 + doc_id % 11 AS w, 1 + doc_id % 7 AS h,
                      doc_id % 9 = 0 AS bad
               FROM documents),
    s AS (SELECT media_id, bad, w, h,
            list_sum([list_sum([(media_id * 23 + 5 * p + 11 * ch) % 256
                                for ch in range(0, 3)])
                      for p in range(0, w * h)]) AS rsum
          FROM m)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'tiff' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE w END AS BIGINT) AS width,
           CAST(CASE WHEN bad THEN 0 ELSE h END AS BIGINT) AS height,
           CAST(CASE WHEN bad THEN 0 ELSE w * h END AS BIGINT) AS n_pixels,
           CAST(CASE WHEN bad THEN 0 ELSE rsum END AS BIGINT) AS rgb_sum
    FROM s
    """,
    doc="REAL baseline TIFF decode with stdlib alone (sixth codec): "
    "II/MM byte-order header (odd ids are written big-endian so both "
    "orders execute on-wire), IFD walk with the TIFF 6.0 4-byte "
    "inline-value rule, multi-strip assembly (RowsPerStrip=2 in the "
    "fixture so the strip loop runs), per-image RGB sums; truncated "
    "blobs degrade to 'unknown'. The oracle recomputes every value "
    "blind from the LCG formulas. operators/tiff.py:tiff_pixel_stats",
    tags=("llm", "multimodal"),
)
def multimodal_tiff_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.tiff import (
        synthesize_tiff_media,
        tiff_pixel_stats,
    )

    media = synthesize_tiff_media(load_table(spark, sf_dir, "documents"))
    return tiff_pixel_stats(media)


@register(
    "multimodal_tiff_packbits",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      4 + doc_id % 9 AS w, 1 + doc_id % 6 AS h,
                      doc_id % 8 = 0 AS bad
               FROM documents),
    s AS (SELECT media_id, bad, w, h,
            list_sum([(media_id * 37 + 11 * (p // 5)) % 256
                      for p in range(0, w * h)]) AS rsum
          FROM m)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'tiff' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE w END AS BIGINT) AS width,
           CAST(CASE WHEN bad THEN 0 ELSE h END AS BIGINT) AS height,
           CAST(CASE WHEN bad THEN 0 ELSE w * h END AS BIGINT) AS n_pixels,
           CAST(CASE WHEN bad THEN 0 ELSE rsum END AS BIGINT) AS rgb_sum
    FROM s
    """,
    doc="PackBits-compressed TIFF decode (TIFF 6.0 §9, the first "
    "compressed-TIFF subset): signed-count byte runs decoded per row "
    "within multi-strip grayscale images, both byte orders on-wire; "
    "run lengths of 5 in the fixture pixel formula force BOTH repeat "
    "runs and literal segments through the codec. Truncated blobs "
    "degrade to 'unknown'; the oracle recomputes every value blind "
    "from the LCG formulas and never sees a compressed byte. "
    "operators/tiff.py:synthesize_tiff_packbits_media",
    tags=("llm", "multimodal"),
)
def multimodal_tiff_packbits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.tiff import (
        synthesize_tiff_packbits_media,
        tiff_pixel_stats,
    )

    media = synthesize_tiff_packbits_media(load_table(spark, sf_dir, "documents"))
    return tiff_pixel_stats(media)


@register(
    "multimodal_gif_interlaced",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      3 + doc_id % 11 AS w, 5 + doc_id % 8 AS h,
                      doc_id % 10 = 0 AS bad
               FROM documents),
    s AS (SELECT media_id, bad, w, h,
            list_sum([(media_id * 41 + 19 * p) % 4
                      for p in range(0, w * h)]) AS isum,
            list_sum([(p + 1) * ((media_id * 41 + 19 * p) % 4)
                      for p in range(0, w * h)]) AS psum
          FROM m)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'gif' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE w END AS BIGINT) AS width,
           CAST(CASE WHEN bad THEN 0 ELSE h END AS BIGINT) AS height,
           CAST(CASE WHEN bad THEN 0 ELSE w * h END AS BIGINT) AS n_pixels,
           CAST(CASE WHEN bad THEN 0 ELSE isum END AS BIGINT) AS idx_sum,
           CAST(CASE WHEN bad THEN 0 ELSE psum END AS BIGINT) AS idx_possum
    FROM s
    """,
    doc="Interlaced GIF89a decode (Appendix E four-pass row order; the "
    "fixture h >= 5 guarantees all four passes carry rows). The "
    "idx_possum column is position-weighted, so a decoder that ignores "
    "the interlace flag or mis-orders the passes produces the right "
    "idx_sum but the wrong checksum and hash-mismatches; the oracle "
    "recomputes both blind from the display-order LCG formula. "
    "operators/gif.py:gif_interlaced_pixel_stats",
    tags=("llm", "multimodal"),
)
def multimodal_gif_interlaced(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.gif import (
        gif_interlaced_pixel_stats,
        synthesize_gif_interlaced_media,
    )

    media = synthesize_gif_interlaced_media(load_table(spark, sf_dir, "documents"))
    return gif_interlaced_pixel_stats(media)

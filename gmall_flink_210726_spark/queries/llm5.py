r"""LLM-data-pipeline queries, wave 5: perceptual image dedup, audio
window features, semantic (embedding) dedup, temperature mixture.

Oracle notes:
- The image/audio oracles recompute EVERY value blind from the
  fixture LCG formulas without seeing a byte (the multimodal_headers
  contract, queries/llm.py) — a decoder that misparses any header
  offset, row stride, or sampling grid hash-mismatches.
- dHash near-dup uses the simhash pigeonhole contract
  (queries/llm.py _SIMHASH_SIG): hamming ≤ 3 with four 16-bit bands
  means the banded Spark join is EXACTLY the exhaustive oracle join.
- Cosines are rounded to 6 decimals on both sides before the
  threshold compare (the ANN/threshold-pairs contract).
- Bit 63 packs via its two's-complement literal, DuckDB refuses
  1 << 63 (the simhash precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_210726_spark.operators.audio import audio_window_energy
from gmall_flink_210726_spark.operators.imagehash import (
    dhash_images,
    dhash_near_pairs,
    synthesize_grouped_bmp,
)
from gmall_flink_210726_spark.operators.multimodal import synthesize_media
from gmall_flink_210726_spark.operators.semdedup import semantic_dedup
from gmall_flink_210726_spark.operators.text2 import temperature_mixture
from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table

# dHash signature recomputed blind from the grouped-BMP fixture LCG
# (operators/imagehash.py:_make_group_bmp): group seed s = id // 4,
# member perturbation p at payload offsets 0 and o2, 8x9 sample grid
# in stored-row space, cell = 3-byte sum, bit = right > left.
_DHASH_SIG = """
    WITH m AS (SELECT doc_id AS media_id, doc_id // 4 AS s, doc_id % 4 AS p
               FROM documents),
    d AS (SELECT media_id, s, p, 4 + s % 29 AS w, 3 + s % 13 AS h FROM m),
    dd AS (SELECT *, ((w * 3 + 3) // 4) * 4 AS rowb FROM d),
    d3 AS (SELECT *, (3 * h // 8) * rowb + (4 * w // 9) * 3 AS o2 FROM dd),
    cells AS (SELECT media_id, w, h,
      [list_sum([(s * 31
                  + 7 * (((j // 9) * h // 8) * rowb + ((j % 9) * w // 9) * 3 + c)
                  + CASE WHEN (((j // 9) * h // 8) * rowb
                               + ((j % 9) * w // 9) * 3 + c) = 0
                            OR (((j // 9) * h // 8) * rowb
                               + ((j % 9) * w // 9) * 3 + c) = o2
                         THEN p ELSE 0 END) % 256
                 for c in range(0, 3)])
       for j in range(0, 72)] AS cl
      FROM d3),
    hsh AS (SELECT media_id, w, h,
      CAST(COALESCE(list_sum(
        [CASE WHEN cl[(b // 8) * 9 + (b % 8) + 2] > cl[(b // 8) * 9 + (b % 8) + 1]
              THEN CASE WHEN b = 63 THEN -9223372036854775808
                        ELSE (CAST(1 AS BIGINT) << b) END
              ELSE 0 END for b in range(0, 64)]), 0) AS BIGINT) AS dhash
      FROM cells)
"""


@register(
    "multimodal_dhash",
    oracle=f"""
    {_DHASH_SIG}
    SELECT media_id, 'bmp' AS format,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height, dhash
    FROM hsh
    """,
    doc="Perceptual image hash (dHash, Krawetz 2013) from real on-wire "
    "BMP bytes: decode, nearest-neighbor 8x9 luminance grid, one bit "
    "per horizontal neighbor comparison, packed int64. The oracle "
    "recomputes the exact 64-bit signature from the grouped-fixture "
    "LCG without seeing the bytes — any header-offset, stride, "
    "sampling or packing error mismatches",
    tags=("llm", "multimodal", "dedup"),
)
def multimodal_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_grouped_bmp(load_table(spark, sf_dir, "documents"))
    return dhash_images(media)


@register(
    "multimodal_dhash_neardup",
    oracle=f"""
    {_DHASH_SIG}
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
    FROM hsh a JOIN hsh b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
    """,
    doc="Image near-dup pairs (dHash hamming ≤ 3) — the multimodal "
    "sibling of dedup_simhash: 4-band pigeonhole equi-join (single "
    "shuffle of 16-byte rows, bounded buckets) + exact popcount "
    "verify. hamming ≤ 3 with 4 bands makes the banded join exactly "
    "the oracle's exhaustive join; the grouped-BMP fixture plants "
    "real near-dup groups (per-member perturbation of two sampled "
    "cells) so the result is non-trivial at every SF",
    tags=("llm", "multimodal", "dedup", "bench"),
)
def multimodal_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_grouped_bmp(load_table(spark, sf_dir, "documents"))
    return dhash_near_pairs(dhash_images(media), max_hamming=3)


@register(
    "multimodal_audio_energy",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, 1 + doc_id % 2 AS ch,
                      32 + doc_id % 64 AS ns
               FROM documents WHERE doc_id % 2 = 1),
    d AS (SELECT *, ns // 16 AS nw FROM m),
    e AS (SELECT media_id, nw,
       [list_sum([CAST(((media_id * 13 + 5 * (wi * 16 * ch + k)) % 65536)
                       - 32768 AS BIGINT)
                  * CAST(((media_id * 13 + 5 * (wi * 16 * ch + k)) % 65536)
                         - 32768 AS BIGINT)
                  for k in range(0, 16 * ch)])
        for wi in range(0, nw)] AS en,
       list_sum([CASE WHEN abs(((media_id * 13 + 5 * k) % 65536) - 32768)
                           >= 32767 THEN 1 ELSE 0 END
                 for k in range(0, nw * 16 * ch)]) AS ncl
       FROM d)
    SELECT media_id, 'wav' AS format, CAST(nw AS BIGINT) AS n_windows,
           CAST(list_sum(en) AS BIGINT) AS total_energy,
           CAST(list_max(en) AS BIGINT) AS max_energy,
           CAST(COALESCE(ncl, 0) AS BIGINT) AS n_clipped
    FROM e
    """,
    doc="Windowed audio energy from real WAV bytes (RIFF walk + numpy "
    "window reshape): per-file window count, total/max per-window "
    "energy, clipped-sample count — the STFT-front-end feature pass "
    "plus the clipping screen. The oracle recomputes every integer "
    "from the WAV fixture LCG blind; stride/interleave/truncation "
    "errors mismatch",
    tags=("llm", "multimodal"),
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    wavs = media.filter(F.col("meta.format") == "wav")
    return audio_window_energy(wavs, win=16)


@register(
    "dedup_semantic",
    oracle="""
    WITH bb AS (SELECT vec_id, embedding AS v,
        list_sum([CASE WHEN embedding[d + 1] > 0 THEN (1 << d) ELSE 0 END
                  for d in range(0, 8)]) AS bucket
        FROM embeddings),
    drp AS (SELECT DISTINCT y.vec_id AS did
            FROM bb x JOIN bb y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
            WHERE round(list_cosine_similarity(x.v, y.v), 6) >= 0.3)
    SELECT b.vec_id, CAST(COALESCE(b.bucket, 0) AS BIGINT) AS bucket,
           d.did IS NULL AS kept
    FROM bb b LEFT JOIN drp d ON b.vec_id = d.did
    """,
    doc="Semantic dedup (SemDeDup, Abbas et al. 2023) with a "
    "deterministic sign-code clustering: a vector is dropped iff a "
    "smaller-id same-bucket vector sits at cosine ≥ 0.3 (round-6 "
    "contract). Quadratic work confined to buckets via the bounded "
    "_bucket_pairs window; only (id, bucket, vector) shuffles once",
    tags=("llm", "dedup", "similarity"),
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return semantic_dedup(
        load_table(spark, sf_dir, "embeddings"), threshold=0.3, sign_bits=8
    )


@register(
    "llm_temperature_mixture",
    oracle="""
    WITH c AS (SELECT lang AS grp, CAST(count(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY lang),
    r AS (SELECT grp, n_docs,
            least(1.0, 0.5 * (SELECT sum(n_docs) FROM c)
                  * pow(n_docs, 0.5)
                  / (SELECT sum(pow(n_docs, 0.5)) FROM c) / n_docs) AS rate
          FROM c),
    u AS (SELECT lang AS grp,
                 CAST(('0x' || substring(md5('mix' || CAST(doc_id AS VARCHAR)),
                                         1, 6)) AS BIGINT)
                 / 16777216.0 AS u
          FROM documents)
    SELECT r.grp AS lang, r.n_docs,
           CAST(sum(CASE WHEN u.u < r.rate THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           round(r.rate, 6) AS rate
    FROM u JOIN r ON u.grp = r.grp
    GROUP BY r.grp, r.n_docs, r.rate
    """,
    doc="Temperature-weighted dataset mixing (Conneau & Lample 2019): "
    "per-language keep rate ∝ n^(alpha-1), membership by the "
    "deterministic md5 uniform of hash_split — stable under reruns "
    "and appends, exactly reproducible by the oracle. Two passes by "
    "design: a lang-only column-pruned count, then a broadcast-rate "
    "map-side filter — corpus rows never shuffle",
    tags=("llm", "text"),
)
def llm_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temperature_mixture(
        load_table(spark, sf_dir, "documents"), alpha=0.5, target_frac=0.5
    )


@register(
    "multimodal_jpeg_pixels",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      1 + doc_id % 4 AS bw, 1 + doc_id % 3 AS bh,
                      doc_id % 5 AS wp, doc_id % 3 AS hp,
                      doc_id % 13 = 0 AS bad
               FROM documents),
    s AS (SELECT media_id, bad, 8 * bw - wp AS w, 8 * bh - hp AS h,
            list_sum([((media_id * 37 + 11 * b) % 256)
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
    doc="REAL baseline JPEG decode with stdlib+numpy alone: marker "
    "walk, canonical Huffman from DHT, byte-stuffed entropy stream, "
    "DC prediction + EXTEND, zigzag dequant, 8x8 IDCT, level shift, "
    "right/bottom crop of partial blocks. DC-only fixture blocks with "
    "quantizer step 8 make every decoded pixel integer-exact, so the "
    "oracle recomputes per-image pixel sums blind from the block LCG "
    "(crop-weighted); truncated corrupt blobs must degrade to "
    "format='unknown'",
    tags=("llm", "multimodal"),
)
def multimodal_jpeg_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.jpeg import (
        jpeg_pixel_stats,
        synthesize_jpeg_media,
    )

    media = synthesize_jpeg_media(load_table(spark, sf_dir, "documents"))
    return jpeg_pixel_stats(media)

r"""LLM-pipeline wave 11: video-container metadata extraction.

The multimodal family's missing modality: video. Frame DECODING stays
behind the `multimodal_frame_sample` stub (no codec libs in the
container), but container-level metadata — duration, track layout,
payload integrity — is pure stdlib byte-walking, and it is the step a
real video ingestion pipeline runs on 100% of files (codec work runs
on the sampled few).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "multimodal_mp4_boxes",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             doc_id % 13 = 0 AS bad,
             CASE doc_id % 3 WHEN 0 THEN 'isom' WHEN 1 THEN 'mp42'
                  ELSE 'avc1' END AS brand,
             1000 * (1 + doc_id % 4) AS timescale,
             500 + doc_id % 1000 AS duration,
             1 + doc_id % 3 AS n_tracks,
             64 + doc_id % 128 AS n
      FROM documents)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'mp4' END AS format,
           CASE WHEN bad THEN '' ELSE brand END AS brand,
           CAST(CASE WHEN bad THEN 0 ELSE timescale END AS BIGINT)
             AS timescale,
           CAST(CASE WHEN bad THEN 0
                ELSE (duration * 1000) // timescale END AS BIGINT)
             AS duration_ms,
           CAST(CASE WHEN bad THEN 0 ELSE n_tracks END AS BIGINT)
             AS n_tracks,
           CAST(CASE WHEN bad THEN 0 ELSE 4 + 2 * n_tracks END AS BIGINT)
             AS n_boxes,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS mdat_bytes,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([(media_id * 17 + 11 * j) % 256
                               for j in range(0, n)]) END AS BIGINT)
             AS payload_sum
    FROM m
    """,
    doc="REAL MP4/ISO-BMFF container parse: synthesize minimal-but-"
    "compliant MP4 blobs (ftyp + moov(mvhd + n x trak(tkhd)) + mdat) "
    "from the document ids, then walk the box tree back with stdlib "
    "struct in an Arrow-batched mapInPandas — brand, mvhd timescale/"
    "duration at their spec offsets, trak count, recursive box count, "
    "and the exact mdat byte sum. The oracle recomputes every field "
    "from the fixture LCG formulas WITHOUT seeing the bytes; every "
    "13th blob is truncated mid-moov and must degrade to 'unknown' "
    "(the corrupt-stripe contract). Container metadata runs on 100%% "
    "of files at ingest; codec work (multimodal_frame_sample) runs on "
    "the sampled few. operators/mp4.py",
    tags=("llm", "multimodal"),
)
def multimodal_mp4_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.mp4 import (
        mp4_box_stats,
        synthesize_mp4_media,
    )

    media = synthesize_mp4_media(load_table(spark, sf_dir, "documents"))
    return mp4_box_stats(media)


@register(
    "multimodal_mp4_samples",
    oracle="""
    WITH m AS (
      SELECT doc_id, doc_id % 11 = 0 AS bad, 1 + doc_id % 3 AS n_tracks
      FROM documents),
    tracks AS (
      SELECT doc_id, bad, UNNEST(range(0, n_tracks)) AS t FROM m
      WHERE NOT bad),
    calc AS (
      SELECT doc_id, t,
             8 + (doc_id + 3 * t) % 13 AS n_s,
             1 + (doc_id + t) % 4 AS a,
             100 + (doc_id * 7 + t) % 50 AS d1,
             200 + (doc_id * 11 + 3 * t) % 60 AS d2
      FROM tracks)
    SELECT doc_id AS media_id,
           CAST(t + 1 AS BIGINT) AS track_id,
           CASE (doc_id + t) % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'mp4a'
                ELSE 'hvc1' END AS codec,
           CAST(n_s AS BIGINT) AS n_samples,
           CAST(a * d1 + (n_s - a) * d2 AS BIGINT) AS duration_ticks,
           CAST(list_sum([50 + (doc_id * 13 + 7 * t + 29 * j) % 100
                          for j in range(0, n_s)]) AS BIGINT)
             AS total_bytes,
           CAST(1 + (doc_id + t) % 3 AS BIGINT) AS n_chunks,
           CAST(1000 * (t + 1) + doc_id % 97 AS BIGINT) AS first_offset
    FROM calc
    UNION ALL
    SELECT doc_id AS media_id, 0 AS track_id, 'unknown' AS codec,
           0 AS n_samples, 0 AS duration_ticks, 0 AS total_bytes,
           0 AS n_chunks, 0 AS first_offset
    FROM m WHERE bad
    """,
    doc="MP4 sample-table (stbl) parse — the frame-sampling entry "
    "point video ingestion needs (VERDICT r7 #6): synthesize blobs "
    "with full trak/mdia/minf/stbl trees, then walk back per-track "
    "stsd codec 4cc, stsz sample count + exact byte extent (cross-"
    "checked against the stts run total), stts duration in ticks, "
    "and stco chunk count + first offset. A frame sampler uses "
    "exactly these tables to seek without decoding. Every 11th blob "
    "is truncated mid-stbl and degrades to one codec='unknown' row. "
    "operators/mp4.py mp4_sample_tables",
    tags=("llm", "multimodal"),
)
def multimodal_mp4_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.mp4 import (
        mp4_sample_tables,
        synthesize_mp4_sampletables,
    )

    media = synthesize_mp4_sampletables(load_table(spark, sf_dir, "documents"))
    return mp4_sample_tables(media)

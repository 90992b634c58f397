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

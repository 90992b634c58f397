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

r"""LLM-pipeline wave 17 (round 12): the HTTP/1.1 message layer real
CommonCrawl records carry (status line, chunked transfer framing,
gzip/deflate content codings peeled before HTML extraction), parquet
split-block bloom filters completing the data-skipping stack, ORC
DECIMAL/TIMESTAMP columns, xerial-snappy Kafka batches, unigram-LM
tokenizer training, and Delta v2 checkpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "multimodal_warc_http",
    oracle="""
    WITH s AS (SELECT doc_id AS media_id,
                      doc_id % 11 = 0 OR doc_id % 13 = 0
                        OR doc_id % 17 = 0 AS bad,
                      doc_id % 5 AS v,
                      string_split(text, ' ') AS ws,
                      1 + doc_id % 3 AS nli
               FROM documents),
    b AS (SELECT media_id, bad, v, nli, len(ws) AS nw,
                 array_to_string(ws[1:len(ws)//2], ' ') AS p1,
                 array_to_string(ws[len(ws)//2+1:len(ws)], ' ') AS p2
          FROM s)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'warc' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE 2 END AS BIGINT) AS n_records,
           CAST(CASE WHEN bad THEN 0 ELSE 1 END AS BIGINT)
             AS n_responses,
           CAST(CASE WHEN bad THEN 0 ELSE 1 END AS BIGINT) AS n_http,
           CAST(CASE WHEN bad THEN 0 ELSE 200 END AS BIGINT)
             AS status_sum,
           CAST(CASE WHEN bad OR v NOT IN (1, 3) THEN 0 ELSE 1
                END AS BIGINT) AS n_chunked,
           CAST(CASE WHEN bad OR v NOT IN (2, 3) THEN 0 ELSE 1
                END AS BIGINT) AS n_gzip,
           CAST(CASE WHEN bad OR v != 4 THEN 0 ELSE 1
                END AS BIGINT) AS n_deflate,
           CASE WHEN bad THEN ''
                ELSE 'Doc ' || CAST(media_id AS VARCHAR) END AS title,
           CAST(CASE WHEN bad THEN 0 ELSE 4 + nli END AS BIGINT)
             AS n_blocks,
           CAST(CASE WHEN bad THEN 0
                ELSE 2 + nw + 3 * nli + 15 END AS BIGINT) AS n_words,
           CASE WHEN bad THEN ''
                ELSE 'Heading ' || CAST(media_id AS VARCHAR) || chr(10)
                     || p1 || chr(10) || p2 || chr(10)
                     || array_to_string(
                          ['item ' || CAST(media_id AS VARCHAR) || ' '
                           || CAST(j AS VARCHAR)
                           for j in range(0, nli)], chr(10))
                     || chr(10)
                     || 'amp & lt < gt > quote " num A hex B link '
                     || CAST(media_id AS VARCHAR) || ' end'
           END AS body_text
    FROM b
    """,
    doc="The REAL CommonCrawl response-record shape (2013+ crawls): "
    "the WARC content block is a full HTTP/1.1 message — status "
    "line, header fields, Transfer-Encoding: chunked framing, "
    "Content-Encoding gzip/deflate — peeled by the RFC 9110/9112 "
    "parser (operators/httpmsg.py) through the hand RFC 1950/1952 "
    "decoders BEFORE HTML extraction. The record's own Content-Type "
    "(application/http; msgtype=response, ISO 28500 §6) is the "
    "dispatch, not a body sniff. Framing rotates doc_id%5: identity+"
    "Content-Length / chunked (with chunk extension + trailer) / "
    "gzip / chunked-over-gzip / deflate(zlib). Three independent lie "
    "stripes, all CRC-clean at the gzip layer below: every 11th id's "
    "page swallows via the unclosed script (HTML), every 13th "
    "declares one chunk a byte bigger than it is (chunked framing "
    "desync), every 17th declares Content-Length one byte long — "
    "each must degrade exactly its stream. The oracle reconstructs "
    "the exact extracted text, counts, and per-variant framing flags "
    "blind from the parquet text column. Per-blob stateless "
    "Arrow-batched mapInPandas; embarrassingly parallel at 100 TB. "
    "operators/httpmsg.py, operators/warc.py warc_http_text",
    tags=("llm", "multimodal", "text"),
)
def multimodal_warc_http(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.warc import (
        synthesize_warc_http_media,
        warc_http_text,
    )

    media = synthesize_warc_http_media(
        load_table(spark, sf_dir, "documents")
    )
    return warc_http_text(media)

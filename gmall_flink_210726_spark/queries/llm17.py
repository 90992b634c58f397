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


@register(
    "multimodal_parquet_bloom",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      2 + doc_id % 3 AS g,
                      doc_id % 7 = 0 OR doc_id % 9 = 0 AS bad,
                      doc_id % 137 AS qr
               FROM documents),
    p AS (SELECT media_id, g, bad,
                 qr < 24 * g AS present,
                 CASE WHEN qr < 24 * g THEN qr % g ELSE -1 END AS fg
          FROM m)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'parquet' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE g END AS BIGINT) AS n_groups,
           CAST(CASE WHEN bad OR NOT present THEN 0 ELSE 1
                END AS BIGINT) AS n_maybe,
           CAST(CASE WHEN bad THEN 0
                     WHEN present THEN g - 1 ELSE g
                END AS BIGINT) AS n_skipped,
           CAST(CASE WHEN bad OR NOT present THEN 0 ELSE 1
                END AS BIGINT) AS n_found,
           CAST(CASE WHEN bad THEN -1 ELSE fg END AS BIGINT)
             AS found_group,
           CAST(CASE WHEN bad OR NOT present THEN 0
                ELSE 1000 * (24 * fg + 276 * g) + 24 * media_id
                END AS BIGINT) AS k_sum_read
    FROM p
    """,
    doc="Parquet split-block bloom filters (SBBF) — the third and "
    "last data-skipping layer beside row-group stats (L192) and the "
    "page index (L222), and the only one that prunes point lookups "
    "when every group spans the full value range (the fixture's "
    "groups deliberately interleave values so min/max could never "
    "skip). From-scratch XXH64 (pinned against Spark's JVM xxhash64 "
    "and the reference vectors), the multiply-shift block reduction "
    "and eight-SALT word masks from the parquet-format spec, and a "
    "hand Thrift-compact WRITER rendering the complete file "
    "(pyarrow 16 cannot write blooms; pyarrow reads the hand file "
    "back bit-exact in tests). The walk opens ONLY maybe-groups. "
    "Trust chain: bloom_filter_length must equal parsed header + "
    "numBytes (every 7th id lies by one byte); false negatives are "
    "a spec violation, so every decoded value of every opened group "
    "re-probes its own filter — every 9th id zeroes one bit of a "
    "non-probe value chosen so the probe key still opens the group "
    "and walks into the lie. No false positives over the driver id "
    "range (measured exhaustively), so the oracle reconstructs "
    "n_maybe/n_skipped/found_group/k_sum_read blind from doc_id. "
    "operators/pqbloom.py read_parquet_bloom_lookup",
    tags=("llm", "multimodal", "lakehouse"),
)
def multimodal_parquet_bloom(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.pqbloom import (
        parquet_bloom_stats,
        synthesize_parquet_bloom_media,
    )

    media = synthesize_parquet_bloom_media(
        load_table(spark, sf_dir, "documents")
    )
    return parquet_bloom_stats(media)

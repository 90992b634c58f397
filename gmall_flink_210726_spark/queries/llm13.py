r"""LLM-pipeline wave 13: web-corpus ingestion front door.

Round-9 brief items: HTML->text extraction (the step C4 runs before
any line rule — every text operator in this repo assumed it already
happened), WARC record framing over the multi-member gzip walk (the
actual CommonCrawl ingestion contract), and the follow-on compositions
that make the ingest path end-to-end real.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "text_html_extract",
    oracle="""
    WITH s AS (SELECT doc_id, doc_id % 11 = 0 AS bad,
                      string_split(text, ' ') AS ws
               FROM documents),
    b AS (SELECT doc_id, bad,
                 array_to_string(ws[1:len(ws)//2], ' ') AS p1,
                 array_to_string(ws[len(ws)//2+1:len(ws)], ' ') AS p2,
                 1 + doc_id % 3 AS nli
          FROM s)
    SELECT doc_id,
           CASE WHEN bad THEN 'unknown' ELSE 'html' END AS format,
           CASE WHEN bad THEN ''
                ELSE 'Doc ' || CAST(doc_id AS VARCHAR) END AS title,
           CAST(CASE WHEN bad THEN 0 ELSE 4 + nli END AS BIGINT)
             AS n_blocks,
           CASE WHEN bad THEN ''
                ELSE 'Heading ' || CAST(doc_id AS VARCHAR) || chr(10)
                     || p1 || chr(10) || p2 || chr(10)
                     || array_to_string(
                          ['item ' || CAST(doc_id AS VARCHAR) || ' '
                           || CAST(j AS VARCHAR)
                           for j in range(0, nli)], chr(10))
                     || chr(10)
                     || 'amp & lt < gt > quote " num A hex B link '
                     || CAST(doc_id AS VARCHAR) || ' end'
           END AS body_text
    FROM b
    """,
    doc="HTML->text extraction — the C4 preprocessing step every "
    "web corpus runs before ANY text operator (Raffel et al. 2020 "
    "§2.2): a real tag-grammar walk (quote-aware tag scan so '>' "
    "inside a quoted attribute does not close the tag; script/style "
    "raw-text elements swallowed to their literal closing tags; "
    "comments dropped whole; block tags cut text blocks, inline tags "
    "vanish without splitting; named + numeric entity decode), "
    "Arrow-batched, zero shuffle — corpus bodies never leave their "
    "partition. Fixtures wrap each document's text in a deterministic "
    "page full of parser traps (JS string containing fake markup, "
    "CSS '>' selector, commented-out tags, uppercase tags, bold wrap "
    "mid-paragraph, entity+anchor paragraph); the oracle reconstructs "
    "the EXACT extracted body text from the parquet text column "
    "blind, so only a grammar-correct extractor matches. Every 11th "
    "page drops its script closing tag (the classic unclosed-script "
    "swallow) and must degrade to 'unknown'. operators/html.py",
    tags=("llm", "text", "multimodal"),
)
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.html import (
        html_extract,
        synthesize_html_docs,
    )

    pages = synthesize_html_docs(load_table(spark, sf_dir, "documents"))
    return html_extract(pages)

r"""LLM-data-pipeline queries, wave 4: paragraph-granularity dedup,
substring-span overlap, BPE pair statistics, CCNet perplexity buckets.

Oracle notes:
- The driver's documents table is single-line (no chr(10) anywhere —
  checked), so the paragraph queries first reshape each doc into
  4-word lines joined by newlines, built with the same list machinery
  on both engines (the boilerplate-chunk precedent, queries/llm3.py).
- Spark keys paragraph/span identity on xxhash64; DuckDB groups on
  the string itself. Outputs carry no hashes, so results agree
  barring a 64-bit collision (the boilerplate_lines contract).
- round(x, 6) on IEEE doubles computed from identical exact operands
  agrees between engines (the w6/unigram precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_210726_spark.operators.text import _words
from gmall_flink_210726_spark.operators.text2 import (
    bpe_pair_counts,
    ccnet_buckets,
    paragraph_dedup,
    span_overlap_pairs,
)
from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table

# Reshape the single-line synthetic docs into multi-paragraph docs:
# 4-word lines joined by newlines — built identically on both engines.
_PARA_WORDS = 4

_ORACLE_RESHAPE = rf"""
    w AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS ws
      FROM documents),
    d AS (
      SELECT doc_id,
             array_to_string(
               list_transform(
                 range(0, CAST(ceil(len(ws) / {_PARA_WORDS}.0) AS INT)),
                 i -> array_to_string(
                        list_slice(ws, i * {_PARA_WORDS} + 1,
                                   i * {_PARA_WORDS} + {_PARA_WORDS}), ' ')),
               chr(10)) AS text2
      FROM w WHERE len(ws) >= 1)
"""


def _reshaped_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = _words("text")
    n_lines = F.ceil(F.size(ws) / F.lit(_PARA_WORDS)).cast("int")
    lines = F.when(
        F.size(ws) >= 1,
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.concat_ws(
                " ", F.slice(ws, i * _PARA_WORDS + 1, _PARA_WORDS)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.where(F.size(ws) >= 1).select(
        "doc_id", F.array_join(lines, "\n").alias("text")
    )


@register(
    "text_paragraph_dedup",
    oracle=f"""
    WITH {_ORACLE_RESHAPE},
    ps AS (SELECT doc_id, string_split(text2, chr(10)) AS ps FROM d),
    px AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(ps) + 1),
                         i -> {{'pos': i - 1, 'p': ps[i]}})) AS u
           FROM ps),
    k AS (SELECT doc_id, u.pos AS pos, u.p AS p FROM px
          WHERE trim(u.p) <> ''),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY trim(p)
                                       ORDER BY doc_id, pos) AS rn
          FROM k),
    keepers AS (
      SELECT doc_id, pos, p FROM r WHERE rn = 1
      UNION ALL
      SELECT doc_id, u.pos AS pos, u.p AS p FROM px WHERE trim(u.p) = ''),
    agg AS (SELECT doc_id, string_agg(p, chr(10) ORDER BY pos) AS dedup_text
            FROM keepers GROUP BY doc_id),
    stats AS (SELECT doc_id,
                     CAST(COUNT(*) AS BIGINT) AS n_paras,
                     CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_dup_paras
              FROM r GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(stats.n_paras, 0) AS n_paras,
           COALESCE(stats.n_dup_paras, 0) AS n_dup_paras,
           COALESCE(agg.dedup_text, '') AS dedup_text
    FROM d
    LEFT JOIN stats USING (doc_id)
    LEFT JOIN agg USING (doc_id)
    """,
    doc="RefinedWeb-rule paragraph dedup (Penedo et al. 2023 §3.2): a "
    "paragraph duplicated across the corpus survives only at its first "
    "(min doc, min position) occurrence; documents are reassembled "
    "with losers removed. Shuffles carry (id, pos, xxhash64) keys and "
    "kept-position arrays — paragraph strings never shuffle; the text "
    "is re-split JVM-side behind the docs table's own id join",
    tags=("llm", "text", "dedup"),
)
def text_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return paragraph_dedup(_reshaped_docs(spark, sf_dir))


@register(
    "text_span_overlap",
    oracle=r"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS ws
      FROM documents),
    g0 AS (SELECT doc_id,
                  unnest(list_transform(range(0, len(ws) - 5),
                         i -> array_to_string(list_slice(ws, i + 1, i + 6),
                                              ' '))) AS span
           FROM w WHERE len(ws) >= 6),
    g AS (SELECT DISTINCT doc_id, span FROM g0),
    el AS (SELECT span FROM g GROUP BY span
           HAVING COUNT(*) > 1 AND COUNT(*) <= 64),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM g a JOIN el USING (span) JOIN g b USING (span)
          WHERE a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared_spans
    FROM p GROUP BY doc_a, doc_b
    """,
    doc="Exact substring-span overlap — the fixed-window approximation "
    "of suffix-array substring dedup (Lee et al. 2022): document pairs "
    "sharing >= 1 distinct 6-word window, with shared-span counts. "
    "Single-shuffle co-occurrence equi-join on 8-byte span hashes "
    "through a df-capped span table (max_df=64 hub cap — the L2/L35 "
    "discipline)",
    tags=("llm", "text", "dedup"),
)
def text_span_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return span_overlap_pairs(
        load_table(spark, sf_dir, "documents"), window_words=6, max_df=64
    )


@register(
    "text_bpe_pairs",
    oracle=r"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS w
      FROM documents),
    cts AS (SELECT w, COUNT(*) AS ct FROM tok GROUP BY w),
    p AS (SELECT ct,
                 unnest(list_transform(range(1, length(w)),
                        i -> substring(w, i, 2))) AS pair
          FROM cts WHERE length(w) >= 2)
    SELECT pair, CAST(SUM(ct) AS BIGINT) AS pair_count
    FROM p GROUP BY pair
    """,
    doc="BPE first-merge pair statistics (Sennrich et al. 2016 §3.2): "
    "corpus-weighted adjacent character-pair frequencies. Two-level "
    "agg — the corpus collapses to the word-frequency vocabulary "
    "first, so the pair explode runs over |V| distinct words, not "
    "|corpus| tokens",
    tags=("llm", "text"),
)
def text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_pair_counts(load_table(spark, sf_dir, "documents"))


@register(
    "text_ccnet_buckets",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS w
      FROM documents),
    cts AS (SELECT w, COUNT(*) AS ct FROM tok GROUP BY w),
    n AS (SELECT SUM(ct) AS n_total FROM cts),
    lp AS (
      SELECT tok.doc_id,
             CAST(round(ln(CAST(ct AS DOUBLE) / n_total), 6)
                  AS DECIMAL(18,6)) AS lp
      FROM tok JOIN cts USING (w), n),
    sc AS (SELECT doc_id,
                  round(CAST(CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS DOUBLE),
                        6) AS avg_logprob
           FROM lp GROUP BY doc_id),
    b AS (SELECT round(quantile_cont(avg_logprob, 2.0/3.0), 6) AS t_head,
                 round(quantile_cont(avg_logprob, 1.0/3.0), 6) AS t_mid
          FROM sc)
    SELECT doc_id, avg_logprob,
           CASE WHEN avg_logprob >= t_head THEN 'head'
                WHEN avg_logprob >= t_mid THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM sc, b
    """,
    doc="CCNet head/middle/tail perplexity terciles (Wenzek et al. "
    "2020 §3) over the corpus-fit unigram LM score. Boundaries are "
    "two exact order statistics collected as bounded driver scalars "
    "and applied map-side — no global ntile window single-task funnel "
    "at 100 TB",
    tags=("llm", "text"),
)
def text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ccnet_buckets(load_table(spark, sf_dir, "documents"))

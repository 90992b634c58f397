"""LLM-data-pipeline queries, wave 3: C4-style line cleaning, PII
redaction, and cross-document boilerplate detection — the remaining
corpus-cleaning surface (Raffel et al. 2020 §2.2 public rules).

Oracle notes:
- Every regex used is ASCII-only and restricted to constructs Java
  (Spark) and RE2 (DuckDB) implement identically: literal classes,
  \\d, \\b, bounded repeats. DuckDB regexp_replace needs the 'g'
  flag to match Spark's replace-all default.
- Spark ``split(text, '\\n')`` keeps trailing empty strings (limit
  -1), as does DuckDB ``string_split`` — line counts agree.
- boiler_pct: both engines compute the same IEEE double division and
  truncate toward zero (Spark cast-to-long / DuckDB FLOOR-then-cast;
  values are non-negative so they coincide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gmall_flink_210726_spark.operators.text import (
    PII_EMAIL,
    PII_IPV4,
    PII_PHONE,
    boilerplate_lines,
    c4_line_filter,
    pii_scrub,
)
from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table

_C4_KEPT_LINES = r"""
      list_filter(string_split(text, chr(10)),
        l -> list_contains(['.', '!', '?', '"'], right(trim(l), 1))
             AND len(list_filter(string_split_regex(trim(l), '\s+'),
                                 x -> x <> '')) >= 5)
"""


@register(
    "text_c4_line_filter",
    oracle=f"""
    WITH k AS (
      SELECT doc_id, text, {_C4_KEPT_LINES} AS kept
      FROM documents)
    SELECT doc_id,
           CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept_lines,
           COALESCE(array_to_string(kept, chr(10)), '') AS clean_text,
           (NOT (contains(text, '{{') OR contains(lower(text), 'lorem ipsum'))
            AND len(kept) > 0) AS c4_kept
    FROM k
    """,
    doc="C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep "
    "lines ending in terminal punctuation with ≥5 words; drop pages "
    "containing a curly brace or 'lorem ipsum'. Pure JVM higher-order "
    "array functions over one split — a single fused map-stage "
    "projection, no shuffle, no Python",
    tags=("llm", "text"),
)
def text_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return c4_line_filter(load_table(spark, sf_dir, "documents"))


@register(
    "text_pii_scrub",
    oracle=f"""
    WITH s1 AS (
      SELECT doc_id, text,
             regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g') AS em
      FROM documents),
    s2 AS (SELECT *, regexp_replace(em, '{PII_IPV4}', '<IP>', 'g') AS ipm
           FROM s1)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(em, '{PII_IPV4}')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(ipm, '{PII_PHONE}')) AS BIGINT) AS n_phones,
           regexp_replace(ipm, '{PII_PHONE}', '<PHONE>', 'g') AS scrubbed,
           CAST(length(regexp_replace(ipm, '{PII_PHONE}', '<PHONE>', 'g'))
                AS BIGINT) AS n_scrubbed_chars
    FROM s2
    """,
    doc="PII redaction: mask emails, IPv4 addresses, and NXX-XXXX "
    "phone fragments with fixed tags, counting each stage's "
    "replacements against the previous stage's text (an IP inside an "
    "email hostname counts once as email). One JVM regex projection — "
    "no shuffle; patterns are Java/RE2-portable by construction",
    tags=("llm", "text"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pii_scrub(load_table(spark, sf_dir, "documents"))


@register(
    "text_boilerplate_lines",
    oracle=r"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS ws
      FROM documents),
    ch AS (
      SELECT doc_id,
             unnest(list_transform(
               range(0, CAST(ceil(len(ws) / 3.0) AS INT)),
               i -> array_to_string(list_slice(ws, i * 3 + 1, i * 3 + 3), ' ')
             )) AS chunk
      FROM w WHERE len(ws) >= 1),
    df AS (SELECT chunk, COUNT(DISTINCT doc_id) AS chunk_df
           FROM ch GROUP BY chunk),
    pd AS (SELECT ch.doc_id,
                  CAST(COUNT(*) AS BIGINT) AS n_chunks,
                  CAST(SUM(CASE WHEN df.chunk_df > 1 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_boiler_chunks
           FROM ch JOIN df USING (chunk) GROUP BY ch.doc_id)
    SELECT doc_id, n_chunks, n_boiler_chunks,
           CAST(FLOOR(100 * n_boiler_chunks / n_chunks) AS BIGINT) AS boiler_pct
    FROM pd
    """,
    doc="Cross-document boilerplate detection (the C4 'line seen on "
    "more than one page' rule at 3-word-chunk granularity): explode "
    "chunks, count document frequency corpus-wide (map-side partial "
    "combine), join df-counts back per doc. Empty/whitespace-only "
    "docs have no chunks and are absent from the output",
    tags=("llm", "text"),
)
def text_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    return boilerplate_lines(load_table(spark, sf_dir, "documents"))


@register(
    "text_unigram_logprob",
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
      FROM tok JOIN cts USING (w), n)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(lp) AS DOUBLE) AS sum_logprob,
           CAST(CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_logprob
    FROM lp GROUP BY doc_id
    """,
    doc="Corpus-derived unigram LM score per doc — the perplexity-proxy "
    "quality signal (KenLM stand-in): unigram MLE fit on the corpus in "
    "one token-count agg, each doc scored by mean token log-prob. "
    "Per-token ln rounded to 6 dp and summed as DECIMAL (order-free "
    "exact), mean divided as doubles — deterministic on both engines. "
    "The corpus is scanned/exploded physically ONCE: the per-(doc, "
    "token) aggregate is eagerly checkpointed and feeds the vocab "
    "counts, the corpus-size scalar, and the score join-back; the "
    "vocabulary join is a plain equi-join, never a corpus-vocab "
    "broadcast",
    tags=("llm", "text"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.text import unigram_logprob_score

    return unigram_logprob_score(load_table(spark, sf_dir, "documents"))


# URL-screening fixture — the driver's documents table contains no URLs
# (checked), so the C4/RefinedWeb step-1 rule is pinned on a VALUES
# fixture built identically on both engines (same pattern as the CJK
# tokenizer fixture). Pages cover: blocked domain, allowed domain,
# mixed case, explicit port, deep path, multiple URLs, no URL.
_URL_PAGES = (
    (1, "read this at https://spam.example.com/offer now"),
    (2, "docs live at https://docs.python.org/3/library/ and are good"),
    (3, "mirror HTTPS://SPAM.EXAMPLE.COM:8443/deep/path?x=1 plus http://ok.org"),
    (4, "two bad http://spam.example.com/a http://casino.test/b pages"),
    (5, "a page with no links at all"),
    (6, "edge http://sub.spam.example.com not blocked (exact-domain rule)"),
)
_URL_BLOCKLIST = ("spam.example.com", "casino.test")
_URL_VALUES = ", ".join(
    "(" + str(i) + ", '" + t.replace("'", "''") + "')" for i, t in _URL_PAGES
)
_URL_BLOCK_SQL = ", ".join(f"'{d}'" for d in _URL_BLOCKLIST)


@register(
    "text_url_filter",
    oracle=f"""
    SELECT doc_id,
           CAST(len(urls) AS BIGINT) AS n_urls,
           CAST(len(list_filter(urls,
                u -> list_contains([{_URL_BLOCK_SQL}],
                       lower(regexp_extract(u, '(?i:https?)://([A-Za-z0-9.-]+)', 1)))))
                AS BIGINT) AS n_blocked,
           len(list_filter(urls,
                u -> list_contains([{_URL_BLOCK_SQL}],
                       lower(regexp_extract(u, '(?i:https?)://([A-Za-z0-9.-]+)', 1)))))
             = 0 AS url_kept
    FROM (SELECT doc_id,
                 regexp_extract_all(text,
                   '(?i:https?)://[A-Za-z0-9.-]+(?::[0-9]+)?(?:/[^\\s]*)?') AS urls
          FROM (VALUES {_URL_VALUES}) AS t(doc_id, text))
    """,
    doc="C4/RefinedWeb URL screening: extract http(s) URLs, lowercase "
    "the domain, count blocklist hits, keep pages with zero — one "
    "fused JVM regex/array projection (pure map stage at 100 TB). "
    "Exact-domain match by design: subdomains of a blocked domain "
    "are not blocked (page 6 pins this). Fixture VALUES-built on "
    "both engines; patterns Java+RE2-portable",
    tags=("llm", "text"),
)
def text_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.text import url_filter

    docs = spark.sql(f"SELECT * FROM (VALUES {_URL_VALUES}) AS t(doc_id, text)")
    return url_filter(docs, _URL_BLOCKLIST)


_URL_BLOCK_VALUES = ", ".join(f"('{d}')" for d in _URL_BLOCKLIST)


@register(
    "text_url_filter_table",
    oracle=f"""
    WITH pages AS (SELECT doc_id, text FROM (VALUES {_URL_VALUES}) AS t(doc_id, text)),
    block AS (SELECT DISTINCT domain FROM (VALUES {_URL_BLOCK_VALUES}) AS b(domain)),
    d AS (
      SELECT doc_id,
             lower(regexp_extract(u.url, '(?i:https?)://([A-Za-z0-9.-]+)', 1)) AS dom
      FROM pages,
           unnest(regexp_extract_all(text,
             '(?i:https?)://[A-Za-z0-9.-]+(?::[0-9]+)?(?:/[^\\s]*)?')) AS u(url)),
    agg AS (
      SELECT p.doc_id,
             COUNT(d.dom) AS n_urls,
             COUNT(b.domain) AS n_blocked
      FROM pages p
      LEFT JOIN d ON p.doc_id = d.doc_id
      LEFT JOIN block b ON d.dom = b.domain
      GROUP BY p.doc_id)
    SELECT doc_id,
           CAST(n_urls AS BIGINT) AS n_urls,
           CAST(n_blocked AS BIGINT) AS n_blocked,
           n_blocked = 0 AS url_kept
    FROM agg
    """,
    doc="URL screening with the blocklist as a TABLE — the deployment "
    "shape once the list outgrows a plan literal: exploded lowercased "
    "domains left-join the (deduped, broadcast) blocklist table, then "
    "re-aggregate per doc. Same output contract and fixture as "
    "text_url_filter; the corpus side is never shuffled for the join, "
    "only bare (id, domain) rows re-aggregate (plan-tested)",
    tags=("llm", "text"),
)
def text_url_filter_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.text import url_filter_table

    docs = spark.sql(f"SELECT * FROM (VALUES {_URL_VALUES}) AS t(doc_id, text)")
    block = spark.sql(
        f"SELECT * FROM (VALUES {_URL_BLOCK_VALUES}) AS b(domain)"
    )
    return url_filter_table(docs, block)

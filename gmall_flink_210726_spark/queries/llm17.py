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
    "each must degrade exactly its stream. Charset stripes rotate "
    "doc_id%4 — utf-8 declared / cp1252 declared / UTF-16-BOM with "
    "no charset param / cp1252 bytes under a LYING charset=utf-8 — "
    "and every variant must extract the SAME non-ASCII marker text "
    "through the decode chain (HTTP charset -> BOM -> meta -> "
    "strict-UTF-8 -> cp1252; operators/charset.py decode_web_bytes). "
    "The oracle reconstructs "
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


@register(
    "multimodal_orc_decimal",
    oracle="""
    WITH m AS (SELECT doc_id AS i, 1500 + (doc_id % 4) * 400 AS n,
                      doc_id % 23 = 0 AS bad
               FROM documents),
    r AS (SELECT i, n, bad, unnest(range(0, n)) AS r FROM m),
    v AS (SELECT i, n, bad,
                 (i * 37 + r * 131) % 100000 - 50000 AS mant,
                 1577836800 + (i + r * 7) % 86400 AS sec,
                 CASE r % 5 WHEN 0 THEN 0 WHEN 1 THEN 500000000
                            WHEN 2 THEN 123456789 WHEN 3 THEN 1000
                            ELSE 250000000 END AS ns
          FROM r),
    a AS (SELECT i, n, bad,
                 SUM(mant) AS dsum, MIN(mant) AS dmin,
                 MAX(mant) AS dmax,
                 MIN(sec * 1000 + ns // 1000000) AS tmin,
                 MAX(sec * 1000 + ns // 1000000) AS tmax,
                 SUM(ns) AS nsum
          FROM v GROUP BY i, n, bad)
    SELECT i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'orc' END AS format,
           CASE WHEN bad THEN ''
                ELSE ['none','zlib','snappy','zstd',
                      'lz4'][1 + i % 5]
           END AS compression,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_rows,
           CAST(CASE WHEN bad THEN 0 ELSE 2 END AS BIGINT) AS scale,
           CAST(CASE WHEN bad THEN 0 ELSE dsum END AS BIGINT)
             AS dec_sum_mant,
           CAST(CASE WHEN bad THEN 0 ELSE dmin END AS BIGINT)
             AS dec_min_mant,
           CAST(CASE WHEN bad THEN 0 ELSE dmax END AS BIGINT)
             AS dec_max_mant,
           CAST(CASE WHEN bad THEN 0 ELSE tmin END AS BIGINT)
             AS ts_min_ms,
           CAST(CASE WHEN bad THEN 0 ELSE tmax END AS BIGINT)
             AS ts_max_ms,
           CAST(CASE WHEN bad THEN 0 ELSE nsum END AS BIGINT)
             AS ns_sum
    FROM a
    """,
    doc="ORC DECIMAL and TIMESTAMP columns — what real warehouse ORC "
    "mostly holds (VERDICT r11 missing #4): DECIMAL DIRECT_V2 DATA "
    "is one unbounded zigzag-varint mantissa per value with an RLEv2 "
    "SECONDARY scale stream (every scale must equal the declared "
    "type scale, exact stream consumption); TIMESTAMP DATA is RLEv2 "
    "seconds from the ORC 2015-01-01 epoch with the SECONDARY "
    "trailing-zero nano encoding (bottom 3 bits = removed zeros - 1, "
    "pinned against the real writer; the nanos cycle exercises all "
    "trailing-zero classes incl. the 123456789 no-trim case). "
    "Books cross-checked both ways: DecimalStatistics min/max/sum "
    "STRINGS must equal the decoded values under ORC's trailing-"
    "zero-trimmed rendering, TimestampStatistics minimumUtc/"
    "maximumUtc milliseconds vs decoded. Compression rotates all "
    "five codecs through the hand decoders; every 23rd id flips a "
    "data byte (codec grammar / varint grammar / books must catch). "
    "Fixtures are REAL pyarrow.orc writes. operators/orc2.py "
    "read_orc_dec_ts",
    tags=("llm", "multimodal", "lakehouse"),
)
def multimodal_orc_decimal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.orc2 import (
        orc_dec_stats,
        synthesize_orc_dec_media,
    )

    media = synthesize_orc_dec_media(
        load_table(spark, sf_dir, "documents")
    )
    return orc_dec_stats(media)


@register(
    "multimodal_orc_rowindex",
    oracle="""
    WITH m AS (SELECT doc_id AS i, 3000 + 500 * (doc_id % 5) AS n,
                      doc_id % 19 = 0 OR doc_id % 29 = 0 AS bad
               FROM documents),
    p AS (SELECT i, n, bad, (n + 999) // 1000 AS nst,
                 (i * 11) % (CASE WHEN i % 19 = 0 THEN 230
                             ELSE 280 END) AS lor,
                 i % ((n + 999) // 1000) AS starg
          FROM m),
    w AS (SELECT i, n, bad, nst,
                 300 * starg + lor AS lo,
                 300 * starg + lor + 20 AS hi
          FROM p),
    r AS (SELECT i, n, bad, nst, lo, hi, unnest(range(0, n)) AS r
          FROM w),
    v AS (SELECT i, lo, hi, r // 1000 AS k,
                 300 * (r // 1000) + (i + 7 * r) % 251 AS val
          FROM r),
    sk AS (SELECT i, k, MIN(val) AS kmin, MAX(val) AS kmax
           FROM v GROUP BY i, k),
    sel AS (SELECT sk.i, sk.k
            FROM sk JOIN w ON sk.i = w.i
            WHERE NOT (kmin > hi OR kmax < lo)),
    mt AS (SELECT v.i, COUNT(*) AS nm,
                  CAST(SUM(val) AS BIGINT) AS ms
           FROM v JOIN sel ON v.i = sel.i AND v.k = sel.k
           WHERE val BETWEEN lo AND hi
           GROUP BY v.i),
    ns AS (SELECT i, COUNT(*) AS nsel FROM sel GROUP BY i)
    SELECT w.i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'orc' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_rows,
           CAST(CASE WHEN bad THEN 0 ELSE nst END AS BIGINT)
             AS n_strides,
           CAST(CASE WHEN bad THEN 0 ELSE COALESCE(nsel, 0)
                END AS BIGINT) AS n_sel,
           CAST(CASE WHEN bad THEN 0 ELSE nst - COALESCE(nsel, 0)
                END AS BIGINT) AS n_skipped,
           CAST(CASE WHEN bad THEN 0 ELSE COALESCE(nm, 0)
                END AS BIGINT) AS n_match,
           CAST(CASE WHEN bad THEN 0 ELSE COALESCE(ms, 0)
                END AS BIGINT) AS match_sum
    FROM w LEFT JOIN ns ON w.i = ns.i
           LEFT JOIN mt ON w.i = mt.i
    """,
    doc="ORC stripe ROW_INDEX — the in-stripe skipping layer, ORC's "
    "twin of the parquet page index L222 (VERDICT r11 missing #4): "
    "RowIndexEntry every rowIndexStride=1000 rows carrying seek "
    "POSITIONS (byte offset of the RLEv2 run containing the row, "
    "values to skip inside it) plus per-stride IntegerStatistics. "
    "The walk re-derives every run boundary from its own decode and "
    "demands EVERY entry's positions land exactly on one; stride "
    "selection under the per-doc [lo, lo+20] window uses the "
    "claimed stats, and every SELECTED stride's decoded min/max "
    "must equal the claimed bounds. Values give stride k the "
    "disjoint band [300k, 300k+250] so min/max stats genuinely "
    "discriminate (the window chases stride i %% n_strides; the "
    "280-cycle tail selects nothing — a pure-skip read). Lies are "
    "length-preserving varint splices into the REAL pyarrow file: "
    "every 19th id inflates the first SELECTED stride's claimed max "
    "(a pruned stride could lie forever), every 29th bumps entry "
    "1's seek byte offset. One entry per stride enforced, stream "
    "lengths must tile the index+data regions exactly. "
    "operators/orc2.py read_orc_rowindex",
    tags=("llm", "multimodal", "lakehouse"),
)
def multimodal_orc_rowindex(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.orc2 import (
        orc_rowindex_stats,
        synthesize_orc_rowindex_media,
    )

    media = synthesize_orc_rowindex_media(
        load_table(spark, sf_dir, "documents")
    )
    return orc_rowindex_stats(media)


def _l2sql(x: str) -> str:
    """DuckDB fixed-point log2 — the same integer square-and-compare
    loop as operators/unigram.py log2fix (bit-identical)."""
    n = f"(length(printf('%b', {x})) - 1)"
    init = f"((({x} * 65536) // (1 << {n})) << 32)"
    fold = (
        f"list_reduce(list_prepend({init}, range(0, 16)), "
        "(s, i) -> CASE WHEN (((s >> 32) * (s >> 32)) >> 16) >= 131072 "
        "THEN ((((s >> 32) * (s >> 32)) >> 17) << 32) "
        "+ ((s & 4294967295) * 2 + 1) "
        "ELSE ((((s >> 32) * (s >> 32)) >> 16) << 32) "
        "+ ((s & 4294967295) * 2) END)"
    )
    return f"({n} * 65536 + ({fold} & 4294967295))"


def _unigram_oracle(mode: str) -> str:
    """The full seed + 2-round hard-EM replay in DuckDB SQL; ``mode``
    selects the train (vocab) or encode (per-doc) tail."""
    head = r"""
    WITH wf AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS ct FROM (
        SELECT substr(x, 1, 8) AS w FROM (
          SELECT unnest(list_filter(
            string_split_regex(lower(text), '\s+'), x -> x != '')) AS x
          FROM documents))
      GROUP BY w),
    sub AS (
      SELECT substr(w, pos, l) AS piece, CAST(SUM(ct) AS BIGINT) AS u
      FROM wf, unnest(range(1, 9)) AS t1(pos),
               unnest(range(1, 5)) AS t2(l)
      WHERE pos + l - 1 <= length(w)
      GROUP BY 1),
    topv AS (SELECT piece, u FROM sub ORDER BY u DESC, piece LIMIT 96),
    chars AS (SELECT piece, u FROM sub WHERE length(piece) = 1),
    v0 AS (SELECT piece, MAX(u) AS u
           FROM (SELECT * FROM topv UNION ALL SELECT * FROM chars)
           GROUP BY piece),
    seg AS (
      SELECT w, ct, mask,
             list_transform(range(1, length(cuts)),
               t -> substr(w, cuts[t] + 1, cuts[t+1] - cuts[t]))
               AS pieces
      FROM (
        SELECT w, ct, mask,
               list_concat(list_concat([0],
                 list_filter(range(1, length(w)),
                   j -> ((mask >> (j - 1)) & 1) = 1)),
                 [length(w)]) AS cuts
        FROM (SELECT w, ct,
                     unnest(range(0, (1::BIGINT << (length(w) - 1))))
                       AS mask
              FROM wf)))"""
    round_tpl = """,
    c{k} AS (SELECT piece, {lt} - {lu} AS cost
             FROM v{k}, (SELECT CAST(SUM(u) AS BIGINT) AS T
                         FROM v{k}) t),
    sc{k} AS (
      SELECT q.w, q.mask, COUNT(*) AS np, COUNT(c.cost) AS nv,
             CAST(SUM(c.cost) AS BIGINT) AS score
      FROM (SELECT w, mask, unnest(pieces) AS piece FROM seg) q
      LEFT JOIN c{k} c ON c.piece = q.piece
      GROUP BY q.w, q.mask),
    win{k} AS (
      SELECT w, mask FROM (
        SELECT w, mask, row_number() OVER (
          PARTITION BY w ORDER BY score, np, mask) AS rn
        FROM sc{k} WHERE nv = np) WHERE rn = 1)"""
    usage_tpl = """,
    ur{k} AS (
      SELECT piece, CAST(SUM(ct) AS BIGINT) AS u
      FROM (SELECT s.ct, unnest(s.pieces) AS piece
            FROM seg s JOIN win{k} x
              ON s.w = x.w AND s.mask = x.mask)
      GROUP BY piece),
    v{k1} AS (
      SELECT piece, u FROM ur{k} WHERE length(piece) > 1
      UNION ALL
      SELECT ch.piece, COALESCE(u2.u, 1) AS u
      FROM chars ch LEFT JOIN ur{k} u2 ON u2.piece = ch.piece)"""
    sql = head
    for k in range(2):
        sql += round_tpl.format(
            k=k, lt=_l2sql("t.T"), lu=_l2sql("u")
        ) + usage_tpl.format(k=k, k1=k + 1)
    # the post-training cost table and (for encode) a final pass
    sql += round_tpl.format(k=2, lt=_l2sql("t.T"), lu=_l2sql("u"))
    if mode == "train":
        return sql + """
    SELECT v2.piece AS piece, v2.u AS usage, c2.cost AS cost
    FROM v2 JOIN c2 ON c2.piece = v2.piece
    """
    return sql + r""",
    pw AS (
      SELECT z.w, CAST(COUNT(*) AS BIGINT) AS w_tokens,
             CAST(SUM(CASE WHEN length(piece) > 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS w_multi,
             CAST(SUM(length(piece)) AS BIGINT) AS w_chars
      FROM (SELECT s.w, unnest(s.pieces) AS piece
            FROM seg s JOIN win2 x
              ON s.w = x.w AND s.mask = x.mask) z
      GROUP BY z.w),
    pairs AS (
      SELECT doc_id, substr(x, 1, 8) AS w FROM (
        SELECT doc_id, unnest(list_filter(
          string_split_regex(lower(text), '\s+'), x -> x != '')) AS x
        FROM documents))
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(w_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(w_multi) AS BIGINT) AS n_multi,
           CAST(SUM(w_chars) AS BIGINT) AS n_chars
    FROM pairs JOIN pw ON pw.w = pairs.w
    GROUP BY doc_id
    """


@register(
    "text_unigram_train",
    oracle=_unigram_oracle("train"),
    doc="SentencePiece-style unigram-LM tokenizer TRAINING (Kudo "
    "2018) — completes the tokenizer-training trio beside bpe_train "
    "(L185) and WordPiece: seed vocabulary from frequent substrings "
    "(top-96 of all length-1..4 substrings of the frequency-weighted "
    "distinct words, plus every character for coverage), then two "
    "hard-EM (Viterbi-EM) rounds: E re-segments every distinct word "
    "under the current piece costs, M recomputes costs from "
    "frequency-weighted usage, pruning drops unused multi-char "
    "pieces while characters keep a usage floor. Every arithmetic "
    "step is integer-deterministic so the oracle replays EM EXACTLY "
    "in SQL: costs are fixed-point base-2 surprisals computed by an "
    "integer square-and-compare mantissa loop (bit-identical in "
    "Python, a Spark aggregate fold, and a DuckDB list_reduce), and "
    "Viterbi is an exhaustive enumeration of the <=128 cut masks of "
    "8-char-capped words with (cost, n_pieces, mask) total-order "
    "tie-breaks — no float ever enters. Scale: ONE corpus-sized "
    "shuffle (the checkpointed distinct-word frame), vocab-sized agg "
    "+ ~160-row bounded collect per round, the bpe_train loop "
    "discipline. operators/unigram.py unigram_train; validated "
    "against an independent pure-Python reference in tests.",
    tags=("llm", "text", "tokenizer"),
)
def text_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.unigram import unigram_train

    return unigram_train(load_table(spark, sf_dir, "documents"))


@register(
    "text_unigram_encode",
    oracle=_unigram_oracle("encode"),
    doc="Corpus-wide Viterbi ENCODING under the trained unigram-LM "
    "costs — the tokenizer's throughput step (what a training-data "
    "pipeline spends its cycles on after text_unigram_train learns "
    "the vocabulary once). Segments the DISTINCT-word frame only "
    "(tokenize the vocabulary, never re-tokenize the zipfian "
    "corpus — the L185 bpe_encode discipline) and joins back to the "
    "(doc, word) pairs. Per doc: n_words, n_tokens, n_multi "
    "(multi-char pieces), and n_chars recomputed from PIECE lengths "
    "— the losslessness proof (must equal the summed truncated word "
    "lengths, which is how the oracle cross-derives it). "
    "operators/unigram.py unigram_encode",
    tags=("llm", "text", "tokenizer"),
)
def text_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.unigram import (
        unigram_encode,
    )

    return unigram_encode(load_table(spark, sf_dir, "documents"))


@register(
    "lakehouse_delta_v2_checkpoint",
    oracle="""
    WITH m AS (SELECT doc_id AS i,
                      doc_id % 9 = 0 OR doc_id % 13 = 0
                        OR doc_id % 15 = 0 AS bad,
                      2 + doc_id % 2 AS nf,
                      1 + doc_id % 2 AS ns
               FROM documents),
    fj AS (SELECT i, nf, f, 30 + ((i + f) % 4) * 10 AS R,
                  NOT (i % 2 = 1 AND f = 0) AS alive
           FROM (SELECT i, nf, unnest(range(0, nf + 1)) AS f FROM m)),
    rj AS (SELECT i, (19 * i + 7 * f + 3 * j) % 2000 AS k
           FROM (SELECT i, f, unnest(range(0, R)) AS j
                 FROM fj WHERE alive)),
    agg AS (SELECT fj.i,
                   SUM(CASE WHEN alive THEN 1 ELSE 0 END) AS lf,
                   SUM(CASE WHEN alive THEN R ELSE 0 END) AS lr
            FROM fj GROUP BY fj.i),
    ks AS (SELECT i, SUM(k) AS ksum FROM rj GROUP BY i)
    SELECT m.i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'delta' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE 2 END AS BIGINT)
             AS checkpoint_version,
           CAST(CASE WHEN bad THEN 0 ELSE 3 + ns END AS BIGINT)
             AS n_main_actions,
           CAST(CASE WHEN bad THEN 0 ELSE ns END AS BIGINT)
             AS n_sidecars,
           CAST(CASE WHEN bad THEN 0 ELSE nf + 1 END AS BIGINT)
             AS n_sidecar_actions,
           CAST(CASE WHEN bad THEN 0 ELSE 1 END AS BIGINT)
             AS n_tombstones,
           CAST(CASE WHEN bad THEN 0 ELSE 1 END AS BIGINT)
             AS n_tail_commits,
           CAST(CASE WHEN bad THEN 0 ELSE agg.lf END AS BIGINT)
             AS live_files,
           CAST(CASE WHEN bad THEN 0 ELSE agg.lr END AS BIGINT)
             AS live_rows,
           CAST(CASE WHEN bad THEN 0 ELSE ks.ksum END AS BIGINT)
             AS k_sum
    FROM m
    JOIN agg ON agg.i = m.i
    JOIN ks ON ks.i = m.i
    """,
    doc="Delta V2 CHECKPOINTS (delta.io PROTOCOL.md 'V2 Checkpoint "
    "Table Feature') — what current feature-enabled writers emit, "
    "keeping the Delta layer current (VERDICT r11 next #8): the "
    "checkpoint at V is a UUID-named MANIFEST parquet "
    "(<V>.checkpoint.<uuid>.parquet, exactly one allowed) holding "
    "checkpointMetadata + protocol + metaData + SIDECAR pointer "
    "rows, while the file actions live in sidecar parquet parts "
    "under _delta_log/_sidecars/. The hand struct-leaf reader (L233) "
    "decodes both layers; _last_checkpoint carries checkpointSchema "
    "and a size that must equal the TOTAL decoded action count "
    "across manifest + sidecars (every 9th id lies by one). Trust "
    "chain: exactly one checkpointMetadata row and its version must "
    "equal V, protocol minReaderVersion == 3 (the v2Checkpoint "
    "reader requirement), each sidecar's declared sizeInBytes vs "
    "the member's true bytes (every 15th id inflates one), sidecars "
    "hold ONLY file actions, duplicate adds across sidecars "
    "refused, tail-commit contiguity and never-added-remove refusal "
    "(every 13th id), and per-file stats.numRecords/size vs the "
    "actual hand parquet decode. The oracle recomputes the "
    "post-tail live set blind. operators/deltacp.py "
    "read_delta_v2_checkpoint_table",
    tags=("llm", "multimodal", "lakehouse"),
)
def lakehouse_delta_v2_checkpoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.deltacp import (
        delta_v2_checkpoint_stats,
        synthesize_delta_v2_checkpoint_media,
    )

    media = synthesize_delta_v2_checkpoint_media(
        load_table(spark, sf_dir, "documents")
    )
    return delta_v2_checkpoint_stats(media)


@register(
    "multimodal_orc_bloom",
    oracle="""
    WITH m AS (SELECT doc_id AS i, 3000 + 500 * (doc_id % 5) AS n,
                      doc_id % 19 = 0 OR doc_id % 23 = 0 AS bad
               FROM documents),
    p AS (SELECT i, n, bad, (n + 999) // 1000 AS nst,
                 (i * 13) % 260 AS qr,
                 i % ((n + 999) // 1000) AS starg
          FROM m),
    t AS (SELECT i, COUNT(*) AS cnt
          FROM (SELECT p.i, unnest(range(starg * 1000,
                       least(starg * 1000 + 1000, n))) AS r,
                       qr
                FROM p WHERE qr < 251)
          WHERE (i + 7 * r) % 251 = qr
          GROUP BY i)
    SELECT p.i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'orc' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_rows,
           CAST(CASE WHEN bad THEN 0 ELSE nst END AS BIGINT)
             AS n_strides,
           CAST(CASE WHEN bad THEN 0 ELSE COALESCE(t.cnt, 0)
                END AS BIGINT) AS n_found,
           CAST(CASE WHEN bad OR t.cnt IS NULL THEN -1 ELSE starg
                END AS BIGINT) AS found_stride,
           CAST(CASE WHEN bad THEN 0 ELSE qr * 8 + starg
                END AS BIGINT) AS q
    FROM p LEFT JOIN t ON t.i = p.i
    """,
    doc="ORC per-stride BLOOM FILTERS (stream kind 8, "
    "BLOOM_FILTER_UTF8) — the third ORC skipping layer, completing "
    "the same stats -> row-index -> bloom trio the parquet side has "
    "(L192/L222/L237): a BloomFilterIndex protobuf carries one "
    "filter per row-index stride; LONG values hash with the Thomas "
    "Wang 64-bit mix in SIGNED arithmetic (C++ ORC's int64 shifts "
    "are arithmetic — 0 hashes to 0, the convention fitted and "
    "pinned bit-exact against pyarrow's writer in tests) and spread "
    "Kirsch-Mitzenmacher style with Java-int overflow semantics. "
    "Fixture strides all span the SAME numeric band (stride k holds "
    "residue*8+k), so min/max statistics cannot skip anything and "
    "the bloom is the only working discriminator — measured ~76%% "
    "of strides skipped. Bloom false positives are legal, so the "
    "oracle pins only FP-independent outputs (n_found/found_stride/"
    "counts); skip behavior is pinned in pytest. Trust chain: one "
    "filter per row-index entry, uniform (k, numBytes) across a "
    "column's filters (every 23rd id bumps stride 1's k varint), "
    "and every read stride re-probes each decoded value against its "
    "own filter — every 19th id clears one bloom bit of a non-probe "
    "value chosen outside the probe's positions, so the stride is "
    "read and walks into the false-negative lie. "
    "operators/orc2.py read_orc_bloom_lookup",
    tags=("llm", "multimodal", "lakehouse"),
)
def multimodal_orc_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.orc2 import (
        orc_bloom_stats,
        synthesize_orc_bloom_media,
    )

    media = synthesize_orc_bloom_media(
        load_table(spark, sf_dir, "documents")
    )
    return orc_bloom_stats(media)


@register(
    "multimodal_warc_reqresp",
    oracle="""
    WITH s AS (SELECT doc_id AS i,
                      doc_id % 11 = 0 OR doc_id % 13 = 0
                        OR doc_id % 17 = 0 OR doc_id % 21 = 0
                        OR doc_id % 27 = 0 AS bad,
                      doc_id % 2 = 1 AS post,
                      len(string_split(text, ' ')) AS nw,
                      1 + doc_id % 3 AS nli
               FROM documents)
    SELECT i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'warc' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE 3 END AS BIGINT)
             AS n_records,
           CAST(CASE WHEN bad THEN 0 ELSE 1 END AS BIGINT)
             AS n_requests,
           CAST(CASE WHEN bad OR post THEN 0 ELSE 1 END AS BIGINT)
             AS n_get,
           CAST(CASE WHEN bad OR NOT post THEN 0 ELSE 1
                END AS BIGINT) AS n_post,
           CAST(CASE WHEN bad OR NOT post THEN 0
                ELSE 2 + length(CAST(i AS VARCHAR))
                END AS BIGINT) AS req_body_len,
           CAST(CASE WHEN bad THEN 0 ELSE 200 END AS BIGINT)
             AS status_sum,
           CAST(CASE WHEN bad THEN 0
                ELSE 2 + nw + 3 * nli + 15 END AS BIGINT) AS n_words
    FROM s
    """,
    doc="WARC request/response PAIRS — the full per-fetch capture "
    "shape real crawls store: each fetch is a msgtype=request record "
    "followed by its msgtype=response record under the same "
    "WARC-Target-URI. The request half of the RFC 9112 message "
    "layer parses the request-line (method/target/version grammar), "
    "the shared field grammar, a mandatory Host header, and body "
    "framing (bodyless GET; POST with exact Content-Length; TE+CL "
    "refused) — and the request-target must equal the record's own "
    "URI path, the cross-record check that catches a mis-threaded "
    "crawl attributing content to the wrong page. Responses run the "
    "full L236 chain. Five independent stripes: the response's "
    "11/13/17 trio plus every 21st id's request targeting the NEXT "
    "doc's path and every 27th id's POST Content-Length lie. "
    "operators/httpmsg.py parse_http_request, operators/warc.py "
    "warc_reqresp_stats",
    tags=("llm", "multimodal", "text"),
)
def multimodal_warc_reqresp(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.warc import (
        synthesize_warc_reqresp_media,
        warc_reqresp_stats,
    )

    media = synthesize_warc_reqresp_media(
        load_table(spark, sf_dir, "documents")
    )
    return warc_reqresp_stats(media)


@register(
    "multimodal_parquet_bloom_str",
    oracle="""
    WITH m AS (SELECT doc_id AS i,
                      2 + doc_id % 3 AS g,
                      doc_id % 7 = 0 OR doc_id % 9 = 0 AS bad,
                      doc_id % 137 AS qr
               FROM documents)
    SELECT i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'parquet' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE g END AS BIGINT) AS n_groups,
           CAST(CASE WHEN bad OR qr >= 24 * g THEN 0 ELSE 1
                END AS BIGINT) AS n_found,
           CAST(CASE WHEN bad OR qr >= 24 * g THEN -1 ELSE qr % g
                END AS BIGINT) AS found_group
    FROM m
    """,
    doc="Parquet split-block bloom filters on a STRING key column — "
    "the URL/doc-key point lookup where min/max statistics are "
    "useless for high-cardinality keys and the bloom is the ONLY "
    "skipping layer. BYTE_ARRAY hash input is the raw bytes (no "
    "length prefix) per the parquet bloom spec; the hand writer "
    "renders PLAIN BYTE_ARRAY pages (length-prefixed) beside the "
    "bloom sections, and the walk re-probes every decoded string of "
    "every opened group. Unlike the INT64 twin (L237, measured "
    "FP-free), string-key false positives DO occur at this scale "
    "(one in 5000 ids), so the oracle pins only FP-independent "
    "outputs and pytest pins the skip rate. Same lie stripes: every "
    "7th id's bloom_filter_length off by one, every 9th id's "
    "bit-clear false negative planted outside the probe's "
    "positions. operators/pqbloom.py read_parquet_bloom_lookup "
    "(ptype=6)",
    tags=("llm", "multimodal", "lakehouse"),
)
def multimodal_parquet_bloom_str(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.pqbloom import (
        parquet_bloom_str_stats,
        synthesize_parquet_bloom_str_media,
    )

    media = synthesize_parquet_bloom_str_media(
        load_table(spark, sf_dir, "documents")
    )
    return parquet_bloom_str_stats(media)


@register(
    "lakehouse_iceberg_bucket_prune",
    oracle="""
    WITH m AS (SELECT doc_id AS i,
                      3 + doc_id % 3 AS nm,
                      doc_id % 9 = 0 OR doc_id % 13 = 0
                        OR doc_id % 17 = 0 AS bad
               FROM documents),
    p AS (SELECT i, nm, bad,
                 i % nm AS tm, i % 2 AS te
          FROM m)
    SELECT i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'iceberg' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE nm END AS BIGINT)
             AS n_manifests,
           CAST(CASE WHEN bad THEN 0 ELSE 1 END AS BIGINT)
             AS n_manifests_read,
           CAST(CASE WHEN bad THEN 0 ELSE 1 END AS BIGINT)
             AS files_selected,
           CAST(CASE WHEN bad THEN 0
                ELSE 10 + (i + 5 * tm + te) % 40 END AS BIGINT)
             AS rows_selected,
           CAST(CASE WHEN bad THEN 0 ELSE 1 END AS BIGINT) AS n_found
    FROM p
    """,
    doc="Iceberg BUCKET-transform partition pruning — the "
    "hash-partitioned half of hidden partitioning (the range half "
    "is L232): bucket(N, k) = (murmur3_x86_32(little-endian-8(k), "
    "seed 0) & MAX_INT) %% N per the Iceberg spec, murmur "
    "implemented from the public MurmurHash3 spec and pinned in "
    "tests against BOTH the canonical reference vectors and Spark's "
    "JVM hash() (same algorithm, seed 42). A point lookup computes "
    "the probe's bucket ONCE and opens only the manifest claiming "
    "it (4-byte-LE field summaries) and only the data file claiming "
    "that bucket — one manifest fetched, one parquet decoded, the "
    "move that turns a key lookup on a 100 TB table into one "
    "partition's I/O. Trust chain: every decoded key must re-hash "
    "to the file's claimed bucket (every 9th id mis-routes one row "
    "— how a buggy writer silently corrupts a bucketed table), "
    "record_count vs the actual decode (every 17th id inflates it), "
    "manifest-list truncation refusal (every 13th). The fixture "
    "assigns keys to buckets BY SEARCH, so every oracled count is "
    "hash-independent and the SQL oracle needs no murmur. "
    "operators/iceberg2.py read_iceberg_bucket_prune",
    tags=("llm", "multimodal", "lakehouse"),
)
def lakehouse_iceberg_bucket_prune(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.iceberg2 import (
        iceberg_bucket_stats,
        synthesize_iceberg_bucket_media,
    )

    media = synthesize_iceberg_bucket_media(
        load_table(spark, sf_dir, "documents")
    )
    return iceberg_bucket_stats(media)

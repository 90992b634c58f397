r"""LLM-pipeline wave 14: the default lakehouse page shapes and the
tokenizer/ingest throughput steps.

Round-10 brief items (VERDICT r9 "Next round"): RLE_DICTIONARY +
nullable definition levels — the page shape pyarrow/Spark actually
write by default for string columns, without which the from-scratch
parquet read path misses most real files — the GZIP page codec
(parquet's other ubiquitous codec next to Snappy) wired under the
same column walk through the hand-written RFC 1952 member decoder,
the BPE *encode* pass (the corpus-tokenization step a pipeline
actually spends cycles on after training), the cp1252 charset
fallback transcode for the non-UTF-8 crawl tail, and WET conversion
records in the WARC walk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "multimodal_parquet_dict",
    oracle="""
    WITH m AS (SELECT doc_id AS i, doc_id % 8 = 0 AS bad,
                      10 + doc_id % 90 AS n, 1 + doc_id % 3 AS g,
                      4 + doc_id % 6 AS md
               FROM documents),
    r AS (SELECT i, bad, n, g, md, (n + g - 1) // g AS rgsz,
                 unnest(range(0, n)) AS rr
          FROM m),
    c AS (SELECT i, bad, n, g, rr // rgsz AS grp,
                 CASE WHEN (7 * rr + i) % 5 = 0 THEN NULL
                      ELSE (i + 3 * rr) % md END AS x
          FROM r),
    pr AS (SELECT i, bad, n, g,
                  COUNT(*) - COUNT(x) AS n_nulls,
                  COALESCE(SUM(167 + x), 0) AS vsum
           FROM c GROUP BY i, bad, n, g),
    dg AS (SELECT i, grp, COUNT(DISTINCT x) AS ds,
                  COALESCE(SUM(DISTINCT 167 + x), 0) AS dsum
           FROM c GROUP BY i, grp),
    dd AS (SELECT i, SUM(ds) AS dict_size, SUM(dsum) AS dict_sum
           FROM dg GROUP BY i)
    SELECT pr.i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'parquet' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_values,
           CAST(CASE WHEN bad THEN 0 ELSE n_nulls END AS BIGINT)
             AS n_nulls,
           CAST(CASE WHEN bad THEN 0 ELSE g END AS BIGINT) AS n_pages,
           CAST(CASE WHEN bad THEN 0 ELSE dict_size END AS BIGINT)
             AS dict_size,
           CAST(CASE WHEN bad THEN 0 ELSE vsum END AS BIGINT)
             AS value_bytes_sum,
           CAST(CASE WHEN bad THEN 0 ELSE dict_sum END AS BIGINT)
             AS dict_bytes_sum
    FROM pr JOIN dd ON pr.i = dd.i
    """,
    doc="RLE_DICTIONARY + NULLABLE parquet column read from scratch "
    "— the page shape pyarrow/Spark write BY DEFAULT for string "
    "columns, i.e. what a real lakehouse file actually contains: "
    "DICTIONARY page (PLAIN byte-array values, consumed exactly), "
    "then data pages whose definition levels carry a real 0/1 null "
    "mix (RLE/bit-packed hybrid, bit width 1) followed by a 1-byte "
    "index bit width and hybrid-coded dictionary indices (general "
    "bit width 0-32, groups of 8 packed LSB-first), every index "
    "bounds-checked against the dictionary. Cross-checks: per-page "
    "null-inclusive counts sum to each chunk's num_values, chunks "
    "sum to the file row count. The oracle recomputes value counts, "
    "null counts, per-row-group dictionary sizes (distinct non-null "
    "values per group) and byte-value checksums over both the "
    "materialized column and the dictionaries blind from the write "
    "formulas. Every 8th id's first dictionary PageHeader is "
    "smashed to thrift type-15 bytes and must degrade. Pure map "
    "over blobs, zero shuffle. operators/parquetmeta.py "
    "read_parquet_column_s_dict",
    tags=("llm", "multimodal"),
)
def multimodal_parquet_dict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.parquetmeta import (
        parquet_dict_stats,
        synthesize_parquet_dict_media,
    )

    media = synthesize_parquet_dict_media(
        load_table(spark, sf_dir, "documents")
    )
    return parquet_dict_stats(media)


@register(
    "multimodal_parquet_gzip",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, doc_id % 11 = 0 AS bad,
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
    doc="GZIP-compressed parquet column read — parquet's other "
    "ubiquitous page codec next to Snappy — under the same page "
    "walk as multimodal_parquet_column, decompressed by the HAND-"
    "WRITTEN RFC 1952 gzip member walk over the shared _inflate_at "
    "DEFLATE block loop (CRC-32 and ISIZE proven per member, "
    "decoded length proven against the page header's uncompressed "
    "size). Pages are compressed by pyarrow's reference zlib, the "
    "zlib-validates-the-hand-inflate pattern end-to-end. The oracle "
    "recomputes the exact column sums blind; every 11th id's "
    "smashed footer length degrades. operators/parquetmeta.py "
    "_page_decompress, operators/inflate.py iter_gzip_members",
    tags=("llm", "multimodal"),
)
def multimodal_parquet_gzip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.parquetmeta import (
        parquet_column_stats,
        synthesize_parquet_gzip_media,
    )

    media = synthesize_parquet_gzip_media(
        load_table(spark, sf_dir, "documents")
    )
    return parquet_column_stats(media)


def _encode_oracle() -> str:
    from gmall_flink_210726_spark.queries.llm13 import _bpe_encode_oracle

    return _bpe_encode_oracle(10)


@register(
    "text_bpe_encode",
    oracle=_encode_oracle(),
    doc="BPE ENCODE pass — the tokenizer's throughput step: after "
    "text_bpe_train learns 10 merges, this applies them corpus-wide, "
    "replaying each merge in learned rank order as the same greedy "
    "left-to-right scan used during training, compiled into ONE "
    "Column expression (10 nested aggregate() folds). Higher-order "
    "functions never enter codegen, so the expensive fold runs once "
    "per DISTINCT word — the same vocabulary collapse bpe_train "
    "opens with — and per-word results join back to the exploded "
    "(doc, word) pairs: tokenize the VOCABULARY, not the corpus "
    "(a zipfian corpus repeats words endlessly; ~4x at sf0.1, the "
    "gap only widens with scale). Plan-pinned: the fold never "
    "touches a node carrying corpus rows. Output per doc: word "
    "count, post-merge token count, merged-symbol count, and "
    "n_chars recomputed from SYMBOL lengths (the oracle sums RAW "
    "word lengths, so agreement proves losslessness). The oracle "
    "re-derives the merge table blind via the train chain with the "
    "word key threaded through, then joins doc words to final "
    "symbol lists. operators/text2.py bpe_encode",
    tags=("llm", "text"),
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.text2 import (
        bpe_encode,
        bpe_train,
    )

    docs = load_table(spark, sf_dir, "documents")
    mt = bpe_train(docs, n_merges=10).orderBy("rnk").collect()
    merges = [(r["left_sym"], r["right_sym"]) for r in mt]
    return bpe_encode(docs, merges)


@register(
    "text_charset_fallback",
    oracle="""
    WITH m AS (SELECT doc_id AS i, doc_id % 4 AS v,
                      30 + doc_id % 50 AS n
               FROM documents),
    u AS (SELECT i, v, n, unnest(range(0, n)) AS k FROM m),
    c AS (SELECT i, v, k,
            CASE WHEN v < 2
                   THEN [97, 233, 20013, 128512][1 + (i + k) % 4]
                 WHEN v = 2
                   THEN [8220, 8221, 8212, 233, 65, 32][1 + (i + k) % 6]
                 WHEN k % 7 = 3 THEN 157
                 ELSE [147, 148, 151, 233, 65, 32][1 + (i + k) % 6]
            END AS cp,
            CASE WHEN v < 2 THEN [1, 2, 3, 4][1 + (i + k) % 4]
                 ELSE 1 END AS nb,
            CASE WHEN v < 2 THEN 0
                 WHEN v = 3 AND k % 7 = 3 THEN 1
                 WHEN (i + k) % 6 < 3 THEN 1
                 ELSE 0 END AS c1
          FROM u)
    SELECT i AS media_id,
           CASE WHEN v < 2 THEN 'utf-8'
                WHEN v = 2 THEN 'cp1252'
                ELSE 'latin-1' END AS encoding,
           CAST(SUM(nb) AS BIGINT) AS n_bytes,
           CAST(COUNT(*) AS BIGINT) AS n_cps,
           CAST(SUM(cp) AS BIGINT) AS cp_sum,
           CAST(SUM(c1) AS BIGINT) AS n_c1_recovered
    FROM c GROUP BY i, v
    """,
    doc="Charset fallback transcode — the C4/CCNet front-door step "
    "that RECOVERS the non-UTF-8 crawl tail instead of dropping it: "
    "strict UTF-8 (the from-scratch RFC 3629 walk) first, then "
    "Windows-1252 with the real hand-written 0x80-0x9F table (27 "
    "printable mappings; the five UNDEFINED bytes make strict "
    "cp1252 fail), then latin-1 as the never-fails floor. Fixture "
    "stripes: half the ids valid mixed-class UTF-8, a quarter "
    "Word-style cp1252 (smart quotes / em dash, never accidentally "
    "valid UTF-8 because isolated 0x80-0xBF bytes are orphan "
    "continuations), a quarter with the undefined 0x9D injected so "
    "the chain demonstrably falls through. The oracle recomputes "
    "encoding labels, byte/code-point counts, code-point SUMS (any "
    "wrong table entry shifts them) and C1-range recovery counts "
    "blind from the write formulas. Arrow-batched mapInPandas, "
    "zero shuffle. operators/charset.py charset_transcode",
    tags=("llm", "text"),
)
def text_charset_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.charset import (
        charset_transcode_stats,
        synthesize_charset_media,
    )

    media = synthesize_charset_media(load_table(spark, sf_dir, "documents"))
    return charset_transcode_stats(media)


@register(
    "multimodal_wet_text",
    oracle="""
    WITH s AS (SELECT doc_id AS media_id, doc_id % 3 AS v,
                      doc_id % 13 = 0 OR
                      (doc_id % 11 = 0 AND doc_id % 3 <> 1) AS bad,
                      string_split(text, ' ') AS ws,
                      1 + doc_id % 3 AS nli
               FROM documents),
    b AS (SELECT media_id, v, bad, nli, len(ws) AS nw,
                 array_to_string(ws[1:len(ws)//2], ' ') AS p1,
                 array_to_string(ws[len(ws)//2+1:len(ws)], ' ') AS p2
          FROM s),
    h AS (SELECT *,
            'Heading ' || CAST(media_id AS VARCHAR) || chr(10)
            || p1 || chr(10) || p2 || chr(10)
            || array_to_string(
                 ['item ' || CAST(media_id AS VARCHAR) || ' '
                  || CAST(j AS VARCHAR) for j in range(0, nli)],
                 chr(10))
            || chr(10)
            || 'amp & lt < gt > quote " num A hex B link '
            || CAST(media_id AS VARCHAR) || ' end' AS hbody,
            p1 || chr(10) || p2 AS cbody
          FROM b)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'warc' END AS format,
           CAST(CASE WHEN bad THEN 0 WHEN v = 2 THEN 3
                ELSE 2 END AS BIGINT) AS n_records,
           CAST(CASE WHEN bad OR v = 1 THEN 0 ELSE 1 END AS BIGINT)
             AS n_responses,
           CAST(CASE WHEN bad OR v = 0 THEN 0 ELSE 1 END AS BIGINT)
             AS n_conversions,
           CASE WHEN bad OR v = 1 THEN ''
                ELSE 'Doc ' || CAST(media_id AS VARCHAR) END AS title,
           CAST(CASE WHEN bad THEN 0 ELSE
                  (CASE WHEN v <> 1 THEN 4 + nli ELSE 0 END)
                + (CASE WHEN v <> 0 THEN 2 ELSE 0 END)
                END AS BIGINT) AS n_blocks,
           CAST(CASE WHEN bad THEN 0 ELSE
                  (CASE WHEN v <> 1 THEN 2 + nw + 3 * nli + 15
                        ELSE 0 END)
                + (CASE WHEN v <> 0 THEN nw ELSE 0 END)
                END AS BIGINT) AS n_words,
           CASE WHEN bad THEN ''
                WHEN v = 0 THEN hbody
                WHEN v = 1 THEN cbody
                ELSE hbody || chr(10) || cbody END AS body_text
    FROM h
    """,
    doc="WET conversion records in the WARC walk — CommonCrawl's "
    "OTHER front door (*.warc.wet.gz): WARC-Type 'conversion' with a "
    "text/plain payload that IS the pre-extracted text. The combined "
    "walk accepts BOTH record types per stream: response bodies go "
    "through the HTML tag-grammar extractor, conversion payloads "
    "pass through as their non-empty lines (a deliberate blank line "
    "in every fixture payload proves the drop). Mixed-record "
    "fixture by id: a third response-only, a third conversion-only, "
    "a third BOTH; the oracle reconstructs the exact combined body "
    "text, block/word/record-type counts and title blind from the "
    "parquet text column. Corruption strikes per layer: every 13th "
    "id lies about the last record's Content-Length (WARC layer, "
    "CRC-clean below), response-bearing every-11th ids keep the "
    "unclosed-script swallow (HTML layer). operators/warc.py "
    "warc_text_extract",
    tags=("llm", "multimodal", "text"),
)
def multimodal_wet_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.warc import (
        synthesize_wet_media,
        warc_text_extract,
    )

    media = synthesize_wet_media(load_table(spark, sf_dir, "documents"))
    return warc_text_extract(media)


@register(
    "multimodal_zstd_frames",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, doc_id % 9 = 0 AS bad,
                      1 + doc_id % 3 AS n, doc_id % 5 = 0 AS skip
               FROM documents)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'zstd' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_frames,
           CAST(CASE WHEN bad THEN 0 ELSE n // 2 END AS BIGINT)
             AS n_checksummed,
           CAST(CASE WHEN bad OR NOT skip THEN 0 ELSE 1 END AS BIGINT)
             AS n_skippable,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([200 + (media_id * 43 + 29 * j) % 600
                               for j in range(0, n)]) END AS BIGINT)
             AS decoded_len,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([list_sum(
                       [97 + ((media_id * 7 + 13 * j + (k // 5) * 11)
                              % 7)
                        for k in range(0,
                            200 + (media_id * 43 + 29 * j) % 600)])
                     for j in range(0, n)]) END AS BIGINT)
             AS payload_sum
    FROM m
    """,
    doc="Zstandard frame decode (RFC 8878) FROM SCRATCH — the modern "
    "CommonCrawl/parquet codec, completing the hand codec family "
    "next to DEFLATE/gzip/zlib/Snappy: FSE (tANS) table reads + "
    "state machines, Huffman literals (FSE-compressed weight "
    "tables, 4-stream split), all four sequence symbol-compression "
    "modes, repeat offsets, LZ77 execute, and the content checksum "
    "verified by a from-scratch XXH64. Streams are 1-3 concatenated "
    "frames at compression levels 1/7/13/19 (different levels "
    "exercise different entropy modes), odd frames checksummed, "
    "every 5th id prefixed with a skippable frame. The corrupt "
    "stripe (every 9th id) force-checksums all frames then flips "
    "the last frame's middle byte, so degrade is deterministic "
    "(grammar, size, or checksum — never a silent wrong decode). "
    "The oracle recomputes frame counts and decoded byte sums blind "
    "from the stateless run-text formula. Reference encoder "
    "(pyarrow's bundled zstd) appears ONLY encoder-side. "
    "operators/zstd.py zstd_decompress",
    tags=("llm", "multimodal"),
)
def multimodal_zstd_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.zstd import (
        synthesize_zstd_media,
        zstd_frame_stats,
    )

    media = synthesize_zstd_media(load_table(spark, sf_dir, "documents"))
    return zstd_frame_stats(media)


@register(
    "multimodal_parquet_zstd",
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
    doc="ZSTD-compressed parquet column read — the page codec modern "
    "lakehouses default to — under the same page walk as "
    "multimodal_parquet_column, each page decompressed by the from-"
    "scratch RFC 8878 frame decoder (FSE + Huffman + sequences, "
    "decoded length proven against the page header's uncompressed "
    "size). Pages are compressed by pyarrow's reference encoder; "
    "the oracle recomputes exact column sums blind; every 9th id's "
    "smashed footer length degrades. operators/parquetmeta.py "
    "_page_decompress, operators/zstd.py zstd_decompress",
    tags=("llm", "multimodal"),
)
def multimodal_parquet_zstd(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.parquetmeta import (
        parquet_column_stats,
        synthesize_parquet_zstd_media,
    )

    media = synthesize_parquet_zstd_media(
        load_table(spark, sf_dir, "documents")
    )
    return parquet_column_stats(media)


@register(
    "multimodal_parquet_v2_delta",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, doc_id % 10 = 0 AS bad,
                      10 + doc_id % 90 AS n, 1 + doc_id % 3 AS g
               FROM documents)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'parquet' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_values,
           CAST(CASE WHEN bad THEN 0 ELSE g END AS BIGINT) AS n_pages,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([(media_id * 7 + 3 * r) % 1000 - 400
                               for r in range(0, n)]) END AS BIGINT)
             AS k_sum,
           CAST(CASE WHEN bad THEN 0
                ELSE 492 * n + list_sum([(media_id + 2 * r) % 9
                                         for r in range(0, n)])
                END AS BIGINT) AS s_bytes_sum
    FROM m
    """,
    doc="Parquet FORMAT-V2 data pages + the delta encodings modern "
    "writers default to, from scratch: DataPageHeaderV2 (explicit "
    "definition-level byte length, levels never compressed, "
    "is_compressed flag), DELTA_BINARY_PACKED int64 (zigzag first "
    "value, per-block zigzag min_delta, bit-packed miniblocks — "
    "NEGATIVE values in the fixture exercise both sign paths) and "
    "DELTA_LENGTH_BYTE_ARRAY strings (delta-packed length run, "
    "concatenated bytes consumed exactly). The page codec rotates "
    "NONE/SNAPPY/GZIP/ZSTD by id, so all four hand decoders run "
    "under the v2 page shape in one query. Cross-checks: per-page "
    "counts sum to chunk counts sum to file rows, the delta run's "
    "own total matches the page, the byte section length closes. "
    "The oracle recomputes both column checksums blind; every 10th "
    "id's smashed first PageHeader degrades. "
    "operators/parquetmeta.py read_parquet_columns_v2",
    tags=("llm", "multimodal"),
)
def multimodal_parquet_v2_delta(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.parquetmeta import (
        parquet_v2_stats,
        synthesize_parquet_v2_media,
    )

    media = synthesize_parquet_v2_media(
        load_table(spark, sf_dir, "documents")
    )
    return parquet_v2_stats(media)


@register(
    "multimodal_parquet_bss_dba",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, doc_id % 11 = 0 AS bad,
                      10 + doc_id % 90 AS n, 1 + doc_id % 3 AS g
               FROM documents)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'parquet' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_values,
           CAST(CASE WHEN bad THEN 0 ELSE g END AS BIGINT) AS n_pages,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([(media_id * 7 + 3 * r) % 1000 - 300
                               for r in range(0, n)]) END AS BIGINT)
             AS v_q_sum,
           CAST(CASE WHEN bad THEN 0
                ELSE 613 * n + n * (media_id % 5)
                     + list_sum([(media_id + 3 * r) % 9
                                 for r in range(0, n)])
                END AS BIGINT) AS s_bytes_sum
    FROM m
    """,
    doc="The remaining parquet v2 encodings from scratch: "
    "BYTE_STREAM_SPLIT doubles (the k-th bytes of all values grouped "
    "into k streams — transposed back and reconstructed as exact "
    "IEEE quarters, so the proof sum stays in integer space) and "
    "DELTA_BYTE_ARRAY strings (front coding: delta-packed PREFIX "
    "lengths + a DELTA_LENGTH_BYTE_ARRAY suffix section, each value "
    "spliced from its predecessor; prefix-longer-than-previous and "
    "non-exact body consumption degrade). Codec rotates NONE/SNAPPY/"
    "GZIP/ZSTD by id. The oracle recomputes quarter-sums and string "
    "byte checksums blind; every 11th id's smashed first PageHeader "
    "degrades. operators/parquetmeta.py read_parquet_columns_bss_dba",
    tags=("llm", "multimodal"),
)
def multimodal_parquet_bss_dba(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.parquetmeta import (
        parquet_bss_stats,
        synthesize_parquet_bss_media,
    )

    media = synthesize_parquet_bss_media(
        load_table(spark, sf_dir, "documents")
    )
    return parquet_bss_stats(media)


@register(
    "multimodal_parquet_stats_skip",
    oracle="""
    WITH m AS (SELECT doc_id AS i, doc_id % 12 = 0 AS bad,
                      20 + doc_id % 60 AS n, 1 + doc_id % 4 AS g,
                      (doc_id % 12) * 40 AS base
               FROM documents),
    gdef AS (SELECT i, bad, n, g, base, (n + g - 1) // g AS sz,
                    unnest(range(0, g)) AS j
             FROM m),
    grp AS (SELECT i, bad, g, base, j * sz AS lo_r,
                   CASE WHEN (j + 1) * sz < n THEN (j + 1) * sz - 1
                        ELSE n - 1 END AS hi_r
            FROM gdef),
    gag AS (SELECT i, bad, g,
                   CASE WHEN base + hi_r < 300 OR base + lo_r > 449
                        THEN 1 ELSE 0 END AS skipped,
                   GREATEST(lo_r, 300 - base) AS mlo,
                   LEAST(hi_r, 449 - base) AS mhi, base
            FROM grp),
    agg AS (SELECT i, bad, g AS n_groups,
                   SUM(skipped) AS n_skipped,
                   SUM(CASE WHEN skipped = 0 AND mhi >= mlo
                            THEN mhi - mlo + 1 ELSE 0 END) AS n_match,
                   SUM(CASE WHEN skipped = 0 AND mhi >= mlo
                            THEN (mhi - mlo + 1) * base
                                 + (mhi * (mhi + 1)
                                    - (mlo - 1) * mlo) // 2
                            ELSE 0 END) AS match_sum
            FROM gag GROUP BY i, bad, g)
    SELECT i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'parquet' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n_groups END AS BIGINT)
             AS n_groups,
           CAST(CASE WHEN bad THEN 0 ELSE n_skipped END AS BIGINT)
             AS n_skipped,
           CAST(CASE WHEN bad THEN 0 ELSE n_match END AS BIGINT)
             AS n_match,
           CAST(CASE WHEN bad THEN 0 ELSE match_sum END AS BIGINT)
             AS match_sum
    FROM agg
    """,
    doc="Statistics-based row-group SKIPPING — the Iceberg/Delta "
    "data-skipping planning trick, hand-decoded: a range scan "
    "(300 <= k <= 449) reads each chunk's min/max statistics from "
    "the footer (Statistics thrift struct, signed 8-byte LE) and "
    "never opens a row group whose [min, max] cannot intersect the "
    "predicate; groups that ARE read get their true min/max cross-"
    "checked against the claimed stats (lying stats on a read group "
    "degrade the file — skipped groups trust stats, the documented "
    "contract of every pruning engine). Fixture geometry yields all "
    "three planner outcomes: ~half the files fully skipped, a "
    "quarter fully read, ~20% MIXED (per-group pruning proven). The "
    "oracle recomputes skip decisions and matching sums blind from "
    "the write formulas via arithmetic series. "
    "operators/parquetmeta.py parquet_stats_skip",
    tags=("llm", "multimodal", "scan"),
)
def multimodal_parquet_stats_skip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.parquetmeta import (
        parquet_skip_stats,
        synthesize_parquet_stats_media,
    )

    media = synthesize_parquet_stats_media(
        load_table(spark, sf_dir, "documents")
    )
    return parquet_skip_stats(media, 300, 449)


@register(
    "text_charset_web",
    oracle="""
    WITH m AS (SELECT doc_id AS i, doc_id % 6 AS v,
                      25 + doc_id % 40 AS n
               FROM documents),
    u AS (SELECT i, v, n, unnest(range(0, n)) AS k FROM m
          WHERE v < 5),
    c AS (SELECT i, v, k,
            CASE WHEN v < 2 THEN
                   CASE WHEN (i + k) % 4 = 0
                        THEN 66560 + (i + k) % 16
                        ELSE 65 + (i + 3 * k) % 26 END
                 WHEN v = 2
                   THEN [97, 233, 20013, 128512][1 + (i + k) % 4]
                 WHEN v = 3
                   THEN [8220, 8221, 8212, 233, 65, 32][1 + (i + k) % 6]
                 WHEN k % 7 = 3 THEN 157
                 ELSE [147, 148, 151, 233, 65, 32][1 + (i + k) % 6]
            END AS cp,
            CASE WHEN v < 2 THEN
                   CASE WHEN (i + k) % 4 = 0 THEN 4 ELSE 2 END
                 WHEN v = 2 THEN [1, 2, 3, 4][1 + (i + k) % 4]
                 ELSE 1 END AS nb,
            CASE WHEN v < 3 THEN 0
                 WHEN v = 4 AND k % 7 = 3 THEN 1
                 WHEN (i + k) % 6 < 3 THEN 1
                 ELSE 0 END AS c1
          FROM u),
    agg5 AS (SELECT i, v, n FROM m WHERE v = 5),
    t5 AS (SELECT i, unnest(range(0, 2 * n + 1)) AS k, n FROM agg5),
    c5 AS (SELECT i,
                  CASE WHEN k % 9 = 2 THEN 144
                       ELSE 97 + (i + k) % 13 END AS cp,
                  CASE WHEN k % 9 = 2 THEN 1 ELSE 0 END AS c1
           FROM t5),
    lo AS (SELECT i,
                  CASE WHEN v < 2 THEN 'utf-16' ||
                         CASE WHEN v = 0 THEN 'le' ELSE 'be' END
                       WHEN v = 2 THEN 'utf-8'
                       WHEN v = 3 THEN 'cp1252'
                       ELSE 'latin-1' END AS encoding,
                  CAST(CASE WHEN v < 2 THEN 2 ELSE 0 END
                       + SUM(nb) AS BIGINT) AS n_bytes,
                  CAST(COUNT(*) AS BIGINT) AS n_cps,
                  CAST(SUM(cp) AS BIGINT) AS cp_sum,
                  CAST(SUM(c1) AS BIGINT) AS n_c1_recovered
           FROM c JOIN m USING (i, v) GROUP BY i, v),
    hi AS (SELECT c5.i, 'latin-1' AS encoding,
                  CAST(COUNT(*) + 2 AS BIGINT) AS n_bytes,
                  CAST(COUNT(*) + 2 AS BIGINT) AS n_cps,
                  CAST(SUM(cp) + 255 + 254 AS BIGINT) AS cp_sum,
                  CAST(SUM(c1) AS BIGINT) AS n_c1_recovered
           FROM c5 GROUP BY c5.i)
    SELECT i AS media_id, encoding, n_bytes, n_cps, cp_sum,
           n_c1_recovered
    FROM lo
    UNION ALL
    SELECT i AS media_id, encoding, n_bytes, n_cps, cp_sum,
           n_c1_recovered
    FROM hi
    """,
    doc="The FULL web-tail charset chain: BOM-tagged UTF-16 first "
    "(a BOM is an explicit declaration, so it outranks content "
    "sniffing; RFC 2781 strict — surrogates must pair, lone or "
    "truncated pairs reject), then strict UTF-8, then Windows-1252, "
    "then the latin-1 floor. Six fixture stripes: UTF-16LE and "
    "UTF-16BE with an astral (surrogate-pair) code point every 4th "
    "unit, valid UTF-8, cp1252, latin-1 via the undefined 0x9D, and "
    "a CORRUPT UTF-16 stream (BOM + odd byte count) that must fall "
    "through the entire chain to latin-1 with the BOM bytes "
    "recovered as code points. The oracle recomputes encoding "
    "labels, byte/code-point counts and code-point sums blind. "
    "operators/charset.py charset_transcode_web",
    tags=("llm", "text"),
)
def text_charset_web(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.charset import (
        charset_web_stats,
        synthesize_charset_web_media,
    )

    media = synthesize_charset_web_media(
        load_table(spark, sf_dir, "documents")
    )
    return charset_web_stats(media)


@register(
    "crawl_robots_frontier",
    oracle="""
    WITH u AS (SELECT doc_id AS i, doc_id % 10 AS host,
                      doc_id % 6 AS v
               FROM documents),
    a AS (SELECT i, host,
                 CASE WHEN host % 3 = 0 THEN
                        CASE WHEN v = 4 THEN 0 ELSE 1 END
                      WHEN v IN (1, 3) THEN 0
                      ELSE 1 END AS allowed
          FROM u)
    SELECT host, CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(SUM(allowed) AS BIGINT) AS n_allowed,
           CAST(SUM(allowed * i) AS BIGINT) AS allowed_id_sum
    FROM a GROUP BY host ORDER BY host
    """,
    doc="robots.txt crawl governance (RFC 9309, the Robots Exclusion "
    "Protocol) — the allow/deny join a compliant corpus pipeline "
    "runs over its URL frontier BEFORE fetching: hand-written group "
    "parser (consecutive User-agent lines, unknown fields ignored), "
    "longest-UA-token group selection with '*' only as fallback and "
    "NO rule merging, longest-pattern rule matching with allow "
    "winning ties, '*' wildcards and '$' end anchors via a leftmost-"
    "greedy segment scan. Fixture: 10 per-host robots files (total "
    "ban for another bot, directory ban + longer allow carve-out + "
    "wildcard-suffix ban for '*', and a bot-specific group on every "
    "3rd host that REPLACES the '*' rules — allowing paths '*' "
    "bans, the classic REP gotcha). The tiny robots side is parsed "
    "once per worker (broadcast pattern); URLs never shuffle until "
    "the per-host aggregate. Canonical REP matcher examples pinned "
    "in tests. operators/robots.py robots_allowed",
    tags=("llm", "text", "scan"),
)
def crawl_robots_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.robots import (
        robots_frontier_stats,
    )

    return robots_frontier_stats(load_table(spark, sf_dir, "documents"))


_WP_ORACLE = r"""
WITH RECURSIVE tok AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents),
words AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS ct FROM tok GROUP BY w),
cand AS MATERIALIZED (
  SELECT u.piece AS piece, u.plen AS plen, ct
  FROM (SELECT ct,
               unnest(flatten(
                 [[{'piece': CASE WHEN p = 0 THEN substring(w, 1, m)
                        ELSE '##' || substring(w, p + 1, m) END,
                    'plen': m}
                   for m in range(1, least(4, length(w) - p) + 1)]
                  for p in range(0, length(w))])) AS u
        FROM words)),
weighted AS MATERIALIZED (
  SELECT piece, plen, CAST(SUM(ct) AS BIGINT) AS weight
  FROM cand GROUP BY 1, 2),
vocab AS MATERIALIZED (
  SELECT piece FROM weighted WHERE plen = 1
  UNION
  SELECT piece FROM (
    SELECT piece,
           ROW_NUMBER() OVER (
             PARTITION BY (piece LIKE '##%'), plen
             ORDER BY weight DESC, piece) AS rk
    FROM weighted WHERE plen > 1)
  WHERE rk <= 30),
seg AS (
  SELECT w, 0 AS pos, 0 AS np FROM words
  UNION ALL
  SELECT s.w,
         s.pos + CASE WHEN v4.piece IS NOT NULL THEN 4
                      WHEN v3.piece IS NOT NULL THEN 3
                      WHEN v2.piece IS NOT NULL THEN 2
                      ELSE 1 END,
         s.np + 1
  FROM seg s
  LEFT JOIN vocab v4
    ON s.pos + 4 <= length(s.w)
   AND v4.piece = CASE WHEN s.pos = 0 THEN substring(s.w, 1, 4)
                       ELSE '##' || substring(s.w, s.pos + 1, 4) END
  LEFT JOIN vocab v3
    ON s.pos + 3 <= length(s.w)
   AND v3.piece = CASE WHEN s.pos = 0 THEN substring(s.w, 1, 3)
                       ELSE '##' || substring(s.w, s.pos + 1, 3) END
  LEFT JOIN vocab v2
    ON s.pos + 2 <= length(s.w)
   AND v2.piece = CASE WHEN s.pos = 0 THEN substring(s.w, 1, 2)
                       ELSE '##' || substring(s.w, s.pos + 1, 2) END
  WHERE s.pos < length(s.w)),
wseg AS MATERIALIZED (
  SELECT w, np FROM seg WHERE pos = length(w)),
agg AS MATERIALIZED (
  SELECT t.doc_id, COUNT(*) AS n_words, SUM(ws.np) AS n_pieces,
         SUM(ws.np - 1) AS n_cont
  FROM tok t JOIN wseg ws ON t.w = ws.w GROUP BY 1)
SELECT d.doc_id,
       CAST(COALESCE(agg.n_words, 0) AS BIGINT) AS n_words,
       CAST(COALESCE(agg.n_pieces, 0) AS BIGINT) AS n_pieces,
       CAST(COALESCE(agg.n_cont, 0) AS BIGINT) AS n_cont_pieces,
       CAST(0 AS BIGINT) AS n_unk
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
"""


@register(
    "text_wordpiece_encode",
    oracle=_WP_ORACLE,
    doc="WordPiece tokenization (Wu et al. 2016; the BERT tokenizer) "
    "— greedy LONGEST-match-first against a fixed vocabulary with "
    "'##' continuation marking, completing the tokenizer family "
    "next to bpe_train/bpe_encode. The vocabulary is induced "
    "deterministically in-query: every single character per role "
    "(start / continuation — guaranteeing no [UNK], the same reason "
    "real pipelines add byte fallback) plus the top-30 most corpus-"
    "frequent multi-char pieces per (kind, length<=4), ties broken "
    "by piece text. Scale shape mirrors bpe_encode: the segmenter "
    "runs once per DISTINCT word (Arrow-batched over the word "
    "vocabulary, piece set closed over) and joins back to the "
    "(doc, word) pairs. The oracle replays BOTH the vocabulary "
    "induction (nested substring comprehension + windowed top-K) "
    "and the greedy scan (a recursive CTE stepping longest-first "
    "4/3/2/1 via vocab joins) blind. n_cont_pieces = n_pieces - "
    "n_words doubles as a segmentation-count invariant. "
    "operators/wordpiece.py wordpiece_segment",
    tags=("llm", "text"),
)
def text_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.wordpiece import (
        induce_vocab,
        wordpiece_encode,
    )

    docs = load_table(spark, sf_dir, "documents")
    return wordpiece_encode(docs, induce_vocab(docs))


@register(
    "multimodal_lz4_frames",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, doc_id % 9 = 0 AS bad,
                      1 + doc_id % 3 AS n, doc_id % 5 = 0 AS skip
               FROM documents)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'lz4' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_frames,
           CAST(CASE WHEN bad THEN 0 ELSE n // 2 END AS BIGINT)
             AS n_checksummed,
           CAST(CASE WHEN bad OR NOT skip THEN 0 ELSE 1 END AS BIGINT)
             AS n_skippable,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([220 + (media_id * 41 + 31 * j) % 700
                               for j in range(0, n)]) END AS BIGINT)
             AS decoded_len,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([list_sum(
                       [97 + ((media_id * 7 + 13 * j + (k // 5) * 11)
                              % 7)
                        for k in range(0,
                            220 + (media_id * 41 + 31 * j) % 700)])
                     for j in range(0, n)]) END AS BIGINT)
             AS payload_sum
    FROM m
    """,
    doc="LZ4 frame decode from scratch (block + frame formats): "
    "token/literal/offset sequence walk with linked-block history "
    "windows (the reference encoder writes LINKED frames — matches "
    "reach into previous blocks), frame descriptor whose HC byte is "
    "(XXH32(descriptor)>>8)&0xFF — verified on every reference-"
    "written frame, so the hand XXH32 is cross-checked against the "
    "real encoder — stored-block flag, skippable frames, multi-"
    "frame concat, and content checksums (added frame-surgically in "
    "the fixture since the reference writes none). Every 9th id "
    "force-checksums then flips the last frame's middle byte — "
    "degrade is deterministic. The oracle recomputes frame counts "
    "and decoded byte sums blind. operators/lz4.py "
    "lz4_frame_decompress",
    tags=("llm", "multimodal"),
)
def multimodal_lz4_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.lz4 import (
        lz4_frame_stats,
        synthesize_lz4_media,
    )

    media = synthesize_lz4_media(load_table(spark, sf_dir, "documents"))
    return lz4_frame_stats(media)


@register(
    "multimodal_parquet_lz4",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, doc_id % 13 = 0 AS bad,
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
    doc="LZ4_RAW-compressed parquet column read (thrift codec 7, one "
    "plain LZ4 block per page) under the same page walk as "
    "multimodal_parquet_column — with this the page walk hand-"
    "decodes EVERY parquet codec in practical use: UNCOMPRESSED, "
    "SNAPPY, GZIP, ZSTD, LZ4_RAW. Decoded length proven against the "
    "page header; the oracle recomputes exact column sums blind; "
    "every 13th id's smashed footer length degrades. "
    "operators/parquetmeta.py _page_decompress, operators/lz4.py "
    "lz4_block_decompress",
    tags=("llm", "multimodal"),
)
def multimodal_parquet_lz4(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.parquetmeta import (
        parquet_column_stats,
        synthesize_parquet_lz4_media,
    )

    media = synthesize_parquet_lz4_media(
        load_table(spark, sf_dir, "documents")
    )
    return parquet_column_stats(media)


@register(
    "text_blocklist_ac",
    oracle="""
    WITH p AS (SELECT unnest(['he','she','his','hers','in','ing',
                              'ion','on','er','ers','the','then',
                              'at','ate','rat','an','and']) AS pattern),
    d AS (SELECT doc_id, lower(text) AS t FROM documents),
    c AS (SELECT doc_id, pattern,
            CAST(COALESCE(list_sum(
              [CASE WHEN substring(t, i, length(pattern)) = pattern
                    THEN 1 ELSE 0 END
               for i in range(1, length(t) - length(pattern) + 2)]),
              0) AS BIGINT) AS n_hits
          FROM d CROSS JOIN p)
    SELECT doc_id, pattern, n_hits FROM c WHERE n_hits > 0
    """,
    doc="Aho-Corasick multi-pattern blocklist scan (Aho & Corasick "
    "1975) — the phrase-screening pass every production corpus "
    "filter runs (bad-word lists, PII triggers, benchmark-"
    "contamination strings): ONE pass over each document matches "
    "the whole pattern set, instead of one pass per phrase. Classic "
    "construction from scratch: goto trie, BFS failure links, "
    "output-link merging so OVERLAPPING and nested occurrences all "
    "count — the blocklist deliberately contains the textbook "
    "he/she/his/hers family plus nested in/ing/ion/on and er/ers "
    "chains, so finding 'hers' must also report 'he' and 'ers'. "
    "The oracle recomputes every per-(doc, pattern) overlapping "
    "count position-by-position. The bounded pattern set builds "
    "once per worker; Arrow-batched mapInPandas, zero shuffle "
    "before the bounded (doc x pattern) output. "
    "operators/ahocorasick.py ac_build/ac_count",
    tags=("llm", "text"),
)
def text_blocklist_ac(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.ahocorasick import (
        blocklist_scan,
    )

    return blocklist_scan(load_table(spark, sf_dir, "documents"))


@register(
    "text_idn_punycode",
    oracle="""
    WITH m AS (SELECT doc_id AS i, doc_id % 8 = 0 AS bad,
                      3 + doc_id % 6 AS n
               FROM documents)
    SELECT i AS doc_id,
           CASE WHEN bad THEN 'invalid' ELSE 'ok' END AS status,
           CAST(CASE WHEN bad THEN 0 ELSE 3 END AS BIGINT) AS n_labels,
           CAST(CASE WHEN bad THEN 0 ELSE 1 END AS BIGINT)
             AS n_idn_labels,
           CAST(CASE WHEN bad THEN 0 ELSE 8 + n END AS BIGINT)
             AS n_cps,
           CAST(CASE WHEN bad THEN 0
                ELSE 100 + 48 + i % 10
                     + 103 + 48 + i % 10
                     + list_sum([945 + (i + k) % 24
                                 for k in range(0, n)])
                     + 448 END AS BIGINT) AS cp_sum
    FROM m
    """,
    doc="Punycode / IDNA decode (RFC 3492) — internationalized "
    "domains in the crawl front door: a URL dedup that treats "
    "xn--nxasmq6b and its Unicode form as different hosts fetches "
    "the same site twice, and homograph analysis needs the decoded "
    "code points. The RFC's generalized-variable-length-integer "
    "decode, bias adaptation and insertion reconstruction are "
    "implemented from scratch (the RFC's own sample vectors and a "
    "2000-case fuzz against the stdlib reference codec are pinned "
    "in tests); strictness rejects invalid digits, overflow, "
    "truncation, and xn-- labels that decode to pure ASCII (a "
    "spoofing vector). Fixture hosts carry a formula-derived Greek "
    "label encoded by the stdlib codec (encoder side only); every "
    "8th id has an invalid '!' digit injected and must reject. The "
    "oracle recomputes label/code-point counts and code-point sums "
    "blind. operators/punycode.py punycode_decode",
    tags=("llm", "text"),
)
def text_idn_punycode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.punycode import (
        idn_decode_stats,
        synthesize_idn_hosts,
    )

    hosts = synthesize_idn_hosts(load_table(spark, sf_dir, "documents"))
    return idn_decode_stats(hosts)


@register(
    "crawl_sitemap_parse",
    oracle="""
    WITH m AS (SELECT doc_id AS i, doc_id % 7 = 0 AS bad,
                      doc_id % 2 = 0 AS isurl,
                      length(CAST(doc_id AS VARCHAR)) AS li,
                      1 + doc_id % 5 AS nu, 1 + doc_id % 3 AS ns
               FROM documents)
    SELECT i AS doc_id,
           CASE WHEN bad THEN 'invalid'
                WHEN isurl THEN 'urlset'
                ELSE 'sitemapindex' END AS kind,
           CAST(CASE WHEN bad THEN 0
                WHEN isurl THEN nu ELSE ns END AS BIGINT) AS n_entries,
           CAST(CASE WHEN bad THEN 0
                WHEN isurl THEN nu * (32 + li)
                ELSE ns * (29 + li) END AS BIGINT) AS loc_len_sum,
           CAST(CASE WHEN bad OR NOT isurl THEN 0
                ELSE list_sum([(i + j) % 10 for j in range(0, nu)])
                END AS BIGINT) AS pri_x10_sum
    FROM m
    """,
    doc="Sitemap XML parsing (sitemaps.org protocol 0.9) — the "
    "fourth leg of the crawl-governance front door next to "
    "robots.txt, URL canonicalization and IDN decode: a from-"
    "scratch strict XML subset (declaration/comments, properly "
    "nested tags with mismatch rejection, attribute tolerance, the "
    "five predefined entities plus decimal/hex character "
    "references) interpreted as urlset -> per-url loc/priority and "
    "sitemapindex -> child sitemap locs (a real crawler walks "
    "both). Fixture locs carry an ENTITY-ENCODED query string, so "
    "loc_len_sum proves the decode (the oracle counts DECODED "
    "characters blind); every 7th id closes the root with the "
    "wrong tag and must reject — a truncated or mangled sitemap "
    "never half-parses. operators/sitemap.py parse_sitemap",
    tags=("llm", "text", "scan"),
)
def crawl_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.sitemap import (
        sitemap_stats,
        synthesize_sitemaps,
    )

    xml = synthesize_sitemaps(load_table(spark, sf_dir, "documents"))
    return sitemap_stats(xml)


@register(
    "multimodal_warc_zstd",
    oracle="""
    WITH s AS (SELECT doc_id AS media_id, doc_id % 3 AS v,
                      doc_id % 13 = 0 OR
                      (doc_id % 11 = 0 AND doc_id % 3 <> 1) AS bad,
                      string_split(text, ' ') AS ws,
                      1 + doc_id % 3 AS nli
               FROM documents),
    b AS (SELECT media_id, v, bad, nli, len(ws) AS nw,
                 array_to_string(ws[1:len(ws)//2], ' ') AS p1,
                 array_to_string(ws[len(ws)//2+1:len(ws)], ' ') AS p2
          FROM s),
    h AS (SELECT *,
            'Heading ' || CAST(media_id AS VARCHAR) || chr(10)
            || p1 || chr(10) || p2 || chr(10)
            || array_to_string(
                 ['item ' || CAST(media_id AS VARCHAR) || ' '
                  || CAST(j AS VARCHAR) for j in range(0, nli)],
                 chr(10))
            || chr(10)
            || 'amp & lt < gt > quote " num A hex B link '
            || CAST(media_id AS VARCHAR) || ' end' AS hbody,
            p1 || chr(10) || p2 AS cbody
          FROM b)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'warc' END AS format,
           CAST(CASE WHEN bad THEN 0 WHEN v = 2 THEN 3
                ELSE 2 END AS BIGINT) AS n_records,
           CAST(CASE WHEN bad OR v = 1 THEN 0 ELSE 1 END AS BIGINT)
             AS n_responses,
           CAST(CASE WHEN bad OR v = 0 THEN 0 ELSE 1 END AS BIGINT)
             AS n_conversions,
           CASE WHEN bad OR v = 1 THEN ''
                ELSE 'Doc ' || CAST(media_id AS VARCHAR) END AS title,
           CAST(CASE WHEN bad THEN 0 ELSE
                  (CASE WHEN v <> 1 THEN 4 + nli ELSE 0 END)
                + (CASE WHEN v <> 0 THEN 2 ELSE 0 END)
                END AS BIGINT) AS n_blocks,
           CAST(CASE WHEN bad THEN 0 ELSE
                  (CASE WHEN v <> 1 THEN 2 + nw + 3 * nli + 15
                        ELSE 0 END)
                + (CASE WHEN v <> 0 THEN nw ELSE 0 END)
                END AS BIGINT) AS n_words,
           CASE WHEN bad THEN ''
                WHEN v = 0 THEN hbody
                WHEN v = 1 THEN cbody
                ELSE hbody || chr(10) || cbody END AS body_text
    FROM h
    """,
    doc=".warc.zst ingest — the MODERN CommonCrawl container (newer "
    "CC crawls ship zstd-compressed): one zstd frame per record, "
    "mirroring the one-gzip-member-per-record convention, so the "
    "web-corpus front door now runs END-TO-END on either codec "
    "family — the from-scratch RFC 8878 decoder (FSE + Huffman + "
    "sequences) feeds the same WARC framing, HTML extraction and "
    "WET passthrough as the gzip twin (multimodal_wet_text), with "
    "identical record mix and rotating compression levels. Every "
    "5th id uses the REAL .warc.zst dictionary convention: a "
    "leading 0x184D2A5D skippable frame carries an RFC 8878 §5 "
    "TRAINED dictionary (itself zstd-compressed on 10th ids) and "
    "all record frames are reference-encoder compressed AGAINST "
    "it — the hand decoder resolves the Dictionary_ID, pre-seeds "
    "entropy/repeat state, and primes the LZ77 window; omitted "
    "(65th) and truncated (195th) dictionary lies ride already-"
    "bad rows and must refuse, "
    "and the same per-layer corruption stripes: every 13th id lies "
    "about Content-Length (zstd still decodes cleanly — only WARC "
    "framing catches it), response-bearing every-11th ids keep the "
    "unclosed-script swallow. The oracle reconstructs the exact "
    "combined body text blind. operators/warc.py "
    "warc_zstd_text_extract, operators/zstd.py iter_zstd_frames",
    tags=("llm", "multimodal", "text"),
)
def multimodal_warc_zstd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.warc import (
        synthesize_warc_zstd_media,
        warc_zstd_text_extract,
    )

    media = synthesize_warc_zstd_media(
        load_table(spark, sf_dir, "documents")
    )
    return warc_zstd_text_extract(media)

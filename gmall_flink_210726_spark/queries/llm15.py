r"""LLM-pipeline wave 15: the nested lakehouse read path and the
remaining ingest-format walks.

Round-11 brief items (VERDICT r10 "Next round"): parquet NESTED
columns — repetition levels + Dremel record assembly over the
standard 3-level LIST shape, the one remaining structural gap
between the hand reader and real lakehouse files (every real schema
has arrays; this repo's own ``embeddings.embedding`` is one) — the
Avro object-container walk (the Kafka-ecosystem ingest format the
gmall reference's topics would carry in production), WAT metadata
records completing the CommonCrawl WARC/WET/WAT trio, the WebDataset
tar→JPEG loader composition, and hand-written Unicode NFC
normalization for the text front door.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "multimodal_parquet_nested",
    oracle="""
    WITH m AS (SELECT doc_id AS i, doc_id % 13 = 0 AS bad,
                      10 + doc_id % 90 AS n, 1 + doc_id % 3 AS g
               FROM documents),
    r AS (SELECT i, n, unnest(range(0, n)) AS rr FROM m),
    ar AS (SELECT i, rr, (i + 5 * rr) % 7 AS m7,
                  1 + (i + rr) % 4 AS nel
           FROM r),
    ae AS (SELECT i,
                  CASE WHEN (i + rr + 3 * j) % 11 = 0 THEN NULL
                       ELSE (i + 3 * rr + 17 * j) % 1000 END AS v
           FROM (SELECT i, rr, unnest(range(0, nel)) AS j
                 FROM ar WHERE m7 >= 2)),
    aagg AS (SELECT i, COUNT(v) AS arr_elems,
                    COUNT(*) - COUNT(v) AS arr_null_elems,
                    COALESCE(SUM(v), 0) AS arr_sum
             FROM ae GROUP BY i),
    alists AS (SELECT i,
                      SUM(CASE WHEN m7 = 0 THEN 1 ELSE 0 END)
                        AS arr_null_lists,
                      SUM(CASE WHEN m7 = 1 THEN 1 ELSE 0 END)
                        AS arr_empty_lists
               FROM ar GROUP BY i),
    tr AS (SELECT i, rr, (i + 2 * rr) % 5 AS m5, rr % 3 AS tl FROM r),
    te AS (SELECT i,
                  CASE WHEN (i + rr + j) % 13 = 0 THEN NULL
                       ELSE 'tag' || CAST((i + 4 * rr + j) % 100
                                          AS VARCHAR) END AS s
           FROM (SELECT i, rr, unnest(range(0, tl)) AS j
                 FROM tr WHERE m5 <> 0)),
    tagg AS (SELECT i, COUNT(s) AS tag_count,
                    COALESCE(SUM(length(s)), 0) AS tag_len_sum
             FROM te GROUP BY i),
    tlists AS (SELECT i,
                      SUM(CASE WHEN m5 = 0 THEN 1 ELSE 0 END)
                        AS tag_null_lists,
                      SUM(CASE WHEN m5 <> 0 AND tl = 0 THEN 1 ELSE 0 END)
                        AS tag_empty_lists
               FROM tr GROUP BY i)
    SELECT m.i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'parquet' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_records,
           CAST(CASE WHEN bad THEN 0 ELSE 2 * g END AS BIGINT) AS n_pages,
           CAST(CASE WHEN bad THEN 0 ELSE COALESCE(aagg.arr_sum, 0) END
                AS BIGINT) AS arr_sum,
           CAST(CASE WHEN bad THEN 0 ELSE COALESCE(aagg.arr_elems, 0) END
                AS BIGINT) AS arr_elems,
           CAST(CASE WHEN bad THEN 0
                ELSE COALESCE(aagg.arr_null_elems, 0) END AS BIGINT)
             AS arr_null_elems,
           CAST(CASE WHEN bad THEN 0 ELSE alists.arr_null_lists END
                AS BIGINT) AS arr_null_lists,
           CAST(CASE WHEN bad THEN 0 ELSE alists.arr_empty_lists END
                AS BIGINT) AS arr_empty_lists,
           CAST(CASE WHEN bad THEN 0 ELSE COALESCE(tagg.tag_count, 0) END
                AS BIGINT) AS tag_count,
           CAST(CASE WHEN bad THEN 0 ELSE COALESCE(tagg.tag_len_sum, 0) END
                AS BIGINT) AS tag_len_sum,
           CAST(CASE WHEN bad THEN 0 ELSE tlists.tag_null_lists END
                AS BIGINT) AS tag_null_lists,
           CAST(CASE WHEN bad THEN 0 ELSE tlists.tag_empty_lists END
                AS BIGINT) AS tag_empty_lists
    FROM m
    JOIN alists ON alists.i = m.i
    JOIN tlists ON tlists.i = m.i
    LEFT JOIN aagg ON aagg.i = m.i
    LEFT JOIN tagg ON tagg.i = m.i
    """,
    doc="Parquet NESTED columns from scratch: repetition levels + "
    "Dremel record assembly (Melnik et al., VLDB 2010) over the "
    "standard 3-level LIST shape — optional group (LIST) { repeated "
    "group list { optional leaf } } — the layout of this repo's own "
    "embeddings.embedding column and of real lakehouse array "
    "schemas. Fixture files (REAL pyarrow writes) carry a nullable "
    "list<int64> with empty lists and null elements plus a nullable "
    "list<string>; the schema walk derives (max_def=3, max_rep=1) "
    "from the repetition types, each v1 page yields two 4-byte-"
    "length-prefixed RLE level streams + PLAIN values, and record "
    "assembly rebuilds the lists (rep 0 opens a record; def 0 null "
    "list / 1 empty list / 2 null element / 3 value). Cross-checks: "
    "per-page level counts, exact value consumption, page counts "
    "sum to chunk num_values, ASSEMBLED record counts equal each "
    "row group's num_rows for BOTH columns, groups sum to the file "
    "rows. The page codec rotates through all five hand-decoded "
    "families (NONE/SNAPPY/GZIP/ZSTD/LZ4_RAW) by id. Every 13th "
    "id's first data-page body word is smashed to 0xFFFFFFFF (the "
    "rep-level length prefix on plain pages, a codec-grammar bomb "
    "on compressed ones) and must degrade. The oracle recomputes element "
    "sums, null/empty-list and null-element breakdowns, and string "
    "byte lengths blind from the write formulas. Pure map over "
    "blobs, zero shuffle. operators/parquetmeta.py "
    "read_parquet_nested",
    tags=("llm", "multimodal"),
)
def multimodal_parquet_nested(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.parquetmeta import (
        parquet_nested_stats,
        synthesize_parquet_nested_media,
    )

    media = synthesize_parquet_nested_media(
        load_table(spark, sf_dir, "documents")
    )
    return parquet_nested_stats(media)


@register(
    "multimodal_avro_container",
    oracle="""
    WITH m AS (SELECT doc_id AS i, doc_id % 9 = 0 AS bad,
                      8 + doc_id % 40 AS n, 1 + doc_id % 3 AS g
               FROM documents),
    r AS (SELECT i, unnest(range(0, n)) AS rr FROM m),
    base AS (SELECT i,
                    SUM((5 * i + 3 * rr) % 1000) AS id_sum,
                    SUM(CASE WHEN (i + rr) % 4 = 0 THEN 0 ELSE 1 END)
                      AS name_count,
                    SUM(CASE WHEN (i + rr) % 4 = 0 THEN 0
                        ELSE 1 + length(CAST((i + 2 * rr) % 50
                                             AS VARCHAR)) END)
                      AS name_len_sum,
                    SUM(rr % 4) AS vals_count
             FROM r GROUP BY i),
    v AS (SELECT i, COALESCE(SUM((i + 7 * rr + k) % 100), 0) AS vals_sum
          FROM (SELECT i, rr, unnest(range(0, rr % 4)) AS k FROM r)
          GROUP BY i)
    SELECT m.i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'avro' END AS format,
           CASE WHEN bad THEN ''
                ELSE ['null', 'deflate', 'snappy', 'zstandard',
                      'bzip2', 'xz'][1 + m.i % 6] END AS codec,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_records,
           CAST(CASE WHEN bad THEN 0 ELSE g END AS BIGINT) AS n_blocks,
           CAST(CASE WHEN bad THEN 0 ELSE base.id_sum END AS BIGINT)
             AS id_sum,
           CAST(CASE WHEN bad THEN 0 ELSE base.name_count END AS BIGINT)
             AS name_count,
           CAST(CASE WHEN bad THEN 0 ELSE base.name_len_sum END AS BIGINT)
             AS name_len_sum,
           CAST(CASE WHEN bad THEN 0 ELSE base.vals_count END AS BIGINT)
             AS vals_count,
           CAST(CASE WHEN bad THEN 0 ELSE COALESCE(v.vals_sum, 0) END
                AS BIGINT) AS vals_sum
    FROM m JOIN base ON base.i = m.i LEFT JOIN v ON v.i = m.i
    """,
    doc="Avro object-container walk from scratch (Apache Avro 1.11 "
    "spec) — the Kafka-ecosystem ingest format the gmall reference's "
    "topics would carry in production: Obj magic, block-framed file "
    "metadata map (avro.schema JSON + avro.codec), 16-byte sync "
    "marker, then sync-framed data blocks (zigzag-long count + byte "
    "size). A SCHEMA-DRIVEN decoder materializes records (long "
    "zigzag varints, union-indexed nullable string, block-framed "
    "long array) and ALL SIX spec codecs are hand-walked: null, "
    "deflate (raw DEFLATE via the repo's hand inflate), snappy "
    "(hand block decoder + the codec's big-endian CRC-32 of the "
    "uncompressed data, checked), and the optional zstandard / "
    "bzip2 / xz through the repo's hand RFC 8878 / bzip2 / xz "
    "decoders (exact-consumption checked). Cross-checks: each block decodes "
    "EXACTLY its declared record count and consumes its payload "
    "exactly; every block's trailing sync must equal the header's "
    "(every 9th id has one sync byte flipped and must degrade). "
    "The oracle recomputes id/value sums and name byte lengths "
    "blind from the write formulas. Pure map over blobs, zero "
    "shuffle. operators/avro.py read_avro_container",
    tags=("llm", "multimodal"),
)
def multimodal_avro_container(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.avro import (
        avro_container_stats,
        synthesize_avro_media,
    )

    media = synthesize_avro_media(load_table(spark, sf_dir, "documents"))
    return avro_container_stats(media)


@register(
    "multimodal_wat_links",
    oracle="""
    WITH m AS (SELECT doc_id AS i, doc_id % 10 = 0 AS bad,
                      doc_id % 3 AS v, 1 + doc_id % 5 AS nl
               FROM documents),
    l AS (SELECT i, 16 + length(CAST((3 * i + j) % 50 AS VARCHAR))
                   AS ulen
          FROM (SELECT i, nl, unnest(range(0, nl)) AS j FROM m)),
    ls AS (SELECT i, CAST(SUM(ulen) AS BIGINT) AS lls FROM l GROUP BY i)
    SELECT m.i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'warc' END AS format,
           CAST(CASE WHEN bad THEN 0
                ELSE 2 + CASE WHEN v <> 1 THEN 1 ELSE 0 END
                       + CASE WHEN v <> 0 THEN 1 ELSE 0 END
                END AS BIGINT) AS n_records,
           CAST(CASE WHEN bad THEN 0 ELSE 1 END AS BIGINT) AS n_warcinfo,
           CAST(CASE WHEN bad OR v = 1 THEN 0 ELSE 1 END AS BIGINT)
             AS n_responses,
           CAST(CASE WHEN bad OR v = 0 THEN 0 ELSE 1 END AS BIGINT)
             AS n_conversions,
           CAST(CASE WHEN bad THEN 0 ELSE 1 END AS BIGINT) AS n_metadata,
           CAST(CASE WHEN bad THEN 0 ELSE nl END AS BIGINT) AS n_links,
           CAST(CASE WHEN bad THEN 0 ELSE ls.lls END AS BIGINT)
             AS link_len_sum
    FROM m JOIN ls ON ls.i = m.i
    """,
    doc="WAT metadata records — the THIRD CommonCrawl file type, "
    "completing the WARC/WET/WAT trio a real CC pipeline consumes: "
    "WARC-Type 'metadata' records whose payload is a JSON Envelope; "
    "the link graph is extracted from Envelope -> Payload-Metadata "
    "-> HTTP-Response-Metadata -> HTML-Metadata -> Links. The mixed "
    "fixture stream carries a warcinfo + response (two thirds of "
    "ids) + conversion (two thirds) + ALWAYS one WAT envelope with "
    "1 + i%5 links; the walk counts every record type and sums link "
    "URL byte lengths, and the oracle recomputes all of it blind "
    "from the write formulas (url length = 16 + digits of "
    "(3i+j)%50). Every 10th id truncates the envelope's last byte "
    "(malformed JSON) and must degrade; any missing key along the "
    "envelope path degrades too. Pure map over blobs, zero shuffle. "
    "operators/warc.py _walk_warc_wat",
    tags=("llm", "multimodal"),
)
def multimodal_wat_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.warc import (
        synthesize_wat_media,
        warc_wat_stats,
    )

    media = synthesize_wat_media(load_table(spark, sf_dir, "documents"))
    return warc_wat_stats(media)


_WDS_ORACLE_BODY = """
    WITH m AS (SELECT doc_id AS i, doc_id % 17 = 0 AS shard_bad,
                      2 + doc_id % 3 AS ns
               FROM documents),
    s AS (SELECT i, shard_bad, ns, 4 * i + s AS sid
          FROM (SELECT i, shard_bad, ns, unnest(range(0, ns)) AS s
                FROM m)),
    d AS (SELECT i, shard_bad, ns, sid, sid % 13 = 0 AS sbad,
                 1 + sid % 4 AS bw, 1 + sid % 3 AS bh,
                 sid % 5 AS wp, sid % 3 AS hp
          FROM s),
    p AS (SELECT i, shard_bad, ns, sbad,
                 (8 * bw - wp) * (8 * bh - hp) AS npx,
                 list_sum([((sid * 37 + 11 * b) % 256)
                           * (CASE WHEN b % bw = bw - 1
                                   THEN 8 - wp ELSE 8 END)
                           * (CASE WHEN b // bw = bh - 1
                                   THEN 8 - hp ELSE 8 END)
                           for b in range(0, bw * bh)]) AS psum,
                 sid % 10 AS cls
          FROM d),
    agg AS (SELECT i, shard_bad, ns,
                   SUM(CASE WHEN sbad THEN 1 ELSE 0 END) AS n_bad,
                   SUM(CASE WHEN sbad THEN 0 ELSE npx END) AS n_pixels,
                   SUM(CASE WHEN sbad THEN 0 ELSE psum END) AS pixel_sum,
                   SUM(CASE WHEN sbad THEN 0 ELSE cls END) AS cls_sum
            FROM p GROUP BY 1, 2, 3)
"""


@register(
    "multimodal_webdataset",
    oracle=_WDS_ORACLE_BODY
    + """
    SELECT i AS media_id,
           CASE WHEN shard_bad THEN 'unknown'
                ELSE 'webdataset' END AS format,
           CAST(CASE WHEN shard_bad THEN 0 ELSE ns END AS BIGINT)
             AS n_samples,
           CAST(CASE WHEN shard_bad THEN 0 ELSE ns - n_bad END AS BIGINT)
             AS n_ok,
           CAST(CASE WHEN shard_bad THEN 0 ELSE n_bad END AS BIGINT)
             AS n_bad,
           CAST(CASE WHEN shard_bad THEN 0 ELSE n_pixels END AS BIGINT)
             AS n_pixels,
           CAST(CASE WHEN shard_bad THEN 0 ELSE pixel_sum END AS BIGINT)
             AS pixel_sum,
           CAST(CASE WHEN shard_bad THEN 0 ELSE cls_sum END AS BIGINT)
             AS cls_sum
    FROM agg
    """,
    doc="WebDataset loader pass END-TO-END: tar shards of real "
    "baseline JPEGs -> member walk (checksummed ustar headers) -> "
    "consecutive-key sample grouping (<key>.jpg + <key>.cls) -> "
    "per-sample from-scratch JPEG decode (Huffman + dequant + IDCT) "
    "-> per-shard pixel checksums — the composition a multimodal "
    "training pipeline actually runs per shard, as ONE operator "
    "(composes operators/tar.py with operators/jpeg.py). Two-layer "
    "degrade contract: every 17th id's smashed shard header "
    "degrades the whole row; the JPEG fixture's every-13th-sid "
    "truncation stripe marks just that SAMPLE bad and the rest of "
    "the shard still loads (a loader drops samples, not shards). "
    "The oracle recomputes per-shard sample counts, crop-weighted "
    "pixel sums and label sums blind from the write formulas. Pure "
    "map over shards, zero shuffle of payload bytes. "
    "operators/wds.py _walk_wds",
    tags=("llm", "multimodal"),
)
def multimodal_webdataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.wds import (
        synthesize_wds_media,
        wds_sample_stats,
    )

    media = synthesize_wds_media(load_table(spark, sf_dir, "documents"))
    return wds_sample_stats(media)


@register(
    "text_nfc_normalize",
    oracle="""
    WITH m AS (SELECT doc_id AS i, doc_id % 11 = 0 AS bad,
                      5 + doc_id % 20 AS k
               FROM documents),
    u AS (SELECT i, 97 + (i + j) % 26 AS filler,
                 CASE (i + 3 * j) % 12
                      WHEN 0 THEN 224 WHEN 1 THEN 225 WHEN 2 THEN 233
                      WHEN 3 THEN 232 WHEN 4 THEN 237 WHEN 5 THEN 244
                      WHEN 6 THEN 252 WHEN 7 THEN 241 WHEN 8 THEN 231
                      WHEN 9 THEN 193 WHEN 10 THEN 353 ELSE 380
                 END AS comp
          FROM (SELECT i, k, unnest(range(0, k)) AS j FROM m)),
    agg AS (SELECT i, SUM(filler + comp) AS unit_sum FROM u GROUP BY i)
    SELECT m.i AS doc_id,
           CAST(CASE WHEN bad THEN 0 ELSE 1 END AS BIGINT) AS normalized,
           CAST(CASE WHEN bad THEN 0 ELSE k + 1 END AS BIGINT)
             AS n_composed,
           CAST(CASE WHEN bad THEN 0 ELSE 2 * k + 2 END AS BIGINT)
             AS out_len,
           CAST(CASE WHEN bad THEN 0 ELSE agg.unit_sum + 1031 END
                AS BIGINT) AS cp_sum
    FROM m JOIN agg ON agg.i = m.i
    """,
    doc="Hand-written Unicode NFC normalization (UAX #15) over a "
    "bounded in-code table — the C4/CCNet front-door step between "
    "charset transcode and tokenization: the full 161-entry "
    "canonical decomposition table for Latin-1 Supplement + Latin "
    "Extended-A, canonical reordering by combining class (stable "
    "sort of nonzero-ccc runs), and the UAX #15 composition "
    "algorithm with last-starter tracking and blocking. Two-sided "
    "degrade: out-of-table codepoints AND non-blocked pairs full "
    "Unicode composes OUTSIDE the covered ranges (the exhaustive "
    "_UNSAFE set) both return un-normalizable — the operator never "
    "emits a normalization unicodedata would disagree with "
    "(fuzz-pinned over 50k covered-alphabet strings in tests). The "
    "fixture builds per-doc NFD strings (filler + decomposed pair "
    "units, plus one multi-mark reorder unit a+cedilla+grave whose "
    "ccc-202 mark must NOT block the ccc-230 grave composing to "
    "a-grave); every 11th id appends an out-of-table mark (U+0359) "
    "and must degrade. The oracle recomputes composed codepoint "
    "sums blind from its own independent pair->composed CASE "
    "mapping. Arrow-batched mapInPandas, zero shuffle. "
    "operators/nfc.py nfc_normalize",
    tags=("llm", "text"),
)
def text_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.nfc import nfc_normalize_stats

    return nfc_normalize_stats(load_table(spark, sf_dir, "documents"))


@register(
    "multimodal_parquet_map",
    oracle="""
    WITH m AS (SELECT doc_id AS i, doc_id % 14 = 0 AS bad,
                      8 + doc_id % 50 AS n, 1 + doc_id % 3 AS g
               FROM documents),
    r AS (SELECT i, rr, (i + 3 * rr) % 6 = 0 AS mnull, rr % 3 AS t
          FROM (SELECT i, n, unnest(range(0, n)) AS rr FROM m)),
    e AS (SELECT i, CASE WHEN (i + 2 * rr + j) % 7 = 0 THEN NULL
                         ELSE (i + 5 * rr + 11 * j) % 500 END AS v
          FROM (SELECT i, rr, unnest(range(0, t)) AS j
                FROM r WHERE NOT mnull)),
    ag AS (SELECT i, COUNT(*) AS n_entries,
                  COUNT(*) - COUNT(v) AS n_null_vals,
                  COALESCE(SUM(v), 0) AS val_sum
           FROM e GROUP BY i),
    lm AS (SELECT i,
                  SUM(CASE WHEN mnull THEN 1 ELSE 0 END) AS n_null_maps,
                  SUM(CASE WHEN NOT mnull AND t = 0 THEN 1 ELSE 0 END)
                    AS n_empty_maps
           FROM r GROUP BY i)
    SELECT m.i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'parquet' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_records,
           CAST(CASE WHEN bad THEN 0 ELSE 2 * g END AS BIGINT) AS n_pages,
           CAST(CASE WHEN bad THEN 0 ELSE lm.n_null_maps END AS BIGINT)
             AS n_null_maps,
           CAST(CASE WHEN bad THEN 0 ELSE lm.n_empty_maps END AS BIGINT)
             AS n_empty_maps,
           CAST(CASE WHEN bad THEN 0 ELSE COALESCE(ag.n_entries, 0) END
                AS BIGINT) AS n_entries,
           CAST(CASE WHEN bad THEN 0
                ELSE 2 * COALESCE(ag.n_entries, 0) END AS BIGINT)
             AS key_len_sum,
           CAST(CASE WHEN bad THEN 0 ELSE COALESCE(ag.n_null_vals, 0) END
                AS BIGINT) AS n_null_vals,
           CAST(CASE WHEN bad THEN 0 ELSE COALESCE(ag.val_sum, 0) END
                AS BIGINT) AS val_sum
    FROM m JOIN lm ON lm.i = m.i LEFT JOIN ag ON ag.i = m.i
    """,
    doc="Parquet nested MAP columns from scratch — the OTHER "
    "dominant nested layout beside LIST: optional group (MAP) { "
    "repeated group key_value { required key; optional value } }. "
    "A map is TWO leaf streams sharing one repetition structure "
    "(REQUIRED key at max_def=2, OPTIONAL value at max_def=3, both "
    "derived from the schema walk, exercising the required-leaf "
    "Dremel branch the LIST reader never hits); each is page-walked "
    "and assembled independently, then ZIPPED with the map-specific "
    "cross-check: both leaves must agree record-by-record on "
    "null/empty/entry-count — a key stream and value stream that "
    "disagree is a corrupt file. Codec rotates NONE/SNAPPY/ZSTD. "
    "Every 14th id smashes the VALUE chunk's first page body word: "
    "the key stream still parses, so only the zip cross-check "
    "catches it. The oracle recomputes entry counts, key byte "
    "lengths, null-value counts and value sums blind. Pure map over "
    "blobs, zero shuffle. operators/parquetmeta.py read_parquet_map",
    tags=("llm", "multimodal"),
)
def multimodal_parquet_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.parquetmeta import (
        parquet_map_stats,
        synthesize_parquet_map_media,
    )

    media = synthesize_parquet_map_media(
        load_table(spark, sf_dir, "documents")
    )
    return parquet_map_stats(media)


@register(
    "multimodal_parquet_nested_v2",
    # identical write formulas, so the v1 query's oracle applies
    # verbatim: the page FORMAT differs, the content does not
    oracle=None,  # set right below to the v1 oracle text
    doc="Parquet nested LIST columns over DATA_PAGE_V2 pages — the "
    "v2 page format's defining difference exercised on the NESTED "
    "path: repetition/definition level byte lengths live in the "
    "page header, the level streams are ALWAYS uncompressed and "
    "sit OUTSIDE the codec, is_compressed applies to the values "
    "alone, and v2 carries its own per-page books (the walk checks "
    "rep==0 count == the header's num_rows — a cross-check v1 "
    "cannot offer). Same fixture formulas, codec rotation and "
    "smashed-stripe contract as multimodal_parquet_nested (the "
    "smash lands on the raw rep-level RLE stream itself here), so "
    "the same blind oracle applies verbatim; v1/v2 agreement is "
    "additionally unit-pinned. operators/parquetmeta.py "
    "_read_list_chunk",
    tags=("llm", "multimodal"),
)
def multimodal_parquet_nested_v2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.parquetmeta import (
        parquet_nested_stats,
        synthesize_parquet_nested_v2_media,
    )

    media = synthesize_parquet_nested_v2_media(
        load_table(spark, sf_dir, "documents")
    )
    return parquet_nested_stats(media)


# the v2 twin shares the v1 oracle verbatim (same write formulas)
from gmall_flink_210726_spark.registry import QUERIES as _Q  # noqa: E402

_Q["multimodal_parquet_nested_v2"].oracle = _Q[
    "multimodal_parquet_nested"
].oracle


@register(
    "multimodal_parquet_deep",
    oracle="""
    WITH m AS (SELECT doc_id AS i, doc_id % 16 = 0 AS bad,
                      8 + doc_id % 40 AS n, 1 + doc_id % 3 AS g
               FROM documents),
    r AS (SELECT i, rr, (i + 2 * rr) % 6 AS m6, 1 + (i + rr) % 3 AS ol
          FROM (SELECT i, n, unnest(range(0, n)) AS rr FROM m)),
    outa AS (SELECT i,
                    SUM(CASE WHEN m6 = 0 THEN 1 ELSE 0 END) AS outer_null,
                    SUM(CASE WHEN m6 = 1 THEN 1 ELSE 0 END) AS outer_empty
             FROM r GROUP BY i),
    inr AS (SELECT i, rr, j, (i + rr + 2 * j) % 5 AS m5,
                   1 + (i + j) % 3 AS il
            FROM (SELECT i, rr, ol, unnest(range(0, ol)) AS j
                  FROM r WHERE m6 >= 2)),
    ina AS (SELECT i,
                   SUM(CASE WHEN m5 <> 0 THEN 1 ELSE 0 END) AS inner_lists,
                   SUM(CASE WHEN m5 = 0 THEN 1 ELSE 0 END) AS inner_null,
                   SUM(CASE WHEN m5 = 1 THEN 1 ELSE 0 END) AS inner_empty
            FROM inr GROUP BY i),
    el AS (SELECT i, CASE WHEN (i + rr + j + k) % 9 = 0 THEN NULL
                          ELSE (i + 4 * rr + 7 * j + 13 * k) % 300
                     END AS v
           FROM (SELECT i, rr, j, unnest(range(0, il)) AS k
                 FROM inr WHERE m5 >= 2)),
    ea AS (SELECT i, COUNT(v) AS n_elems,
                  COUNT(*) - COUNT(v) AS n_null_elems,
                  COALESCE(SUM(v), 0) AS elem_sum
           FROM el GROUP BY i)
    SELECT m.i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'parquet' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_records,
           CAST(CASE WHEN bad THEN 0 ELSE g END AS BIGINT) AS n_pages,
           CAST(CASE WHEN bad THEN 0 ELSE outa.outer_null END AS BIGINT)
             AS outer_null,
           CAST(CASE WHEN bad THEN 0 ELSE outa.outer_empty END AS BIGINT)
             AS outer_empty,
           CAST(CASE WHEN bad THEN 0 ELSE COALESCE(ina.inner_lists, 0)
                END AS BIGINT) AS inner_lists,
           CAST(CASE WHEN bad THEN 0 ELSE COALESCE(ina.inner_null, 0)
                END AS BIGINT) AS inner_null,
           CAST(CASE WHEN bad THEN 0 ELSE COALESCE(ina.inner_empty, 0)
                END AS BIGINT) AS inner_empty,
           CAST(CASE WHEN bad THEN 0 ELSE COALESCE(ea.n_elems, 0) END
                AS BIGINT) AS n_elems,
           CAST(CASE WHEN bad THEN 0 ELSE COALESCE(ea.n_null_elems, 0)
                END AS BIGINT) AS n_null_elems,
           CAST(CASE WHEN bad THEN 0 ELSE COALESCE(ea.elem_sum, 0) END
                AS BIGINT) AS elem_sum
    FROM m
    JOIN outa ON outa.i = m.i
    LEFT JOIN ina ON ina.i = m.i
    LEFT JOIN ea ON ea.i = m.i
    """,
    doc="FULL Dremel record assembly at arbitrary nesting depth: "
    "list<list<int64>> (max_rep=2, max_def=5) — the shape the "
    "3-level special case cannot express (feature tensors, token "
    "span trees). The collection chain (opt,1)(rep,2)(opt,3)(rep,4)"
    "(opt,5) is DERIVED from the schema walk per leaf "
    "(_schema_leaf_chains); levels decode at their true bit widths "
    "(rep 2 bits, def 3 bits); _assemble_records_deep implements "
    "the general algorithm — the entry's repetition level selects "
    "which open list continues, the definition level selects how "
    "deep new structure is defined — and is unit-pinned to agree "
    "with the depth-1 assembler on 2000 random streams. Fixture "
    "rotates page version v1/v2 AND codec NONE/SNAPPY/ZSTD; nulls "
    "and empties exist at BOTH nesting depths; every 16th id "
    "smashes the first page body word and must degrade. The oracle "
    "triple-unnests the write formulas blind. Pure map over blobs, "
    "zero shuffle. operators/parquetmeta.py read_parquet_deep",
    tags=("llm", "multimodal"),
)
def multimodal_parquet_deep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.parquetmeta import (
        parquet_deep_stats,
        synthesize_parquet_deep_media,
    )

    media = synthesize_parquet_deep_media(
        load_table(spark, sf_dir, "documents")
    )
    return parquet_deep_stats(media)


@register(
    "multimodal_parquet_struct",
    oracle="""
    WITH m AS (SELECT doc_id AS i, doc_id % 15 = 0 AS bad,
                      9 + doc_id % 60 AS n, 1 + doc_id % 3 AS g
               FROM documents),
    r AS (SELECT i, rr, (i + 4 * rr) % 7 = 0 AS snull
          FROM (SELECT i, n, unnest(range(0, n)) AS rr FROM m)),
    f AS (SELECT i,
                 SUM(CASE WHEN snull THEN 1 ELSE 0 END) AS n_null_structs,
                 SUM(CASE WHEN NOT snull AND (i + rr) % 5 = 0
                          THEN 1 ELSE 0 END) AS a_nulls,
                 SUM(CASE WHEN NOT snull AND (i + rr) % 5 <> 0
                          THEN (i + 6 * rr) % 700 ELSE 0 END) AS a_sum,
                 SUM(CASE WHEN NOT snull AND (i + 3 * rr) % 4 = 0
                          THEN 1 ELSE 0 END) AS b_nulls,
                 SUM(CASE WHEN NOT snull AND (i + 3 * rr) % 4 <> 0
                          THEN 1 + length(CAST((i + 2 * rr) % 30
                                               AS VARCHAR))
                          ELSE 0 END) AS b_len_sum
          FROM r GROUP BY i)
    SELECT m.i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'parquet' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_records,
           CAST(CASE WHEN bad THEN 0 ELSE 2 * g END AS BIGINT) AS n_pages,
           CAST(CASE WHEN bad THEN 0 ELSE f.n_null_structs END AS BIGINT)
             AS n_null_structs,
           CAST(CASE WHEN bad THEN 0 ELSE f.a_nulls END AS BIGINT)
             AS a_nulls,
           CAST(CASE WHEN bad THEN 0 ELSE f.a_sum END AS BIGINT)
             AS a_sum,
           CAST(CASE WHEN bad THEN 0 ELSE f.b_nulls END AS BIGINT)
             AS b_nulls,
           CAST(CASE WHEN bad THEN 0 ELSE f.b_len_sum END AS BIGINT)
             AS b_len_sum
    FROM m JOIN f ON f.i = m.i
    """,
    doc="Parquet STRUCT columns — the non-repeated nesting shape "
    "completing the matrix (LIST, MAP, list<list>, now STRUCT): "
    "optional group s { optional int64 a; optional binary b }. Each "
    "field is a leaf chunk carrying DEFINITION levels only; max_rep "
    "is 0 so pages omit the repetition section entirely (the spec's "
    "conditional layout, now exercised in _read_list_chunk): def 0 "
    "struct null / 1 field null / 2 value. The struct cross-check: "
    "both leaves must agree row-by-row on WHICH rows are "
    "struct-null; the fixture smashes field b's chunk only (every "
    "15th id), so field a still parses and the agreement check (or "
    "the level grammar) must catch it. Codec rotates "
    "NONE/SNAPPY/GZIP. The oracle recomputes per-field null counts, "
    "value sums and string byte lengths blind. Pure map over blobs, "
    "zero shuffle. operators/parquetmeta.py read_parquet_struct",
    tags=("llm", "multimodal"),
)
def multimodal_parquet_struct(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.parquetmeta import (
        parquet_struct_stats,
        synthesize_parquet_struct_media,
    )

    media = synthesize_parquet_struct_media(
        load_table(spark, sf_dir, "documents")
    )
    return parquet_struct_stats(media)


@register(
    "text_front_door",
    oracle="""
    WITH m AS (SELECT doc_id AS i, doc_id % 2 = 0 AS even,
                      doc_id % 2 = 0 AND doc_id % 11 = 0 AS bad,
                      5 + doc_id % 20 AS k
               FROM documents),
    u AS (SELECT i, even, 97 + (i + j) % 26 AS filler,
                 CASE (i + 3 * j) % 12
                      WHEN 0 THEN 224 WHEN 1 THEN 225 WHEN 2 THEN 233
                      WHEN 3 THEN 232 WHEN 4 THEN 237 WHEN 5 THEN 244
                      WHEN 6 THEN 252 WHEN 7 THEN 241 WHEN 8 THEN 231
                      WHEN 9 THEN 193 WHEN 10 THEN 353 ELSE 380
                 END AS comp12,
                 CASE (i + 3 * j) % 10
                      WHEN 0 THEN 224 WHEN 1 THEN 225 WHEN 2 THEN 233
                      WHEN 3 THEN 232 WHEN 4 THEN 237 WHEN 5 THEN 244
                      WHEN 6 THEN 252 WHEN 7 THEN 241 WHEN 8 THEN 231
                      ELSE 193
                 END AS comp10
          FROM (SELECT i, even, k, unnest(range(0, k)) AS j FROM m)),
    agg AS (SELECT i,
                   SUM(filler + CASE WHEN even THEN comp12
                                     ELSE comp10 END) AS unit_sum
            FROM u GROUP BY i)
    SELECT m.i AS doc_id,
           CASE WHEN even THEN 'utf-8' ELSE 'cp1252' END AS encoding,
           CAST(CASE WHEN NOT even THEN 2 * k
                     WHEN bad THEN 4 * k + 8 ELSE 4 * k + 5 END
                AS BIGINT) AS n_bytes,
           CAST(CASE WHEN NOT even THEN 2 * k
                     WHEN bad THEN 3 * k + 5 ELSE 3 * k + 3 END
                AS BIGINT) AS n_cps,
           CAST(CASE WHEN bad THEN 0 ELSE 1 END AS BIGINT) AS normalized,
           CAST(CASE WHEN bad THEN 0 WHEN even THEN k + 1 ELSE k END
                AS BIGINT) AS n_composed,
           CAST(CASE WHEN bad THEN 0 WHEN even THEN 2 * k + 2
                     ELSE 2 * k END AS BIGINT) AS out_len,
           CAST(CASE WHEN bad THEN 0
                     WHEN even THEN agg.unit_sum + 1031
                     ELSE agg.unit_sum END AS BIGINT) AS out_cp_sum
    FROM m JOIN agg ON agg.i = m.i
    """,
    doc="The composed text FRONT DOOR as one operator — raw crawl "
    "bytes -> strict-UTF-8/cp1252/latin-1 fallback chain -> hand "
    "NFC -> per-doc proofs, the pipeline a crawl corpus runs before "
    "tokenization, composing operators/charset.py with "
    "operators/nfc.py (the text-side sibling of the WebDataset "
    "composition). Even ids are UTF-8-encoded DECOMPOSED text (the "
    "chain detects utf-8, NFC composes k+1 units; every 22nd id "
    "carries the out-of-table U+0359 and the NFC layer must refuse "
    "while the charset layer still succeeds — per-layer degrade "
    "independence); odd ids are single-byte cp1252 text already "
    "composed (strict UTF-8 must reject it, and NFC is a fixed "
    "point that still reports k decompose-recompose round-trips). "
    "The oracle recomputes byte/codepoint/composition counts and "
    "output codepoint sums blind from the write formulas. "
    "operators/nfc.py text_front_door_stats",
    tags=("llm", "text"),
)
def text_front_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.nfc import (
        text_front_door_stats,
    )

    return text_front_door_stats(load_table(spark, sf_dir, "documents"))


@register(
    "lakehouse_delta_snapshot",
    oracle="""
    WITH m AS (SELECT doc_id AS i, doc_id % 12 = 0 AS bad,
                      2 + doc_id % 4 AS c, 2 + doc_id % 3 AS a
               FROM documents),
    f0 AS (SELECT i, k % 2 AS p,
                  (i + 1) % 2 = 0 AND k = i % a AS removed,
                  1000 + (7 * i + 11 * k) % 5000 AS sz,
                  10 + (i + 3 * k) % 90 AS rws
           FROM (SELECT i, a, unnest(range(0, a)) AS k FROM m)),
    fv AS (SELECT i, 0 AS p,
                  v + 1 <= c - 1 AND (i + v + 1) % 2 = 0 AS removed,
                  1000 + (7 * i + 11 * (100 * v)) % 5000 AS sz,
                  10 + (i + 3 * (100 * v)) % 90 AS rws
           FROM (SELECT i, c, unnest(range(1, c)) AS v FROM m)),
    allf AS (SELECT * FROM f0 UNION ALL SELECT * FROM fv),
    liv AS (SELECT i, COUNT(*) AS live_files, SUM(sz) AS live_bytes,
                   SUM(rws) AS live_rows,
                   COUNT(DISTINCT p) AS n_partitions
            FROM allf WHERE NOT removed GROUP BY i),
    tot AS (SELECT i, COUNT(*) AS n_adds,
                   SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS n_removes
            FROM allf GROUP BY i)
    SELECT m.i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'delta' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE c END AS BIGINT) AS n_commits,
           CAST(CASE WHEN bad THEN 0 ELSE tot.n_adds END AS BIGINT)
             AS n_adds,
           CAST(CASE WHEN bad THEN 0 ELSE tot.n_removes END AS BIGINT)
             AS n_removes,
           CAST(CASE WHEN bad THEN 0 ELSE liv.live_files END AS BIGINT)
             AS live_files,
           CAST(CASE WHEN bad THEN 0 ELSE liv.live_bytes END AS BIGINT)
             AS live_bytes,
           CAST(CASE WHEN bad THEN 0 ELSE liv.live_rows END AS BIGINT)
             AS live_rows,
           CAST(CASE WHEN bad THEN 0 ELSE liv.n_partitions END AS BIGINT)
             AS n_partitions
    FROM m JOIN liv ON liv.i = m.i JOIN tot ON tot.i = m.i
    """,
    doc="Delta-log SNAPSHOT RESOLUTION — the table-format metadata "
    "layer above the file formats (delta.io PROTOCOL.md): a "
    "lakehouse reader replays the versioned newline-JSON commit "
    "files (contiguous from 0, checked) and the snapshot is the "
    "ordered replay where the LAST action per path wins — adds "
    "accumulate, removes drop, a re-add resurrects. Protocol "
    "checks: minReaderVersion beyond this reader degrades (the "
    "spec's own forward-compat rule), commit 0 must establish "
    "protocol+metaData, a remove of a never-live path or a re-add "
    "with a different size is a corrupt log, and malformed JSON "
    "anywhere rejects the table (every 12th id truncates the last "
    "commit mid-line). numRecords come from the adds' embedded "
    "stats JSON. Output: live file/byte/row/partition totals the "
    "oracle recomputes blind by replaying the same add/remove "
    "formulas relationally. The logs ship as tar blobs (composing "
    "the ustar walk); at 100 TB only these few-KB logs are read — "
    "which is the entire point of the table-format layer. Bench "
    "note: ~90% of this query's sf0.1 wall time is the in-query "
    "fixture INGEST (synthesizing 5k tar'd multi-commit logs); the "
    "replay itself is a few-KB-per-table metadata pass. "
    "operators/deltalog.py replay_delta_log",
    tags=("llm", "multimodal", "lakehouse"),
)
def lakehouse_delta_snapshot(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.deltalog import (
        delta_snapshot_stats,
        synthesize_delta_log_media,
    )

    media = synthesize_delta_log_media(
        load_table(spark, sf_dir, "documents")
    )
    return delta_snapshot_stats(media)


@register(
    "lakehouse_iceberg_snapshot",
    oracle="""
    WITH m AS (SELECT doc_id AS i, doc_id % 13 = 0 AS bad,
                      1 + doc_id % 3 AS nm
               FROM documents),
    mf AS (SELECT i, mm, 2 + (i + mm) % 3 AS ne
           FROM (SELECT i, nm, unnest(range(0, nm)) AS mm FROM m)),
    e AS (SELECT i, mm, ee, (i + mm + ee) % 5 AS s5,
                 10 + (i + 7 * mm + 3 * ee) % 90 AS rws,
                 500 + (11 * i + 13 * mm + 17 * ee) % 4000 AS sz
          FROM (SELECT i, mm, ne, unnest(range(0, ne)) AS ee FROM mf)),
    ag AS (SELECT i,
                  SUM(CASE WHEN s5 IN (1, 2) THEN 1 ELSE 0 END)
                    AS n_added,
                  SUM(CASE WHEN s5 >= 3 THEN 1 ELSE 0 END) AS n_existing,
                  SUM(CASE WHEN s5 = 0 THEN 1 ELSE 0 END) AS n_deleted,
                  SUM(CASE WHEN s5 <> 0 THEN 1 ELSE 0 END) AS live_files,
                  SUM(CASE WHEN s5 <> 0 THEN rws ELSE 0 END) AS live_rows,
                  SUM(CASE WHEN s5 <> 0 THEN sz ELSE 0 END) AS live_bytes
           FROM e GROUP BY i)
    SELECT m.i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'iceberg' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE nm END AS BIGINT)
             AS n_manifests,
           CAST(CASE WHEN bad THEN 0 ELSE ag.n_added END AS BIGINT)
             AS n_added,
           CAST(CASE WHEN bad THEN 0 ELSE ag.n_existing END AS BIGINT)
             AS n_existing,
           CAST(CASE WHEN bad THEN 0 ELSE ag.n_deleted END AS BIGINT)
             AS n_deleted,
           CAST(CASE WHEN bad THEN 0 ELSE ag.live_files END AS BIGINT)
             AS live_files,
           CAST(CASE WHEN bad THEN 0 ELSE ag.live_rows END AS BIGINT)
             AS live_rows,
           CAST(CASE WHEN bad THEN 0 ELSE ag.live_bytes END AS BIGINT)
             AS live_bytes
    FROM m JOIN ag ON ag.i = m.i
    """,
    doc="Iceberg SNAPSHOT WALK — the second table-format metadata "
    "layer, composed from the repo's own Avro machinery (manifest "
    "lists and manifests ARE Avro object containers, read by the "
    "same schema-driven decoder as the Kafka ingest path): "
    "metadata.json -> current-snapshot-id -> manifest list -> "
    "manifests -> live data-file totals (status 0 EXISTING / 1 "
    "ADDED live, 2 DELETED excluded). The fixture plants a DECOY "
    "older snapshot whose manifest list covers only manifest 0 — "
    "following the snapshot log instead of current-snapshot-id "
    "gives wrong totals whenever the table has >1 manifest. "
    "Cross-checks at every hop: manifest_length must equal the "
    "referenced member's actual bytes (every 13th id lies by one "
    "byte and must degrade), the list's per-status counts must "
    "equal what each manifest contains, and Avro-layer violations "
    "degrade inside the container reader. The oracle recomputes "
    "per-status counts and live row/byte totals blind. "
    "operators/iceberg.py read_iceberg_snapshot",
    tags=("llm", "multimodal", "lakehouse"),
)
def lakehouse_iceberg_snapshot(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.iceberg import (
        iceberg_snapshot_stats,
        synthesize_iceberg_media,
    )

    media = synthesize_iceberg_media(
        load_table(spark, sf_dir, "documents")
    )
    return iceberg_snapshot_stats(media)


@register(
    "multimodal_orc_column",
    oracle="""
    WITH m AS (SELECT doc_id AS i, doc_id % 17 = 0 AS bad,
                      2000 + (doc_id % 5) * 500 AS n, doc_id % 4 AS mode
               FROM documents),
    v AS (SELECT i,
                 CASE mode
                      WHEN 0 THEN (i + rr // 7) % 50
                      WHEN 1 THEN 3 * rr + i
                      WHEN 2 THEN (7 * i + 3 * rr) % 1000 - 500
                      ELSE ((i + rr) % 64)
                           + CASE WHEN rr % 50 = 0
                                  THEN 1099511627776 ELSE 0 END
                 END AS val
          FROM (SELECT i, mode, n, unnest(range(0, n)) AS rr FROM m)),
    ag AS (SELECT i, CAST(SUM(val) AS BIGINT) AS k_sum,
                  CAST(MIN(val) AS BIGINT) AS k_min,
                  CAST(MAX(val) AS BIGINT) AS k_max
           FROM v GROUP BY i)
    SELECT m.i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'orc' END AS format,
           CASE WHEN bad THEN ''
                WHEN m.i % 5 = 0 THEN 'none'
                WHEN m.i % 5 = 1 THEN 'zlib'
                WHEN m.i % 5 = 2 THEN 'snappy'
                WHEN m.i % 5 = 3 THEN 'zstd'
                ELSE 'lz4' END AS compression,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_rows,
           CAST(CASE WHEN bad THEN 0 ELSE ag.k_sum END AS BIGINT)
             AS k_sum,
           CAST(CASE WHEN bad THEN 0 ELSE ag.k_min END AS BIGINT)
             AS k_min,
           CAST(CASE WHEN bad THEN 0 ELSE ag.k_max END AS BIGINT)
             AS k_max
    FROM m JOIN ag ON ag.i = m.i
    """,
    doc="ORC column read FROM SCRATCH — the other major columnar "
    "lakehouse format, completing the format matrix next to parquet: "
    "postscript (trailing length byte + protobuf with its own ORC "
    "magic field), a generic hand PROTOBUF walk (the third wire "
    "format in-repo beside Thrift compact and Avro binary), footer "
    "stripe list + type tree + IntegerStatistics, ORC compressed-"
    "stream chunk framing ((len<<1)|isOriginal, chunks through the "
    "repo's hand inflate/snappy/LZ4/zstd decoders), and RLEv2 "
    "signed integers with ALL FOUR sub-encodings (SHORT_REPEAT, "
    "DIRECT, DELTA incl. the fixed-delta width-0 form, PATCHED_BASE "
    "with sign-magnitude base and closestFixedBits patch packing) — "
    "fixture value modes make the real C++ writer emit every one, "
    "pinned in tests. Cross-checks: stripe rows sum to file rows, "
    "every stripe decodes exactly its count, and the decoded "
    "min/max/sum must equal the footer's statistics (writer books "
    "vs independent decode). Compression rotates all five kinds; "
    "every 17th id flips a byte inside the first stripe's data "
    "region and must degrade (codec grammar on compressed ids, the "
    "stats cross-check on uncompressed). The oracle recomputes "
    "sums/extrema blind from the mode formulas. Pure map over "
    "blobs, zero shuffle. operators/orc.py read_orc_int_column",
    tags=("llm", "multimodal", "lakehouse"),
)
def multimodal_orc_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.orc import (
        orc_column_stats,
        synthesize_orc_media,
    )

    media = synthesize_orc_media(load_table(spark, sf_dir, "documents"))
    return orc_column_stats(media)


@register(
    "multimodal_orc_strings",
    oracle="""
    WITH m AS (SELECT doc_id AS i, doc_id % 19 = 0 AS bad,
                      1500 + (doc_id % 4) * 400 AS n, 5 + doc_id % 6 AS md
               FROM documents),
    v AS (SELECT i, CASE WHEN (i + rr) % 6 = 0 THEN NULL
                         ELSE 'w' || CAST((i + 3 * rr) % md AS VARCHAR)
                    END AS s
          FROM (SELECT i, md, n, unnest(range(0, n)) AS rr FROM m)),
    ag AS (SELECT i, COUNT(*) - COUNT(s) AS n_nulls, COUNT(s) AS n_strs,
                  CAST(COALESCE(SUM(length(s)), 0) AS BIGINT)
                    AS str_len_sum,
                  MIN(s) AS min_s, MAX(s) AS max_s
           FROM v GROUP BY i)
    SELECT m.i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'orc' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_rows,
           CAST(CASE WHEN bad THEN 0 ELSE ag.n_nulls END AS BIGINT)
             AS n_nulls,
           CAST(CASE WHEN bad THEN 0 ELSE ag.n_strs END AS BIGINT)
             AS n_strs,
           CAST(CASE WHEN bad THEN 0 ELSE ag.str_len_sum END AS BIGINT)
             AS str_len_sum,
           CASE WHEN bad THEN '' ELSE ag.min_s END AS min_s,
           CASE WHEN bad THEN '' ELSE ag.max_s END AS max_s
    FROM m JOIN ag ON ag.i = m.i
    """,
    doc="ORC nullable STRING columns — the read path most real ORC "
    "columns actually take, completing the hand reader: the PRESENT "
    "stream (byte run-length encoding, control 0-127 run / 128-255 "
    "literal, then MSB-first bit-packing) maps values onto rows, "
    "and BOTH row encodings the spec defines for strings are "
    "decoded — DIRECT_V2 (unsigned-RLEv2 LENGTH stream slicing the "
    "concatenated DATA bytes, which the lengths must consume "
    "exactly) and DICTIONARY_V2 (unsigned-RLEv2 indices bounds-"
    "checked against the encoding's dictionarySize, dictionary "
    "bytes + lengths) — the fixture alternates encodings by id via "
    "the writer's dictionary threshold, so both paths run against "
    "the real C++ writer. The unsigned RLEv2 variant (no zigzag on "
    "values, plain-varint DELTA base) is exercised here and shares "
    "the four-sub-encoding walk with the signed reader. Decoded "
    "non-null count, min, max and total length are cross-checked "
    "against the footer's StringStatistics + hasNull flag; "
    "compression rotates all five kinds; every 19th id flips a data "
    "byte and must degrade. The oracle recomputes null counts, "
    "lengths and lexicographic extrema blind. Pure map over blobs, "
    "zero shuffle. operators/orc.py read_orc_string_column",
    tags=("llm", "multimodal", "lakehouse"),
)
def multimodal_orc_strings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.orc import (
        orc_string_stats,
        synthesize_orc_str_media,
    )

    media = synthesize_orc_str_media(
        load_table(spark, sf_dir, "documents")
    )
    return orc_string_stats(media)


@register(
    "multimodal_kafka_segment",
    oracle="""
    WITH m AS (SELECT doc_id AS i, doc_id % 11 = 0 AS bad,
                      1 + doc_id % 3 AS nb
               FROM documents),
    b AS (SELECT i, bb, 2 + (i + bb) % 4 AS rc
          FROM (SELECT i, nb, unnest(range(0, nb)) AS bb FROM m)),
    r AS (SELECT i, bb, rr, (7 * i + 5 * bb + rr) % 100 AS pay
          FROM (SELECT i, bb, rc, unnest(range(0, rc)) AS rr FROM b)),
    ag AS (SELECT i, COUNT(*) AS n_records,
                  SUM(CASE WHEN (i + bb + rr) % 3 = 0 THEN 1 ELSE 0 END)
                    AS n_null_keys,
                  SUM(CASE WHEN (i + bb + rr) % 3 = 0 THEN 0 ELSE 2 END)
                    AS key_len_sum,
                  SUM(1 + length(CAST(pay AS VARCHAR))) AS value_len_sum,
                  SUM(pay) AS payload_sum,
                  SUM(rr) AS ts_delta_sum
           FROM r GROUP BY i)
    SELECT m.i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'kafka' END AS format,
           CASE WHEN bad THEN ''
                WHEN m.i % 5 = 0 THEN 'none'
                WHEN m.i % 5 = 1 THEN 'gzip'
                WHEN m.i % 5 = 2 THEN 'snappy'
                WHEN m.i % 5 = 3 THEN 'lz4'
                ELSE 'zstd' END AS compression,
           CAST(CASE WHEN bad THEN 0 ELSE nb END AS BIGINT) AS n_batches,
           CAST(CASE WHEN bad THEN 0 ELSE ag.n_records END AS BIGINT)
             AS n_records,
           CAST(CASE WHEN bad THEN 0 ELSE ag.n_null_keys END AS BIGINT)
             AS n_null_keys,
           CAST(CASE WHEN bad THEN 0 ELSE ag.key_len_sum END AS BIGINT)
             AS key_len_sum,
           CAST(CASE WHEN bad THEN 0 ELSE ag.value_len_sum END AS BIGINT)
             AS value_len_sum,
           CAST(CASE WHEN bad THEN 0 ELSE ag.payload_sum END AS BIGINT)
             AS payload_sum,
           CAST(CASE WHEN bad THEN 0 ELSE ag.ts_delta_sum END AS BIGINT)
             AS ts_delta_sum,
           CAST(CASE WHEN bad THEN 0 ELSE ag.n_records - 1 END AS BIGINT)
             AS max_offset
    FROM m JOIN ag ON ag.i = m.i
    """,
    doc="Kafka log-segment RecordBatch decode (message format v2, "
    "KIP-98) — the bytes the gmall reference's topics actually "
    "store, and the data half of the Kafka wire path the container "
    "cannot socket to: a segment is concatenated RecordBatch v2 "
    "frames whose CRC32C (Castagnoli, from-scratch table, pinned on "
    "the RFC 3720 vector) covers everything after the crc field; "
    "attributes select the records-block compression (none / gzip / "
    "xerial-snappy / lz4 FRAME / zstd through the repo's hand "
    "decoders — snappy is the Java-ecosystem xerial stream framing, "
    "magic+versions+[len][raw snappy block] repeated, multi-block "
    "exercised); records are zigzag-varint framed (length must equal "
    "the actual bytes, offsetDeltas dense 0..n-1, lastOffsetDelta "
    "agreeing, headers walked, null keys counted). Values carry a "
    "numeric payload the reader parses back out, so the oracle "
    "proves CONTENT decode, not just framing. Every 11th id XORs "
    "one byte inside the first batch's records region — CRC32C "
    "must catch it (validated on every stripe id through the sf0.1 "
    "range). Pure map over segments, zero shuffle. "
    "operators/kafkalog.py read_kafka_segment",
    tags=("llm", "multimodal", "kafka"),
)
def multimodal_kafka_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.kafkalog import (
        kafka_segment_stats,
        synthesize_kafka_media,
    )

    media = synthesize_kafka_media(
        load_table(spark, sf_dir, "documents")
    )
    return kafka_segment_stats(media)


@register(
    "multimodal_avro_evolution",
    oracle="""
    WITH m AS (SELECT doc_id AS i, doc_id % 10 = 0 AS bad,
                      6 + doc_id % 30 AS n
               FROM documents),
    r AS (SELECT i, rr,
                 (5 * i + 3 * rr) % 1000 AS idv,
                 (i + 2 * rr) % 50 AS qty,
                 (i + rr) % 4 = 0 AS name_null,
                 1 + length(CAST((i + 2 * rr) % 50 AS VARCHAR)) AS nlen
          FROM (SELECT i, n, unnest(range(0, n)) AS rr FROM m)),
    ag AS (SELECT i, COUNT(*) AS n_records, SUM(idv) AS id_sum,
                  SUM(qty) AS qty_sum,
                  SUM(CASE WHEN name_null THEN 0 ELSE 1 END)
                    AS name_count,
                  SUM(CASE WHEN name_null THEN 0 ELSE nlen END)
                    AS name_len_sum
           FROM r GROUP BY i)
    SELECT m.i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'avro' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_records,
           CAST(CASE WHEN bad THEN 0 ELSE ag.id_sum END AS BIGINT)
             AS id_sum,
           CAST(CASE WHEN bad THEN 0 ELSE ag.qty_sum END AS BIGINT)
             AS qty_sum,
           CAST(CASE WHEN bad THEN 0 ELSE ag.name_count END AS BIGINT)
             AS name_count,
           CAST(CASE WHEN bad THEN 0 ELSE ag.name_len_sum END AS BIGINT)
             AS name_len_sum,
           CAST(CASE WHEN bad THEN 0 ELSE 7 * n END AS BIGINT)
             AS score_sum
    FROM m JOIN ag ON ag.i = m.i
    """,
    doc="Avro SCHEMA RESOLUTION (the spec's 'Schema Resolution' "
    "section — the feature Avro exists for): v1-WRITER containers "
    "decoded through a v2 READER schema. Every resolution rule the "
    "evolution path needs runs per record: fields matched by NAME, "
    "the writer's 'vals' array DROPPED (its bytes still consumed "
    "exactly — the skip path), the writer's INT 'qty' PROMOTED to "
    "the reader's long, and the reader's new 'score' field filled "
    "from its JSON DEFAULT (score_sum = 7n proves defaults applied "
    "to every record). The degrade stripe is semantic, not byte "
    "corruption: every 10th id's writer schema omits 'name', a "
    "perfectly valid container on its own that THIS reader must "
    "refuse (its name field has no default) — the spec's resolution "
    "error, exercised for real. Codec rotates null/deflate/snappy. "
    "The oracle recomputes id/qty/name/score sums blind. "
    "operators/avro.py read_avro_resolved",
    tags=("llm", "multimodal", "kafka"),
)
def multimodal_avro_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.avro import (
        avro_evolution_stats,
        synthesize_avro_v1_media,
    )

    media = synthesize_avro_v1_media(
        load_table(spark, sf_dir, "documents")
    )
    return avro_evolution_stats(media)


@register(
    "lakehouse_delta_scan",
    oracle="""
    WITH m AS (SELECT doc_id AS i, doc_id % 13 = 0 AS bad,
                      2 + doc_id % 3 AS c
               FROM documents),
    f AS (SELECT i, c, vv, kk,
                 (17 * i + 31 * vv + 7 * kk) % 4000 + 1 AS s
          FROM (SELECT i, c, unnest(range(0, c)) AS vv FROM m),
               (SELECT unnest([0, 1]) AS kk)
          WHERE kk = 0 OR vv = 0),
    liv AS (SELECT i, s
            FROM f
            WHERE NOT (kk = 0 AND vv < c - 1 AND (i + vv + 1) % 2 = 0)),
    rows_per AS (SELECT i, s, 10 + s % 90 AS nrows FROM liv),
    ks AS (SELECT i, SUM((s * 7 + 3 * rr) % 1000) AS kpart
           FROM (SELECT i, s, nrows, unnest(range(0, nrows)) AS rr
                 FROM rows_per)
           GROUP BY i),
    ag AS (SELECT rp.i, COUNT(*) AS live_files,
                  SUM(rp.nrows) AS live_rows
           FROM rows_per rp GROUP BY rp.i)
    SELECT m.i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'delta' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE c END AS BIGINT) AS n_commits,
           CAST(CASE WHEN bad THEN 0 ELSE ag.live_files END AS BIGINT)
             AS live_files,
           CAST(CASE WHEN bad THEN 0 ELSE ag.live_rows END AS BIGINT)
             AS live_rows,
           CAST(CASE WHEN bad THEN 0 ELSE ks.kpart END AS BIGINT)
             AS k_sum
    FROM m JOIN ag ON ag.i = m.i JOIN ks ON ks.i = m.i
    """,
    doc="A complete Delta TABLE SCAN from raw bytes with zero "
    "library code — the end-to-end composition a lakehouse reader "
    "IS: the tar carries the _delta_log commits AND the real "
    "pyarrow-written parquet part files their adds reference; the "
    "log replays to the live set (the L214 machinery) and every "
    "live file's k column is then read by the from-scratch parquet "
    "column walk (footer Thrift, pages, levels). The trust chain "
    "is CHECKED, not assumed: each live file's actual bytes must "
    "equal its add's size, and its ACTUALLY-DECODED row count must "
    "equal the add's stats.numRecords. The degrade stripe is the "
    "sharpest in the repo: every 13th id's LAST add (a file no "
    "remove ever targets) overstates numRecords by ONE — the log "
    "is structurally valid, every parquet file parses clean, and "
    "only the stats-vs-actual-decode check can catch it (validated "
    "on every stripe id through the sf0.1 range; a lie on a "
    "REMOVED file is correctly invisible, which the first fixture "
    "draft proved by accident). The oracle replays the same "
    "add/remove formulas and re-derives per-file k sums blind. "
    "operators/deltalog.py scan_delta_table",
    tags=("llm", "multimodal", "lakehouse"),
)
def lakehouse_delta_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.deltalog import (
        delta_scan_stats,
        synthesize_delta_table_media,
    )

    media = synthesize_delta_table_media(
        load_table(spark, sf_dir, "documents")
    )
    return delta_scan_stats(media)

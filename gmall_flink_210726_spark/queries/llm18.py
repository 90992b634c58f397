r"""LLM-pipeline wave 18: round-13 lakehouse + format depth.

Round-12 brief items (VERDICT r12 "Next round"): Delta stats-based
file skipping (minValues/maxValues pruning before any parquet bytes
are fetched), Avro logical types, Kafka transactional/control batches,
ORC FLOAT/DOUBLE/BINARY columns, Iceberg schema evolution by field-id,
and parquet page-level CRC verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "lakehouse_delta_stats_skip",
    oracle="""
    WITH ids AS (SELECT doc_id AS i, 2 + doc_id % 3 AS nc
                 FROM documents),
    cms AS (SELECT i, nc, unnest(range(0, nc)) AS v FROM ids),
    files AS (
        SELECT i, nc, v, unnest(CASE WHEN v = 0 THEN [0, 1]
                                     ELSE [0] END) AS k
        FROM cms),
    live AS (
        SELECT * FROM files
        WHERE NOT (k = 0 AND v < nc - 1 AND (i + v + 1) % 2 = 0)),
    vals AS (
        SELECT i, nc, v, k,
               10 + ((17 * i + 31 * v + 7 * k) % 4000 + 1) % 90 AS n,
               [(((17 * i + 31 * v + 7 * k) % 4000 + 1) * 7 + 3 * r)
                  % 1000
                for r in range(0,
                  10 + ((17 * i + 31 * v + 7 * k) % 4000 + 1) % 90)]
                 AS vs,
               (v = nc - 1 AND k = 0) AS lastf
        FROM live),
    f2 AS (
        SELECT i, nc, n, vs, lastf,
               list_min(vs) AS mn, list_max(vs) AS mx
        FROM vals),
    f3 AS (
        SELECT i, nc, n, vs, mn, mx,
               CASE WHEN lastf AND i % 14 = 0 THEN mn
                    WHEN lastf AND i % 23 = 0 THEN 2000
                    ELSE mn END AS cmn,
               CASE WHEN lastf AND i % 14 = 0 THEN mx - 1
                    WHEN lastf AND i % 23 = 0 THEN 2003
                    ELSE mx END AS cmx
        FROM f2),
    f4 AS (
        SELECT i, nc, n, vs, mn, mx, cmn, cmx,
               (cmx < 300 OR cmn > 499) AS skipped,
               NOT (cmx < 300 OR cmn > 499)
                 AND (cmn <> mn OR cmx <> mx) AS lie
        FROM f3),
    agg AS (
        SELECT i, MAX(nc) AS n_commits, COUNT(*) AS live_files,
               BOOL_OR(lie) AS bad,
               SUM(CASE WHEN skipped THEN 1 ELSE 0 END) AS n_skipped,
               SUM(CASE WHEN skipped THEN 0 ELSE 1 END) AS n_read,
               SUM(CASE WHEN skipped THEN n ELSE 0 END)
                 AS skipped_rows,
               SUM(CASE WHEN skipped THEN 0 ELSE len(
                     list_filter(vs, x -> x BETWEEN 300 AND 499))
                   END) AS n_matching,
               SUM(CASE WHEN skipped THEN 0 ELSE COALESCE(list_sum(
                     list_filter(vs, x -> x BETWEEN 300 AND 499)), 0)
                   END) AS match_sum
        FROM f4 GROUP BY i)
    SELECT i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'delta' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n_commits END AS BIGINT)
             AS n_commits,
           CAST(CASE WHEN bad THEN 0 ELSE live_files END AS BIGINT)
             AS live_files,
           CAST(CASE WHEN bad THEN 0 ELSE n_skipped END AS BIGINT)
             AS n_skipped,
           CAST(CASE WHEN bad THEN 0 ELSE n_read END AS BIGINT)
             AS n_read,
           CAST(CASE WHEN bad THEN 0 ELSE skipped_rows END AS BIGINT)
             AS skipped_rows,
           CAST(CASE WHEN bad THEN 0 ELSE n_matching END AS BIGINT)
             AS n_matching,
           CAST(CASE WHEN bad THEN 0 ELSE match_sum END AS BIGINT)
             AS match_sum
    FROM agg
    """,
    doc="Delta STATS-BASED FILE SKIPPING (delta.io/PROTOCOL.md "
    "per-file statistics) — the one missing rung of the round-12 "
    "skipping ladder: each add's stats JSON carries minValues/"
    "maxValues for k, and the range predicate k BETWEEN 300 AND 499 "
    "prunes files during LOG REPLAY, before any parquet bytes are "
    "fetched (at 100 TB the pruned part files are never opened; only "
    "the few-KB log is read). Every file the predicate DOES open is "
    "fully decoded by the hand parquet column walk and its claimed "
    "min/max re-proven against the actual values (the L192 "
    "trust-chain pattern): every 14th id's always-live last add "
    "claims max-1 and must degrade the table when read. Every "
    "23rd-miss-14th id claims a [2000,2003] window and is silently "
    "pruned — documenting the trust boundary skipping inherently "
    "has (a lie on a file you never open cannot be caught); the "
    "oracle models the reader, not the ground truth. ~49% of live "
    "files are skipped at this predicate (pinned in "
    "tests/test_deltalog.py). operators/deltalog.py "
    "scan_delta_table_pruned",
    tags=("llm", "lakehouse", "multimodal"),
)
def lakehouse_delta_stats_skip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.deltalog import (
        delta_stats_skip_scan,
        synthesize_delta_stats_media,
    )

    media = synthesize_delta_stats_media(
        load_table(spark, sf_dir, "documents")
    )
    return delta_stats_skip_scan(media, 300, 499)


@register(
    "multimodal_avro_logical",
    oracle="""
    WITH m AS (SELECT doc_id AS i, 4 + doc_id % 7 AS n
               FROM documents),
    r AS (SELECT i, n, unnest(range(0, n)) AS rr FROM m),
    per AS (SELECT i, n,
                   SUM((i * 37 + rr * 101) % 2000001 - 1000000)
                     AS psum,
                   SUM((i * 53 + rr * 997) % 3000001 - 1500000)
                     AS qsum,
                   MIN((i + 3 * rr) % 20000) AS dmin,
                   MAX(1600000000000000
                       + (i * 1000003 + rr * 777) % 1000000000000)
                     AS tmax
            FROM r GROUP BY i, n),
    f AS (SELECT i, n, psum, qsum, dmin, tmax,
                 i % 9 = 0 OR i % 13 = 0 AS bad
          FROM per)
    SELECT i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'avro_lt' END AS format,
           CASE WHEN bad THEN ''
                ELSE ['null', 'deflate', 'snappy', 'zstandard',
                      'bzip2', 'xz'][1 + i % 6]
           END AS codec,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT)
             AS n_records,
           CAST(CASE WHEN bad THEN 0 ELSE (n + 2) // 3 END AS BIGINT)
             AS n_blocks,
           CAST(CASE WHEN bad THEN 0 ELSE psum END AS BIGINT)
             AS price_unscaled_sum,
           CAST(CASE WHEN bad THEN 0 ELSE qsum END AS BIGINT)
             AS qty_unscaled_sum,
           CASE WHEN bad THEN ''
                ELSE strftime(
                       DATE '1970-01-01' + CAST(dmin AS INTEGER),
                       '%Y-%m-%d')
           END AS date_min,
           CASE WHEN bad THEN ''
                ELSE strftime(make_timestamp(tmax),
                              '%Y-%m-%dT%H:%M:%S.%f')
           END AS ts_max_iso,
           CASE WHEN bad THEN ''
                ELSE printf('%08x-0000-4000-8000-%012x',
                            (i * 2654435761) % 4294967296,
                            i % 281474976710656)
           END AS uuid_first,
           CAST(CASE WHEN NOT bad AND i % 6 = 0 THEN 1 ELSE 0
                END AS BIGINT) AS lt_ignored
    FROM f
    """,
    doc="Avro LOGICAL TYPES (Avro 1.11 spec) in the schema-driven "
    "container reader — the annotations real Kafka-ecosystem "
    "payloads and Iceberg manifest fields carry: decimal over BYTES "
    "(minimal two's-complement big-endian unscaled, negative half "
    "proves signedness) and over FIXED(6) with the max-precision-"
    "per-size bound checked, date (days since epoch), "
    "timestamp-micros (ISO-rendered to prove the conversion, not "
    "just the raw long), and uuid (RFC 4122 textual, format-"
    "validated). Spec rule pinned: an INVALID annotation (every 6th "
    "id declares decimal on an int) is IGNORED and the field "
    "decodes as its underlying type — while an invalid VALUE "
    "(every 13th id's malformed uuid) is data corruption and "
    "degrades, as does the flipped sync marker on every 9th id. "
    "Codec rotates null/deflate/snappy through the hand decoders. "
    "The resolved reader refuses promoting a plain writer int/long "
    "into a reader logical type (pytest-pinned). Arrow-batched "
    "mapInPandas, zero shuffle. operators/avro.py "
    "avro_logical_stats",
    tags=("llm", "multimodal"),
)
def multimodal_avro_logical(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.avro import (
        avro_logical_stats,
        synthesize_avro_logical_media,
    )

    media = synthesize_avro_logical_media(
        load_table(spark, sf_dir, "documents")
    )
    return avro_logical_stats(media)


@register(
    "multimodal_kafka_txn",
    oracle="""
    WITH m AS (SELECT doc_id AS i, 1 + doc_id % 2 AS n_pids
               FROM documents),
    pb AS (SELECT i, n_pids, unnest(range(0, n_pids)) AS p FROM m),
    tb AS (SELECT i, n_pids, p,
                  unnest(range(0, 1 + (i + p) % 2)) AS b
           FROM pb),
    txn AS (SELECT i, n_pids, p, b,
                   2 + (i + p + b) % 3 AS nrec,
                   COALESCE(list_sum(
                     [(7 * i + 5 * (10 * (p + 1) + b) + r) % 100
                      for r in range(0, 2 + (i + p + b) % 3)]), 0)
                     AS psum
            FROM tb),
    per_p AS (SELECT i, n_pids, p,
                     (i + p) % 3 = 0 AS aborted,
                     CAST(SUM(nrec) AS BIGINT) AS trec,
                     CAST(SUM(psum) AS BIGINT) AS tsum,
                     COUNT(*) AS nb
              FROM txn GROUP BY i, n_pids, p),
    agg AS (SELECT i, MAX(n_pids) AS n_pids,
                   CAST(SUM(nb) AS BIGINT) AS n_txn_batches,
                   CAST(SUM(CASE WHEN aborted THEN 0 ELSE trec END)
                        AS BIGINT) AS com_rec,
                   CAST(SUM(CASE WHEN aborted THEN 0 ELSE tsum END)
                        AS BIGINT) AS com_sum,
                   CAST(SUM(CASE WHEN aborted THEN trec ELSE 0 END)
                        AS BIGINT) AS ab_rec,
                   CAST(SUM(CASE WHEN aborted THEN tsum ELSE 0 END)
                        AS BIGINT) AS ab_sum,
                   CAST(SUM(CASE WHEN aborted THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_ab,
                   CAST(SUM(CASE WHEN aborted THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_com
            FROM per_p GROUP BY i),
    plains AS (SELECT doc_id AS i, 2 + doc_id % 3 AS nr1,
                      COALESCE(list_sum(
                        [(7 * doc_id + r) % 100
                         for r in range(0, 2 + doc_id % 3)]), 0) AS s1,
                      COALESCE(list_sum(
                        [(7 * doc_id + 5 + r) % 100
                         for r in range(0, 2)]), 0) AS s2
               FROM documents),
    f AS (SELECT a.i, a.n_pids, a.n_txn_batches,
                 a.com_rec + pl.nr1 + 2 AS committed_records,
                 CAST(a.com_sum + pl.s1 + pl.s2 AS BIGINT)
                   AS committed_sum,
                 a.ab_rec AS aborted_records,
                 a.ab_sum AS aborted_sum,
                 a.n_ab, a.n_com,
                 i % 11 = 0 OR i % 17 = 0 OR i % 19 = 0 AS bad,
                 pl.nr1 + a.com_rec + a.ab_rec + 2 + a.n_pids
                   AS total_offsets
          FROM agg a JOIN plains pl USING (i))
    SELECT i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'kafka' END AS format,
           CAST(CASE WHEN bad THEN 0
                ELSE 2 + n_txn_batches + n_pids END AS BIGINT)
             AS n_batches,
           CAST(CASE WHEN bad THEN 0 ELSE n_pids END AS BIGINT)
             AS n_control,
           CAST(CASE WHEN bad THEN 0 ELSE n_txn_batches END
                AS BIGINT) AS n_txn_batches,
           CAST(CASE WHEN bad THEN 0 ELSE n_com END AS BIGINT)
             AS n_txns_committed,
           CAST(CASE WHEN bad THEN 0 ELSE n_ab END AS BIGINT)
             AS n_txns_aborted,
           CAST(CASE WHEN bad THEN 0 ELSE committed_records END
                AS BIGINT) AS committed_records,
           CAST(CASE WHEN bad THEN 0 ELSE committed_sum END
                AS BIGINT) AS committed_sum,
           CAST(CASE WHEN bad THEN 0 ELSE aborted_records END
                AS BIGINT) AS aborted_records,
           CAST(CASE WHEN bad THEN 0 ELSE aborted_sum END AS BIGINT)
             AS aborted_sum,
           CAST(CASE WHEN bad THEN 0 ELSE total_offsets - 1 END
                AS BIGINT) AS max_offset
    FROM f
    """,
    doc="Kafka TRANSACTIONAL reads (KIP-98) over RecordBatch v2 "
    "segments — the read_committed semantics a real exactly-once "
    "topic consumer needs: attributes bit 4 marks transactional "
    "batches (producerId required), bit 5 CONTROL batches whose "
    "single record's key is version:int16/type:int16 (0=ABORT, "
    "1=COMMIT). The walk buffers each producer's records until its "
    "marker: commits become visible, ABORTED RECORDS ARE EXCLUDED "
    "from the committed counts (the verdict-r12 gap). Books must "
    "balance: a dangling open transaction at segment end (17th "
    "ids), a marker for a producer with nothing open (19th ids), or "
    "a CRC32C flip (11th ids) all refuse. Interleaved multi-producer "
    "layout with plain batches between; data-batch compression "
    "rotates none/gzip/xerial-snappy/lz4/zstd through the hand "
    "decoders. The oracle replays producer/batch/abort bookkeeping "
    "blind. operators/kafkalog.py read_kafka_segment_committed",
    tags=("llm", "multimodal"),
)
def multimodal_kafka_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.kafkalog import (
        kafka_committed_stats,
        synthesize_kafka_txn_media,
    )

    media = synthesize_kafka_txn_media(
        load_table(spark, sf_dir, "documents")
    )
    return kafka_committed_stats(media)


@register(
    "multimodal_orc_double",
    oracle="""
    WITH m AS (SELECT doc_id AS i,
                      1200 + (doc_id % 4) * 300 AS n
               FROM documents),
    r AS (SELECT i, n, unnest(range(0, n)) AS rr FROM m),
    per AS (SELECT i, n,
                   CAST(SUM((i * 13 + rr * 7) % 8192 - 4096)
                        AS BIGINT) AS mf_sum,
                   CAST(SUM((i * 29 + rr * 17) % 2000001 - 1000000)
                        AS BIGINT) AS mx_sum,
                   MIN((i * 29 + rr * 17) % 2000001 - 1000000)
                     AS mx_min,
                   MAX((i * 29 + rr * 17) % 2000001 - 1000000)
                     AS mx_max,
                   CAST(SUM((i + rr) % 18) AS BIGINT) AS blen_sum,
                   CAST(SUM(COALESCE(list_sum(
                     [(i * 3 + rr * 5 + j * 11) % 256
                      for j in range(0, (i + rr) % 18)]), 0))
                        AS BIGINT) AS bsum
            FROM r GROUP BY i, n),
    f AS (SELECT *, i % 21 = 0 AS bad FROM per)
    SELECT i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'orc' END AS format,
           CASE WHEN bad THEN ''
                ELSE ['none', 'zlib', 'snappy', 'zstd',
                      'lz4'][1 + i % 5]
           END AS compression,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_rows,
           CASE WHEN bad THEN 0.0
                ELSE CAST(mf_sum AS DOUBLE) / 64 END AS f_sum,
           CASE WHEN bad THEN 0.0
                ELSE CAST(mx_sum AS DOUBLE) / 64 END AS x_sum,
           CASE WHEN bad THEN 0.0
                ELSE CAST(mx_min AS DOUBLE) / 64 END AS x_min,
           CASE WHEN bad THEN 0.0
                ELSE CAST(mx_max AS DOUBLE) / 64 END AS x_max,
           CAST(CASE WHEN bad THEN 0 ELSE blen_sum END AS BIGINT)
             AS blen_sum,
           CAST(CASE WHEN bad THEN 0 ELSE bsum END AS BIGINT)
             AS bsum
    FROM f
    """,
    doc="ORC FLOAT + DOUBLE + BINARY columns — the remaining common "
    "warehouse types after round 12's DECIMAL/TIMESTAMP: IEEE 754 "
    "little-endian DATA streams (DIRECT encoding; the spec defines "
    "no V2 for floats) with exact rows*width stream tiling, BINARY "
    "as concatenated payload + RLEv2-unsigned LENGTH stream whose "
    "sum must tile DATA exactly, and footer DoubleStatistics "
    "(fixed64 min/max/sum) cross-checked BIT-EXACTLY against the "
    "decode using the writer's own per-stripe-then-merge "
    "accumulation order; BinaryStatistics.sum (zigzag total length) "
    "likewise. Values are integers/64, exactly representable in "
    "both engines, so float equality in the oracle is bit-equality "
    "with no tolerance. Real pyarrow.orc files, 4 KiB stripes, all "
    "five codecs rotating; every 21st id flips a data byte and must "
    "degrade. operators/orc2.py read_orc_double_bin",
    tags=("llm", "multimodal"),
)
def multimodal_orc_double(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.orc2 import (
        orc_double_stats,
        synthesize_orc_double_media,
    )

    media = synthesize_orc_double_media(
        load_table(spark, sf_dir, "documents")
    )
    return orc_double_stats(media)


@register(
    "lakehouse_iceberg_schema_evolution",
    oracle="""
    WITH m AS (SELECT doc_id AS i, 1 + doc_id % 2 AS n_old,
                      1 + (doc_id + 1) % 3 AS n_new
               FROM documents),
    olds AS (SELECT i, n_old, n_new, unnest(range(0, n_old)) AS f
             FROM m),
    o AS (SELECT i, f, 10 + (i + 3 * f) % 40 AS rows_,
                 COALESCE(list_sum(
                   [(i * 7 + f * 13 + 3 * r) % 1000
                    for r in range(0, 10 + (i + 3 * f) % 40)]), 0)
                   AS ksum
          FROM olds),
    news AS (SELECT i, n_old, n_new, unnest(range(0, n_new)) AS g
             FROM m),
    nn AS (SELECT i, g, 10 + (i + 5 * g) % 40 AS rows_,
                  COALESCE(list_sum(
                    [(i * 7 + (100 + g) * 13 + 3 * r) % 1000
                     for r in range(0, 10 + (i + 5 * g) % 40)]), 0)
                    AS ksum,
                  COALESCE(list_sum(
                    [(i * 11 + g * 17 + 5 * r) % 500
                     for r in range(0, 10 + (i + 5 * g) % 40)]), 0)
                    AS ssum
           FROM news),
    oa AS (SELECT i, CAST(SUM(rows_) AS BIGINT) AS orows,
                  CAST(SUM(ksum) AS BIGINT) AS oksum,
                  COUNT(*) AS n_old
           FROM o GROUP BY i),
    na AS (SELECT i, CAST(SUM(rows_) AS BIGINT) AS nrows,
                  CAST(SUM(ksum) AS BIGINT) AS nksum,
                  CAST(SUM(ssum) AS BIGINT) AS nssum,
                  COUNT(*) AS n_new
           FROM nn GROUP BY i),
    f AS (SELECT oa.i, oa.n_old, na.n_new, oa.orows, na.nrows,
                 oa.oksum + na.nksum AS key_sum, na.nssum,
                 oa.i % 13 = 0 OR oa.i % 19 = 0 AS bad
          FROM oa JOIN na ON oa.i = na.i)
    SELECT i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'iceberg' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n_old + n_new END
                AS BIGINT) AS n_files,
           CAST(CASE WHEN bad THEN 0 ELSE n_old END AS BIGINT)
             AS n_files_old,
           CAST(CASE WHEN bad THEN 0 ELSE n_new END AS BIGINT)
             AS n_files_new,
           CAST(CASE WHEN bad THEN 0 ELSE orows + nrows END
                AS BIGINT) AS total_rows,
           CAST(CASE WHEN bad THEN 0 ELSE key_sum END AS BIGINT)
             AS key_sum,
           CAST(CASE WHEN bad THEN 0 ELSE nssum END AS BIGINT)
             AS score_sum,
           CAST(CASE WHEN bad THEN 0 ELSE orows END AS BIGINT)
             AS score_nulls
    FROM f
    """,
    doc="Iceberg SCHEMA EVOLUTION BY FIELD-ID — the feature the "
    "format exists for (spec 'Column Projection'): the current "
    "schema RENAMED k->key (same id 1), DROPPED v (id 2), and ADDED "
    "optional score (id 3); data files written before the evolution "
    "carry the old names and no id-3 column. The reader resolves "
    "every column by the field_id in the parquet SchemaElement "
    "(field 9), NEVER by name: renames are free, dropped columns "
    "unprojected, added columns null for pre-evolution files "
    "(score_nulls counts them). The decoy stripe proves it: every "
    "7th id's first old file names its TRUE id-1 column 'legacy' "
    "and plants a column NAMED 'key' under id 9 with values+1 — a "
    "name-resolving reader returns a wrong key_sum the oracle "
    "catches. A required id missing (13th ids) or a duplicate id "
    "(19th ids) refuses. Chain: metadata.json current-schema-id -> "
    "manifest list -> manifest -> real pyarrow parquet with "
    "PARQUET:field_id metadata, decoded by the hand column walk. "
    "operators/iceberg2.py read_iceberg_evolved",
    tags=("llm", "lakehouse", "multimodal"),
)
def lakehouse_iceberg_schema_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.iceberg2 import (
        iceberg_evolution_stats,
        synthesize_iceberg_evo_media,
    )

    media = synthesize_iceberg_evo_media(
        load_table(spark, sf_dir, "documents")
    )
    return iceberg_evolution_stats(media)


@register(
    "lakehouse_delta_time_travel",
    oracle="""
    WITH m AS (SELECT doc_id AS i, 2 + doc_id % 4 AS nc,
                      2 + doc_id % 3 AS base,
                      doc_id % 12 = 0 AS bad
               FROM documents),
    ks AS (SELECT i, nc, base, bad,
                  unnest(range(0, base)) AS k
           FROM m),
    c0 AS (SELECT i, CAST(SUM(10 + (i + 3 * k) % 90) AS BIGINT)
                     AS rows0,
                  CAST(SUM(1000 + (7 * i + 11 * k) % 5000)
                       AS BIGINT) AS bytes0
           FROM ks GROUP BY i),
    f AS (SELECT m.i, m.nc, m.base, m.bad,
                 (m.i + 1) % 2 = 0 AS removed,
                 c0.rows0 + 10 + (m.i + 300) % 90 AS rows01,
                 c0.bytes0 + 1000 + (7 * m.i + 1100) % 5000
                   AS bytes01,
                 10 + (m.i + 3 * (m.i % m.base)) % 90 AS rrows,
                 1000 + (7 * m.i + 11 * (m.i % m.base)) % 5000
                   AS rbytes
          FROM m JOIN c0 ON m.i = c0.i)
    SELECT i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'delta' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE 1 END AS BIGINT)
             AS version,
           CAST(CASE WHEN bad THEN 0 ELSE nc END AS BIGINT)
             AS n_commits,
           CAST(CASE WHEN bad THEN 0 ELSE base + 1 END AS BIGINT)
             AS n_adds,
           CAST(CASE WHEN bad THEN 0
                WHEN removed THEN 1 ELSE 0 END AS BIGINT)
             AS n_removes,
           CAST(CASE WHEN bad THEN 0
                ELSE base + 1 - (CASE WHEN removed THEN 1 ELSE 0 END)
                END AS BIGINT) AS live_files,
           CAST(CASE WHEN bad THEN 0
                ELSE bytes01 - (CASE WHEN removed THEN rbytes
                                ELSE 0 END) END AS BIGINT)
             AS live_bytes,
           CAST(CASE WHEN bad THEN 0
                ELSE rows01 - (CASE WHEN removed THEN rrows
                               ELSE 0 END) END AS BIGINT)
             AS live_rows,
           CAST(CASE WHEN bad THEN 0
                WHEN removed AND i % base = 1 AND base < 4 THEN 1
                ELSE 2 END AS BIGINT) AS n_partitions
    FROM f
    """,
    doc="Delta TIME TRAVEL (VERSION AS OF 1): the state at version v "
    "is the replay of commits 0..v ONLY (delta.io/PROTOCOL.md) - "
    "later commits are never opened, so corruption beyond the "
    "travel point is invisible (pinned in tests: the 12-stripe's "
    "truncated last commit degrades an as-of-1 read exactly when "
    "the log has two commits, and an as-of-0 read of the same "
    "corrupt log succeeds); traveling past the log's end refuses. "
    "The oracle replays adds/removes of commits 0 and 1 blind. "
    "operators/deltalog.py replay_delta_log_asof",
    tags=("llm", "lakehouse", "multimodal"),
)
def lakehouse_delta_time_travel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.deltalog import (
        delta_asof_stats,
    )
    from gmall_flink_210726_spark.operators.deltalog import (
        synthesize_delta_log_media,
    )

    media = synthesize_delta_log_media(
        load_table(spark, sf_dir, "documents")
    )
    return delta_asof_stats(media, 1)


@register(
    "lakehouse_iceberg_time_travel",
    oracle="""
    WITH m AS (SELECT doc_id AS i,
                      doc_id % 13 = 0 OR doc_id % 23 = 0
                        OR doc_id % 29 = 0 AS bad,
                      2 + doc_id % 3 AS ne
               FROM documents),
    e AS (SELECT i, bad, unnest(range(0, ne)) AS ent FROM m),
    s AS (SELECT i, bad, ent, (i + ent) % 5 AS s5,
                 10 + (i + 3 * ent) % 90 AS rows_,
                 500 + (11 * i + 17 * ent) % 4000 AS size_
          FROM e),
    c AS (SELECT i, bad,
                 CAST(SUM(CASE WHEN s5 IN (1, 2) THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_added,
                 CAST(SUM(CASE WHEN s5 NOT IN (0, 1, 2) THEN 1
                          ELSE 0 END) AS BIGINT) AS n_existing,
                 CAST(SUM(CASE WHEN s5 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_deleted,
                 CAST(SUM(CASE WHEN s5 <> 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS live_files,
                 CAST(SUM(CASE WHEN s5 <> 0 THEN rows_ ELSE 0 END)
                      AS BIGINT) AS live_rows,
                 CAST(SUM(CASE WHEN s5 <> 0 THEN size_ ELSE 0 END)
                      AS BIGINT) AS live_bytes
          FROM s GROUP BY i, bad)
    SELECT i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'iceberg' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE 1700000000000 END
                AS BIGINT) AS snapshot_ts_ms,
           CAST(CASE WHEN bad THEN 0 ELSE 2 END AS BIGINT)
             AS n_snapshots,
           CAST(CASE WHEN bad THEN 0 ELSE 1 END AS BIGINT)
             AS n_manifests,
           CAST(CASE WHEN bad THEN 0 ELSE n_added END AS BIGINT)
             AS n_added,
           CAST(CASE WHEN bad THEN 0 ELSE n_existing END AS BIGINT)
             AS n_existing,
           CAST(CASE WHEN bad THEN 0 ELSE n_deleted END AS BIGINT)
             AS n_deleted,
           CAST(CASE WHEN bad THEN 0 ELSE live_files END AS BIGINT)
             AS live_files,
           CAST(CASE WHEN bad THEN 0 ELSE live_rows END AS BIGINT)
             AS live_rows,
           CAST(CASE WHEN bad THEN 0 ELSE live_bytes END AS BIGINT)
             AS live_bytes
    FROM c
    """,
    doc="Iceberg TIME TRAVEL (TIMESTAMP AS OF, spec snapshot-log): "
    "resolve the LATEST snapshot-log entry with timestamp-ms <= the "
    "as-of instant — here between the two snapshots, so the walk "
    "must read the OLDER snapshot's manifest list (one manifest) "
    "while current-snapshot-id points at the newer one covering "
    "more. The log must be strictly ascending (every 29th id runs "
    "backward — an out-of-order log makes every as-of answer "
    "ambiguous, refuse), every entry's snapshot-id must resolve "
    "(every 23rd id's older entry names a missing snapshot), an "
    "as-of before the first entry refuses, and the resolved "
    "snapshot's manifest walk keeps the full trust chain (the 13th-"
    "id manifest-length lie carries over). Totals recomputed blind. "
    "operators/iceberg.py read_iceberg_asof",
    tags=("llm", "lakehouse", "multimodal"),
)
def lakehouse_iceberg_time_travel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.iceberg import (
        iceberg_asof_stats,
        synthesize_iceberg_media,
    )

    media = synthesize_iceberg_media(
        load_table(spark, sf_dir, "documents")
    )
    return iceberg_asof_stats(media, 1_700_000_030_000)


@register(
    "lakehouse_delta_partition_prune",
    oracle="""
    WITH ids AS (SELECT doc_id AS i, 2 + doc_id % 3 AS nc
                 FROM documents),
    cms AS (SELECT i, nc, unnest(range(0, nc)) AS v FROM ids),
    files AS (
        SELECT i, nc, v, unnest(CASE WHEN v = 0 THEN [0, 1]
                                     ELSE [0] END) AS k
        FROM cms),
    live AS (
        SELECT * FROM files
        WHERE NOT (k = 0 AND v < nc - 1 AND (i + v + 1) % 2 = 0)),
    vals AS (
        SELECT i, nc, v, k,
               (i + v + k) % 4 AS pk,
               10 + ((17 * i + 31 * v + 7 * k) % 4000 + 1) % 90 AS n,
               (17 * i + 31 * v + 7 * k) % 4000 + 1 AS s,
               (v = nc - 1 AND k = 0 AND i % 15 = 0) AS lied
        FROM live),
    f2 AS (
        SELECT i, nc, n, pk, lied,
               CASE WHEN lied THEN (pk + 1) % 4 ELSE pk END
                 AS claimed,
               n * pk + 4 * COALESCE(list_sum(
                 [(s * 7 + 3 * r) % 250 for r in range(0, n)]), 0)
                 AS ksum
        FROM vals),
    agg AS (
        SELECT i, MAX(nc) AS n_commits, COUNT(*) AS live_files,
               BOOL_OR(claimed = 2 AND lied) AS bad,
               CAST(SUM(CASE WHEN claimed <> 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pruned,
               CAST(SUM(CASE WHEN claimed = 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_read,
               CAST(SUM(CASE WHEN claimed = 2 THEN n ELSE 0 END)
                    AS BIGINT) AS read_rows,
               CAST(SUM(CASE WHEN claimed = 2 THEN ksum ELSE 0 END)
                    AS BIGINT) AS k_sum
        FROM f2 GROUP BY i)
    SELECT i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'delta' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n_commits END AS BIGINT)
             AS n_commits,
           CAST(CASE WHEN bad THEN 0 ELSE live_files END AS BIGINT)
             AS live_files,
           CAST(CASE WHEN bad THEN 0 ELSE n_pruned END AS BIGINT)
             AS n_pruned,
           CAST(CASE WHEN bad THEN 0 ELSE n_read END AS BIGINT)
             AS n_read,
           CAST(CASE WHEN bad THEN 0 ELSE read_rows END AS BIGINT)
             AS read_rows,
           CAST(CASE WHEN bad THEN 0 ELSE k_sum END AS BIGINT)
             AS k_sum
    FROM agg
    """,
    doc="Delta PARTITION PRUNING: partitionValues are metadata - the "
    "partition column's per-file value lives in the add action, not "
    "the parquet bytes, so an equality predicate (pk = 2) prunes "
    "files during LOG REPLAY with pruned bytes never touched. The "
    "fixture's partitioning is DERIVED (every row of a file "
    "satisfies k % 4 == pk), making the trust chain CHECKABLE on "
    "contact: every opened file's decoded keys must all land in the "
    "claimed partition - the mis-routed-writer lie (every 15th id's "
    "always-live last add claims (pk+1)%4) degrades exactly when "
    "the predicate selects the CLAIMED value and is silently pruned "
    "otherwise, the same trust boundary the stats-skip twin "
    "documents. ~75% of live files pruned at one-in-four "
    "selectivity. operators/deltalog.py "
    "scan_delta_table_partition_pruned",
    tags=("llm", "lakehouse", "multimodal"),
)
def lakehouse_delta_partition_prune(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.deltalog import (
        delta_partition_prune_scan,
        synthesize_delta_part_media,
    )

    media = synthesize_delta_part_media(
        load_table(spark, sf_dir, "documents")
    )
    return delta_partition_prune_scan(media, "pk", "2")


@register(
    "multimodal_kafka_index",
    oracle="""
    WITH m AS (SELECT doc_id AS i, 3 + doc_id % 4 AS nb
               FROM documents),
    b AS (SELECT i, nb, unnest(range(0, nb)) AS bb FROM m),
    c AS (SELECT i, nb, bb, 2 + (i + bb) % 4 AS cnt FROM b),
    w AS (SELECT i, nb, bb, cnt,
                 SUM(cnt) OVER (PARTITION BY i ORDER BY bb)
                   - cnt AS off0,
                 SUM(cnt) OVER (PARTITION BY i ORDER BY bb)
                   - 1 AS last_off
          FROM c),
    tot AS (SELECT i, MAX(nb) AS nb,
                   CAST(SUM(cnt) AS BIGINT) AS total,
                   (MAX(nb) + 1) // 2 AS n_entries
            FROM w GROUP BY i),
    cont AS (SELECT i, MIN(bb) AS cb
             FROM w WHERE off0 <= 5 AND 5 <= last_off GROUP BY i),
    flr AS (SELECT i,
                   COALESCE(MAX(CASE WHEN bb % 2 = 0
                                     AND last_off <= 5 THEN bb END),
                            0) AS fb
            FROM w GROUP BY i),
    pay AS (SELECT w.i, (7 * w.i + 5 * w.bb + (5 - w.off0)) % 100
                     AS payload
            FROM w JOIN cont ON w.i = cont.i AND w.bb = cont.cb),
    f AS (SELECT t.i, t.nb, t.n_entries, t.total,
                 cont.cb, flr.fb, pay.payload,
                 t.i % 15 = 0 OR t.i % 16 = 0
                   OR (t.i % 11 = 0 AND t.n_entries >= 2)
                   OR 5 >= t.total AS bad
          FROM tot t
          JOIN cont ON t.i = cont.i
          JOIN flr ON t.i = flr.i
          JOIN pay ON t.i = pay.i)
    SELECT i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'kafka' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n_entries END AS BIGINT)
             AS n_entries,
           CAST(CASE WHEN bad THEN 0 ELSE nb END AS BIGINT)
             AS n_batches,
           CAST(CASE WHEN bad THEN 0 ELSE cb - fb + 1 END AS BIGINT)
             AS batches_scanned,
           CAST(CASE WHEN bad THEN 0 ELSE 5 END AS BIGINT)
             AS found_offset,
           CAST(CASE WHEN bad THEN 0 ELSE payload END AS BIGINT)
             AS payload
    FROM f
    """,
    doc="Kafka OFFSET INDEX (.index) seek — the other half of every "
    "real segment directory: sparse 8-byte big-endian entries "
    "(relativeOffset:int32, position:int32) appended as (largest "
    "offset of the batch, batch START position); a consumer seek "
    "floor-binary-searches then scans batches forward (the broker's "
    "translateOffset), shipped as a 2-member tar (segment.log + "
    "segment.index). Trust chain: entries strictly ascending in "
    "BOTH fields, every position must land exactly on a batch "
    "boundary, and each entry's relativeOffset must equal ITS "
    "batch's last offset — a mid-batch position (15th ids), a "
    "bumped relativeOffset (16th ids), or swapped entries (11th "
    "ids) each degrade rather than silently desync the seek. The "
    "oracle recomputes the floor batch, scan length, and the sought "
    "record's payload blind. operators/kafkalog.py "
    "read_kafka_indexed_lookup",
    tags=("llm", "multimodal"),
)
def multimodal_kafka_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.kafkalog import (
        kafka_indexed_lookup_stats,
        synthesize_kafka_indexed_media,
    )

    media = synthesize_kafka_indexed_media(
        load_table(spark, sf_dir, "documents")
    )
    return kafka_indexed_lookup_stats(media, 5)


@register(
    "multimodal_cdx_lookup",
    oracle="""
    WITH m AS (SELECT doc_id AS i, 2 + doc_id % 3 AS n,
                      len(string_split(text, ' ')) AS nw
               FROM documents),
    f AS (SELECT i, n, nw,
                 i + 1000 * (i % n) AS j
          FROM m),
    g AS (SELECT i, n, nw, j,
                 j % 11 = 0 OR i % 14 = 0 OR i % 16 = 0
                   OR i % 18 = 0 OR i % 21 = 0 AS bad
          FROM f)
    SELECT i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'cdx' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT)
             AS n_lines,
           CAST(CASE WHEN bad THEN 0 ELSE 200 END AS BIGINT)
             AS status,
           CASE WHEN bad THEN ''
                ELSE 'Doc ' || CAST(j AS VARCHAR) END AS title,
           CAST(CASE WHEN bad THEN 0
                ELSE 2 + nw + 3 * (1 + j % 3) + 15 END AS BIGINT)
             AS n_words,
           CAST(CASE WHEN bad THEN 0 ELSE 1 END AS BIGINT)
             AS digest_ok
    FROM g
    """,
    doc="CDXJ RANDOM ACCESS — how CommonCrawl is actually consumed "
    "at scale: the published cc-index (one sorted line per capture: "
    "urlkey timestamp {filename/offset/length/digest JSON}) turns a "
    "URL lookup into ONE ranged fetch of ONE gzip member instead of "
    "a 100 TB scan. The lookup proves the whole contract: bytes "
    "outside [offset, offset+length) are never touched (pinned by "
    "corrupting a non-target member - identical result), the range "
    "must frame exactly one CRC-proven gzip member holding one WARC "
    "response, the HTTP body's SHA-1 must equal the index line's "
    "base32 digest (the WARC-Payload-Digest convention), the index "
    "must be SORTED by urlkey (real clients binary-search it), and "
    "the extracted text flows through the charset-aware front door. "
    "Lie stripes: offset+1 (14th ids), length-1 (16th), cooked "
    "digest (18th), unsorted index (21st) - each degrades; the "
    "target's own unclosed-script pages (j%11) degrade at the HTML "
    "layer. operators/warc.py cdx_lookup",
    tags=("llm", "multimodal", "text"),
)
def multimodal_cdx_lookup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.warc import (
        cdx_lookup_stats,
        synthesize_cdx_media,
    )

    media = synthesize_cdx_media(
        load_table(spark, sf_dir, "documents")
    )
    return cdx_lookup_stats(media, "com,example)/doc/{i}")


@register(
    "lakehouse_hudi_snapshot",
    oracle="""
    WITH m AS (SELECT doc_id AS i, 2 + doc_id % 3 AS ng,
                      doc_id % 2 = 0 AS has_t2,
                      doc_id % 13 = 0 OR doc_id % 19 = 0 AS bad
               FROM documents),
    g AS (SELECT i, ng, has_t2, bad, unnest(range(0, ng)) AS gg
          FROM m),
    sel AS (SELECT i, ng, has_t2, bad, gg,
                   CASE WHEN has_t2 AND gg % 2 = 0 THEN 2 ELSE 1
                   END AS c
            FROM g),
    v AS (SELECT i, ng, has_t2, bad, gg,
                 10 + (i + 7 * gg + 13 * c) % 40 AS n,
                 COALESCE(list_sum(
                   [(i * 5 + gg * 11 + c * 17 + 3 * r) % 1000
                    for r in range(0,
                      10 + (i + 7 * gg + 13 * c) % 40)]), 0) AS ks
          FROM sel),
    a AS (SELECT i, MAX(ng) AS ng, BOOL_OR(has_t2) AS has_t2,
                 BOOL_OR(bad) AS bad,
                 CAST(SUM(n) AS BIGINT) AS rows_,
                 CAST(SUM(ks) AS BIGINT) AS ksum
          FROM v GROUP BY i)
    SELECT i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'hudi' END AS format,
           CAST(CASE WHEN bad THEN 0
                WHEN has_t2 THEN 2 ELSE 1 END AS BIGINT)
             AS n_completed,
           CAST(CASE WHEN bad THEN 0 ELSE 1 END AS BIGINT)
             AS n_inflight,
           CAST(CASE WHEN bad THEN 0 ELSE ng END AS BIGINT)
             AS n_groups,
           CAST(CASE WHEN bad THEN 0 ELSE rows_ END AS BIGINT)
             AS total_rows,
           CAST(CASE WHEN bad THEN 0 ELSE ksum END AS BIGINT)
             AS k_sum
    FROM a
    """,
    doc="Hudi COPY-ON-WRITE timeline replay — the THIRD major table "
    "format next to the Delta log and the Iceberg snapshot chain "
    "(hudi.apache.org 'Timeline'): only COMPLETED commits are "
    "readable; per FILE GROUP (fileId) the snapshot sees the base "
    "file of the LATEST completed commit, a rewrite superseding the "
    "old base file under the same fileId. The fixture plants an "
    "INFLIGHT commit whose base file sits in the tar — a dirty read "
    "would see it, the replay provably never opens it (corruption "
    "pin), and superseded base files are likewise never opened. "
    "Trust chain: one base file per group per commit (duplicate "
    "fileId refuses, 19th ids), every selected file's bytes match "
    "fileSizeInBytes and its decode matches numWrites (overstated "
    "by one on 13th ids - caught). TIMESTAMP-AS-OF replays the "
    "timeline prefix (pytest-pinned). operators/hudi.py "
    "read_hudi_snapshot",
    tags=("llm", "lakehouse", "multimodal"),
)
def lakehouse_hudi_snapshot(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.hudi import (
        hudi_snapshot_stats,
        synthesize_hudi_media,
    )

    media = synthesize_hudi_media(
        load_table(spark, sf_dir, "documents")
    )
    return hudi_snapshot_stats(media)


@register(
    "lakehouse_puffin_ndv",
    oracle="""
    WITH m AS (SELECT doc_id AS i, 40 + doc_id % 60 AS n,
                      doc_id % 13 = 0 OR doc_id % 17 = 0
                        OR doc_id % 19 = 0 AS bad
               FROM documents),
    v AS (SELECT i, n, bad,
                 len(list_distinct(
                   [(i * 7 + 3 * r) % 97 for r in range(0, n)]))
                   AS ndv
          FROM m)
    SELECT i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'puffin' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE 1 END AS BIGINT)
             AS n_blobs,
           CAST(CASE WHEN bad THEN 0 ELSE i % 2 END AS BIGINT)
             AS footer_compressed,
           CASE WHEN bad THEN ''
                ELSE ['none', 'lz4', 'zstd'][1 + i % 3] END
             AS blob_codec,
           CAST(CASE WHEN bad THEN 0 ELSE ndv END AS BIGINT) AS ndv,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_rows
    FROM v
    """,
    doc="Puffin container walk (iceberg.apache.org/puffin-spec) - "
    "the statistics sidecar a planner reads for table-level NDV "
    "without touching data: PFA1 magics, footer framing "
    "(payload + LE size + flags), flag-bit-0 LZ4-compressed footer "
    "payloads (hand LZ4 frame walk, odd ids), per-blob metadata "
    "JSON, and blob ranges that must be ascending, non-overlapping "
    "and inside the blob region; blob payloads decode through the "
    "hand lz4/zstd codecs (rotating i%3). The NDV trust chain is "
    "three-way: claimed properties.ndv == the payload's strictly "
    "ascending value count == the ACTUAL distinct count of the "
    "accompanying parquet's column. Lies: ndv+1 (13th ids, the "
    "payload's own books), a dropped payload value with consistent "
    "books (17th - only the data cross-check catches it), a blob "
    "length overrunning the region (19th). The standard "
    "datasketches-theta blob type's wire format needs the library "
    "(brotli-class descope); Puffin is an open container and the "
    "fixture's repo-defined blob type keeps ndv exactly provable. "
    "operators/puffin.py read_puffin_ndv",
    tags=("llm", "lakehouse", "multimodal"),
)
def lakehouse_puffin_ndv(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.puffin import (
        puffin_ndv_stats,
        synthesize_puffin_media,
    )

    media = synthesize_puffin_media(
        load_table(spark, sf_dir, "documents")
    )
    return puffin_ndv_stats(media)


@register(
    "lakehouse_iceberg_dv_puffin",
    oracle="""
    WITH m AS (SELECT doc_id AS i, 2 + doc_id % 2 AS nf,
                      doc_id % 13 = 0 OR doc_id % 17 = 0
                        OR (doc_id % 19 = 0 AND doc_id % 17 <> 0
                            AND doc_id % 2 = 1) AS bad
               FROM documents),
    f AS (SELECT i, nf, bad, unnest(range(0, nf)) AS ff FROM m),
    v AS (SELECT i, nf, bad, ff,
                 20 + (i + 9 * ff) % 60 AS rows_,
                 (ff = 0 OR (ff = 1 AND i % 2 = 1)) AS has_dv
          FROM f),
    w AS (SELECT i, nf, bad, ff, rows_, has_dv,
                 COALESCE(list_sum(
                   [(i * 3 + ff * 19 + 5 * j) % 1000
                    for j in range(0, rows_)]), 0) AS ksum,
                 CASE WHEN has_dv THEN list_distinct(
                   [(i + 3 * ff + 7 * t) % rows_
                    for t in range(0, rows_ // 4)])
                 ELSE [] END AS pos
          FROM v),
    x AS (SELECT i, nf, bad, ff, rows_, has_dv, ksum,
                 len(pos) AS ndel,
                 COALESCE(list_sum(list_transform(pos,
                   p -> (i * 3 + ff * 19 + 5 * p) % 1000)), 0)
                   AS dsum
          FROM w),
    a AS (SELECT i, MAX(nf) AS nf, BOOL_OR(bad) AS bad,
                 CAST(SUM(CASE WHEN has_dv THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_dvs,
                 CAST(SUM(rows_) AS BIGINT) AS total_rows,
                 CAST(SUM(ndel) AS BIGINT) AS deleted_rows,
                 CAST(SUM(rows_ - ndel) AS BIGINT) AS live_rows,
                 CAST(SUM(ksum - dsum) AS BIGINT) AS live_k_sum
          FROM x GROUP BY i)
    SELECT i AS media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'iceberg' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE nf END AS BIGINT)
             AS n_data_files,
           CAST(CASE WHEN bad THEN 0 ELSE n_dvs END AS BIGINT)
             AS n_dvs,
           CAST(CASE WHEN bad THEN 0 ELSE total_rows END AS BIGINT)
             AS total_rows,
           CAST(CASE WHEN bad THEN 0 ELSE deleted_rows END
                AS BIGINT) AS deleted_rows,
           CAST(CASE WHEN bad THEN 0 ELSE live_rows END AS BIGINT)
             AS live_rows,
           CAST(CASE WHEN bad THEN 0 ELSE live_k_sum END AS BIGINT)
             AS live_k_sum
    FROM a
    """,
    doc="Iceberg v3 DELETION VECTORS in Puffin — the format-v3 "
    "merge-on-read design (spec 'Deletion Vectors' + puffin-spec "
    "deletion-vector-v1): position deletes live as Puffin blobs, "
    "one per data file, framed len:u32BE + the D1 D3 39 64 magic "
    "(1681511377 LE, shared with Delta's RoaringBitmapArray for "
    "cross-format compatibility) + the portable 64-bit roaring "
    "vector (hand decoder, operators/roaring.py) + CRC-32:u32BE. "
    "Delete manifests reference blobs by (puffin path, "
    "content_offset, content_size_in_bytes, referenced_data_file, "
    "cardinality); the scan resolves each through the Puffin footer "
    "and demands the range name a REAL blob of the right type whose "
    "referenced-data-file matches — then proves framing books, "
    "magic, CRC, cardinality, and in-range positions before "
    "subtracting deleted rows from the hand-decoded parquet. Lies: "
    "CRC flip (13th ids), a CONSISTENT cardinality lie in manifest "
    "AND blob properties (17th - only the roaring decode's own "
    "count exposes it), a manifest range swapped onto the OTHER "
    "file's blob (19th odd ids - the referenced-data-file "
    "cross-check refuses). operators/puffin.py read_iceberg_dv_scan",
    tags=("llm", "lakehouse", "multimodal"),
)
def lakehouse_iceberg_dv_puffin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from gmall_flink_210726_spark.operators.puffin import (
        iceberg_dv_stats,
        synthesize_iceberg_dv_media,
    )

    media = synthesize_iceberg_dv_media(
        load_table(spark, sf_dir, "documents")
    )
    return iceberg_dv_stats(media)

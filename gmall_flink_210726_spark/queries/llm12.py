r"""LLM-pipeline wave 12: compressed-audio container metadata (MP3)
and lexical retrieval (BM25).

MP3 completes the audio side of the multimodal family the way MP4 did
video: the per-frame header walk is the pass an audio ingestion
pipeline runs on 100% of files (duration, average bitrate, CBR check)
before any codec work. BM25 is the lexical-retrieval scorer every
RAG/dedup pipeline keeps next to its dense-embedding ANN — same
tokenization as the TF-IDF operator, exact rounded-decimal weight
algebra so the oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "multimodal_mp3_frames",
    oracle="""
    WITH br AS (SELECT [32,40,48,56,64,80,96,112,128,160,192,224,256,320]
                  AS t),
    m AS (SELECT doc_id AS media_id,
                 doc_id % 9 = 0 AS bad,
                 6 + doc_id % 10 AS n
          FROM documents)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'mp3' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_frames,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([144000 * t[1 + (media_id * 5 + j) % 14]
                               // 44100 + (media_id + j) % 2
                               for j in range(0, n)]) END AS BIGINT)
             AS total_bytes,
           CAST(CASE WHEN bad THEN 0
                ELSE (n * 1152 * 1000) // 44100 END AS BIGINT)
             AS duration_ms,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([t[1 + (media_id * 5 + j) % 14]
                               for j in range(0, n)]) END AS BIGINT)
             AS kbps_sum,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([(media_id + j) % 2
                               for j in range(0, n)]) END AS BIGINT)
             AS pad_frames
    FROM m, br
    """,
    doc="REAL MPEG-1 Layer III frame walk: synthesize compliant CBR-"
    "free MP3 streams (per-frame 4-byte headers, ISO/IEC 11172-3 "
    "bitrate/sample-rate tables, padding bit, exact 144*bitrate/"
    "samplerate frame-length arithmetic) from the document ids, then "
    "parse them back in an Arrow-batched mapInPandas — frame count, "
    "exact byte extent, stream duration from the 1152-samples-per-"
    "frame grant, per-stream bitrate sum (VBR average), padding-frame "
    "count. The oracle recomputes every field from the fixture "
    "formulas WITHOUT seeing the bytes; every 9th blob is truncated "
    "mid-frame and must degrade to 'unknown' (the corrupt-stripe "
    "contract). operators/mp3.py",
    tags=("llm", "multimodal"),
)
def multimodal_mp3_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.mp3 import (
        mp3_frame_stats,
        synthesize_mp3_media,
    )

    media = synthesize_mp3_media(load_table(spark, sf_dir, "documents"))
    return mp3_frame_stats(media)


@register(
    "text_bm25_topk",
    oracle=r"""
    WITH tok AS (SELECT doc_id,
                   unnest(list_filter(string_split_regex(lower(text),
                                                         '\s+'),
                                      x -> x <> '')) AS w
                 FROM documents),
    len AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
            FROM tok GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
                     CAST(SUM(dl) AS BIGINT) AS tl
              FROM len),
    q AS (SELECT unnest(['data', 'model', 'learning', 'system']) AS w),
    tf AS (SELECT t.doc_id, t.w, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok t JOIN q ON t.w = q.w GROUP BY 1, 2),
    dfq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
    sc AS (SELECT tf.doc_id,
                  CAST(round(
                    ln((CAST(nd AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                       / (CAST(df AS DOUBLE) + 0.5) + 1.0)
                    * (CAST(tf AS DOUBLE) * 2.2)
                    / (CAST(tf AS DOUBLE)
                       + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                                * CAST(nd AS DOUBLE)
                                / CAST(tl AS DOUBLE))), 6)
                    AS DECIMAL(18,6)) AS term_score
           FROM tf JOIN dfq USING (w) JOIN len USING (doc_id), stats),
    agg AS (SELECT doc_id,
                   CAST(CAST(SUM(term_score) AS DECIMAL(18,6)) AS DOUBLE)
                     AS bm25
            FROM sc GROUP BY doc_id),
    rk AS (SELECT doc_id, bm25,
                  ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
           FROM agg)
    SELECT doc_id, bm25, CAST(rnk AS BIGINT) AS rnk
    FROM rk WHERE rnk <= 20
    """,
    doc="BM25 top-20 lexical retrieval over the corpus for a fixed "
    "query ('data model learning system'), k1=1.2, b=0.75 — the "
    "sparse scorer a RAG pipeline runs beside dense-embedding ANN. "
    "Same whitespace tokenization as the TF-IDF operator; per-(doc,"
    "term) scores are rounded to 6 dp THEN summed as DECIMAL(18,6) "
    "so the doc score is an order-free exact sum (the repo's weight-"
    "algebra rule); rank ties break on doc_id. Only query-term "
    "postings shuffle (a 4-term semi-join prunes the corpus scan); "
    "df and corpus stats are 1-row/4-row broadcast frames; the rank "
    "window runs over the matched-doc frame only.",
    tags=("llm", "text", "retrieval"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    terms = ["data", "model", "learning", "system"]
    # ONE corpus scan: token counts fold map-side into (dl, tf_0..tf_3)
    # per doc — the raw token explode never shuffles, and the second
    # tokenization pass a naive dl-then-tf plan pays is gone
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("w"),
    )
    # localCheckpoint pins the single tokenization: per_doc fans out to
    # four consumers (dl, corpus stats, tf, df) and Catalyst re-plans
    # the scan+explode for each without it (measured 8 scans / 0
    # reused exchanges). The checkpointed frame is one 6-long row per
    # doc — bounded by |docs|, never corpus bytes
    per_doc = (
        tok.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("dl"),
            *[
                F.sum(F.when(F.col("w") == t, 1).otherwise(0))
                .cast("long")
                .alias(f"tf_{k}")
                for k, t in enumerate(terms)
            ],
        )
        .localCheckpoint(eager=True)
    )
    ln = per_doc.select("doc_id", "dl")
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("dl").cast("long").alias("tl"),
    )
    stacked = ", ".join(
        f"'{t}', tf_{k}" for k, t in enumerate(terms)
    )
    tf = per_doc.select(
        "doc_id",
        F.expr(f"stack({len(terms)}, {stacked}) AS (w, tf)"),
    ).filter(F.col("tf") > 0)
    dfq = tf.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("df"))
    sc = (
        tf.join(F.broadcast(dfq), "w")
        .join(ln, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                F.log(
                    (
                        F.col("nd").cast("double")
                        - F.col("df").cast("double")
                        + F.lit(0.5)
                    )
                    / (F.col("df").cast("double") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * (F.col("tf").cast("double") * F.lit(2.2))
                / (
                    F.col("tf").cast("double")
                    + F.lit(1.2)
                    * (
                        F.lit(0.25)
                        + F.lit(0.75)
                        * F.col("dl").cast("double")
                        * F.col("nd").cast("double")
                        / F.col("tl").cast("double")
                    )
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("term_score"),
        )
    )
    agg = sc.groupBy("doc_id").agg(
        F.sum("term_score")
        .cast("decimal(18,6)")
        .cast("double")
        .alias("bm25")
    )
    # top-20 via orderBy+limit = TakeOrderedAndProject (per-partition
    # heaps, no global sort, no single-partition rank window over the
    # full matched set); the rank window then runs on 20 rows
    top = agg.orderBy(F.col("bm25").desc(), F.col("doc_id")).limit(20)
    return top.select(
        "doc_id",
        "bm25",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), F.col("doc_id")))
        .cast("long")
        .alias("rnk"),
    )


@register(
    "multimodal_jpeg_exif",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, doc_id % 7 = 0 AS bad
               FROM documents)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'jpeg' END AS format,
           CASE WHEN bad THEN ''
                WHEN media_id % 2 = 0 THEN 'II' ELSE 'MM' END
             AS byte_order,
           CAST(CASE WHEN bad THEN 0 ELSE 1 + media_id % 8 END AS BIGINT)
             AS orientation,
           CASE WHEN bad THEN ''
                ELSE 'cam' || CAST(media_id % 5 AS VARCHAR) END AS make,
           CAST(CASE WHEN bad THEN 0 ELSE 72 + media_id % 4 END AS BIGINT)
             AS xres_num,
           CAST(CASE WHEN bad THEN 0
                WHEN media_id % 3 = 0 THEN 4 ELSE 3 END AS BIGINT)
             AS n_ifd_entries,
           CAST(CASE WHEN bad THEN 0 ELSE 16 + media_id % 9 END AS BIGINT)
             AS width,
           CAST(CASE WHEN bad THEN 0 ELSE 8 + media_id % 7 END AS BIGINT)
             AS height
    FROM m
    """,
    doc="REAL EXIF extraction: synthesize minimal JPEGs whose APP1 "
    "segment carries a complete TIFF structure (EXIF 2.3), then walk "
    "it back in an Arrow-batched mapInPandas — JPEG marker framing to "
    "find APP1/SOF0, byte-order header (even ids II, odd ids MM — a "
    "one-endian parser bug flips half the corpus), tag-sorted IFD "
    "walk covering all three storage classes (inline SHORT "
    "orientation, offset ASCII make/software, offset RATIONAL "
    "x-resolution). Orientation is the tag every thumbnailer reads "
    "before resize. The oracle recomputes every field from the id "
    "formulas blind; every 7th blob is truncated mid-structure and "
    "must degrade to 'unknown'. operators/exif.py",
    tags=("llm", "multimodal"),
)
def multimodal_jpeg_exif(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.exif import (
        jpeg_exif_stats,
        synthesize_exif_media,
    )

    media = synthesize_exif_media(load_table(spark, sf_dir, "documents"))
    return jpeg_exif_stats(media)


@register(
    "multimodal_mp3_id3",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, doc_id % 8 = 0 AS bad,
                      'track ' || CAST(doc_id % 100 AS VARCHAR)
                        || chr(233) AS title,
                      'artist ' || CAST(doc_id % 10 AS VARCHAR) AS artist,
                      1 + doc_id % 12 AS track
               FROM documents)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'mp3' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE 3 END AS BIGINT)
             AS id3_version,
           CAST(CASE WHEN bad THEN 0 ELSE 3 END AS BIGINT) AS n_tags,
           CASE WHEN bad THEN '' ELSE title END AS title,
           CASE WHEN bad THEN '' ELSE artist END AS artist,
           CAST(CASE WHEN bad THEN 0 ELSE track END AS BIGINT) AS track,
           CAST(CASE WHEN bad THEN 0
                ELSE 10 + (CASE WHEN media_id % 2 = 1
                           THEN 13 + 2 * length(title)
                           ELSE 11 + length(title) END)
                     + (11 + length(artist))
                     + (11 + length(CAST(track AS VARCHAR)))
                     + (2 + media_id % 6) END AS BIGINT) AS tag_bytes,
           CAST(CASE WHEN bad THEN 0 ELSE 3 + media_id % 5 END AS BIGINT)
             AS n_frames
    FROM m
    """,
    doc="ID3v2.3 tag extraction — the MP3 sibling of JPEG's EXIF: "
    "syncsafe-int tag size (7-bit bytes, a real-world parser trap), "
    "TIT2/TPE1/TRCK text-frame walk with flag and encoding-byte "
    "validation — encoding 0x00 ISO-8859-1 AND 0x01 UTF-16-with-BOM "
    "(the charset chain's strict RFC 2781 walk; the title ends in a "
    "non-ASCII character and rotates encodings by id parity, so the "
    "DECODE, not just the framing, is oracle-pinned; v2.4-only "
    "encodings refuse inside a v2.3 tag) — zero-padding handling, "
    "then the ISO 11172-3 frame "
    "walk over the remaining audio so tag AND audio must BOTH parse. "
    "The oracle recomputes titles, artists, track numbers, the exact "
    "tag byte extent (header + 3 frames + id-dependent padding) and "
    "audio frame count from the id formulas blind; every 8th blob is "
    "truncated mid-audio and must degrade to 'unknown'. "
    "operators/mp3.py mp3_id3_tags",
    tags=("llm", "multimodal"),
)
def multimodal_mp3_id3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.mp3 import (
        mp3_id3_tags,
        synthesize_id3_media,
    )

    media = synthesize_id3_media(load_table(spark, sf_dir, "documents"))
    return mp3_id3_tags(media)


@register(
    "multimodal_tar_members",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, doc_id % 10 = 0 AS bad,
                      3 + doc_id % 6 AS n
               FROM documents)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'tar' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_members,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([100 + (media_id * 37 + 53 * j) % 400
                               for j in range(0, n)]) END AS BIGINT)
             AS total_payload,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([list_sum(
                       [(media_id * 11 + 7 * j + 3 * k) % 256
                        for k in range(0,
                            100 + (media_id * 37 + 53 * j) % 400)])
                     for j in range(0, n)]) END AS BIGINT)
             AS payload_sum,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([1 + (100 + (media_id * 37 + 53 * j) % 400
                                    + 511) // 512
                               for j in range(0, n)]) + 2 END AS BIGINT)
             AS n_blocks,
           CASE WHEN bad THEN ''
                ELSE 'doc_' || CAST(media_id AS VARCHAR) || '_0.txt' END
             AS first_name
    FROM m
    """,
    doc="POSIX ustar shard walk — the WebDataset container pass a "
    "multimodal loader runs on every tar shard before any sample "
    "decode: 512-byte header blocks, octal size fields, header "
    "CHECKSUM validation (sum over the header with the chksum field "
    "blanked — a real integrity check the oracle never sees), magic/"
    "typeflag checks, zero-padding verification, two-zero-block EOF. "
    "The oracle recomputes member counts, exact payload byte extents "
    "and sums, 512-block counts, and first member names from the id "
    "formulas blind; every 10th shard is truncated mid-payload and "
    "must degrade to 'unknown'. operators/tar.py",
    tags=("llm", "multimodal"),
)
def multimodal_tar_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.tar import (
        synthesize_tar_media,
        tar_member_stats,
    )

    media = synthesize_tar_media(load_table(spark, sf_dir, "documents"))
    return tar_member_stats(media)


@register(
    "multimodal_zip_entries",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, doc_id % 12 = 0 AS bad,
                      2 + doc_id % 5 AS n
               FROM documents)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'zip' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_entries,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([40 + (media_id * 29 + 17 * j) % 200
                               for j in range(0, n)]) END AS BIGINT)
             AS total_bytes,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([list_sum(
                       [(media_id * 23 + 11 * j + 5 * k) % 256
                        for k in range(0,
                            40 + (media_id * 29 + 17 * j) % 200)])
                     for j in range(0, n)]) END AS BIGINT)
             AS payload_sum,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([46 + length('f_' || CAST(media_id AS
                     VARCHAR) || '_' || CAST(j AS VARCHAR) || '.bin')
                               for j in range(0, n)]) END AS BIGINT)
             AS cd_size,
           CASE WHEN bad THEN ''
                ELSE 'f_' || CAST(media_id AS VARCHAR) || '_0.bin' END
             AS first_name
    FROM m
    """,
    doc="ZIP central-directory walk — tar's structural inverse (the "
    "authoritative index lives at the END): EOCD back-scan, central "
    "directory traversal, per-entry cross-check against the local "
    "file header (signature + name agreement + offset bounds), and a "
    "REAL CRC-32 verification of every STORED payload via zlib — an "
    "integrity check the oracle cannot see, which is the point: the "
    "decoder must EARN the formula-predicted fields by full "
    "validation. Blobs round-trip through Python's own zipfile in "
    "the unit tests, proving they are genuine archives. Every 12th "
    "id loses its EOCD tail and must degrade to 'unknown'. "
    "operators/zipc.py",
    tags=("llm", "multimodal"),
)
def multimodal_zip_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.zipc import (
        synthesize_zip_media,
        zip_entry_stats,
    )

    media = synthesize_zip_media(load_table(spark, sf_dir, "documents"))
    return zip_entry_stats(media)


@register(
    "multimodal_zip_deflate",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, doc_id % 14 = 0 AS bad,
                      2 + doc_id % 4 AS n
               FROM documents)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'zip' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_entries,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([200 + (media_id * 41 + 31 * j) % 600
                               for j in range(0, n)]) END AS BIGINT)
             AS total_uncompressed,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([list_sum(
                       [97 + ((media_id * 7 + 13 * j + (k // 5) * 11)
                              % 7)
                        for k in range(0,
                            200 + (media_id * 41 + 31 * j) % 600)])
                     for j in range(0, n)]) END AS BIGINT)
             AS payload_sum,
           CASE WHEN bad THEN ''
                ELSE 'd_' || CAST(media_id AS VARCHAR) || '_0.txt' END
             AS first_name
    FROM m
    """,
    doc="HAND-WRITTEN INFLATE (RFC 1951) under the ZIP walk: fixtures "
    "are compressed by zlib itself (raw deflate), and the decoder "
    "reverses them from scratch — LSB-first bit reader, stored "
    "blocks, the fixed Huffman code, full dynamic-Huffman blocks "
    "(code-length alphabet with 16/17/18 repeats), length/distance "
    "extra-bit tables, LZ77 back-copy, decompression-bomb guard — "
    "then proves each payload via size + CRC-32. The oracle "
    "recomputes entry counts and the exact DECOMPRESSED byte sums "
    "from stateless run-text formulas it can evaluate blind; the "
    "compressed bytes in between are opaque to it, which is the "
    "point — only a correct inflate reproduces the predicted sums. "
    "Completes the from-scratch codec set: Huffman (JPEG), LZW "
    "(GIF/TIFF), ADPCM/mu-law (WAV), DEFLATE (ZIP). "
    "operators/inflate.py",
    tags=("llm", "multimodal"),
)
def multimodal_zip_deflate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.inflate import (
        synthesize_zip_deflate_media,
        zip_deflate_stats,
    )

    media = synthesize_zip_deflate_media(
        load_table(spark, sf_dir, "documents")
    )
    return zip_deflate_stats(media)


@register(
    "multimodal_gzip_members",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, doc_id % 13 = 0 AS bad,
                      1 + doc_id % 4 AS n
               FROM documents)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'gzip' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_members,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([150 + (media_id * 43 + 29 * j) % 500
                               for j in range(0, n)]) END AS BIGINT)
             AS total_uncompressed,
           CAST(CASE WHEN bad THEN 0
                ELSE list_sum([list_sum(
                       [97 + ((media_id * 7 + 13 * j + (k // 5) * 11)
                              % 7)
                        for k in range(0,
                            150 + (media_id * 43 + 29 * j) % 500)])
                     for j in range(0, n)]) END AS BIGINT)
             AS payload_sum,
           CASE WHEN bad THEN ''
                ELSE 'rec_' || CAST(media_id AS VARCHAR) || '_0' END
             AS first_name
    FROM m
    """,
    doc="Multi-member gzip walk (RFC 1952) — the WARC/WET convention "
    "web-scale text corpora actually ship in: one gzip member per "
    "record, concatenated, so a reader must loop header -> deflate "
    "body -> CRC-32 + ISIZE trailer until exact end-of-stream. The "
    "deflate bodies are decoded by the SAME hand-written inflate as "
    "multimodal_zip_deflate (fixtures compressed by zlib; streams "
    "also round-trip through stdlib gzip in the unit tests), FNAME "
    "headers are parsed, and every member's CRC must prove the "
    "decode. The oracle recomputes member counts and decompressed "
    "byte sums blind; every 13th stream is truncated mid-trailer. "
    "operators/inflate.py _walk_gzip",
    tags=("llm", "multimodal"),
)
def multimodal_gzip_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.inflate import (
        gzip_member_stats,
        synthesize_gzip_media,
    )

    media = synthesize_gzip_media(load_table(spark, sf_dir, "documents"))
    return gzip_member_stats(media)

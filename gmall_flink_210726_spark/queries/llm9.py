r"""LLM wave 9: exact cross-document substring duplication and
mergeable-HLL register rollup.

text_substring_dedup approximates the ExactSubstr pass of Lee et al.
2022 ("Deduplicating Training Data Makes Language Models Better",
ACL) with strided fixed-length hash windows instead of a suffix
array: a 40-char window every 10 chars catches any cross-document
duplicated run of >= 49 chars (a duplicated run of length
L >= window + stride - 1 must contain an aligned window) at 1/10 the
explode cost of per-position windows, and only (doc_id, md5) pairs
ever shuffle — document bodies stay in the scan stage.

sketch_hll_rollup demonstrates the register-merge algebra that makes
sketches the 100 TB answer to multi-granularity distinct counts:
per-month HLL register tables MAX-merge into the corpus-level table
WITHOUT a second pass over raw rows — aggregate once at the finest
grain, roll up sketches, never re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table

_WIN = 40
_STRIDE = 10


@register(
    "text_substring_dedup",
    oracle=f"""
    WITH d AS (SELECT doc_id, text FROM documents
               WHERE length(text) >= {_WIN}),
    px AS (SELECT doc_id, text,
                  unnest(range(1, length(text) - {_WIN - 2}, {_STRIDE}))
                    AS p
           FROM d),
    w AS (SELECT doc_id,
                 md5(substr(text, CAST(p AS INTEGER), {_WIN})) AS h
          FROM px),
    dup AS (SELECT h FROM w GROUP BY h
            HAVING COUNT(DISTINCT doc_id) > 1),
    tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows
            FROM w GROUP BY 1),
    dd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_windows
           FROM w WHERE h IN (SELECT h FROM dup) GROUP BY 1)
    SELECT docs.doc_id,
           COALESCE(tot.n_windows, 0) AS n_windows,
           COALESCE(dd.n_dup_windows, 0) AS n_dup_windows,
           CASE WHEN COALESCE(tot.n_windows, 0) = 0 THEN 0.0
                ELSE COALESCE(dd.n_dup_windows, 0)
                     / CAST(tot.n_windows AS DOUBLE) END AS dup_frac
    FROM documents docs
    LEFT JOIN tot ON docs.doc_id = tot.doc_id
    LEFT JOIN dd ON docs.doc_id = dd.doc_id
    """,
    doc="Exact cross-document substring duplication screen (the "
    "hash-window approximation of Lee et al. 2022's ExactSubstr "
    "suffix-array pass): 40-char windows at stride 10 — any "
    "cross-doc duplicated run >= 49 chars necessarily contains an "
    "aligned window — hashed to md5 in the scan projection, grouped "
    "by hash, and a window counts as duplicated when its hash occurs "
    "in more than one distinct document. Per-doc output: window "
    "count, duplicated-window count, duplicated fraction. Scale "
    "shape: the stride divides the explode factor by 10 and the "
    "md5 happens BEFORE the exchange, so shuffles carry (id, hash) "
    "pairs only; the dup-hash set is HAVING-filtered before the "
    "semi-join back. dup_frac is an exact int/int double quotient.",
    tags=("llm", "text", "dedup"),
)
def text_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.filter(F.length("text") >= _WIN)
    w = d.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(1), F.length("text") - (_WIN - 1), F.lit(_STRIDE)
            )
        ).alias("p"),
        "text",
    ).select(
        "doc_id",
        F.md5(F.substring(F.col("text"), F.col("p"), F.lit(_WIN))).alias(
            "h"
        ),
    )
    # the window-hash frame feeds three legs (dup-hash mining, per-doc
    # totals, per-doc dup counts): materialize once
    w = w.localCheckpoint(eager=False)
    dup = (
        w.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("h")
    )
    tot = w.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows")
    )
    dd = (
        w.join(dup, "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup_windows"))
    )
    nw = F.coalesce("n_windows", F.lit(0)).cast("long")
    ndw = F.coalesce("n_dup_windows", F.lit(0)).cast("long")
    return (
        docs.select("doc_id")
        .join(tot, "doc_id", "left")
        .join(dd, "doc_id", "left")
        .select(
            "doc_id",
            nw.alias("n_windows"),
            ndw.alias("n_dup_windows"),
            F.when(nw == 0, F.lit(0.0))
            .otherwise(ndw / nw.cast("double"))
            .alias("dup_frac"),
        )
    )


@register(
    "multimodal_jpeg_422",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      1 + doc_id % 3 AS mw, 1 + doc_id % 3 AS mh,
                      doc_id % 5 AS wp, doc_id % 3 AS hp,
                      doc_id % 13 = 0 AS bad
               FROM documents),
    s AS (SELECT media_id, bad, mw, mh,
                 16 * mw - wp AS w, 8 * mh - hp AS h FROM m),
    t AS (SELECT media_id, bad, w, h,
            list_sum([
              (LEAST(255, GREATEST(0, CAST(floor(
                 ((media_id * 59 + 31 * b) % 256)
                 + CAST(1.402 AS DOUBLE)
                   * (((media_id * 31 + 11 * ((b // (2 * mw)) * mw
                        + (b % (2 * mw)) // 2)) % 256) - 128)
                 + 0.5) AS BIGINT)))
             + LEAST(255, GREATEST(0, CAST(floor(
                 ((media_id * 59 + 31 * b) % 256)
                 - CAST(0.344136 AS DOUBLE)
                   * (((media_id * 17 + 5 * ((b // (2 * mw)) * mw
                        + (b % (2 * mw)) // 2)) % 256) - 128)
                 - CAST(0.714136 AS DOUBLE)
                   * (((media_id * 31 + 11 * ((b // (2 * mw)) * mw
                        + (b % (2 * mw)) // 2)) % 256) - 128)
                 + 0.5) AS BIGINT)))
             + LEAST(255, GREATEST(0, CAST(floor(
                 ((media_id * 59 + 31 * b) % 256)
                 + CAST(1.772 AS DOUBLE)
                   * (((media_id * 17 + 5 * ((b // (2 * mw)) * mw
                        + (b % (2 * mw)) // 2)) % 256) - 128)
                 + 0.5) AS BIGINT))))
              * LEAST(8, w - (b % (2 * mw)) * 8)
              * LEAST(8, h - (b // (2 * mw)) * 8)
              for b in range(0, 2 * mw * mh)]) AS vsum
          FROM s)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'jpeg' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE w END AS BIGINT) AS width,
           CAST(CASE WHEN bad THEN 0 ELSE h END AS BIGINT) AS height,
           CAST(CASE WHEN bad THEN 0 ELSE w * h END AS BIGINT) AS n_pixels,
           CAST(CASE WHEN bad THEN 0 ELSE vsum END AS BIGINT) AS pixel_sum
    FROM t
    """,
    doc="REAL 4:2:2 chroma-subsampled color JPEG decode (horizontal-"
    "only subsampling, the broadcast/video-capture convention): Y at "
    "2x1 with Cb/Cr at 1x1, 16x8-pixel MCUs carrying 2 Y blocks + Cb "
    "+ Cr, per-component DC predictors, horizontal-only replicate "
    "upsampling — a decoder that applies the 4:2:0 vertical repeat "
    "or mis-maps chroma columns changes the sums. Same BT.601 "
    "floor(x+0.5) contract as the 4:2:0 query; the oracle recomputes "
    "crop-weighted per-block RGB contributions blind from the LCGs. "
    "operators/jpeg.py:_make_jpeg422",
    tags=("llm", "multimodal"),
)
def multimodal_jpeg_422(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.jpeg import (
        jpeg_pixel_stats,
        synthesize_jpeg422_media,
    )

    media = synthesize_jpeg422_media(load_table(spark, sf_dir, "documents"))
    return jpeg_pixel_stats(media)


@register(
    "multimodal_png_adam7",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      5 + doc_id % 13 AS w, 3 + doc_id % 9 AS h,
                      doc_id % 11 = 0 AS bad
               FROM documents),
    s AS (SELECT media_id, bad, w, h,
            list_sum([(media_id * 43 + 13 * k) % 256
                      for k in range(0, w * h * 3)]) AS rsum,
            list_sum([(k + 1) * ((media_id * 43 + 13 * k) % 256)
                      for k in range(0, w * h * 3)]) AS psum
          FROM m)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'png' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE w END AS BIGINT) AS width,
           CAST(CASE WHEN bad THEN 0 ELSE h END AS BIGINT) AS height,
           CAST(CASE WHEN bad THEN 0 ELSE w * h END AS BIGINT) AS n_pixels,
           CAST(CASE WHEN bad THEN 0 ELSE rsum END AS BIGINT) AS sum_rgb,
           CAST(CASE WHEN bad THEN 0 ELSE psum END AS BIGINT) AS pos_sum
    FROM s
    """,
    doc="Adam7-interlaced PNG decode (PNG spec §8.2): seven "
    "independent sub-images, each with its own filter bytes and "
    "fresh prior-line state, unfiltered then scattered back to "
    "(y0 + r*dy, x0 + c*dx); empty passes contribute no bytes (small "
    "fixture heights exercise the skip rule) and rotating per-pass "
    "filters push all five spec filters incl. Average/Paeth through "
    "the wire. The position-weighted byte checksum makes pass "
    "mis-scatter detectable even when the byte multiset survives. "
    "Truncated blobs degrade; the oracle recomputes blind from the "
    "LCG raster formula. operators/multimodal.py:_make_png_adam7",
    tags=("llm", "multimodal"),
)
def multimodal_png_adam7(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.multimodal import (
        png_adam7_stats,
        synthesize_png_adam7_media,
    )

    media = synthesize_png_adam7_media(
        load_table(spark, sf_dir, "documents")
    )
    return png_adam7_stats(media)


@register(
    "multimodal_tiff_lzw",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      16 + doc_id % 17 AS w, 10 + doc_id % 11 AS h,
                      doc_id % 12 = 0 AS bad
               FROM documents),
    s AS (SELECT media_id, bad, w, h,
            list_sum([(media_id * 29 + 7 * (p // 3)) % 256
                      for p in range(0, w * h)]) AS rsum
          FROM m)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'tiff' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE w END AS BIGINT) AS width,
           CAST(CASE WHEN bad THEN 0 ELSE h END AS BIGINT) AS height,
           CAST(CASE WHEN bad THEN 0 ELSE w * h END AS BIGINT) AS n_pixels,
           CAST(CASE WHEN bad THEN 0 ELSE rsum END AS BIGINT) AS rgb_sum
    FROM s
    """,
    doc="LZW-compressed TIFF decode (TIFF 6.0 §13, Compression=5): a "
    "real variable-width MSB-first LZW decoder — 9->12-bit codes, "
    "ClearCode/EOI, KwKwK, and the TIFF early change (the decoder's "
    "width bumps at 2^w - 2 table entries because it runs one entry "
    "behind the encoder) — run per strip inside multi-strip grayscale "
    "images on both byte orders. Strips are sized so every healthy "
    "image crosses the 9->10-bit boundary. Truncated blobs degrade "
    "to 'unknown'; the oracle recomputes every value blind from the "
    "LCG pixel formula and never sees a compressed byte. "
    "operators/tiff.py:_lzw_decode",
    tags=("llm", "multimodal"),
)
def multimodal_tiff_lzw(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.tiff import (
        synthesize_tiff_lzw_media,
        tiff_pixel_stats,
    )

    media = synthesize_tiff_lzw_media(load_table(spark, sf_dir, "documents"))
    return tiff_pixel_stats(media)


_HASH60 = (
    "list_sum([(strpos('0123456789abcdef', substr({h}, i, 1)) - 1)"
    " * (CAST(1 AS BIGINT) << (4 * (15 - i))) for i in range(1, 16)])"
)

_HLL_EST = """
    round(CASE WHEN 0.709 * 64 * 64 / (s_obs + (64 - n_regs)) <= 160.0
                    AND 64 - n_regs > 0
               THEN 64.0 * ln(64.0 / (64 - n_regs))
               ELSE 0.709 * 64 * 64 / (s_obs + (64 - n_regs)) END, 4)"""


@register(
    "sketch_hll_rollup",
    oracle=f"""
    WITH ded AS (SELECT DISTINCT
                   strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')
                     AS month,
                   o_custkey
                 FROM orders),
    hv AS (SELECT month,
             {_HASH60.format(h="md5(CAST(o_custkey AS VARCHAR))")} AS h60
           FROM ded),
    rg AS (SELECT month, h60 % 64 AS reg,
                  CASE WHEN h60 // 64 = 0 THEN 55
                       ELSE 55 - length(bin(h60 // 64)) END AS rho
           FROM hv),
    mx AS (SELECT month, reg, MAX(rho) AS m FROM rg GROUP BY 1, 2),
    allmx AS (SELECT '(all)' AS month, reg, MAX(m) AS m FROM mx
              GROUP BY 2),
    u AS (SELECT * FROM mx UNION ALL SELECT * FROM allmx),
    pg AS (SELECT month, SUM(power(2.0, -m)) AS s_obs,
                  COUNT(*) AS n_regs
           FROM u GROUP BY 1),
    ex AS (SELECT month, CAST(COUNT(*) AS BIGINT) AS exact_distinct
           FROM ded GROUP BY 1
           UNION ALL
           SELECT '(all)', CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
           FROM orders)
    SELECT pg.month, {_HLL_EST} AS hll_estimate, ex.exact_distinct
    FROM pg JOIN ex USING (month)
    """,
    doc="Mergeable-HLL rollup (the sketch re-aggregation pattern that "
    "replaces COUNT DISTINCT re-scans at 100 TB): per-month register "
    "tables (64 rows/group, operators/sketch.py:hll_registers) "
    "MAX-merge into the corpus-level register table — the '(all)' "
    "row's estimate is derived entirely from the month partials, no "
    "second pass over raw rows — then both granularities estimate "
    "from ONE unioned register frame, with exact counts alongside "
    "for calibration. Register merge-by-MAX is HLL's algebra "
    "(st10 relies on it across epochs; this query relies on it "
    "across GROUPS).",
    tags=("sketch", "llm"),
)
def sketch_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.sketch import (
        hll_estimate_from_registers,
        hll_registers,
    )

    orders = load_table(spark, sf_dir, "orders")
    ded = (
        orders.select(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd")
            .alias("month"),
            "o_custkey",
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    regs = hll_registers(ded, ["month"], "o_custkey").localCheckpoint(
        eager=False
    )
    allregs = regs.groupBy("reg").agg(F.max("m").alias("m")).select(
        F.lit("(all)").alias("month"), "reg", "m"
    )
    est = hll_estimate_from_registers(
        regs.unionByName(allregs), ["month"]
    )
    exact = ded.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("exact_distinct")
    )
    exact_all = ded.agg(
        F.lit("(all)").alias("month"),
        F.count_distinct("o_custkey").cast("long").alias("exact_distinct"),
    )
    return est.join(exact.unionByName(exact_all), "month")


@register(
    "multimodal_png_palette",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      4 + doc_id % 15 AS w, 3 + doc_id % 10 AS h,
                      16 + doc_id % 17 AS np,
                      doc_id % 14 = 0 AS bad
               FROM documents),
    s AS (SELECT media_id, bad, w, h,
            list_sum([(media_id * 7
                       + 29 * ((media_id * 53 + 17 * k) % np)) % 256
                      for k in range(0, w * h)]) AS sr,
            list_sum([(media_id * 11
                       + 31 * ((media_id * 53 + 17 * k) % np)) % 256
                      for k in range(0, w * h)]) AS sg,
            list_sum([(media_id * 13
                       + 37 * ((media_id * 53 + 17 * k) % np)) % 256
                      for k in range(0, w * h)]) AS sb
          FROM m)
    SELECT media_id,
           CASE WHEN bad THEN 'unknown' ELSE 'png' END AS format,
           CAST(CASE WHEN bad THEN 0 ELSE w END AS BIGINT) AS width,
           CAST(CASE WHEN bad THEN 0 ELSE h END AS BIGINT) AS height,
           CAST(CASE WHEN bad THEN 0 ELSE w * h END AS BIGINT) AS n_pixels,
           CAST(CASE WHEN bad THEN 0 ELSE sr END AS BIGINT) AS sum_r,
           CAST(CASE WHEN bad THEN 0 ELSE sg END AS BIGINT) AS sum_g,
           CAST(CASE WHEN bad THEN 0 ELSE sb END AS BIGINT) AS sum_b
    FROM s
    """,
    doc="Paletted PNG decode (color type 3): PLTE chunk parse + "
    "1-byte-per-pixel index raster unfiltered at bpp=1 — the filter "
    "unit CHANGES with the color type (PNG spec 9.2: filters reach "
    "back bpp bytes), so a decoder reusing the truecolor bpp=3 "
    "offsets misdecodes every Sub/Average/Paeth line — then indices "
    "map through the palette with an out-of-range guard. Rotating "
    "y%5 filters push all five through the bpp=1 path. The oracle "
    "recomputes channel sums blind through the palette LCGs. "
    "operators/multimodal.py:_make_png_palette",
    tags=("llm", "multimodal"),
)
def multimodal_png_palette(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.multimodal import (
        png_pixel_stats,
        synthesize_png_palette_media,
    )

    media = synthesize_png_palette_media(
        load_table(spark, sf_dir, "documents")
    )
    return png_pixel_stats(media)


@register(
    "text_zipf_fit",
    oracle=r"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS w
      FROM documents),
    tf AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
           FROM tok GROUP BY w),
    rk AS (SELECT w, freq,
                  CAST(row_number() OVER (ORDER BY freq DESC, w)
                       AS BIGINT) AS rank
           FROM tf),
    top AS (SELECT rank,
                   CAST(round(ln(CAST(rank AS DOUBLE)), 6)
                        AS DECIMAL(12,6)) AS lr,
                   CAST(round(ln(CAST(freq AS DOUBLE)), 6)
                        AS DECIMAL(12,6)) AS lf
            FROM rk WHERE rank <= 500),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(lr) AS DOUBLE) AS sx,
                 CAST(SUM(lf) AS DOUBLE) AS sy,
                 CAST(SUM(lr * lr) AS DOUBLE) AS sxx,
                 CAST(SUM(lr * lf) AS DOUBLE) AS sxy
          FROM top)
    SELECT n AS n_terms,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS zipf_slope,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
             / CAST(n AS DOUBLE) AS intercept
    FROM m
    """,
    doc="Zipf rank-frequency power-law fit (the corpus-health "
    "diagnostic: natural text has slope ~ -1; boilerplate-heavy or "
    "template corpora deviate): OLS of ln(freq) on ln(rank) over the "
    "top-500 vocabulary with a deterministic (freq DESC, term) rank. "
    "Exactness: ln values are 6-dp-rounded DECIMALs (the dsir ln "
    "contract) so every moment sum is exact and order-free; the two "
    "coefficient divisions are the only unrounded float ops, "
    "engine-identical. Scale shape: one tokenization scan collapses "
    "to the vocabulary frame; the global top-500 rank window runs on "
    "the vocabulary (bounded), never the corpus; the fit itself is a "
    "5-scalar projection.",
    tags=("llm", "text"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
        ).alias("w")
    )
    tf = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    rk = tf.select(
        "freq",
        F.row_number()
        .over(W.orderBy(F.col("freq").desc(), F.col("w")))
        .cast("long")
        .alias("rank"),
    ).filter(F.col("rank") <= 500)
    lr = F.round(F.log(F.col("rank").cast("double")), 6).cast(
        "decimal(12,6)"
    )
    lf = F.round(F.log(F.col("freq").cast("double")), 6).cast(
        "decimal(12,6)"
    )
    # the exact DECIMAL moment sums cast to double BEFORE the cross
    # products: a decimal n*sxy at scale 12 exceeds precision 38 and
    # Spark silently rounds mid-expression where DuckDB stays exact —
    # double-from-the-start keeps the operation sequence (and thus
    # every rounding) engine-identical
    m = rk.select(lr.alias("lr"), lf.alias("lf")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("lr").cast("double").alias("sx"),
        F.sum("lf").cast("double").alias("sy"),
        F.sum(F.col("lr") * F.col("lr")).cast("double").alias("sxx"),
        F.sum(F.col("lr") * F.col("lf")).cast("double").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num / den
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n").cast(
        "double"
    )
    return m.select(
        F.col("n").alias("n_terms"),
        slope.alias("zipf_slope"),
        intercept.alias("intercept"),
    )

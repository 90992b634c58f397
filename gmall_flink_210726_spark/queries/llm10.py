r"""LLM-data-pipeline queries, wave 10: KMV bottom-k distinct sketch
and prefix-filtered set-similarity join.

Oracle notes:
- KMV: md5 hex is fixed-width lowercase, so DuckDB's lexicographic
  ROW_NUMBER order over hashes IS the numeric bottom-k order; only the
  single k-th hash is converted to a number, with the identical
  hex-prefix/2^48 double arithmetic on both engines.
- Prefix filtering is LOSSLESS for the Jaccard threshold (Bayardo et
  al. 2007 prefix-filter principle), so the oracle is the plain exact
  Jaccard pair query — same semantics, radically different physical
  plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_210726_spark.queries.llm import _JACCARD_PAIRS
from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "sketch_kmv_distinct",
    oracle="""
    WITH cols AS (
      SELECT 'events.user_id' AS col_name, CAST(user_id AS VARCHAR) AS v
      FROM events WHERE user_id IS NOT NULL
      UNION ALL
      SELECT 'orders.o_custkey', CAST(o_custkey AS VARCHAR)
      FROM orders WHERE o_custkey IS NOT NULL
      UNION ALL
      SELECT 'lineitem.l_partkey', CAST(l_partkey AS VARCHAR)
      FROM lineitem WHERE l_partkey IS NOT NULL
    ),
    d AS (SELECT DISTINCT col_name, md5(v) AS h FROM cols),
    ex AS (SELECT col_name, CAST(COUNT(*) AS BIGINT) AS exact_distinct
           FROM d GROUP BY 1),
    rk AS (SELECT col_name, h,
                  ROW_NUMBER() OVER (PARTITION BY col_name ORDER BY h) AS r
           FROM d),
    kth AS (SELECT col_name,
                   CAST(('0x' || substring(h, 1, 12)) AS BIGINT)
                     / 281474976710656.0 AS frac
            FROM rk WHERE r = 256)
    SELECT ex.col_name, ex.exact_distinct,
           COALESCE(round(255.0 / kth.frac, 4),
                    CAST(ex.exact_distinct AS DOUBLE)) AS kmv_estimate
    FROM ex LEFT JOIN kth USING (col_name)
    """,
    doc="KMV / bottom-k distinct-count sketch (Bar-Yossef et al. 2002; "
    "the theta-sketch base) calibrated against the exact count, for "
    "three profiling columns at once. The Spark side never ranks the "
    "full distinct-hash set: an approx_count_distinct pre-pass sets a "
    "per-group hash cutoff so only ~8k candidate minima reach the rank "
    "window (operators/sketch.py:kmv_distinct) — the oracle ranks "
    "everything (fine at oracle scale) and reads the same k-th hash, "
    "because the cutoff only PRUNES above the k-th value, never "
    "changes it. Groups with <k distinct values fall back to exact.",
    tags=("llm", "sketch"),
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.sketch import kmv_distinct

    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    tagged = (
        events.select(
            F.lit("events.user_id").alias("col_name"),
            F.col("user_id").cast("string").alias("v"),
        )
        .unionAll(
            orders.select(
                F.lit("orders.o_custkey").alias("col_name"),
                F.col("o_custkey").cast("string").alias("v"),
            )
        )
        .unionAll(
            lineitem.select(
                F.lit("lineitem.l_partkey").alias("col_name"),
                F.col("l_partkey").cast("string").alias("v"),
            )
        )
    )
    return kmv_distinct(tagged, k=256)


@register(
    "dedup_prefix_filter_pairs",
    oracle=f"""
    SELECT id_a, id_b, jaccard FROM ({_JACCARD_PAIRS}) j
    WHERE jaccard >= 0.6
    """,
    doc="Exact word-3-gram Jaccard pairs at J >= 0.6 via All-Pairs/"
    "PPJoin PREFIX FILTERING (Bayardo et al. WWW'07; Xiao et al. "
    "WWW'08): under the rarest-token-first global order, only the "
    "first (n - ceil(t*n) + 1) shingles of each doc are indexed and "
    "self-joined — lossless for the threshold, and the high-df hot "
    "shingles that dominate co-occurrence fan-out are exactly the ones "
    "pruned from prefixes, so the skew cap falls out of the algorithm "
    "instead of a max_df heuristic. Candidates are exact-verified by "
    "the shared hash-based pass (operators/dedup.py:"
    "exact_jaccard_verify). The oracle is the plain exact-Jaccard "
    "pair query: identical output, no prefix mechanics to mirror.",
    tags=("llm", "dedup"),
)
def dedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.dedup import prefix_filter_pairs

    docs = load_table(spark, sf_dir, "documents")
    return prefix_filter_pairs(docs, t_num=3, t_den=5)


@register(
    "multimodal_wav_ulaw",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      (24 + doc_id % 40) * (1 + doc_id % 2) AS n,
                      doc_id % 13 = 0 AS corrupt
               FROM documents),
    v AS (SELECT media_id, corrupt,
            [255 - ((media_id * 29 + 11 * k) % 256)
             for k in range(0, n)] AS us
          FROM m),
    w AS (SELECT media_id, corrupt,
            [CASE WHEN u >= 128
                  THEN 132 - (((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)))
                  ELSE (((u % 16) * 8 + 132) * (1 << ((u // 16) % 8))) - 132
             END for u in us] AS vals
          FROM v)
    SELECT media_id,
      CASE WHEN corrupt THEN 'unknown' ELSE 'ulaw' END AS format,
      CAST(CASE WHEN corrupt THEN 0 ELSE len(vals) END AS BIGINT)
        AS n_samples,
      CAST(CASE WHEN corrupt THEN 0
           ELSE list_sum([abs(x) for x in vals]) END AS BIGINT) AS abs_sum,
      CAST(CASE WHEN corrupt THEN 0
           ELSE list_sum([x * x for x in vals]) END AS BIGINT) AS energy,
      CAST(CASE WHEN corrupt THEN 0
           ELSE list_max([abs(x) for x in vals]) END AS BIGINT) AS max_abs
    FROM w
    """,
    doc="G.711 mu-law WAV decode (ITU-T G.711 expansion: u = ~byte, "
    "t = ((mantissa<<3)+132)<<segment, sample = sign ? 132-t : t-132) "
    "+ amplitude stats — the telephony-audio decode leg (call-center/"
    "voicemail corpora arrive companded, peak magnitude 32124, NOT "
    "linear PCM). The fixture writes real RIFF files with fmt tag 7 "
    "and an LCG byte stream; the oracle expands every sample blind "
    "through the same integer formula, so a decoder that forgets the "
    "complement, mis-splits segment/mantissa bits, or assumes PCM "
    "rails mismatches. Every 13th id is truncated mid-header and must "
    "degrade to 'unknown'. operators/audio.py:audio_ulaw_stats",
    tags=("llm", "multimodal"),
)
def multimodal_wav_ulaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.audio import (
        audio_ulaw_stats,
        synthesize_wav_ulaw,
    )

    media = synthesize_wav_ulaw(load_table(spark, sf_dir, "documents"))
    return audio_ulaw_stats(media)


@register(
    "multimodal_bmp_rle",
    oracle="""
    WITH m AS (SELECT doc_id AS i, 16 + doc_id % 9 AS w, 4 + doc_id % 5 AS h,
                      doc_id % 3 AS stripe, doc_id % 11 = 0 AS corrupt
               FROM documents),
    yfs AS (
      SELECT i, w, h, stripe, UNNEST(range(0, h)) AS yf
      FROM m WHERE NOT corrupt
    ),
    rows AS (
      SELECT i, w, h, stripe, yf,
             3 + (i + yf) % 5 AS a,
             (i * 7 + yf) % 256 AS v1,
             (i * 11 + 3 * yf) % 256 AS v2,
             4 + yf % 3 AS ln
      FROM yfs
    ),
    wg AS (
      SELECT *,
        ((3*v1 + 3*i) % 256) + 2*((5*v1 + 2*i) % 256)
          + 3*((7*v1 + i) % 256) AS w1,
        ((3*v2 + 3*i) % 256) + 2*((5*v2 + 2*i) % 256)
          + 3*((7*v2 + i) % 256) AS w2,
        ((3*i) % 256) + 2*((2*i) % 256) + 3*(i % 256) AS w0,
        CASE WHEN stripe = 1
             THEN list_sum([(i*5 + yf + 3*j) % 256 for j in range(0, ln)])
             ELSE 0 END AS absum,
        CASE WHEN stripe = 1
             THEN list_sum([
                    ((3*((i*5 + yf + 3*j) % 256) + 3*i) % 256)
                    + 2*((5*((i*5 + yf + 3*j) % 256) + 2*i) % 256)
                    + 3*((7*((i*5 + yf + 3*j) % 256) + i) % 256)
                  for j in range(0, ln)])
             ELSE 0 END AS abw
      FROM rows
    ),
    agg AS (
      SELECT i,
        CAST(SUM(CASE stripe
          WHEN 0 THEN a*v1 + (w - a)*v2
          WHEN 1 THEN a*v1 + absum + (w - a - ln)*v2
          ELSE a*v1 + (w - a - 2)*v2 END) AS BIGINT) AS idx_sum,
        CAST(SUM((h - yf) * CASE stripe
          WHEN 0 THEN a*w1 + (w - a)*w2
          WHEN 1 THEN a*w1 + abw + (w - a - ln)*w2
          ELSE a*w1 + 2*w0 + (w - a - 2)*w2 END) AS BIGINT) AS weighted_sum
      FROM wg GROUP BY 1
    )
    SELECT m.i AS media_id,
      CASE WHEN m.corrupt THEN 'unknown' ELSE 'bmp' END AS format,
      CAST(CASE WHEN m.corrupt THEN 0 ELSE m.w END AS BIGINT) AS width,
      CAST(CASE WHEN m.corrupt THEN 0 ELSE m.h END AS BIGINT) AS height,
      CAST(COALESCE(agg.idx_sum, 0) AS BIGINT) AS idx_sum,
      CAST(COALESCE(agg.weighted_sum, 0) AS BIGINT) AS weighted_sum
    FROM m LEFT JOIN agg ON agg.i = m.i
    """,
    doc="REAL Windows-BMP BI_RLE8 decode: BITMAPFILEHEADER/"
    "BITMAPINFOHEADER walk, 256-entry BGRX palette read, and the full "
    "RLE8 escape grammar — encoded runs, ABSOLUTE mode (16-bit "
    "word-padded), DELTA skips (zero-filled, the GDI convention), "
    "end-of-line, end-of-bitmap. Rows are stored BOTTOM-UP; the "
    "image-row-weighted palette checksum catches a decoder that skips "
    "the vertical flip, mis-pads absolute segments, or fills deltas "
    "wrong. The fixture cycles all three grammars by id stripe; every "
    "11th id is truncated mid-palette and must degrade to 'unknown'. "
    "The oracle recomputes both checksums blind from the (id, row) "
    "LCGs. operators/bmp.py:bmp_rle_stats",
    tags=("llm", "multimodal"),
)
def multimodal_bmp_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.bmp import (
        bmp_rle_stats,
        synthesize_bmp_rle_media,
    )

    media = synthesize_bmp_rle_media(load_table(spark, sf_dir, "documents"))
    return bmp_rle_stats(media)


_PCA_T = 48  # power iterations; spectrum of random embeddings is
# nearly flat (l2/l1 ~ 0.93 on the fixture), so convergence needs ~50
_PCA_S = 1048576  # 2^20 rescale tick


def _pca_parts(T: int = _PCA_T) -> list:
    """CTE chain shared by the PCA oracles: gram -> T (matvec, maxabs,
    rescale) triples — HUGEINT arithmetic with truncating integer
    division, mirrored bit-for-bit by the Spark side's Python ints."""
    parts = [
        """lng AS (
      SELECT vec_id, unnest(range(len(embedding))) AS dim,
             unnest(embedding::DOUBLE[]) AS x
      FROM embeddings)""",
        """gr AS (
      SELECT a.dim AS i, b.dim AS j,
             round(CAST(SUM(CAST(round(a.x, 6) AS DECIMAL(10,6))
                            * CAST(round(b.x, 6) AS DECIMAL(10,6))) AS DOUBLE),
                   6) AS gram
      FROM lng a JOIN lng b USING (vec_id)
      WHERE a.dim <= b.dim GROUP BY 1, 2)""",
        "gi AS (SELECT i, j, CAST(round(gram * 1000000) AS HUGEINT) AS g FROM gr)",
        "gf AS MATERIALIZED (SELECT i, j, g FROM gi UNION ALL SELECT j, i, g FROM gi WHERE i <> j)",
        f"v0 AS (SELECT DISTINCT i, CAST({_PCA_S} AS HUGEINT) AS v FROM gf)",
    ]
    for t in range(1, T + 1):
        parts.append(
            f"w{t} AS MATERIALIZED (SELECT gf.i, SUM(gf.g * v{t-1}.v) AS v "
            f"FROM gf JOIN v{t-1} ON gf.j = v{t-1}.i GROUP BY 1)"
        )
        parts.append(f"m{t} AS MATERIALIZED (SELECT MAX(abs(v)) AS m FROM w{t})")
        parts.append(
            f"v{t} AS MATERIALIZED (SELECT i, (v * {_PCA_S}) // (SELECT m FROM m{t}) AS v "
            f"FROM w{t})"
        )
    return parts


def _pca_oracle(T: int = _PCA_T) -> str:
    return (
        "WITH "
        + ",\n    ".join(_pca_parts(T))
        + f"""
    SELECT CAST(v.i AS INTEGER) AS dim,
           round(CAST(v.v AS DOUBLE) / {_PCA_S}.0, 6) AS loading,
           round(CAST(m.m AS DOUBLE) / {_PCA_S}.0 / 1000000.0, 4) AS lambda_est
    FROM v{T} v, m{T} m"""
    )


def _pca_project_oracle(T: int = _PCA_T) -> str:
    """Projection oracle: the shared PCA chain, then every embedding
    scores against the 6-dp loadings with per-TERM decimal rounding
    (order-free exact sums — a raw double dot product would differ by
    join order between engines)."""
    parts = _pca_parts(T) + [
        f"""ld AS (SELECT i AS dim,
               round(CAST(v AS DOUBLE) / {_PCA_S}.0, 6) AS loading
        FROM v{T})""",
        """lab AS (SELECT vec_id, label FROM embeddings)""",
        """sc AS (SELECT lng.vec_id,
               SUM(CAST(round(round(lng.x, 6) * ld.loading, 9)
                        AS DECIMAL(18,9))) AS score
        FROM lng JOIN ld USING (dim) GROUP BY 1)""",
    ]
    return (
        "WITH "
        + ",\n    ".join(parts)
        + """
    SELECT lab.label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           round(CAST(SUM(sc.score) AS DOUBLE) / COUNT(*), 6) AS mean_score,
           round(CAST(MIN(sc.score) AS DOUBLE), 6) AS min_score,
           round(CAST(MAX(sc.score) AS DOUBLE), 6) AS max_score
    FROM sc JOIN lab USING (vec_id)
    GROUP BY lab.label"""
    )


@register(
    "emb_pca_power",
    oracle=_pca_oracle(),
    doc="Leading principal component of the embedding corpus by POWER "
    "ITERATION on the Gram matrix — the PCA/whitening primitive. "
    "Scale shape (how Spark MLlib's own PCA works): the ONLY "
    "distributed pass is the d x d Gram reduction "
    "(operators/linalg.py:gram_matrix — map-side outer-product "
    "partials, constant-size shuffle regardless of corpus rows); the "
    "4096-entry matrix is a bounded driver-side collect, and 48 "
    "matvec iterations run in EXACT integer arithmetic (gram in 1e-6 "
    "ticks, iterate rescaled to 2^20 ticks by TRUNCATING integer "
    "division — Python emulates SQL's toward-zero semantics) so both "
    "engines produce bit-identical loadings with zero float-"
    "reassociation drift. 48 iterations because the fixture spectrum "
    "is nearly flat (l2/l1 ~ 0.93); the agreement test pins cosine "
    "> 0.99 against numpy eigh. Output: per-dim loading in [-1, 1] "
    "(2^20-tick normalized) + the dominant-eigenvalue estimate.",
    tags=("llm", "similarity", "linalg"),
)
def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    loadings, lam = _pca_loadings(spark, sf_dir)
    out = [(i, ld, lam) for i, ld in enumerate(loadings)]
    return spark.createDataFrame(
        out, "dim int, loading double, lambda_est double"
    )


def _r_half_up(q: float, places: str) -> float:
    # mirror SQL round() (HALF_UP on the double's exact value) —
    # Python's built-in round is half-even and can differ at ties
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(q).quantize(Decimal(places), ROUND_HALF_UP))


def _pca_loadings(spark: SparkSession, sf_dir: str) -> tuple:
    """Driver-side exact-integer power iteration over the distributed
    Gram reduction (see emb_pca_power doc). Returns (6-dp loadings,
    4-dp dominant-eigenvalue estimate) — bit-identical to the oracle's
    HUGEINT chain."""
    from gmall_flink_210726_spark.operators.linalg import gram_matrix

    emb = load_table(spark, sf_dir, "embeddings")
    rows = gram_matrix(emb).collect()  # bounded: d*(d+1)/2 entries
    G: dict = {}
    d = 0
    for r in rows:
        g = int(round(r["gram"] * 1e6))
        G[(r["dim_i"], r["dim_j"])] = g
        G[(r["dim_j"], r["dim_i"])] = g
        d = max(d, r["dim_j"] + 1)

    def matvec(v):
        return [
            sum(G.get((i, j), 0) * v[j] for j in range(d)) for i in range(d)
        ]

    def tdiv(a: int, b: int) -> int:
        # SQL integer division truncates toward zero; Python floors
        return -((-a) // b) if a < 0 else a // b

    v = [_PCA_S] * d
    m = _PCA_S
    for _ in range(_PCA_T):
        w = matvec(v)
        m = max(abs(x) for x in w)
        v = [tdiv(x * _PCA_S, m) for x in w]
    lam = _r_half_up(float(m) / float(_PCA_S) / 1e6, "1e-4")
    return (
        [_r_half_up(float(x) / float(_PCA_S), "1e-6") for x in v],
        lam,
    )


@register(
    "emb_pca_project",
    oracle=_pca_project_oracle(),
    doc="Projection of every embedding onto the learned leading "
    "principal component, aggregated per label — the USE of L117's "
    "PCA at scale: the loadings are a 64-double broadcast literal, "
    "the projection is one map-side pass (explode + 64-row broadcast "
    "join), and per-TERM 9-dp decimal rounding makes the dot product "
    "an order-free exact sum, so per-label means/extremes hash-match "
    "the oracle, which re-derives the identical loadings through the "
    "shared HUGEINT power-iteration chain. At 100 TB nothing but the "
    "Gram pass and this one scan touch the corpus.",
    tags=("llm", "similarity", "linalg"),
)
def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    loadings, _ = _pca_loadings(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    ld = spark.createDataFrame(
        list(enumerate(loadings)), "dim int, loading double"
    )
    lng = emb.select(
        "vec_id",
        "label",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("dim", "x"),
    )
    term = F.round(F.round("x", 6) * F.col("loading"), 9).cast(
        "decimal(18,9)"
    )
    sc = (
        lng.join(F.broadcast(ld), "dim")
        .groupBy("vec_id", "label")
        .agg(F.sum(term).alias("score"))
    )
    return sc.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.round(
            F.sum("score").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_score"),
        F.round(F.min("score").cast("double"), 6).alias("min_score"),
        F.round(F.max("score").cast("double"), 6).alias("max_score"),
    )


@register(
    "sketch_kmv_overlap",
    oracle="""
    WITH dv AS (SELECT DISTINCT o_orderpriority AS g,
                       md5(CAST(o_custkey AS VARCHAR)) AS h
                FROM orders WHERE o_custkey IS NOT NULL),
    bk AS (SELECT g, h FROM (
             SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS r
             FROM dv) z WHERE r <= 64),
    gs AS (SELECT DISTINCT g FROM dv),
    pr AS (SELECT x.g AS g_a, y.g AS g_b FROM gs x JOIN gs y ON x.g < y.g),
    u AS (SELECT DISTINCT g_a, g_b, h FROM (
            SELECT pr.g_a, pr.g_b, bk.h FROM pr JOIN bk ON bk.g = pr.g_a
            UNION ALL
            SELECT pr.g_a, pr.g_b, bk.h FROM pr JOIN bk ON bk.g = pr.g_b) z),
    uk AS (SELECT g_a, g_b, h,
                  ROW_NUMBER() OVER (PARTITION BY g_a, g_b ORDER BY h) AS r
           FROM u QUALIFY r <= 64),
    st AS (SELECT uk.g_a, uk.g_b,
              CAST(MAX(uk.r) AS BIGINT) AS union_k,
              MAX(CASE WHEN uk.r = 64 THEN uk.h END) AS kth,
              CAST(SUM(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS cnt_ab
           FROM uk
           LEFT JOIN bk a ON a.g = uk.g_a AND a.h = uk.h
           LEFT JOIN bk b ON b.g = uk.g_b AND b.h = uk.h
           GROUP BY 1, 2),
    ex AS (SELECT a.g AS g_a, b.g AS g_b, CAST(COUNT(*) AS BIGINT) AS ei
           FROM dv a JOIN dv b ON a.h = b.h AND a.g < b.g GROUP BY 1, 2)
    SELECT st.g_a, st.g_b,
           CAST(COALESCE(ex.ei, 0) AS BIGINT) AS exact_inter,
           st.union_k,
           round((CAST(cnt_ab AS DOUBLE) / union_k) *
                 CASE WHEN union_k < 64 THEN CAST(union_k AS DOUBLE)
                      ELSE 63.0 / (CAST(('0x' || substring(kth, 1, 12))
                                         AS BIGINT) / 281474976710656.0)
                 END, 4) AS kmv_inter_est
    FROM st LEFT JOIN ex USING (g_a, g_b)
    """,
    doc="KMV set-INTERSECTION estimation between customer sets of every "
    "order-priority pair (Beyer et al. SIGMOD'07, the theta-sketch set "
    "operation), calibrated against the exact intersection. The load-"
    "bearing identity: bottomk(A UNION B) is contained in bottomk(A) "
    "UNION bottomk(B), and within it full-set membership equals "
    "bottom-k membership — so after the cutoff-gated per-group "
    "bottom-k pass, every pairwise estimate runs on <=2k-row frames "
    "(operators/sketch.py:kmv_overlap); nothing corpus-sized is "
    "ranked, shuffled, or broadcast. Exact side is one 8-byte hash "
    "equi-join, present only as the calibration column.",
    tags=("llm", "sketch"),
)
def sketch_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.sketch import kmv_overlap

    orders = load_table(spark, sf_dir, "orders")
    tagged = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_custkey").cast("string").alias("v"),
    )
    return kmv_overlap(tagged, group_col="grp", value_col="v", k=64)


def _adpcm_oracle(max_steps: int = 62) -> str:
    """Generate the unrolled IMA-ADPCM oracle: one materialized CTE per
    decode STEP (all files advance one nibble; finished files pass
    state through), because the codec's per-sample adaptive state is a
    serial recurrence no set-oriented SQL aggregate expresses — the
    same chained-CTE discipline as the PCA oracle. 62 steps covers the
    fixture's max 2*(20+11) nibbles. DuckDB v1.0.0's list_reduce was
    tried first and mis-evaluates repeated subexpressions across
    struct-accumulator fields, so the unroll is also the SAFE form."""
    from gmall_flink_210726_spark.operators.audio import IMA_STEP

    parts = [
        "stp AS (SELECT unnest(range(89)) AS si, unnest(["
        + ",".join(str(s) for s in IMA_STEP)
        + "]) AS sv)",
        """s0 AS MATERIALIZED (
      SELECT doc_id AS media_id, 20 + doc_id % 12 AS nb,
             doc_id % 17 = 0 AS corrupt,
             CAST(((doc_id*37) % 4096) - 2048 AS BIGINT) AS pred,
             CAST((doc_id*5) % 89 AS BIGINT) AS idx,
             CAST(abs(((doc_id*37) % 4096) - 2048) AS BIGINT) AS sab,
             CAST((((doc_id*37) % 4096) - 2048)
                  * (((doc_id*37) % 4096) - 2048) AS BIGINT) AS ssq
      FROM documents)""",
    ]
    for t in range(1, max_steps + 1):
        parts.append(f"""s{t} AS MATERIALIZED (
      SELECT media_id, nb, corrupt, predn AS pred, idxn AS idx,
             sab + CASE WHEN act THEN abs(predn) ELSE 0 END AS sab,
             ssq + CASE WHEN act THEN predn * predn ELSE 0 END AS ssq
      FROM (
        SELECT media_id, nb, corrupt, act,
          CASE WHEN act THEN LEAST(GREATEST(pred + sgn * (sv // 8
               + CASE WHEN mag >= 4 THEN sv ELSE 0 END
               + CASE WHEN mag % 4 >= 2 THEN sv // 2 ELSE 0 END
               + CASE WHEN mag % 2 = 1 THEN sv // 4 ELSE 0 END),
               -32768), 32767) ELSE pred END AS predn,
          CASE WHEN act THEN LEAST(GREATEST(idx
               + CASE WHEN mag < 4 THEN -1 ELSE (mag - 3) * 2 END, 0), 88)
               ELSE idx END AS idxn,
          sab, ssq
        FROM (
          SELECT z.*, stp.sv,
                 ({t} <= 2 * z.nb) AS act,
                 ((z.media_id * 13 + 7 * ({t} - 1)) % 16) % 8 AS mag,
                 CASE WHEN ((z.media_id * 13 + 7 * ({t} - 1)) % 16) // 8 = 1
                      THEN -1 ELSE 1 END AS sgn
          FROM s{t-1} z JOIN stp ON stp.si = z.idx) y) x)""")
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT media_id,
      CASE WHEN corrupt THEN 'unknown' ELSE 'adpcm' END AS format,
      CAST(CASE WHEN corrupt THEN 0 ELSE 1 + 2*nb END AS BIGINT) AS n_samples,
      CAST(CASE WHEN corrupt THEN 0 ELSE sab END AS BIGINT) AS abs_sum,
      CAST(CASE WHEN corrupt THEN 0 ELSE ssq END AS BIGINT) AS energy,
      CAST(CASE WHEN corrupt THEN 0 ELSE pred END AS BIGINT) AS final_pred,
      CAST(CASE WHEN corrupt THEN 0 ELSE idx END AS BIGINT) AS final_idx
    FROM s{max_steps}"""
    )


@register(
    "multimodal_wav_adpcm",
    oracle=_adpcm_oracle(),
    doc="IMA ADPCM WAV decode (WAVE_FORMAT_IMA_ADPCM tag 0x11) — the "
    "PREDICTIVE-codec leg of the decode surface: 4-bit nibbles drive a "
    "per-sample adaptive predictor + step-index recurrence (the IMA "
    "1992 bit-serial difference, clamped int16), so any nibble-order, "
    "clamp, or step-table error COMPOUNDS through the file; the "
    "final_pred/final_idx columns pin the end state exactly. The "
    "fixture writes real single-block mono files from LCG formulas; "
    "every 17th id truncates mid-header -> 'unknown'. The oracle "
    "replays the full adaptive decode blind as 62 unrolled per-step "
    "CTEs (serial state is inexpressible as one SQL aggregate). "
    "operators/audio.py:audio_adpcm_stats",
    tags=("llm", "multimodal"),
)
def multimodal_wav_adpcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.audio import (
        audio_adpcm_stats,
        synthesize_wav_adpcm,
    )

    media = synthesize_wav_adpcm(load_table(spark, sf_dir, "documents"))
    return audio_adpcm_stats(media)

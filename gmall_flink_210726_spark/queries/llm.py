"""LLM-data-pipeline queries (dedup / similarity / text analysis /
multimodal) over the driver's documents + embeddings tables.

Oracle notes:
- All text ops are pure integer/fixed-order-double arithmetic, so the
  DuckDB SQL reproduces them exactly.
- Cosine values are rounded to 6 decimals on both sides before compare/
  rank (operators/similarity.py rationale).
- MinHash+LSH carries the exact-Jaccard oracle: candidates are
  exact-verified, and at these thresholds the fixture's near-dup pairs
  (J ≥ 0.9, verified bimodal — nothing in [0.1, 0.9)) are caught by
  8×4 banding with probability ≈ 1-3e-4 per pair; the parity test
  pins the actual behavior on the driver's own data.
- SimHash signatures use md5-derived token hashes precisely so the
  oracle can recompute the identical int64 in DuckDB (md5 is portable;
  crc32 is not) — full rows+schema+hash check, no rows-only fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_210726_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from gmall_flink_210726_spark.operators.multimodal import (
    decode_media,
    decode_media_headers,
    frame_sample_audio,
    image_channel_stats,
    media_from_documents,
    resize_images,
    synthesize_media,
)
from gmall_flink_210726_spark.operators.similarity import knn_bruteforce
from gmall_flink_210726_spark.operators.text import (
    fingerprint,
    lang_id,
    quality_features,
    token_counts,
)
from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table

# DuckDB fragments shared by the dedup oracles
_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_SHINGLES = f"""
    SELECT doc_id,
           list_distinct(CASE WHEN len(ws) >= 3
             THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws)-1)]
             ELSE [] END) AS sh
    FROM (SELECT doc_id, list_filter(string_split({_NORM}, ' '), x -> x <> '') AS ws
          FROM documents)
"""
_JACCARD_PAIRS = f"""
    WITH g AS ({_SHINGLES})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
    FROM g a JOIN g b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh)) > 0
"""


@register(
    "dedup_exact",
    oracle=f"""
    SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
    FROM documents
    GROUP BY {_NORM}
    """,
    doc="Exact dedup by content digest: keep min doc_id per normalized "
    "text; shuffle carries sha2 digests, not bodies",
    tags=("llm", "dedup", "bench"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_ngram_jaccard",
    oracle=f"{_JACCARD_PAIRS} AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5",
    doc="Exact word-3-gram Jaccard near-dup pairs (J ≥ 0.5) via shingle "
    "co-occurrence join — no O(n²) cross product. Registered WITH the "
    "max_df=100 hot-shingle cap, the mandatory skew guard at scale: a "
    "shingle shared by k docs fans the join out k² rows, so df-capped "
    "shingles bound the worst case at 100²; the fixtures' max shingle "
    "df is 7 (sf0.01) / 25 (sf0.1), so the cap drops nothing and the "
    "uncapped oracle stays exact (test_llm_ops pins the fan-out bound)",
    tags=("llm", "dedup", "bench"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.5, max_df=100
    )


@register(
    "dedup_minhash_lsh",
    oracle=f"{_JACCARD_PAIRS} AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5",
    doc="MinHash(32)+LSH(16×2) candidate generation, exact-Jaccard "
    "verified (J ≥ 0.5); the scale path — signatures are 32 ints/doc, "
    "one banded equi-join shuffle. r=2 rows/band is chosen FOR the "
    "J ≥ 0.5 threshold: candidate recall 1-(1-J²)¹⁶ ≥ 0.99 at J=0.5 "
    "(r=4 would drop that to 0.64) and half the signature compute of "
    "k=64; exact verify then removes every false positive",
    tags=("llm", "dedup", "bench"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), k=32, bands=16, threshold=0.5
    ).select("id_a", "id_b", "jaccard")


# SimHash oracle: recompute the IDENTICAL 64-bit signature in DuckDB —
# md5 is portable, so token hash halves (hex chars 1-8 / 9-16), per-bit
# majority votes, and the packed int64 (bit 63 via two's complement)
# all reproduce exactly; pairs then come from popcount(xor) ≤ 3.
_SIMHASH_SIG = f"""
    WITH g AS (SELECT doc_id,
                      list_filter(string_split({_NORM}, ' '), x -> x <> '') AS ws
               FROM documents),
    toks AS (SELECT doc_id, unnest(ws) AS w FROM g),
    h AS (SELECT doc_id,
                 CAST(('0x' || substring(md5(w), 1, 8)) AS BIGINT) AS lo,
                 CAST(('0x' || substring(md5(w), 9, 8)) AS BIGINT) AS hi
          FROM toks),
    votes AS (SELECT doc_id, b,
                     SUM(CASE WHEN ((CASE WHEN b < 32 THEN lo ELSE hi END)
                                    >> (b % 32)) & 1 = 1
                         THEN 1 ELSE -1 END) AS vote
              FROM h CROSS JOIN range(64) t(b) GROUP BY doc_id, b),
    packed AS (SELECT doc_id,
                      CAST(SUM(CASE WHEN vote > 0 THEN
                             CASE WHEN b = 63 THEN -9223372036854775808
                                  ELSE (CAST(1 AS BIGINT) << b) END
                           ELSE 0 END) AS BIGINT) AS simhash
               FROM votes GROUP BY doc_id),
    sig AS (SELECT d.doc_id, COALESCE(p.simhash, 0) AS simhash
            FROM documents d LEFT JOIN packed p USING (doc_id))
"""


@register(
    "dedup_simhash",
    oracle=f"""
    {_SIMHASH_SIG}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    doc="SimHash64 near-dup pairs (hamming ≤ 3) via single-shuffle "
    "4-band pigeonhole join (posexplode banding); md5-based token "
    "hashes make the signature DuckDB-reproducible, so the oracle "
    "recomputes the exact int64 and the exact pairs",
    tags=("llm", "dedup"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_near_pairs(load_table(spark, sf_dir, "documents"))


@register(
    "ann_cosine_topk",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.qv, e.v), 6) AS cos
      FROM e, q WHERE e.vec_id <> q.query_id)
    SELECT query_id, neighbor_id, cos, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
    doc="Brute-force cosine top-5 for query vectors vec_id<10: broadcast "
    "queries over one corpus scan, JVM zip_with/aggregate dot product, "
    "deterministic (round-6, id tiebreak) ranking",
    tags=("llm", "similarity", "bench"),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_bruteforce(emb, query_ids=list(range(10)), k=5)


@register(
    "ann_cosine_topk_blocked",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.qv, e.v), 6) AS cos
      FROM e, q WHERE e.vec_id <> q.query_id)
    SELECT query_id, neighbor_id, cos, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
    doc="Brute-force cosine top-5, numpy-blocked mapInPandas: one "
    "(batch × Q) matmul per Arrow batch, local top-k per partition, "
    "global re-rank — the 100 TB shape of the exact baseline; same "
    "oracle as the JVM-fold variant (round-6 contract)",
    tags=("llm", "similarity", "bench"),
)
def ann_cosine_topk_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.similarity import knn_bruteforce_blocked

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_bruteforce_blocked(emb, query_ids=list(range(10)), k=5)


@register(
    "ann_threshold_pairs",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cos
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4
    """,
    doc="Embedding near-dup pairs, cosine ≥ 0.4, EXACT via the blocked "
    "matmul plan: rows replicated to B block-pairs, one numpy matmul "
    "per applyInPandas task — no BroadcastNestedLoopJoin anywhere "
    "(test_plans pins this). The naive quadratic self-join survives "
    "only as a unit-test cross-check (test_llm_ops)",
    tags=("llm", "similarity", "bench"),
)
def ann_threshold_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.similarity import (
        cosine_threshold_pairs_blocked,
    )

    return cosine_threshold_pairs_blocked(
        load_table(spark, sf_dir, "embeddings"), threshold=0.4
    )


@register(
    "ann_lsh_topk",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.qv, e.v), 6) AS cos
      FROM e, q WHERE e.vec_id <> q.query_id)
    SELECT query_id, neighbor_id, cos, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
    doc="LSH-bucketed ANN top-5 (48 tables × 4 hyperplanes, seed 11): "
    "exact cosine only among bucket-collision candidates. The fixed "
    "seed makes buckets deterministic, and at 48 tables the output is "
    "measured IDENTICAL to exact KNN on the sf0.01 and sf0.1 fixtures "
    "(per-pair miss prob ~1e-5 at the neighbors' cosine band), so the "
    "exact-KNN SQL is a valid oracle here; recall<1 in general is "
    "pinned by the unit-test recall floor on adversarial data",
    tags=("llm", "similarity"),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ann_lsh_topk(emb, query_ids=list(range(10)), k=5, n_tables=48)


@register(
    "ann_ivf_topk",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.qv, e.v), 6) AS cos
      FROM e, q WHERE e.vec_id <> q.query_id)
    SELECT query_id, neighbor_id, cos, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
    doc="IVF-flat ANN top-5 (16 cells, nprobe 12, deterministic "
    "driver-side spherical k-means training): exact cosine only among "
    "probed cells' members via a broadcast (query, cell) equi-join — "
    "corpus scans twice (assign, score) and never shuffles. nprobe=12 "
    "is measured-exact on every fixture (the isotropic bench embeddings "
    "put true neighbors at cos~0.3, where pruning is impossible for any "
    "index; clustered data needs nprobe<<n_cells, pinned by unit test), "
    "so the exact-KNN SQL is a valid oracle",
    tags=("llm", "similarity"),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ann_ivf_topk(
        emb, query_ids=list(range(10)), k=5, n_cells=16, nprobe=12
    )


@register(
    "text_token_counts",
    oracle=r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
    doc="Token counting: whitespace words + BPE-ish pre-tokenizer regex "
    "pieces, all JVM-side regex",
    tags=("llm", "text"),
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return token_counts(docs).select("doc_id", "n_ws_tokens", "n_bpe_tokens")


@register(
    "text_quality_scores",
    oracle=r"""
    WITH f AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_words,
             CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS n_punct,
             CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                  x -> x IN ('the','a','an','of','and','or','to','in','is','it'))) AS BIGINT) AS n_stop
      FROM documents)
    SELECT doc_id,
           n_chars AS q_chars,
           n_words AS q_words,
           round(CASE WHEN n_words > 0 THEN CAST(n_chars AS DOUBLE)/n_words ELSE 0.0 END, 6) AS q_avg_word_len,
           round(CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE)/n_chars ELSE 0.0 END, 6) AS q_punct_ratio,
           round(CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE)/n_words ELSE 0.0 END, 6) AS q_stop_ratio,
           round(greatest(0.0, least(1.0,
             0.5 + 0.5 * (CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE)/n_words ELSE 0.0 END)
                 - 2.0 * (CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE)/n_chars ELSE 0.0 END)
                 - (CASE WHEN (CASE WHEN n_words > 0 THEN CAST(n_chars AS DOUBLE)/n_words ELSE 0.0 END) < 2
                          OR (CASE WHEN n_words > 0 THEN CAST(n_chars AS DOUBLE)/n_words ELSE 0.0 END) > 12
                         THEN 0.25 ELSE 0.0 END))), 6) AS q_score
    FROM f
    """,
    doc="Quality scoring: length/word/punctuation/stopword features + "
    "composite score, fixed-order double arithmetic",
    tags=("llm", "text", "bench"),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return quality_features(docs).select(
        "doc_id", "q_chars", "q_words", "q_avg_word_len",
        "q_punct_ratio", "q_stop_ratio", "q_score",
    )


@register(
    "text_lang_id",
    oracle=r"""
    WITH s AS (
      SELECT doc_id,
             CAST(len(list_filter(ws, x -> x IN ('the','and','of','is'))) AS BIGINT) AS score_en,
             CAST(len(list_filter(ws, x -> x IN ('der','und','das','ist'))) AS BIGINT) AS score_de,
             CAST(len(list_filter(ws, x -> x IN ('el','los','que','es'))) AS BIGINT) AS score_es,
             CAST(len(list_filter(ws, x -> x IN ('le','les','des','est'))) AS BIGINT) AS score_fr
      FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws
            FROM documents))
    SELECT doc_id, score_en, score_de, score_es, score_fr,
           CASE WHEN greatest(score_en, score_de, score_es, score_fr) <= 0 THEN 'und'
                WHEN score_en = greatest(score_en, score_de, score_es, score_fr) THEN 'en'
                WHEN score_de = greatest(score_en, score_de, score_es, score_fr) THEN 'de'
                WHEN score_es = greatest(score_en, score_de, score_es, score_fr) THEN 'es'
                ELSE 'fr' END AS pred_lang
    FROM s
    """,
    doc="Language ID: marker-word scoring, argmax with fixed tie order "
    "(deterministic classifier shape; n-gram-profile upgrade slots in "
    "behind the same columns)",
    tags=("llm", "text"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return lang_id(docs).select(
        "doc_id", "score_en", "score_de", "score_es", "score_fr", "pred_lang"
    )


@register(
    "text_gopher_filter",
    oracle=r"""
    WITH f AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws,
             CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT) AS n_sym,
             string_split(text, chr(10)) AS lines
      FROM documents),
    m AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             CAST(COALESCE(list_sum(list_transform(ws, x -> length(x))), 0) AS BIGINT) AS sum_len,
             n_sym,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(list_filter(lines, x -> regexp_matches(x, '\.\.\.$'))) AS BIGINT) AS n_ell,
             CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
             CAST(len(list_filter(ws, x -> x IN ('the','a','an','of','and','or','to','in','is','it'))) AS BIGINT) AS n_stop
      FROM f),
    r AS (
      SELECT doc_id,
             n_words AS g_words,
             round(CASE WHEN n_words > 0 THEN CAST(sum_len AS DOUBLE)/n_words ELSE 0.0 END, 6) AS g_mean_word_len,
             round(CASE WHEN n_words > 0 THEN CAST(n_sym AS DOUBLE)/n_words ELSE 0.0 END, 6) AS g_symbol_ratio,
             round(CASE WHEN n_lines > 0 THEN CAST(n_ell AS DOUBLE)/n_lines ELSE 0.0 END, 6) AS g_ellipsis_line_frac,
             round(CASE WHEN n_words > 0 THEN CAST(n_alpha AS DOUBLE)/n_words ELSE 0.0 END, 6) AS g_alpha_word_frac,
             n_stop AS g_stopword_hits,
             (n_words >= 50 AND n_words <= 100000) AS r_word_count,
             (CASE WHEN n_words > 0 THEN CAST(sum_len AS DOUBLE)/n_words ELSE 0.0 END BETWEEN 3.0 AND 10.0) AS r_mean_word_len,
             ((CASE WHEN n_words > 0 THEN CAST(n_sym AS DOUBLE)/n_words ELSE 0.0 END) <= 0.1) AS r_symbol_ratio,
             ((CASE WHEN n_lines > 0 THEN CAST(n_ell AS DOUBLE)/n_lines ELSE 0.0 END) <= 0.3) AS r_ellipsis_lines,
             ((CASE WHEN n_words > 0 THEN CAST(n_alpha AS DOUBLE)/n_words ELSE 0.0 END) >= 0.8) AS r_alpha_words,
             (n_stop >= 2) AS r_stopwords
      FROM m)
    SELECT *,
           (r_word_count AND r_mean_word_len AND r_symbol_ratio
            AND r_ellipsis_lines AND r_alpha_words AND r_stopwords) AS kept
    FROM r
    """,
    doc="Gopher-rules document quality filter (Rae et al. 2021 §A1.1 "
    "public thresholds): word count, mean word length, symbol ratio, "
    "ellipsis lines, alpha-word fraction, stopword hits — per-doc rule "
    "flags + composite kept verdict, one fused scan (every predicate "
    "in whole-stage codegen; reject-reason analytics is a groupBy on "
    "the flags)",
    tags=("llm", "text", "bench"),
)
def text_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.text import gopher_quality_filter

    docs = load_table(spark, sf_dir, "documents")
    return gopher_quality_filter(docs).select(
        "doc_id", "g_words", "g_mean_word_len", "g_symbol_ratio",
        "g_ellipsis_line_frac", "g_alpha_word_frac", "g_stopword_hits",
        "r_word_count", "r_mean_word_len", "r_symbol_ratio",
        "r_ellipsis_lines", "r_alpha_words", "r_stopwords", "kept",
    )


@register(
    "text_repetition_filter",
    oracle=r"""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws,
             string_split(text, chr(10)) AS lines
      FROM documents),
    head AS (
      SELECT doc_id,
             round(CASE WHEN len(lines) > 0
                   THEN 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE)/len(lines)
                   ELSE 0.0 END, 6) AS dup_line_frac
      FROM base),
    uni AS (
      SELECT doc_id, CAST(max(ct) AS DOUBLE)/sum(ct) AS tws FROM (
        SELECT doc_id, w, count(*) AS ct
        FROM (SELECT doc_id, unnest(ws) AS w FROM base) GROUP BY 1, 2)
      GROUP BY 1),
    bi AS (
      SELECT doc_id, CAST(max(ct) AS DOUBLE)/sum(ct) AS tbs FROM (
        SELECT doc_id, b, count(*) AS ct
        FROM (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1]
                                     for i in range(1, len(ws))]) AS b
              FROM base)
        GROUP BY 1, 2)
      GROUP BY 1),
    r AS (
      SELECT h.doc_id, h.dup_line_frac,
             round(COALESCE(u.tws, 0.0), 6) AS top_word_share,
             round(COALESCE(b.tbs, 0.0), 6) AS top_bigram_share
      FROM head h LEFT JOIN uni u USING (doc_id) LEFT JOIN bi b USING (doc_id))
    SELECT *,
           (dup_line_frac <= 0.3) AS r_dup_lines,
           (top_word_share <= 0.2) AS r_top_word,
           (top_bigram_share <= 0.18) AS r_top_bigram,
           (dup_line_frac <= 0.3 AND top_word_share <= 0.2
            AND top_bigram_share <= 0.18) AS rep_kept
    FROM r
    """,
    doc="Gopher-rules repetition filter (Rae et al. 2021 §A1.1): "
    "duplicate-line fraction (map-side array op) + top-unigram/-bigram "
    "shares via explode → two-level agg (partial counts combine "
    "map-side; only (doc, term) counts shuffle) — per-rule flags + "
    "composite rep_kept",
    tags=("llm", "text", "bench"),
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.text import repetition_features

    docs = load_table(spark, sf_dir, "documents")
    return repetition_features(docs)


@register(
    "text_hash_split",
    oracle="""
    SELECT doc_id,
           CAST(CAST(('0x' || substring(md5('split-v1' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 AS BIGINT) AS split_bucket,
           CASE WHEN CAST(('0x' || substring(md5('split-v1' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 80 THEN 'train'
                WHEN CAST(('0x' || substring(md5('split-v1' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    doc="Deterministic train/val/test split by salted md5 of the doc "
    "key: pure projection, no shuffle, reproducible across engines, "
    "stable under corpus growth (unlike randomSplit)",
    tags=("llm", "text"),
)
def text_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.text import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return hash_split(docs).select("doc_id", "split_bucket", "split")


@register(
    "text_fingerprint",
    oracle=r"""
    SELECT doc_id,
           CAST(COALESCE(list_sum(
             [CAST(i AS BIGINT) * (ascii(substring(ws[i], 1, 1)) * 31 + length(ws[i]))
              for i in range(1, len(ws) + 1)]), 0) AS BIGINT) AS fingerprint
    FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws
          FROM documents)
    """,
    doc="Document fingerprint: position-weighted rolling hash over words "
    "— exact integer arithmetic, order-sensitive",
    tags=("llm", "text"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(load_table(spark, sf_dir, "documents"))


@register(
    "multimodal_plumbing",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(CASE WHEN strlen(text) >= 4
                THEN ascii(substring(text,1,1))*16777216 + ascii(substring(text,2,1))*65536
                   + ascii(substring(text,3,1))*256 + ascii(substring(text,4,1))
                ELSE 0 END AS BIGINT) AS header,
           CAST(COALESCE(list_sum([ascii(substring(text, i, 1))
                for i in range(1, least(64, strlen(text)) + 1)]), 0) AS BIGINT) AS checksum
    FROM documents
    """,
    doc="Multimodal PLUMBING check (formerly multimodal_decode): binary "
    "content column → mapInPandas byte-stats decode (Arrow-batched, "
    "bounded batch size) exercising the UDF signature/batch shape the "
    "real codecs drop into; the advertised decode surface is "
    "multimodal_headers (real BMP/WAV byte parsing)",
    tags=("llm", "multimodal"),
)
def multimodal_plumbing(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    return decode_media(media)


@register(
    "multimodal_headers",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             doc_id % 2 = 0 AS is_bmp,
             4 + doc_id % 29 AS w,
             3 + doc_id % 13 AS h,
             1 + doc_id % 2 AS ch,
             8000 + (doc_id % 5) * 2000 AS sr,
             32 + doc_id % 64 AS ns
      FROM documents),
    d AS (
      SELECT *, ((w * 3 + 3) // 4) * 4 * h AS bmp_n, ns * ch * 2 AS wav_n
      FROM m)
    SELECT media_id,
           CASE WHEN is_bmp THEN 'bmp' ELSE 'wav' END AS format,
           CAST(CASE WHEN is_bmp THEN w ELSE 0 END AS BIGINT) AS width,
           CAST(CASE WHEN is_bmp THEN h ELSE 0 END AS BIGINT) AS height,
           CAST(CASE WHEN is_bmp THEN 0 ELSE ch END AS BIGINT) AS n_channels,
           CAST(CASE WHEN is_bmp THEN 0 ELSE sr END AS BIGINT) AS sample_rate,
           CAST(CASE WHEN is_bmp THEN 24 ELSE 16 END AS BIGINT) AS bits_per_sample,
           CAST(CASE WHEN is_bmp THEN bmp_n ELSE wav_n END AS BIGINT) AS data_bytes,
           CAST(CASE WHEN is_bmp THEN 54 + bmp_n ELSE 44 + wav_n END AS BIGINT) AS n_bytes,
           CAST(CASE WHEN is_bmp
                THEN list_sum([(media_id * 31 + 7 * i) % 256
                               for i in range(0, bmp_n)])
                ELSE list_sum([((media_id * 13 + 5 * j + 32768) % 65536) % 256
                             + ((media_id * 13 + 5 * j + 32768) % 65536) // 256
                               for j in range(0, ns * ch)])
                END AS BIGINT) AS payload_sum
    FROM d
    """,
    doc="REAL multimodal decode: synthesize actual BMP (24-bpp, padded "
    "rows) and 16-bit PCM WAV blobs from the documents ids, then parse "
    "the on-wire bytes back with stdlib struct (BITMAPINFOHEADER / "
    "RIFF chunk walk) in an Arrow-batched mapInPandas — header fields "
    "plus exact payload byte sums. The oracle recomputes every field "
    "from the fixture LCG formulas (operators/multimodal.py:141-145) "
    "WITHOUT seeing the bytes, so a decoder that misparses any header "
    "offset or pads rows wrong hash-mismatches",
    tags=("llm", "multimodal"),
)
def multimodal_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    return decode_media_headers(media)


@register(
    "multimodal_resize_thumb",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             4 + doc_id % 29 AS w,
             3 + doc_id % 13 AS h
      FROM documents WHERE doc_id % 2 = 0),
    d AS (SELECT *, ((w * 3 + 3) // 4) * 4 AS rowb FROM m)
    SELECT media_id,
           'bmp' AS format,
           CAST(8 AS BIGINT) AS out_w,
           CAST(8 AS BIGINT) AS out_h,
           CAST(list_sum(
             [(media_id * 31
               + 7 * ((i // 24) * h // 8 * rowb
                      + ((i // 3) % 8) * w // 8 * 3
                      + i % 3)) % 256
              for i in range(0, 192)]) AS BIGINT) AS thumb_sum
    FROM d
    """,
    doc="Multimodal resize: 8x8 nearest-neighbor BMP thumbnails from "
    "real on-wire bytes (sample source pixel (x*w//8, y*h//8), 3 "
    "bytes each) in an Arrow-batched mapInPandas. The oracle "
    "recomputes the sampled-byte sum from the fixture LCG alone — a "
    "resize that miscomputes the row stride, padding, or sampling "
    "grid hash-mismatches",
    tags=("llm", "multimodal"),
)
def multimodal_resize_thumb(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    bmps = media.filter(F.col("meta.format") == "bmp")
    return resize_images(bmps, 8, 8).drop("thumb")


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             1 + doc_id % 2 AS ch,
             32 + doc_id % 64 AS ns
      FROM documents WHERE doc_id % 2 = 1),
    d AS (SELECT *, (ns + 3) // 4 AS nf FROM m),
    v AS (
      SELECT media_id, nf,
             [((media_id * 13 + 5 * ((i // ch) * 4 * ch + i % ch))
               % 65536) - 32768
              for i in range(0, nf * ch)] AS vals
      FROM d)
    SELECT media_id,
           'wav' AS format,
           CAST(nf AS BIGINT) AS n_frames,
           CAST(list_sum(vals) AS BIGINT) AS frame_sum,
           CAST(list_sum(list_transform(vals, x -> abs(x))) AS BIGINT)
             AS frame_abs_sum
    FROM v
    """,
    doc="Multimodal frame sampling: every 4th audio frame (one frame = "
    "one int16 sample per channel) from real WAV bytes — signed sum + "
    "abs sum of the sampled frames, the fixed-rate subsample a speech "
    "pipeline runs before featurization. Oracle recomputes both sums "
    "from the fixture LCG; interleaving or stride errors mismatch",
    tags=("llm", "multimodal"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    wavs = media.filter(F.col("meta.format") == "wav")
    return frame_sample_audio(wavs, 4)


@register(
    "multimodal_channel_stats",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             4 + doc_id % 29 AS w,
             3 + doc_id % 13 AS h
      FROM documents WHERE doc_id % 2 = 0),
    d AS (SELECT *, ((w * 3 + 3) // 4) * 4 AS rowb FROM m)
    SELECT media_id,
           'bmp' AS format,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(list_sum([(media_id * 31
               + 7 * ((j // w) * rowb + (j % w) * 3 + 0)) % 256
              for j in range(0, w * h)]) AS BIGINT) AS sum_c0,
           CAST(list_sum([(media_id * 31
               + 7 * ((j // w) * rowb + (j % w) * 3 + 1)) % 256
              for j in range(0, w * h)]) AS BIGINT) AS sum_c1,
           CAST(list_sum([(media_id * 31
               + 7 * ((j // w) * rowb + (j % w) * 3 + 2)) % 256
              for j in range(0, w * h)]) AS BIGINT) AS sum_c2
    FROM d
    """,
    doc="Multimodal feature extraction: per-channel (BGR) byte sums "
    "over the PIXELS of real BMP blobs — row padding excluded, so a "
    "stride-naive reader that sums the raw payload mismatches on any "
    "width whose 3*w is not 4-aligned. Arrow-batched mapInPandas, "
    "vectorized numpy per blob; the oracle recomputes all three "
    "channel sums from the fixture LCG alone",
    tags=("llm", "multimodal"),
)
def multimodal_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    bmps = media.filter(F.col("meta.format") == "bmp")
    return image_channel_stats(bmps)


@register(
    "multimodal_png_pixels",
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
    doc="REAL general-codec image decode with zero codec libraries: "
    "synthesize actual zlib-compressed 8-bit truecolor PNGs (scanline "
    "filters rotating None/Sub/Up; ids divisible by 97 truncated after "
    "IHDR — real corrupt blobs), then decode them back — chunk walk + "
    "CRC check + IDAT inflate + per-scanline UNFILTER (all five spec "
    "filters) — in an Arrow-batched mapInPandas, emitting per-channel "
    "RGB pixel sums. The oracle recomputes every sum from the fixture "
    "LCG without seeing the bytes, so a decoder that skips unfiltering, "
    "mis-walks chunks, or mishandles the corrupt rows hash-mismatches "
    "(operators/multimodal.py png section)",
    tags=("llm", "multimodal"),
)
def multimodal_png_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.multimodal import (
        png_pixel_stats,
        synthesize_png_media,
    )

    media = synthesize_png_media(load_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


@register(
    "corpus_stats_cube",
    oracle="""
    SELECT COALESCE(lang, '<all>') AS lang,
           COALESCE(source, '<all>') AS source,
           COUNT(*) AS doc_ct,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS DOUBLE) AS mean_chars
    FROM documents
    GROUP BY CUBE (lang, source)
    """,
    doc="Corpus-card composition report: doc counts and char volume by "
    "every (lang, source) combination via CUBE — one pass with "
    "grouping-set expansion (partial aggs per set), the standard "
    "dataset-documentation query at corpus scale",
    tags=("llm", "text", "agg"),
)
def corpus_stats_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.cube("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("doc_ct"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .select(
            F.coalesce("lang", F.lit("<all>")).alias("lang"),
            F.coalesce("source", F.lit("<all>")).alias("source"),
            "doc_ct",
            "total_chars",
            (F.col("total_chars").cast("double") / F.col("doc_ct"))
            .cast("double")
            .alias("mean_chars"),
        )
    )


@register(
    "embedding_norm_stats",
    oracle="""
    WITH n AS (
      SELECT label,
             round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6) AS nrm
      FROM embeddings)
    SELECT label,
           COUNT(*) AS vec_ct,
           CAST(CAST(SUM(CAST(nrm AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_norm,
           round(MIN(nrm), 6) AS min_norm,
           round(MAX(nrm), 6) AS max_norm
    FROM n
    GROUP BY label
    """,
    doc="Per-label embedding L2-norm statistics: the norm is a map-side "
    "JVM fold over the vector (fixed element order, rounded before "
    "aggregation), then one grouped agg with an exact decimal sum for "
    "the mean — the drift/QA check a vector pipeline runs per ingest "
    "batch",
    tags=("llm", "similarity", "agg"),
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    nrm = F.round(F.sqrt(sq), 6)
    from gmall_flink_210726_spark.functions.scalar import money

    return (
        emb.select("label", nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("vec_ct"),
            (F.sum(money("nrm")).cast("double") / F.count(F.lit(1)))
            .cast("double")
            .alias("avg_norm"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
        )
    )


@register(
    "llm_corpus_clean",
    oracle=r"""
    WITH ws_t AS (
      SELECT doc_id, lang, source,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws,
             string_split(text, chr(10)) AS lines,
             CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT) AS n_sym,
             regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm_text
      FROM documents),
    gopher AS (
      SELECT doc_id,
             (len(ws) BETWEEN 50 AND 100000
              AND (CASE WHEN len(ws) > 0 THEN CAST(COALESCE(list_sum(list_transform(ws, x -> length(x))), 0) AS DOUBLE)/len(ws) ELSE 0.0 END BETWEEN 3.0 AND 10.0)
              AND (CASE WHEN len(ws) > 0 THEN CAST(n_sym AS DOUBLE)/len(ws) ELSE 0.0 END) <= 0.1
              AND (CASE WHEN len(lines) > 0 THEN CAST(len(list_filter(lines, x -> regexp_matches(x, '\.\.\.$'))) AS DOUBLE)/len(lines) ELSE 0.0 END) <= 0.3
              AND (CASE WHEN len(ws) > 0 THEN CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)/len(ws) ELSE 0.0 END) >= 0.8
              AND len(list_filter(ws, x -> x IN ('the','a','an','of','and','or','to','in','is','it'))) >= 2) AS g_kept
      FROM ws_t),
    dup_line AS (
      SELECT doc_id,
             (CASE WHEN len(lines) > 0 THEN 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE)/len(lines) ELSE 0.0 END) <= 0.3 AS ok
      FROM ws_t),
    uni AS (
      SELECT doc_id, CAST(max(ct) AS DOUBLE)/sum(ct) <= 0.2 AS ok FROM (
        SELECT doc_id, w, count(*) AS ct
        FROM (SELECT doc_id, unnest(ws) AS w FROM ws_t) GROUP BY 1, 2)
      GROUP BY 1),
    bi AS (
      SELECT doc_id, CAST(max(ct) AS DOUBLE)/sum(ct) <= 0.18 AS ok FROM (
        SELECT doc_id, b, count(*) AS ct
        FROM (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1]
                                     for i in range(1, len(ws))]) AS b
              FROM ws_t)
        GROUP BY 1, 2)
      GROUP BY 1),
    canonical AS (
      SELECT MIN(doc_id) AS doc_id FROM ws_t GROUP BY norm_text)
    SELECT w.doc_id, w.lang, w.source
    FROM ws_t w
    JOIN gopher g USING (doc_id)
    JOIN dup_line dl USING (doc_id)
    LEFT JOIN uni USING (doc_id)
    LEFT JOIN bi USING (doc_id)
    WHERE g.g_kept AND dl.ok
      AND COALESCE(uni.ok, TRUE) AND COALESCE(bi.ok, TRUE)
      AND doc_id IN (SELECT doc_id FROM canonical)
    """,
    doc="End-to-end corpus cleaning pipeline: Gopher quality rules AND "
    "repetition rules AND exact-dedup canonicalization (keep min "
    "doc_id per normalized text) composed as one DataFrame plan — the "
    "filter a user actually ships; every stage reuses an "
    "independently-oracled operator",
    tags=("llm", "dedup", "text", "bench"),
)
def llm_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.dedup import exact_dedup
    from gmall_flink_210726_spark.operators.text import (
        gopher_quality_filter,
        repetition_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    g = gopher_quality_filter(docs).select("doc_id", "lang", "source", "kept")
    r = repetition_features(docs).select("doc_id", "rep_kept")
    keepers = exact_dedup(docs).select(F.col("keep_id").alias("doc_id"))
    return (
        g.filter(F.col("kept"))
        .join(r.filter(F.col("rep_kept")), "doc_id", "left_semi")
        .join(keepers, "doc_id", "left_semi")
        .select("doc_id", "lang", "source")
    )


@register(
    "dedup_incremental_ingest",
    oracle=r"""
    WITH nrm AS (
      SELECT doc_id, text,
             regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS nt
      FROM documents),
    hist AS (SELECT * FROM nrm WHERE doc_id % 3 <> 0),
    inc  AS (SELECT * FROM nrm WHERE doc_id % 3 = 0),
    fresh AS (SELECT * FROM inc
              WHERE nt NOT IN (SELECT nt FROM hist)),
    keep AS (SELECT nt, MIN(doc_id) AS k FROM fresh GROUP BY nt)
    SELECT f.doc_id, f.text, sha256(f.nt) AS digest
    FROM fresh f JOIN keep ON f.nt = keep.nt AND f.doc_id = keep.k
    """,
    doc="Incremental ingest dedup — every-third doc plays the incoming "
    "batch, the rest the historical corpus: the batch's sha2 digests "
    "anti-join history's digest table (history bodies never rescan; "
    "bucketed-on-digest at scale this is co-located), then the batch "
    "dedups within itself keeping min id. Output rows carry the "
    "digest that appends to the seen-digest table for the next batch",
    tags=("llm", "dedup"),
)
def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.dedup import (
        incremental_dedup,
        normalized_text,
    )

    docs = load_table(spark, sf_dir, "documents")
    history = docs.filter(F.col("doc_id") % 3 != 0)
    incoming = docs.filter(F.col("doc_id") % 3 == 0)
    seen = history.select(
        F.sha2(normalized_text("text"), 256).alias("digest")
    )
    return incremental_dedup(incoming, seen)

r"""LLM-data-pipeline queries, wave 6: count-min sketch heavy hitters,
int8 embedding quantization, exact per-label centroids.

Oracle notes:
- CMS: the oracle rebuilds the identical 4x256 sketch — 60-bit md5
  digit-polynomial hash of 'j:word', low 8 bits, SUM cells, MIN-probe —
  so the *approximate* counts hash-compare exactly (the HLL contract,
  queries/extras4.py). DuckDB HUGEINT sums are cast back to BIGINT.
- Quantization: the affine (x-mn)*255/(mx-mn) runs in the same IEEE
  operation order in both engines; round-half-up == round-half-away
  for non-negative arguments. Checksums are integer-exact.
- Centroids: elements rounded to 6 dp then summed as DECIMAL(18,6)
  (order-free exact; the embedding_norm_stats precedent).
- posexplode's 0-based pos == unnest(range(len(...))) zipped unnest;
  INTEGER cast on the oracle side matches Spark's int pos.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_210726_spark.operators.embed import (
    label_centroids,
    quantize_int8_stats,
)
from gmall_flink_210726_spark.operators.sketch import cms_estimate
from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table

_HASH60 = (
    "list_sum([(strpos('0123456789abcdef', substr({h}, i, 1)) - 1)"
    " * (CAST(1 AS BIGINT) << (4 * (15 - i))) for i in range(1, 16)])"
)


@register(
    "sketch_cms_topwords",
    oracle=f"""
    WITH w AS (SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                         x -> x <> '')) AS word
               FROM documents),
    wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS ct FROM w GROUP BY word),
    kj AS (SELECT word, ct, unnest([0, 1, 2, 3]) AS j FROM wc),
    kh AS (SELECT word, ct, j,
             {_HASH60.format(h="md5(CAST(j AS VARCHAR) || ':' || word)")} % 256
               AS ctr
           FROM kj),
    sk AS (SELECT j, ctr, SUM(ct) AS cell FROM kh GROUP BY 1, 2),
    est AS (SELECT word, MAX(ct) AS exact_ct, MIN(cell) AS cms_est
            FROM kh JOIN sk USING (j, ctr) GROUP BY word)
    SELECT word, CAST(exact_ct AS BIGINT) AS exact_ct,
           CAST(cms_est AS BIGINT) AS cms_est
    FROM est ORDER BY exact_ct DESC, word ASC LIMIT 20
    """,
    doc="Count-min sketch (Cormode & Muthukrishnan 2005) word "
    "frequencies, top-20 exact-vs-estimate: the sketch is a FIXED "
    "4x256 cell table however large the vocabulary — the bounded-state "
    "heavy-hitter structure a 100 TB stream aggregator keeps per "
    "window — probed via a broadcast join, estimate = min over rows "
    "(one-sided error >= truth). operators/sketch.py:cms_estimate",
    tags=("sketch", "llm"),
)
def q_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
        ).alias("word")
    )
    wc = words.groupBy("word").agg(F.count(F.lit(1)).alias("ct"))
    est = cms_estimate(wc, "word", "ct")
    return est.orderBy(F.desc("exact_ct"), F.asc("word")).limit(20)


@register(
    "emb_quantize_int8",
    oracle="""
    WITH l AS (SELECT unnest(embedding::DOUBLE[]) AS x,
                      unnest(range(len(embedding))) AS dim
               FROM embeddings),
    cb AS (SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM l GROUP BY dim),
    qv AS (SELECT l.dim,
                  CASE WHEN mx = mn THEN 0
                       ELSE CAST(round((x - mn) * 255 / (mx - mn), 0) AS BIGINT)
                  END AS q
           FROM l JOIN cb USING (dim))
    SELECT CAST(qv.dim AS INTEGER) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n_vals,
           CAST(SUM(q) AS BIGINT) AS q_sum,
           CAST(SUM(q * q) AS BIGINT) AS q_sq_sum,
           round(MIN(cb.mn), 6) AS dim_min,
           round(MIN(cb.mx), 6) AS dim_max
    FROM qv JOIN cb ON qv.dim = cb.dim
    GROUP BY qv.dim
    """,
    doc="Per-dimension int8 scalar quantization of the embedding "
    "corpus (min/max affine codebook) with integer-exact checksums of "
    "the quantized values: explode -> per-dim codebook agg -> "
    "broadcast codebook join -> per-dim checksum. Result is one row "
    "per dimension regardless of corpus size. "
    "operators/embed.py:quantize_int8_stats",
    tags=("llm", "similarity"),
)
def q_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quantize_int8_stats(load_table(spark, sf_dir, "embeddings"))


@register(
    "emb_label_centroids",
    oracle="""
    WITH l AS (SELECT label, unnest(embedding::DOUBLE[]) AS x,
                      unnest(range(len(embedding))) AS dim
               FROM embeddings)
    SELECT label, CAST(dim AS INTEGER) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           round(CAST(CAST(SUM(CAST(round(x, 6) AS DECIMAL(18,6))) AS DOUBLE)
                      / COUNT(*) AS DOUBLE), 6) AS centroid
    FROM l GROUP BY label, dim
    """,
    doc="Exact per-(label, dimension) embedding centroid — the class "
    "prototype table behind semantic dedup / cluster-balance QA. "
    "Rounded-then-DECIMAL summation makes the mean order-free exact; "
    "one explode, one (label, dim) shuffle, |labels| x dims output "
    "rows. operators/embed.py:label_centroids",
    tags=("llm", "similarity", "agg"),
)
def q_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return label_centroids(load_table(spark, sf_dir, "embeddings"))


@register(
    "text_bigram_logprob",
    oracle=r"""
    WITH ws AS (SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x <> '') AS w
                FROM documents),
    bi AS (SELECT doc_id, w[i + 1] AS w1, w[i + 2] AS w2
           FROM (SELECT doc_id, w, unnest(range(len(w) - 1)) AS i
                 FROM ws WHERE len(w) >= 2)),
    c12 AS (SELECT w1, w2, COUNT(*) AS ct12 FROM bi GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(SUM(ct12) AS BIGINT) AS ct1 FROM c12 GROUP BY 1),
    lp AS (SELECT bi.doc_id,
             CAST(round(ln(CAST(ct12 AS DOUBLE) / CAST(ct1 AS DOUBLE)), 6)
                  AS DECIMAL(18,6)) AS lp
           FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1))
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(lp) AS DOUBLE) AS sum_logprob,
           CAST(CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_logprob
    FROM lp GROUP BY doc_id
    """,
    doc="Corpus-derived bigram LM score per doc (one order above "
    "text_unigram_logprob; the CCNet/Gopher perplexity-filter proxy): "
    "P(w2|w1) = C(w1,w2)/C(w1.), mean ln P over the doc's bigrams. "
    "Bigrams are built JVM-side by zipping the token array with its "
    "shift (no per-token window); the corpus explodes ONCE into a "
    "checkpointed (doc, bigram) aggregate from which both count tables "
    "derive. operators/text3.py:bigram_logprob_score",
    tags=("llm", "text"),
)
def q_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.text3 import bigram_logprob_score

    return bigram_logprob_score(load_table(spark, sf_dir, "documents"))


@register(
    "text_quality_logit",
    oracle=r"""
    WITH t AS (SELECT doc_id, text,
                 list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '') AS ws
               FROM documents),
    f AS (SELECT doc_id,
            len(ws) AS n_words,
            CAST(len(list_filter(ws, x -> list_contains(
              ['the','a','an','and','or','of','to','in','is','it',
               'that','for','on','with','as'], x))) AS DOUBLE)
              / CAST(len(ws) AS DOUBLE) AS f_stop,
            CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE)
              / CAST(len(ws) AS DOUBLE) AS f_wlen,
            CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
              / CAST(length(text) AS DOUBLE) AS f_sym
          FROM t WHERE len(ws) > 0)
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           round(f_stop, 6) AS f_stop,
           round(f_wlen, 6) AS f_wlen,
           round(f_sym, 6) AS f_sym,
           round(1.0 / (1.0 + exp(-(-2.0 + 9.0 * f_stop + -0.15 * f_wlen
                                    + -4.0 * f_sym))), 6) AS quality_score,
           round(1.0 / (1.0 + exp(-(-2.0 + 9.0 * f_stop + -0.15 * f_wlen
                                    + -4.0 * f_sym))), 6) >= 0.5 AS keep
    FROM f
    """,
    doc="Logistic-regression quality classifier inference (the "
    "GPT-3-style LR document filter, Brown et al. 2020 App. A): "
    "stopword share, mean token length, symbol share -> fixed-weight "
    "linear score -> sigmoid -> keep flag. Pure map-side Column "
    "arithmetic fused into the scan's WholeStageCodegen — no shuffle, "
    "no UDF. operators/text3.py:quality_logit_score",
    tags=("llm", "text"),
)
def q_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.text3 import quality_logit_score

    return quality_logit_score(load_table(spark, sf_dir, "documents"))

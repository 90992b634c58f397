r"""LLM-data-pipeline queries, wave 8: distributed linear algebra
(exact Gram matrix) and DSIR importance-resampling weights.

Both follow the repo-wide determinism contract: 6-dp rounding BEFORE
any cross-row reduction, DECIMAL (order-free exact) sums, identical
arithmetic on the DuckDB side — so the driver's value-hash gate is
bit-stable under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "emb_gram_matrix",
    oracle="""
    WITH lng AS (
      SELECT vec_id, unnest(range(len(embedding))) AS dim,
             unnest(embedding::DOUBLE[]) AS x
      FROM embeddings
    )
    SELECT CAST(a.dim AS INTEGER) AS dim_i, CAST(b.dim AS INTEGER) AS dim_j,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           round(CAST(SUM(CAST(round(a.x, 6) AS DECIMAL(10,6))
                          * CAST(round(b.x, 6) AS DECIMAL(10,6))) AS DOUBLE),
                 6) AS gram
    FROM lng a JOIN lng b USING (vec_id)
    WHERE a.dim <= b.dim
    GROUP BY 1, 2
    """,
    doc="Exact upper-triangle Gram matrix (X'X) of the embedding "
    "corpus — the d x d moment matrix behind PCA whitening, covariance "
    "estimation and drift monitors. Scale shape: each row emits its "
    "d*(d+1)/2 outer-product terms MAP-SIDE (array expression, no "
    "self-join), partial aggregation collapses every partition to at "
    "most 2080 groups, so the shuffle is constant-size however many "
    "vectors flow through; products/sums are DECIMAL-exact. The "
    "oracle's self-join formulation is the semantic spec only. "
    "operators/linalg.py:gram_matrix",
    tags=("llm", "similarity", "agg"),
)
def emb_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.linalg import gram_matrix

    return gram_matrix(load_table(spark, sf_dir, "embeddings"))


@register(
    "dsir_importance",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, source,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS w
      FROM documents
    ),
    tb AS (
      SELECT doc_id, source,
             CAST(('0x' || substring(md5(w), 1, 15)) AS BIGINT) % 1024 AS b
      FROM tok
    ),
    bs AS (SELECT b,
             SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS ct_t,
             SUM(CASE WHEN source <> 'src1' THEN 1 ELSE 0 END) AS ct_r
           FROM tb GROUP BY b),
    n AS (SELECT SUM(ct_t) AS nt, SUM(ct_r) AS nr FROM bs),
    lr AS (SELECT b,
             CAST(round(
               ln((ct_t + 1) / CAST(nt + 1024 AS DOUBLE))
             - ln((ct_r + 1) / CAST(nr + 1024 AS DOUBLE)), 6)
             AS DECIMAL(18,6)) AS lr
           FROM bs, n),
    db AS (SELECT doc_id, b, COUNT(*) AS ct FROM tb GROUP BY 1, 2)
    SELECT doc_id, CAST(SUM(ct) AS BIGINT) AS n_tokens,
           CAST(SUM(ct * lr) AS DOUBLE) AS log_weight
    FROM db JOIN lr USING (b)
    GROUP BY doc_id
    """,
    doc="DSIR importance-resampling weight per document (Xie et al. "
    "2023): ln p_target - ln p_raw over md5-hashed unigram buckets "
    "(B=1024, add-1 smoothing), target slice source='src1'. The two "
    "bucket LMs are ONE B-row frame built by a single conditional "
    "groupBy; scoring joins that frame broadcast onto per-doc bucket "
    "counts, so only (doc_id, bucket) int pairs ever shuffle. "
    "operators/selection.py:dsir_importance",
    tags=("llm", "text", "quality"),
)
def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.selection import dsir_importance

    return dsir_importance(load_table(spark, sf_dir, "documents"))

"""Final coverage batch: native pivot, set operations, text-cleaning
normalization, and a cross-table documents⋈embeddings analysis query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_210726_spark.functions.scalar import money_sum
from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "x1_pivot_event_types",
    oracle="""
    SELECT user_id,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'click'    THEN 1 END), 0) AS BIGINT) AS click,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'error'    THEN 1 END), 0) AS BIGINT) AS error,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchase,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'signup'   THEN 1 END), 0) AS BIGINT) AS signup,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'view'     THEN 1 END), 0) AS BIGINT) AS view
    FROM events
    GROUP BY user_id
    """,
    doc="Native .pivot(): wide per-user event-type counts (the manual "
    "CASE-WHEN shape of p8, via the dedicated operator; explicit value "
    "list avoids the extra distinct-values job)",
    tags=("extras", "pivot"),
)
def x1_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    pivoted = (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
    )
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in pivoted.columns if c != "user_id"],
    )


@register(
    "x2_intersect_except",
    oracle="""
    WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    erroring AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
    SELECT 'buy_and_click' AS cohort, COUNT(*) AS ct
    FROM (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM clickers)
    UNION ALL
    SELECT 'buy_never_error' AS cohort, COUNT(*) AS ct
    FROM (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM erroring)
    """,
    doc="Set operations (engine extras beyond the reference's union-only "
    "§2.5): INTERSECT and EXCEPT cohorts",
    tags=("extras", "setops"),
)
def x2_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    def cohort(t):
        return events.filter(F.col("event_type") == t).select("user_id").distinct()

    both = cohort("purchase").intersect(cohort("click"))
    never = cohort("purchase").exceptAll(cohort("error")).distinct()
    return (
        both.agg(F.count(F.lit(1)).alias("ct")).select(F.lit("buy_and_click").alias("cohort"), "ct")
        .unionByName(
            never.agg(F.count(F.lit(1)).alias("ct")).select(F.lit("buy_never_error").alias("cohort"), "ct")
        )
    )


@register(
    "x3_text_cleaning",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(regexp_replace(trim(lower(text)), '[^a-z0-9 ]', ' ', 'g'),
                          ' +', ' ', 'g') AS clean_text,
           CAST(length(regexp_replace(regexp_replace(trim(lower(text)), '[^a-z0-9 ]', ' ', 'g'),
                          ' +', ' ', 'g')) AS BIGINT) AS clean_len
    FROM documents
    """,
    doc="Text-cleaning normalization pipeline (LLM preprocessing): "
    "lowercase, strip non-alphanumerics, collapse whitespace — pure "
    "JVM regexp_replace chain",
    tags=("extras", "text"),
)
def x3_text_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    clean = F.regexp_replace(
        F.regexp_replace(F.trim(F.lower(F.col("text"))), r"[^a-z0-9 ]", " "),
        r" +",
        " ",
    )
    return docs.select(
        "doc_id", clean.alias("clean_text"), F.length(clean).cast("long").alias("clean_len")
    )


@register(
    "x4_docs_join_embeddings",
    oracle="""
    SELECT label,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS DECIMAL(18,6))) AS DOUBLE) AS chars_sum
    FROM documents JOIN embeddings ON doc_id = vec_id
    GROUP BY label
    """,
    doc="Cross-modal join: documents ⋈ embeddings on id, per-cluster "
    "(label) document statistics — the join shape of joint text+vector "
    "curation pipelines",
    tags=("extras", "join"),
)
def x4_docs_join_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    joined = docs.join(emb, docs.doc_id == emb.vec_id, "inner")
    return joined.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_docs"), money_sum("n_chars", "chars_sum")
    )

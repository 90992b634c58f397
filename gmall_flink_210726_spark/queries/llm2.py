"""LLM-data-pipeline queries, wave 2: dedup clustering (connected
components over the near-dup pair graph), corpus vocabulary / IDF, and
deterministic stratified downsampling.

Oracle notes:
- Connected components is SQL-expressible via a recursive CTE: the
  min reachable id per node IS the component min-label, which is what
  the iterative Spark propagation converges to. DuckDB's
  WITH RECURSIVE handles the fixture-scale graph easily; the Spark
  side never materializes paths — only (node, label) pairs.
- idf uses ln(); both engines round to 6 decimals before compare,
  absorbing any last-ulp libm difference.
- The stratified sample's md5 sort keys compare identically in both
  engines (binary/ASCII collation on hex strings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_210726_spark.operators.dedup import (
    connected_components,
    ngram_jaccard_pairs,
)
from gmall_flink_210726_spark.operators.text import stratified_sample, vocab_df_idf
from gmall_flink_210726_spark.queries.llm import _SHINGLES
from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "dedup_cc_clusters",
    oracle=f"""
    WITH RECURSIVE sh AS ({_SHINGLES}),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh)) > 0
        AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
    e AS (SELECT id_a AS u, id_b AS v FROM p
          UNION SELECT id_b, id_a FROM p),
    reach AS (
      SELECT u, u AS lbl FROM (SELECT DISTINCT u FROM e)
      UNION
      SELECT e.u, r.lbl FROM e JOIN reach r ON e.v = r.u),
    comp AS (SELECT u, MIN(lbl) AS cluster_id FROM reach GROUP BY u)
    SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN comp c ON c.u = d.doc_id
    """,
    doc="Near-dup CLUSTERS, not just pairs: connected components over "
    "the exact word-3-gram Jaccard (J ≥ 0.5) pair graph by iterative "
    "min-label propagation — every doc mapped to its cluster's minimum "
    "doc_id (singletons map to themselves). The canonical tail of a "
    "corpus dedup pipeline ('keep one doc per cluster'); the pair "
    "source is interchangeable (MinHash-LSH feeds the same operator at "
    "scale). Each round shuffles bare (id, label) pairs; convergence "
    "is detected by the monotone label sum — no extra join",
    tags=("llm", "dedup", "bench"),
)
def dedup_cc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, max_df=100)
    nodes = docs.select(F.col("doc_id").alias("id"))
    cc = connected_components(pairs, nodes, node_col="id")
    return cc.select(F.col("id").alias("doc_id"), "cluster_id")


@register(
    "text_vocab_topdf",
    oracle=r"""
    WITH t AS (
      SELECT unnest(list_distinct(
               list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))) AS token
      FROM documents),
    df AS (SELECT token, COUNT(*) AS df FROM t GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT token, df, round(ln((n_docs + 1.0) / (df + 1.0)) + 1.0, 6) AS idf
    FROM df, n
    ORDER BY df DESC, token
    LIMIT 100
    """,
    doc="Corpus vocabulary: top-100 tokens by DOCUMENT frequency with "
    "smoothed idf — the tokenizer-vocab / feature-selection primitive. "
    "Per-doc distinct is a map-side array op, token counts combine "
    "map-side partials, N joins in as a broadcast single-row agg, and "
    "the cut is a TakeOrdered with token tiebreak (deterministic)",
    tags=("llm", "text"),
)
def text_vocab_topdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return vocab_df_idf(docs, top_k=100)


@register(
    "text_stratified_sample",
    oracle="""
    SELECT doc_id, lang, sample_rank FROM (
      SELECT doc_id, lang,
             CAST(row_number() OVER (PARTITION BY lang
                  ORDER BY md5('strat-v1' || CAST(doc_id AS VARCHAR)), doc_id)
                  AS BIGINT) AS sample_rank
      FROM documents)
    WHERE sample_rank <= 20
    """,
    doc="Deterministic stratified downsample: ≤20 docs per language by "
    "salted-md5 order — corpus rebalancing that is reproducible across "
    "engines and stable under growth (a doc's sort key never changes), "
    "unlike sampleBy. One shuffle on the stratum key",
    tags=("llm", "text"),
)
def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, strata_col="lang", n_per_stratum=20).select(
        "doc_id", "lang", "sample_rank"
    )


@register(
    "text_decontaminate",
    oracle=f"""
    WITH sh AS ({_SHINGLES}),
    ev AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id % 50 = 0),
    tr AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id % 50 <> 0),
    hits AS (SELECT tr.doc_id, COUNT(DISTINCT tr.s) AS n_hit
             FROM tr JOIN ev ON tr.s = ev.s GROUP BY tr.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit_shingles,
           h.doc_id IS NOT NULL AS contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % 50 <> 0
    """,
    doc="Benchmark decontamination: training docs (doc_id % 50 ≠ 0) "
    "flagged when they share any word-3-gram with the held-out eval "
    "slice (doc_id % 50 = 0) — the leakage check every training-data "
    "pipeline runs before shipping. Eval shingles collapse to a "
    "broadcast distinct-hash set; the corpus pays one scan + explode "
    "+ 8-byte equi-join, never a self-join",
    tags=("llm", "text", "dedup"),
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.text import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 50 != 0)
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0)
    return decontaminate(train, eval_docs)


@register(
    "text_sequence_pack",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS start
      FROM t)
    SELECT doc_id, lang, n_tokens,
           CAST(FLOOR(start / 512) AS BIGINT) AS seq_id,
           CAST(start % 512 AS BIGINT) AS seq_offset
    FROM c
    """,
    doc="Greedy stream packing of documents into 512-token training "
    "sequences per language shard: windowed cumulative token count in "
    "id order, integer-exact — sequences cut every 512 tokens, each "
    "doc assigned where its first token lands. Real pipelines pack "
    "per output shard (shard count >> executors) so the per-shard "
    "scan parallelizes; no global ordering anywhere",
    tags=("llm", "text"),
)
def text_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.text import sequence_pack

    docs = load_table(spark, sf_dir, "documents")
    return sequence_pack(docs, budget=512, shard_col="lang")


# RECURSIVE must appear in the WITH prefix for the reach CTE; DuckDB
# is happy with non-recursive CTEs inside a WITH RECURSIVE list.
from gmall_flink_210726_spark.queries.llm import _SIMHASH_SIG

_REC_SIMHASH_SIG = _SIMHASH_SIG.replace("WITH ", "WITH RECURSIVE ", 1)


@register(
    "dedup_cc_star_simhash",
    oracle=f"""
    {_REC_SIMHASH_SIG},
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
    e AS (SELECT id_a AS u, id_b AS v FROM p
          UNION SELECT id_b, id_a FROM p),
    reach AS (
      SELECT u, u AS lbl FROM (SELECT DISTINCT u FROM e)
      UNION
      SELECT e.u, r.lbl FROM e JOIN reach r ON e.v = r.u),
    comp AS (SELECT u, MIN(lbl) AS cluster_id FROM reach GROUP BY u)
    SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN comp c ON c.u = d.doc_id
    """,
    doc="Dedup clusters by large-star/small-star contraction (Kiveris "
    "et al.) over the SimHash hamming≤3 pair graph: O(log n) rounds vs "
    "label propagation's O(diameter) — the CC variant for corpora whose "
    "near-dup chains run deep. Each round is one groupBy shuffle of "
    "bare id pairs (no joins inside the loop); agreement with the "
    "propagation operator is unit-pinned on chains and random graphs",
    tags=("llm", "dedup"),
)
def dedup_cc_star_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.dedup import (
        connected_components_star,
        simhash_near_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = simhash_near_pairs(docs)
    nodes = docs.select(F.col("doc_id").alias("id"))
    cc = connected_components_star(pairs, nodes, node_col="id")
    return cc.select(F.col("id").alias("doc_id"), "cluster_id")


@register(
    "dedup_near_corpus",
    oracle=f"""
    WITH RECURSIVE sh AS ({_SHINGLES}),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh)) > 0
        AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
    e AS (SELECT id_a AS u, id_b AS v FROM p
          UNION SELECT id_b, id_a FROM p),
    reach AS (
      SELECT u, u AS lbl FROM (SELECT DISTINCT u FROM e)
      UNION
      SELECT e.u, r.lbl FROM e JOIN reach r ON e.v = r.u),
    comp AS (SELECT u, MIN(lbl) AS cluster_id FROM reach GROUP BY u),
    full_cc AS (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c ON c.u = d.doc_id),
    sz AS (SELECT cluster_id, COUNT(*) AS cluster_size
           FROM full_cc GROUP BY 1)
    SELECT d.doc_id, d.lang, d.source,
           CAST(sz.cluster_size AS BIGINT) AS cluster_size
    FROM full_cc f
    JOIN sz USING (cluster_id)
    JOIN documents d USING (doc_id)
    WHERE f.doc_id = f.cluster_id
    """,
    doc="Near-dup dedup MATERIALIZED: the surviving corpus after "
    "'keep the min-id doc per near-dup cluster' — pairs (exact "
    "3-gram Jaccard J >= 0.5, df-capped) -> connected components -> "
    "representative selection -> join back to doc metadata with the "
    "cluster size each survivor represents. This is the artifact a "
    "dedup pipeline actually ships; the pair source swaps for "
    "MinHash-LSH at scale with no change downstream",
    tags=("llm", "dedup"),
)
def dedup_near_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, max_df=100)
    nodes = docs.select(F.col("doc_id").alias("id"))
    cc = connected_components(pairs, nodes, node_col="id")
    sizes = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    survivors = cc.filter(F.col("id") == F.col("cluster_id"))
    return (
        survivors.join(sizes, "cluster_id")
        .join(
            docs.select("doc_id", "lang", "source"),
            F.col("id") == F.col("doc_id"),
        )
        .select("doc_id", "lang", "source", "cluster_size")
    )


@register(
    "dedup_triangle_motifs",
    oracle=f"""
    WITH sh AS ({_SHINGLES}),
    p AS (
      SELECT a.doc_id AS u, b.doc_id AS v
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh)) > 0
        AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5)
    SELECT e1.u AS id_a, e1.v AS id_b, e2.v AS id_c
    FROM p e1
    JOIN p e2 ON e1.v = e2.u
    JOIN p e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
    doc="Triangle motifs in the near-dup graph — dense-clique evidence "
    "beyond what connected components shows (a chain and a clique are "
    "one component, but only the clique has triangles). Ordered "
    "enumeration: wedges from one ordered-edge self-join closed by an "
    "equi-probe, each triangle emitted once; hub nodes cap with "
    "max_degree at scale (see operators/dedup.py triangle_list)",
    tags=("llm", "dedup", "graph"),
)
def dedup_triangle_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_210726_spark.operators.dedup import triangle_list

    docs = load_table(spark, sf_dir, "documents")
    # the pair table feeds three self-join legs (e1/e2/e3); Spark's
    # ReuseExchange already dedupes the identical pair-mining subtrees
    # (measured: an explicit localCheckpoint only added first-run
    # materialization cost), so the plan stays lazy
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, max_df=100)
    return triangle_list(pairs)

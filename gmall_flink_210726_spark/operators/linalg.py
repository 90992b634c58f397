"""Distributed linear algebra over embedding columns: the exact Gram
matrix (X'X) of a vector corpus — the d x d moment matrix behind PCA
whitening, covariance estimation, ridge regression closed forms, and
embedding-drift monitors in a training-data pipeline.

Scale shape (the whole point): the corpus is NEVER self-joined and
never exploded into (row, i) x (row, j) pairs through a shuffle.
Each row emits its upper-triangle outer-product terms MAP-SIDE
(d*(d+1)/2 structs from a pure array expression), and the groupBy
immediately partial-aggregates them to at most d*(d+1)/2 groups per
partition — so the only shuffle is |partitions| x 2080 tiny partial
sums for d=64, regardless of corpus row count. At 100 TB the reduce
side is still 2080 rows.

Determinism contract (repo-wide oracle rules): elements are rounded
to 6 dp and cast to DECIMAL(10,6) BEFORE multiplying, products are
exact DECIMAL(21,12), and the cross-row SUM runs in DECIMAL (order-free
exact) — bit-identical in Spark and DuckDB whatever the partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_matrix(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Upper-triangle exact Gram matrix: for i <= j,
    G[i][j] = sum over rows of round(x_i, 6) * round(x_j, 6),
    summed in DECIMAL, reported as a 6-dp double alongside the row
    count. Output is d*(d+1)/2 rows however large the corpus.
    """
    # per-row upper-triangle terms, generated map-side:
    # transform(arr, (xi, i) -> transform(slice from i ..)) -> flatten.
    # slice() is 1-based; the inner index k is 0-based so j = i + k.
    d6 = "CAST(round(CAST({x} AS DOUBLE), 6) AS DECIMAL(10,6))"
    terms = F.explode(
        F.expr(
            f"""
            flatten(transform({vec_col}, (xi, i) ->
              transform(slice({vec_col}, i + 1, size({vec_col}) - i),
                        (xj, k) -> struct(
                          i AS dim_i,
                          i + k AS dim_j,
                          {d6.format(x='xi')} * {d6.format(x='xj')} AS p))))
            """
        )
    ).alias("t")
    return (
        emb.select(terms)
        .groupBy(
            F.col("t.dim_i").alias("dim_i"), F.col("t.dim_j").alias("dim_j")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("t.p").cast("double"), 6).alias("gram"),
        )
    )

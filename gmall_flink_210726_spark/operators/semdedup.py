"""Semantic deduplication over an embedding column (SemDeDup-style).

Beyond-reference surface (BASELINE.json north star). SemDeDup (Abbas
et al. 2023, public) removes *semantic* duplicates — documents whose
embeddings are near-identical even when their text is not — by
clustering the embedding space and dropping all-but-one of each
within-cluster near-dup set. The published recipe clusters with
k-means; this operator swaps in a fully DETERMINISTIC clustering —
the sign code of the first ``sign_bits`` embedding dimensions, i.e.
LSH with axis-aligned hyperplanes — so the same partitioning is
reproducible by a blind SQL oracle and stable across runs (k-means
centroids depend on sampling order; sign codes depend only on the
data). The IVF variant (operators/similarity.py:356) remains the
learned-centroid path.

Keep/drop contract (deterministic, order-free): a vector is DROPPED
iff some SMALLER-id vector in its bucket has cosine ≥ threshold with
it — "keep the first occurrence", the exact-dedup convention of
``dedup_exact`` / ``paragraph_dedup``. (This is greedier than
sequential SemDeDup — a vector whose only near neighbor was itself
dropped still drops — but it is associative, so it parallelizes
without a sequential pass and the oracle can state it as one EXISTS.)

Scale design (100 TB): one scan computes (id, bucket, vector, norm);
candidate pairs come from ``_bucket_pairs`` (operators/dedup.py:172)
— a single shuffle on the bucket key with a BOUNDED sliding window,
so a degenerate corpus (everything in one bucket) costs
O(g·max_bucket) pairs and bounded task memory, never g². Cosines are
evaluated only within buckets — the SemDeDup point: the quadratic is
confined to clusters. Norms are computed once per vector, not per
pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_flink_210726_spark.operators.dedup import _bucket_pairs
from gmall_flink_210726_spark.operators.similarity import _dot, _norm


def sign_bucket(vec_col: str, sign_bits: int = 8):
    """Deterministic LSH bucket: bit d set iff embedding[d] > 0."""
    bits = [
        F.when(F.element_at(F.col(vec_col), d + 1) > 0, F.lit(1 << d)).otherwise(
            F.lit(0)
        )
        for d in range(sign_bits)
    ]
    acc = bits[0]
    for b in bits[1:]:
        acc = acc + b
    return acc.cast("long")


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.3,
    sign_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 512,
) -> DataFrame:
    """(vec_id, bucket, kept) for every input vector — kept=false iff a
    smaller-id same-bucket vector sits at cosine ≥ threshold (rounded
    to 6 decimals, the package-wide cross-engine contract). Oracle
    equivalence is exact while every bucket has ≤ max_bucket+1 members
    (the fixture regime); beyond that the bounded window elides only
    long-range pairs inside near-identical mega-buckets, the
    documented ``_bucket_pairs`` recall trade."""
    sig = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("n"),
        sign_bucket(vec_col, sign_bits).alias("bucket"),
    )
    banded = sig.select(
        "id",
        F.lit(0).alias("band"),
        F.col("bucket").alias("bv"),
        F.struct(F.col("v"), F.col("n")).alias("pl"),
    )
    cand = _bucket_pairs(banded, payload=F.col("pl"), max_bucket=max_bucket)
    cos = F.round(
        _dot(F.col("a.pl.v"), F.col("b.pl.v")) / (F.col("a.pl.n") * F.col("b.pl.n")),
        6,
    )
    # _bucket_pairs orders members by struct — id leads, so a.id < b.id
    dropped = (
        cand.select(F.col("b.id").alias("did"), cos.alias("cos"))
        .filter(F.col("cos") >= F.lit(threshold))
        .select("did")
        .distinct()
    )
    return (
        sig.join(dropped, sig["id"] == dropped["did"], "left")
        .select(
            F.col("id").alias(id_col),
            F.col("bucket"),
            F.col("did").isNull().alias("kept"),
        )
    )

"""Graph analytics over DataFrame edge lists: fixed-iteration
weighted PageRank.

Beyond-reference surface. Sibling of the connected-components /
triangle operators (operators/dedup.py) — same bare-id shuffle
discipline, applied to centrality instead of clustering.

Determinism contract: classic PageRank sums double contributions in
shuffle order — nondeterministic. Here every rank is an integer
(scaled by 10^12) and every step is integer arithmetic with explicit
truncating division (`div` in Spark, `//` in DuckDB — identical on
non-negative operands), so any iteration count yields bit-identical
results on both engines regardless of aggregation order. Rounding
mass lost to truncation is deterministic too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # 10^12: rank mass fixed-point scale

_CHECKPOINT_EVERY = 3  # lineage-truncation cadence (rounds)


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """Weighted PageRank with a fixed iteration count over
    ``nodes(id)`` and ``edges(src, dst, w)``. Dangling nodes (no
    out-edges) keep only the teleport base — their mass is not
    redistributed (the standard simplification; documented, exact).

    rank_0(v) = SCALE div N
    rank_{i+1}(v) = (15% of SCALE div 100) div N
                    + (damping * sum_{u->v} (rank_i(u) div outw_u) * w_uv) div 100

    Scale shape: per iteration ONE equi-join of the compact rank frame
    against the edge list plus one groupBy on dst — the label-
    propagation cost model (operators/dedup.py connected_components).
    The node count is a bounded scalar collect (the unigram
    corpus-size precedent). Edge weights and ranks shuffle as bare
    (id, long) pairs."""
    n = nodes.count()
    if n == 0:
        return nodes.select(
            F.col("id"), F.lit(0).cast("long").alias("pr_scaled")
        )
    base = ((100 - damping_pct) * SCALE // 100) // n
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    pr = nodes.select("id", F.lit(SCALE // n).cast("long").alias("pr"))
    for i in range(iterations):
        if i > 0 and i % _CHECKPOINT_EVERY == 0:
            # truncate lineage every few rounds (the connected_components
            # pattern): each iteration nests two joins + a groupBy, and
            # past ~6 rounds the accumulated plan dominates optimizer
            # time / risks codegen blowup at high iteration counts
            pr = pr.localCheckpoint(eager=True)
        shares = (
            pr.join(outw, pr["id"] == outw["src"])
            .select(F.col("src"), F.expr("pr div ow").alias("share"))
        )
        # every sum is bounded by total rank mass (SCALE = 10^12):
        # sum_v inw(v) <= sum_u (rank_u div outw_u) * outw_u <= SCALE,
        # so plain BIGINT arithmetic never overflows (85 * 10^12 << 2^63)
        inw = (
            shares.join(edges, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("share") * F.col("w")).cast("long").alias("inw"))
        )
        pr = nodes.join(inw, nodes["id"] == inw["dst"], "left").select(
            F.col("id"),
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(inw, CAST(0 AS BIGINT))) div 100")
            )
            .cast("long")
            .alias("pr"),
        )
    return pr.select("id", F.col("pr").alias("pr_scaled"))

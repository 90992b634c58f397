"""Skew-mitigation operators (SURVEY §4 / 100 TB design).

AQE's skew-join handling covers joins; hot-key AGGREGATION skew is
handled here with classic two-phase salting: explode each hot key into
``n_salts`` sub-keys, partially aggregate per (key, salt), then merge
the partials. The result is identical to the direct aggregation — the
salted plan just bounds the largest partition at ~1/n_salts of the hot
key's volume.

Only algebraic aggregates (sum/count/min/max) merge losslessly;
``salted_agg`` takes the partial and merge expressions explicitly so
the caller states both sides of the algebra.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    partial_aggs run per (keys..., salt); merge_aggs run per (keys...)
    over the partial columns. Example::

        salted_agg(events, ["event_type"],
                   [F.count(F.lit(1)).alias("ct"),
                    F.sum(money("value")).alias("vs")],
                   [F.sum("ct").cast("long").alias("ct"),
                    F.sum("vs").cast("double").alias("val_sum")])
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_src: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-breaking SALTED equi-join (the standard hot-key repair when
    a shuffle join puts one key's entire fan-in on one reducer and AQE
    skew-split cannot apply — e.g. the key feeds a downstream stateful
    op pinned to the same partitioning).

    Mechanics: the dim side replicates each row ``n_salts`` times (one
    per salt value — an explode, no shuffle), the fact side computes
    ONE deterministic salt per row from ``salt_src`` (any expression
    that varies WITHIN a key — a row id, line number, payload hash;
    constant-per-key would defeat the point), and the join runs on
    (key, salt): each fact row still matches exactly its key's one
    replica, so the result is BIT-IDENTICAL to the unsalted join while
    the hot key's rows spread over ``n_salts`` reducers.

    Cost model: dim bytes × n_salts through the shuffle vs the hot
    key's fan-in ÷ n_salts — pick n_salts ≈ (hot-key rows) /
    (healthy partition rows), keep dim × n_salts well under the fact
    side. Lossless for inner/left joins on a unique dim key.
    """
    replicated = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    salted_fact = fact.withColumn(
        "_salt", F.pmod(salt_src, F.lit(n_salts)).cast("int")
    )
    return salted_fact.join(replicated, [key, "_salt"]).drop("_salt")

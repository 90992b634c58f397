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

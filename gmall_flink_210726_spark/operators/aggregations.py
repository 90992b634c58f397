"""Windowed / keyed aggregations — A1-A6 from SURVEY.md §2.7.

The reference hand-rolls incremental window reduces with accumulator
POJOs and distinct-id HashSets (dws/ProductStatsApp.java:202-241,
dws/VisitorStatsApp.java:108-141). In Spark the same semantics are a
declarative ``groupBy(window(ts, d), *keys).agg(...)`` — Catalyst plans
a partial (map-side) + final hash aggregate, which IS the reference's
per-record incremental reduce, minus the hand-written state.

Scale note (100 TB): hash aggregation shuffles once on
(window, *keys); AQE coalesces small post-shuffle partitions and
splits skewed ones. Exact distinct counts add a second internal
shuffle (expand + two-phase agg) — `approx_distinct=True` switches to
HLL-based `approx_count_distinct` which stays single-pass; the
streaming bindings use the same flag (SURVEY §4.2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gmall_flink_210726_spark.functions.scalar import DT_FMT


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    stt_fmt: str = DT_FMT,
) -> DataFrame:
    """A1/A2/T3 — keyed tumbling event-time window aggregate with the
    reference's ``stt``/``edt`` window-bound stamping
    (dws/ProductStatsApp.java:230-241).

    Batch-replay form; the streaming binding adds withWatermark upstream
    (streaming/pipelines.py) and reuses this exact groupBy.
    """
    w = F.window(F.col(ts_col), duration)
    out = df.groupBy(w.alias("window"), *[F.col(k) for k in keys]).agg(*aggs)
    return out.select(
        F.date_format(F.col("window.start"), stt_fmt).alias("stt"),
        F.date_format(F.col("window.end"), stt_fmt).alias("edt"),
        *[F.col(k) for k in keys],
        *[F.col(c) for c in out.columns if c != "window" and c not in keys],
    )


def distinct_count(col: str, alias: str, approx: bool = False) -> Column:
    """A3 — distinct count inside a window. The reference carries a
    HashSet in the accumulator and counts its size
    (bean/ProductStats.java:75-86); Spark's exact countDistinct plans a
    two-phase distinct aggregate, `approx` the one-pass HLL sketch."""
    if approx:
        return F.approx_count_distinct(col).alias(alias)
    return F.countDistinct(col).alias(alias)

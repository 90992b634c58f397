"""Time-series operators over the events stream table: time-spine
gap-filling with last-observation-carried-forward, and rolling z-score
anomaly flagging.

Beyond-reference surface — the batch twins of what a monitoring
pipeline computes over the reference's windowed streams (SURVEY §2.7
windows give the aggregate shapes; these add the regular-grid and
outlier-detection shapes a 100 TB metrics store needs).

Determinism contract: event values are dollars-and-cents doubles, so
every operator first rebuilds exact integer cents with
``round(value*100)`` (both engines round the same nearest integer —
the product is never a .5 tie) and does all window arithmetic on
exact integers; doubles appear only in final fixed-order expressions
(the w6/unigram precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _cents():
    # built lazily — a module-level Column would demand an active
    # SparkContext at import time and break registry.load_all()
    return F.round(F.col("value") * 100, 0).cast("long")


def gap_fill_locf(events: DataFrame, bucket: str = "hour") -> DataFrame:
    """Regularize an irregular event stream onto a per-user time spine
    (one row per ``bucket`` between the user's first and last event)
    and fill unobserved buckets by carrying the last observed value
    forward. Output: (user_id, bucket_ts, filled_cents, is_observed);
    the first bucket is always observed, so filled_cents is never
    null.

    Scale shape: the observed-value reduction is one (user, bucket)
    groupBy (map-side combine on row_number pruning); the spine is a
    per-user sequence explode — rows scale with users x span, not
    with events; the LOCF window shuffles once on user_id. No
    collect, no Python."""
    per_bucket = events.select(
        "user_id",
        F.date_trunc(bucket, F.col("ts")).alias("bucket_ts"),
        "ts",
        "event_id",
        _cents().alias("cents"),
    )
    w_last = Window.partitionBy("user_id", "bucket_ts").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    obs = (
        per_bucket.withColumn("rn", F.row_number().over(w_last))
        .where(F.col("rn") == 1)
        .select("user_id", "bucket_ts", "cents")
    )
    spine = (
        events.groupBy("user_id")
        .agg(
            F.date_trunc(bucket, F.min("ts")).alias("b0"),
            F.date_trunc(bucket, F.max("ts")).alias("b1"),
        )
        .select(
            "user_id",
            F.explode(
                F.sequence("b0", "b1", F.expr(f"interval 1 {bucket}"))
            ).alias("bucket_ts"),
        )
    )
    w_locf = (
        Window.partitionBy("user_id")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return spine.join(obs, ["user_id", "bucket_ts"], "left").select(
        "user_id",
        "bucket_ts",
        F.last("cents", ignorenulls=True).over(w_locf).alias("filled_cents"),
        F.col("cents").isNotNull().alias("is_observed"),
    )


def rolling_zscore(
    events: DataFrame, window_rows: int = 20, z_thresh: float = 2.0, min_n: int = 5
) -> DataFrame:
    """Per-user rolling z-score outlier detection: each event's value
    against the trailing ``window_rows``-event mean/stddev (population
    std, current row included). Output: (event_id, user_id, ts, cents,
    zscore, is_anomaly); is_anomaly requires |z| > z_thresh with at
    least ``min_n`` trailing observations.

    Scale shape: ONE window shuffle on user_id computes n/sum/sumsq
    over exact integer cents; mean/var/std/z are fixed-order double
    expressions over those exact operands, so both engines produce
    bit-identical IEEE results (rounded to 6 dp on output)."""
    base = events.select(
        "event_id", "user_id", "ts", _cents().alias("cents")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(window_rows - 1), 0)
    )
    n = F.count(F.lit(1)).over(w)
    s = F.sum("cents").over(w)
    ss = F.sum(F.col("cents") * F.col("cents")).over(w)
    stats = base.select(
        "event_id",
        "user_id",
        "ts",
        "cents",
        n.alias("n"),
        s.alias("s"),
        ss.alias("ss"),
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    ssd = F.col("ss").cast("double")
    mean = sd / nd
    var = F.greatest((ssd - sd * sd / nd) / nd, F.lit(0.0))
    std = F.sqrt(var)
    z = F.when(std > 0, (F.col("cents").cast("double") - mean) / std).otherwise(
        F.lit(0.0)
    )
    return stats.select(
        "event_id",
        "user_id",
        "ts",
        "cents",
        F.round(z, 6).alias("zscore"),
        ((F.abs(z) > F.lit(z_thresh)) & (F.col("n") >= min_n)).alias("is_anomaly"),
    )

"""st16 salted streaming interval join: (1) salting is LOSSLESS —
bit-identical output to the unsalted st3 join; (2) the epoch-partition
sink makes replayed epochs idempotent; (3) every purchase lands in
exactly one salt lane (the no-duplicate invariant salting rests on)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmall_flink_210726_spark.registry import load_all
from tests.conftest import SF_MED, SF_SMALL

SPECS = load_all()


class TestSaltedStreamingJoin:
    @pytest.mark.slow
    def test_bit_identical_to_unsalted_st3(self, spark):
        # sf0.01: the smallest scale where the 5-min interval join has
        # matches (sf0.001's windows are too sparse — 0 rows, vacuous)
        salted = SPECS["st16_stream_salted_interval_join"].fn(spark, SF_MED)
        plain = SPECS["st3_stream_interval_join"].fn(spark, SF_MED)
        s = {(r["purchase_id"], r["view_ct"]) for r in salted.collect()}
        p = {(r["purchase_id"], r["view_ct"]) for r in plain.collect()}
        assert s == p
        assert len(s) > 0

    def test_purchase_salts_cover_lanes(self, spark):
        # the fact side's deterministic salt must spread hot keys:
        # with hundreds of purchases, all 8 lanes get traffic
        from gmall_flink_210726_spark.sources.batch import load_table

        ev = load_table(spark, SF_SMALL, "events").filter(
            F.col("event_type") == "purchase"
        )
        lanes = (
            ev.select(
                F.pmod(F.xxhash64("event_id"), F.lit(8)).cast("int").alias("s")
            )
            .groupBy("s")
            .count()
            .collect()
        )
        assert len(lanes) == 8
        assert min(r["count"] for r in lanes) > 0

    def test_replayed_epoch_does_not_double_count(self, spark, tmp_path):
        # simulate a crash-after-write-before-commit retry: write the
        # same epoch's partials twice through the idempotent sink
        from gmall_flink_210726_spark.sinks import append_stats_exactly_once
        from gmall_flink_210726_spark.sources.batch import load_table

        out = str(tmp_path / "salted_replay")
        ev = load_table(spark, SF_SMALL, "events")
        p = ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_uid"),
            F.col("ts").alias("p_ts"),
        )
        v = ev.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("v_uid"), F.col("ts").alias("v_ts")
        )
        joined = p.join(
            v,
            (F.col("p_uid") == F.col("v_uid"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 300 SECOND"))
            & (F.col("v_ts") <= F.col("p_ts")),
        )
        partials = joined.groupBy("purchase_id").agg(
            F.count(F.lit(1)).cast("long").alias("view_ct")
        )
        append_stats_exactly_once(partials, 3, out)
        append_stats_exactly_once(partials, 3, out)  # the retry
        merged = (
            spark.read.parquet(out)
            .groupBy("purchase_id")
            .agg(F.sum("view_ct").cast("long").alias("view_ct"))
        )
        got = {(r["purchase_id"], r["view_ct"]) for r in merged.collect()}
        want = {
            (r["purchase_id"], r["view_ct"]) for r in partials.collect()
        }
        assert got == want

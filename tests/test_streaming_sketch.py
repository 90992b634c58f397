"""st9 streaming-sketch invariants: multi-epoch merge equals the
single-pass batch sketch, and an epoch RETRY (the at-least-once crash
case) leaves the merged cells unchanged — the idempotent
epoch-partition overwrite is what makes CMS additivity replay-safe."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from gmall_flink_210726_spark.operators.sketch import cms_cells, cms_probe
from gmall_flink_210726_spark.sinks import append_stats_exactly_once
from tests.conftest import SF_SMALL


def _cells_dict(df):
    return {(r.j, r.ctr): r.cell for r in df.collect()}


class TestStreamingCMSReplay:
    @pytest.fixture()
    def staged(self, spark):
        """events.parquet split into two staged files (two epochs)."""
        stage = tempfile.mkdtemp(prefix="st9_test_stage_")
        ev = spark.read.parquet(os.path.join(SF_SMALL, "events.parquet"))
        a = ev.where(F.col("event_id") % 2 == 0)
        b = ev.where(F.col("event_id") % 2 == 1)
        a.coalesce(1).write.parquet(os.path.join(stage, "00"))
        b.coalesce(1).write.parquet(os.path.join(stage, "01"))
        yield stage, ev
        shutil.rmtree(stage, ignore_errors=True)

    def test_multi_epoch_merge_and_retry_idempotence(self, spark, staged):
        stage, ev = staged
        out = tempfile.mkdtemp(prefix="st9_test_cells_")
        ckpt = tempfile.mkdtemp(prefix="st9_test_ckpt_")
        try:
            stream = (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .option("recursiveFileLookup", "true")
                .parquet(stage)
                .select("user_id")
            )

            epochs = []

            def _write(batch, epoch):
                epochs.append(epoch)
                counts = batch.groupBy("user_id").agg(
                    F.count(F.lit(1)).alias("ct")
                )
                append_stats_exactly_once(
                    cms_cells(counts, "user_id", "ct"), epoch, out
                )

            q = (
                stream.writeStream.foreachBatch(_write)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(300)
            q.stop()
            assert len(set(epochs)) >= 2  # really multi-epoch

            def merged():
                return (
                    spark.read.parquet(out)
                    .groupBy("j", "ctr")
                    .agg(F.sum("cell").alias("cell"))
                )

            batch_counts = ev.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("ct")
            )
            want = _cells_dict(cms_cells(batch_counts, "user_id", "ct"))
            assert _cells_dict(merged()) == want

            # RETRY: epoch 0's partial cells written again (crash after
            # write, before checkpoint commit) — overwrite, not append
            first = (
                spark.read.parquet(os.path.join(stage, "00"))
                .groupBy("user_id")
                .agg(F.count(F.lit(1)).alias("ct"))
            )
            append_stats_exactly_once(cms_cells(first, "user_id", "ct"), 0, out)
            assert _cells_dict(merged()) == want

            # probing the merged durable sketch returns >= truth per key
            probed = cms_probe(merged(), batch_counts, "user_id", "ct")
            assert all(r.cms_est >= r.exact_ct for r in probed.collect())
        finally:
            shutil.rmtree(out, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)


class TestStreamingHLLReplay:
    """st10's durable-register counterpart of the CMS case: MAX-merged
    HLL registers across epochs equal the single-pass batch registers,
    and a duplicated epoch write (retry after crash-before-commit)
    leaves the merged registers unchanged."""

    @pytest.fixture()
    def staged(self, spark):
        stage = tempfile.mkdtemp(prefix="st10_test_stage_")
        ev = spark.read.parquet(os.path.join(SF_SMALL, "events.parquet"))
        a = ev.where(F.col("event_id") % 2 == 0)
        b = ev.where(F.col("event_id") % 2 == 1)
        a.coalesce(1).write.parquet(os.path.join(stage, "00"))
        b.coalesce(1).write.parquet(os.path.join(stage, "01"))
        yield stage, ev
        shutil.rmtree(stage, ignore_errors=True)

    def test_hll_register_merge_and_retry_idempotence(self, spark, staged):
        from gmall_flink_210726_spark.operators.sketch import (
            hll_estimate_from_registers,
            hll_registers,
        )

        stage, ev = staged
        out = tempfile.mkdtemp(prefix="st10_test_regs_")
        ckpt = tempfile.mkdtemp(prefix="st10_test_ckpt_")
        try:
            stream = (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .option("recursiveFileLookup", "true")
                .parquet(stage)
                .select("user_id")
            )

            epochs = []

            def _write(batch, epoch):
                epochs.append(epoch)
                keyed = batch.select("user_id").distinct()
                append_stats_exactly_once(
                    hll_registers(keyed, [], "user_id"), epoch, out
                )

            q = (
                stream.writeStream.foreachBatch(_write)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(300)
            q.stop()
            assert len(set(epochs)) >= 2

            def merged():
                return (
                    spark.read.parquet(out)
                    .groupBy("reg")
                    .agg(F.max("m").alias("m"))
                )

            def regs_dict(df):
                return {r.reg: r.m for r in df.collect()}

            want = regs_dict(
                hll_registers(ev.select("user_id").distinct(), [], "user_id")
            )
            assert regs_dict(merged()) == want

            # RETRY: epoch 0's registers written again — overwrite of
            # the same epoch partition, so MAX-merge is unchanged
            first = (
                spark.read.parquet(os.path.join(stage, "00"))
                .select("user_id")
                .distinct()
            )
            append_stats_exactly_once(hll_registers(first, [], "user_id"), 0, out)
            assert regs_dict(merged()) == want

            # the merged durable registers estimate tracks the exact
            # distinct within HLL error (loose 15% gate at m=256)
            est = hll_estimate_from_registers(
                merged().withColumn("scope", F.lit("all")), ["scope"]
            ).collect()[0]["hll_estimate"]
            exact = ev.select("user_id").distinct().count()
            assert abs(est - exact) / exact < 0.15
        finally:
            shutil.rmtree(out, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)


class TestStreamingBloomReplay:
    def test_bit_union_replay_and_duplicate_insensitivity(self, spark):
        """The Bloom bit set is OR-merged: a retried epoch AND an epoch
        whose keys fully overlap another's both leave the merged filter
        identical to the single-pass batch filter."""
        m_bits, k = 512, 4
        ev = spark.read.parquet(os.path.join(SF_SMALL, "events.parquet"))
        keys = ev.select("user_id").distinct()

        def bits_of(df):
            ks = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
            bit = (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":", F.col("j"), F.col("user_id").cast("string")
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.lit(m_bits)
            ).alias("bit")
            return df.select("user_id", ks).select(bit).distinct()

        out = tempfile.mkdtemp(prefix="st12_test_bits_")
        try:
            half_a = keys.where(F.col("user_id") % 2 == 0)
            half_b = keys.where(F.col("user_id") % 2 == 1)
            append_stats_exactly_once(bits_of(half_a), 0, out)
            append_stats_exactly_once(bits_of(half_b), 1, out)
            want = {r.bit for r in bits_of(keys).collect()}
            merged = lambda: {  # noqa: E731
                r.bit
                for r in spark.read.parquet(out).select("bit").distinct().collect()
            }
            assert merged() == want
            # retry epoch 0 (same partial twice) — unchanged
            append_stats_exactly_once(bits_of(half_a), 0, out)
            assert merged() == want
            # a THIRD epoch fully overlapping epoch 1 — set-union is
            # duplicate-insensitive, still unchanged
            append_stats_exactly_once(bits_of(half_b), 2, out)
            assert merged() == want
        finally:
            shutil.rmtree(out, ignore_errors=True)


class TestUpsertReplay:
    """st14 upsert materialization: the serve-time argmax merge must be
    idempotent under epoch RETRY (duplicated partials) and correct
    under multi-epoch splits where a key's latest op moves epochs."""

    def _partials(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, last_type string, last_cents long, last_ts_us long"
        )

    def test_argmax_merge_and_tombstone(self, spark):
        from gmall_flink_210726_spark.queries.streamq3 import upsert_serve

        rows = [
            (1, "view", 100, 10),
            (1, "purchase", 250, 20),  # latest for key 1
            (2, "signup", 0, 5),
            (2, "error", 0, 9),  # tombstone is latest -> key absent
            (3, "error", 0, 3),
            (3, "click", 70, 8),  # delete superseded -> key present
        ]
        got = {r.user_id: (r.last_type, r.last_cents) for r in
               upsert_serve(self._partials(spark, rows)).collect()}
        assert got == {1: ("purchase", 250), 3: ("click", 70)}

    def test_epoch_retry_is_idempotent(self, spark):
        """Writing the SAME epoch twice through the idempotent sink (the
        crash-after-write-before-commit replay) leaves the served table
        unchanged; a naive append sink would double rows and could not
        change argmax output either — so also simulate the harsher
        case: duplicated partials unioned (at-least-once without the
        sink), which argmax STILL absorbs."""
        import os
        import shutil
        import tempfile

        from gmall_flink_210726_spark.queries.streamq3 import upsert_serve

        out = tempfile.mkdtemp(prefix="st14_test_replay_")
        try:
            e0 = self._partials(
                spark, [(1, "view", 100, 10), (2, "signup", 0, 5)]
            )
            e1 = self._partials(
                spark, [(1, "purchase", 250, 20), (2, "error", 0, 9)]
            )
            append_stats_exactly_once(e0, 0, out)
            append_stats_exactly_once(e1, 1, out)
            base = sorted(
                map(tuple, upsert_serve(spark.read.parquet(out)).collect())
            )
            # retry epoch 1: overwrite same partition with same rows
            append_stats_exactly_once(e1, 1, out)
            retried = sorted(
                map(tuple, upsert_serve(spark.read.parquet(out)).collect())
            )
            assert retried == base
            # harsher: duplicated partials with no sink dedup
            dup = upsert_serve(
                spark.read.parquet(out).unionAll(
                    e1.withColumn("epoch_id", F.lit(1))
                )
            )
            assert sorted(map(tuple, dup.collect())) == base
            assert base == [(1, "purchase", 250, 20)]
            assert os.path.isdir(out)
        finally:
            shutil.rmtree(out, ignore_errors=True)

    def test_split_vs_batch_agreement(self, spark):
        """Per-epoch batch-latest partials merged at serve equal the
        single-pass batch answer regardless of how events split across
        epochs (keys straddle the boundary)."""
        from gmall_flink_210726_spark.queries.streamq3 import upsert_serve

        from gmall_flink_210726_spark.sources.batch import load_table

        ev = load_table(spark, SF_SMALL, "events").select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.round(F.col("value") * 100).cast("long").alias("last_cents"),
            F.unix_micros(F.col("ts")).alias("last_ts_us"),
        )
        batch = sorted(map(tuple, upsert_serve(ev).collect()))

        def batch_latest(df):
            return (
                df.groupBy("user_id")
                .agg(
                    F.max_by(
                        F.struct("last_type", "last_cents", "last_ts_us"),
                        F.col("last_ts_us"),
                    ).alias("s")
                )
                .select("user_id", "s.*")
            )

        parts = [
            batch_latest(ev.where(F.col("last_ts_us") % 3 == i)) for i in range(3)
        ]
        merged = parts[0].unionAll(parts[1]).unionAll(parts[2])
        assert sorted(map(tuple, upsert_serve(merged).collect())) == batch

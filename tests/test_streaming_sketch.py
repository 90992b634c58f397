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

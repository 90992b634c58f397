#!/usr/bin/env python
"""Round-15 profiling: split st26_stream_kafka_ingest end-to-end cost
into synthesis+src-write / stream-run (per micro-batch) / readback, per
VERDICT.md next-round item 1. Run: python scripts/profile_st26.py"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gmall_flink_210726_spark.registry import load_all
from gmall_flink_210726_spark.session import default_cpus, get_spark, ship_package

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("profile-st26", cpus=default_cpus())
    ship_package(spark)
    load_all()
    # warm python + streaming machinery like bench.py does
    spark.range(0, 64, 1, default_cpus()).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    warm_dir = tempfile.mkdtemp(prefix="stwarm_")
    spark.range(0, 32).write.mode("overwrite").parquet(warm_dir)
    wq = (
        spark.readStream.schema("id long").parquet(warm_dir)
        .groupBy("id").count()
        .writeStream.format("memory").queryName("stwarm")
        .outputMode("update").trigger(availableNow=True).start()
    )
    wq.awaitTermination(120)
    wq.stop()
    shutil.rmtree(warm_dir, ignore_errors=True)

    from gmall_flink_210726_spark.operators.kafkalog import (
        kafka_segment_stats,
        synthesize_kafka_media,
    )
    from gmall_flink_210726_spark.sources.batch import load_table
    from gmall_flink_210726_spark.sinks import append_stats_exactly_once
    from gmall_flink_210726_spark.streaming.pipelines import write_foreach_batch

    for rep in range(2):
        src = tempfile.mkdtemp(prefix="st26_src_")
        out = tempfile.mkdtemp(prefix="st26_out_")
        ckpt = tempfile.mkdtemp(prefix="st26_ckpt_")
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        marks = {}
        t0 = time.perf_counter()
        try:
            (
                synthesize_kafka_media(load_table(spark, SF_DIR, "documents"))
                .repartition(32)
                .write.mode("overwrite")
                .parquet(src)
            )
            marks["synth+src_write"] = time.perf_counter() - t0
            t1 = time.perf_counter()
            schema = spark.read.parquet(src).schema
            marks["schema_read"] = time.perf_counter() - t1
            t2 = time.perf_counter()
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 16)
                .parquet(src)
            )
            decoded = kafka_segment_stats(stream)

            batch_times = []

            def _write_partials(batch, epoch):
                bt0 = time.perf_counter()
                partials = batch.groupBy(
                    (F.col("media_id") % 10).alias("bucket")
                ).agg(
                    F.count(F.lit(1)).cast("long").alias("n_segments"),
                    F.sum((F.col("format") == "kafka").cast("long")).cast("long").alias("n_ok"),
                    F.sum("n_batches").cast("long").alias("n_batches"),
                    F.sum("n_records").cast("long").alias("n_records"),
                    F.sum("payload_sum").cast("long").alias("payload_sum"),
                )
                append_stats_exactly_once(partials, epoch, out)
                batch_times.append((epoch, time.perf_counter() - bt0))

            spark.conf.set("spark.sql.shuffle.partitions", "8")
            q = write_foreach_batch(decoded, _write_partials, checkpoint_dir=ckpt)
            q.awaitTermination(600)
            # pull per-batch durations from streaming progress
            prog = [
                (p["batchId"], p["durationMs"], p["numInputRows"])
                for p in (q.recentProgress or [])
            ]
            q.stop()
            marks["stream_total"] = time.perf_counter() - t2
            t3 = time.perf_counter()
            result = (
                spark.read.parquet(out)
                .groupBy("bucket")
                .agg(
                    F.sum("n_segments").cast("long").alias("n_segments"),
                    F.sum("n_ok").cast("long").alias("n_ok"),
                    F.sum("n_batches").cast("long").alias("n_batches"),
                    F.sum("n_records").cast("long").alias("n_records"),
                    F.sum("payload_sum").cast("long").alias("payload_sum"),
                )
                .localCheckpoint(eager=True)
            )
            marks["readback+final_agg"] = time.perf_counter() - t3
            result.write.format("noop").mode("overwrite").save()
            marks["TOTAL"] = time.perf_counter() - t0
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            shutil.rmtree(src, ignore_errors=True)
            shutil.rmtree(out, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)
        print(f"--- rep {rep} ---")
        for k, v in marks.items():
            print(f"{k:24s} {v:7.3f}s")
        print("foreachBatch fn times:", [(e, round(t, 3)) for e, t in batch_times])
        for bid, dur, rows in prog:
            print(f"batch {bid}: rows={rows} durations={dur}")
    spark.stop()


if __name__ == "__main__":
    main()

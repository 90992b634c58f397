#!/usr/bin/env python
"""Round-15 A/B: does moving the 32-way repartition BEFORE media
synthesis (shuffle doc_ids, not blobs — guide §8) cut the src-write
phase of the stream-ingest twins? Times 3 reps of each variant on
st26's kafka synthesis."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_flink_210726_spark.session import default_cpus, get_spark, ship_package
from gmall_flink_210726_spark.sources.batch import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("ab-synth", cpus=default_cpus())
    ship_package(spark)
    spark.range(0, 64, 1, default_cpus()).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    from gmall_flink_210726_spark.operators import kafkalog
    from gmall_flink_210726_spark.operators.multimodal import MEDIA_SCHEMA
    import pandas as pd

    docs = load_table(spark, SF_DIR, "documents")

    def variant_a():
        src = tempfile.mkdtemp(prefix="ab_a_")
        t0 = time.perf_counter()
        (
            kafkalog.synthesize_kafka_media(docs)
            .repartition(32)
            .write.mode("overwrite")
            .parquet(src)
        )
        dt = time.perf_counter() - t0
        nfiles = len([f for f in os.listdir(src) if f.endswith(".parquet")])
        shutil.rmtree(src, ignore_errors=True)
        return dt, nfiles

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": [kafkalog._make_kafka_segment(int(i)) for i in ids],
                    "meta": [
                        {"format": "kafka", "width": 0, "height": 0, "sample_rate": 0}
                        for _ in ids
                    ],
                }
            )

    def variant_b():
        src = tempfile.mkdtemp(prefix="ab_b_")
        t0 = time.perf_counter()
        (
            docs.select("doc_id")
            .repartition(32)
            .mapInPandas(gen, MEDIA_SCHEMA)
            .write.mode("overwrite")
            .parquet(src)
        )
        dt = time.perf_counter() - t0
        nfiles = len([f for f in os.listdir(src) if f.endswith(".parquet")])
        shutil.rmtree(src, ignore_errors=True)
        return dt, nfiles

    for name, fn in (("A post-synth repartition", variant_a), ("B pre-synth repartition", variant_b)):
        times = [fn() for _ in range(3)]
        print(name, [f"{t:.3f}s files={n}" for t, n in times])
    spark.stop()


if __name__ == "__main__":
    main()

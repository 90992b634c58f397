"""R3/K2 streaming — one foreachBatch writing every route from a single
persisted micro-batch (SURVEY §7.4 risk 5)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from gmall_flink_210726_spark.sinks import append_stats_table
from gmall_flink_210726_spark.streaming.pipelines import (
    route_batch_to_sinks,
    write_foreach_batch,
)


def test_one_batch_three_sinks(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"event_type": "purchase", "v": 1},
        {"event_type": "purchase", "v": 2},
        {"event_type": "click", "v": 3},
        {"event_type": "view", "v": 4},
        {"event_type": "error", "v": 5},  # matches no route → dropped
    ]
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in rows))

    out_root = str(tmp_path / "routes")
    routes = {
        "dwd_order": F.col("event_type") == "purchase",
        "dwd_click": F.col("event_type") == "click",
        "dim_display": F.col("event_type") == "view",
    }

    def sink(batch, epoch):
        route_batch_to_sinks(
            batch,
            routes,
            lambda name, df: append_stats_table(df, os.path.join(out_root, name)),
        )

    stream = spark.readStream.schema("event_type string, v long").json(str(src))
    q = write_foreach_batch(stream, sink, str(tmp_path / "ckpt"))
    q.awaitTermination()

    got = {
        name: sorted(r.v for r in spark.read.parquet(os.path.join(out_root, name)).collect())
        for name in routes
    }
    assert got == {"dwd_order": [1, 2], "dwd_click": [3], "dim_display": [4]}
    # unmatched route rows land nowhere
    assert not os.path.exists(os.path.join(out_root, "error"))

"""Tests for the sink family (K3-K5), Kafka record helpers (K1/K2),
the checkpointed foreachBatch sink (T9), and the ADS serving layer."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from gmall_flink_210726_spark import sinks
from gmall_flink_210726_spark.plans import ads
from gmall_flink_210726_spark.sources.kafka import to_kafka_dynamic, to_kafka_records


class TestDimStore:
    def test_create_if_not_exists(self, spark, tmp_path):
        path = str(tmp_path / "dim_user")
        schema = StructType([StructField("id", StringType()), StructField("name", StringType())])
        assert sinks.create_table_if_not_exists(spark, path, schema) is True
        assert sinks.create_table_if_not_exists(spark, path, schema) is False
        assert spark.read.parquet(path).count() == 0

    def test_upsert_insert_update_preserve(self, spark, tmp_path):
        path = str(tmp_path / "dim_sku")
        v1 = spark.createDataFrame(
            [("1", "a"), ("2", "b"), ("3", "c")], ["id", "name"]
        )
        sinks.upsert_dim_table(spark, path, v1, pk="id")
        v2 = spark.createDataFrame([("2", "B2"), ("4", "d")], ["id", "name"])
        sinks.upsert_dim_table(spark, path, v2, pk="id")
        got = {r.id: r.name for r in sinks.read_dim_table(spark, path).collect()}
        assert got == {"1": "a", "2": "B2", "3": "c", "4": "d"}

    def test_upsert_latest_wins_within_batch(self, spark, tmp_path):
        path = str(tmp_path / "dim_x")
        batch = spark.createDataFrame(
            [("1", "old", 1), ("1", "new", 2)], ["id", "name", "ver"]
        )
        sinks.upsert_dim_table(spark, path, batch, pk="id", order_col="ver")
        got = sinks.read_dim_table(spark, path).collect()
        assert len(got) == 1 and got[0].name == "new"

    def test_append_stats(self, spark, tmp_path):
        path = str(tmp_path / "stats")
        df = spark.createDataFrame([(1,)], ["x"])
        sinks.append_stats_table(df, path)
        sinks.append_stats_table(df, path)
        assert spark.read.parquet(path).count() == 2


class TestKafkaRecordHelpers:
    def test_to_kafka_records_roundtrip(self, spark):
        df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
        recs = to_kafka_records(df, key=F.col("id")).collect()
        assert {r.key for r in recs} == {"1", "2"}
        payload = json.loads([r.value for r in recs if r.key == "1"][0])
        assert payload == {"id": 1, "name": "a"}

    def test_to_kafka_dynamic_topic_column(self, spark):
        df = spark.createDataFrame(
            [("dwd_a", "x"), ("dwd_b", "y")], ["sink_table", "payload"]
        )
        out = to_kafka_dynamic(df, "sink_table", "payload").collect()
        assert {(r.topic, r.value) for r in out} == {("dwd_a", "x"), ("dwd_b", "y")}


class TestForeachBatchExactlyOnce:
    def test_checkpoint_prevents_reprocessing(self, spark, tmp_path):
        """T9/K3 — a restarted availableNow query with the same
        checkpoint must not re-append already-committed batches."""
        from gmall_flink_210726_spark.streaming.pipelines import write_foreach_batch

        src_dir, out, ckpt = tmp_path / "src", str(tmp_path / "out"), str(tmp_path / "ckpt")
        src_dir.mkdir()
        (src_dir / "a.json").write_text('{"x": 1}\n{"x": 2}\n')

        stream = spark.readStream.schema("x long").json(str(src_dir))
        q = write_foreach_batch(
            stream, lambda df, epoch: sinks.append_stats_table(df, out), ckpt
        )
        q.awaitTermination()
        assert spark.read.parquet(out).count() == 2

        # restart with no new data: nothing must be appended
        q2 = write_foreach_batch(
            stream, lambda df, epoch: sinks.append_stats_table(df, out), ckpt
        )
        q2.awaitTermination()
        assert spark.read.parquet(out).count() == 2

        # new file arrives → only its rows are appended
        (src_dir / "b.json").write_text('{"x": 3}\n')
        q3 = write_foreach_batch(
            stream, lambda df, epoch: sinks.append_stats_table(df, out), ckpt
        )
        q3.awaitTermination()
        assert sorted(r.x for r in spark.read.parquet(out).collect()) == [1, 2, 3]


@pytest.fixture(scope="module")
def stats(spark):
    product = spark.createDataFrame(
        [
            ("2024-06-01 10:00:00", 1, "sku 1", "1", "brand 1", "1", "cat 1", 100.0, 2),
            ("2024-06-01 11:00:00", 2, "sku 2", "2", "brand 2", "2", "cat 2", 300.0, 1),
            ("2024-06-02 10:00:00", 1, "sku 1", "1", "brand 1", "1", "cat 1", 50.0, 1),
        ],
        "stt string, sku_id long, sku_name string, tm_id string, tm_name string, "
        "category3_id string, category3_name string, order_amount double, order_ct long",
    )
    visitor = spark.createDataFrame(
        [
            ("2024-06-01 10:00:00", "1", 5, 20, 4, 1, 1000),
            ("2024-06-01 10:00:10", "0", 7, 50, 6, 2, 2000),
            ("2024-06-02 09:00:00", "0", 3, 10, 2, 0, 500),
        ],
        "stt string, is_new string, uv_ct long, pv_ct long, sv_ct long, uj_ct long, dur_sum long",
    )
    keyword = spark.createDataFrame(
        [
            ("2024-06-01 10:00:00", "spark", 3),
            ("2024-06-01 10:00:10", "spark", 2),
            ("2024-06-01 10:00:10", "engine", 4),
            ("2024-06-02 10:00:00", "other", 9),
        ],
        "stt string, keyword string, ct long",
    )
    return {"product": product, "visitor": visitor, "keyword": keyword}


class TestAds:
    def test_gmv_by_date(self, stats):
        assert ads.gmv_by_date(stats["product"], "2024-06-01").first().gmv == 400.0
        assert ads.gmv_by_date(stats["product"], "2024-06-02").first().gmv == 50.0

    def test_trademark_ranking(self, stats):
        rows = ads.product_stats_by_trademark(stats["product"], "2024-06-01").collect()
        assert [(r.tm_name, r.order_amount) for r in rows] == [("brand 2", 300.0), ("brand 1", 100.0)]

    def test_visitor_by_hour_and_new_flag(self, stats):
        hours = {r.hr: r.pv_ct for r in ads.visitor_stats_by_hour(stats["visitor"], "2024-06-01").collect()}
        assert hours == {10: 70}
        flags = {r.is_new: r.uv_ct for r in ads.visitor_stats_by_new_flag(stats["visitor"], "2024-06-01").collect()}
        assert flags == {"1": 5, "0": 7}

    def test_keyword_top(self, stats):
        rows = ads.keyword_top(stats["keyword"], "2024-06-01").collect()
        assert [(r.keyword, r.ct) for r in rows] == [("spark", 5), ("engine", 4)]

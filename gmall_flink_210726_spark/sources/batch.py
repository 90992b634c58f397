"""Batch sources: the driver's TPC-H-ish parquet tables + generic readers.

The reference consumes Kafka topics (util/MyKafkaUtil.java:32-37); the
batch-replay mode of this engine treats a directory of parquet/JSON files
as the replayed topic. Parquet scans get predicate pushdown + column
pruning from Catalyst for free — the reference's manual column pruning
(func/TableProcessFunction.java:71-77) is subsumed for these paths.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Driver-generated tables (TESTDATA.md). One parquet file per table.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
        # rejects outright. nanosAsLong must be set BEFORE the read is
        # planned (externally-built driver sessions don't have it);
        # it reads ts as epoch-nanos bigint, and DIV keeps the
        # nanos→micros conversion in exact integer arithmetic.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the spark.sql surface,
    ≈ the reference's Flink SQL DDL at util/MyKafkaUtil.java:40-48)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def read_json_events(spark: SparkSession, path: str, schema) -> DataFrame:
    """Raw behavior-log JSON lines with corrupt-record capture (P1 —
    ≈ the dirty side output at dwd/BaseLogApp.java:51-63)."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )

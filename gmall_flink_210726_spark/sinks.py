"""Sinks — K3/K4/K5/K6 (SURVEY §2.2).

The reference writes dimension rows to Phoenix/HBase with hand-built
upsert SQL + auto-DDL (func/DimSinkFunction.java:28-72,
func/TableProcessFunction.java:97-148) and stats rows to ClickHouse via
a reflective JDBC batcher (util/ClickHouseUtil.java:16-54).

Spark-first equivalents on a parquet-backed store (no Delta jar in this
environment — with Delta, ``upsert_dim_table`` is literally
``MERGE INTO dim USING updates ON pk``; the emulation below is the
documented anti-join + union pattern):

- K4 ``upsert_dim_table``  — last-write-wins upsert by primary key.
- K5 ``create_table_if_not_exists`` — schema-only bootstrap (the
  reference's all-varchar auto-DDL).
- K3 ``append_stats_table`` — whole-micro-batch append (the JDBC
  batch of 2 rows / 2 s becomes the trigger interval).
- K6 ``debug_sink`` — console.

Scale note: the upsert shuffles the existing table once on the pk
anti-join; at warehouse scale this is exactly what a Delta MERGE plans
(minus file-level pruning). Updates are deduped to one row per pk
(latest by a monotonic column when given) before merging.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def create_table_if_not_exists(
    spark: SparkSession, path: str, schema: StructType
) -> bool:
    """K5 — bootstrap an empty parquet table with a declared schema.
    Returns True when the table was created. (The reference's Phoenix
    DDL at func/TableProcessFunction.java:107-130 — including its
    'if not exist' typo and never-executed statement — is intended
    semantics here.)"""
    if os.path.exists(path):
        return False
    spark.createDataFrame([], schema).write.parquet(path)
    return True


def upsert_dim_table(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    pk: str,
    order_col: str | None = None,
) -> None:
    """K4 — upsert (insert-or-replace by pk) into a parquet dim table.

    Equivalent of the reference's Phoenix `upsert into` per row
    (func/DimSinkFunction.java:59-72) done set-at-a-time: existing rows
    whose pk appears in the batch are replaced, others kept. The Redis
    cache invalidation at :39 is obsolete — readers broadcast the dim
    per micro-batch (SURVEY §2.6 J2).
    """
    if order_col is not None:
        w = Window.partitionBy(pk).orderBy(F.col(order_col).desc())
        updates = (
            updates.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        updates = updates.dropDuplicates([pk])

    if os.path.exists(path):
        current = spark.read.parquet(path)
        kept = current.join(updates.select(pk), pk, "left_anti")
        merged = kept.unionByName(updates, allowMissingColumns=True)
    else:
        merged = updates
    # swap order matters: move the OLD table aside first and delete it
    # last, so a crash at any point leaves either the old or the new
    # copy at a recoverable location — never neither. (Local-FS only,
    # like the rest of this emulation; a real deployment is Delta
    # MERGE, where the swap is a transactional commit and concurrent
    # readers see a consistent snapshot.)
    tmp = f"{path}__tmp_upsert"
    old = f"{path}__old_upsert"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)
    had_prev = os.path.exists(path)
    if had_prev:
        os.rename(path, old)
    os.rename(tmp, path)
    if had_prev:
        shutil.rmtree(old)


def append_stats_table(df: DataFrame, path: str) -> None:
    """K3 — append a (micro-)batch to a stats table; the whole batch is
    one atomic append (≈ exactly-once when driven by a checkpointed
    foreachBatch, streaming/pipelines.write_foreach_batch)."""
    df.write.mode("append").parquet(path)


def append_stats_exactly_once(df: DataFrame, epoch_id: int, path: str) -> None:
    """K3/T9 — idempotent micro-batch append: each epoch writes its own
    ``epoch_id=N`` partition with overwrite, so a RETRIED epoch (crash
    after write, before checkpoint commit) replaces rather than
    duplicates its rows. This closes the at-least-once gap plain
    append() leaves; readers just scan ``path`` (partition column is
    pruned like any other).

        stream.writeStream.foreachBatch(
            lambda b, e: append_stats_exactly_once(b, e, out)) ...
    """
    df.write.mode("overwrite").parquet(os.path.join(path, f"epoch_id={epoch_id}"))


def debug_sink(df: DataFrame, n: int = 20) -> None:
    """K6 — the reference's `.print()` (dwd/BaseDBApp.java:89-90)."""
    df.show(n, truncate=False)

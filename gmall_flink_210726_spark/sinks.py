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


_POINTER = "_CURRENT"


def _current_version(path: str) -> str | None:
    """Name of the committed version dir (``v{n}``) or None when `path`
    is absent / a legacy flat-parquet table / an empty bootstrap."""
    ptr = os.path.join(path, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        name = f.read().strip()
    return name or None


def read_dim_table(spark: SparkSession, path: str) -> DataFrame:
    """Reader for a dim table written by ``upsert_dim_table``: resolve
    the ``_CURRENT`` pointer to the committed version dir. Falls back to
    reading `path` directly for legacy flat-parquet tables (including
    ``create_table_if_not_exists`` bootstraps)."""
    cur = _current_version(path)
    if cur is not None:
        return spark.read.parquet(os.path.join(path, cur))
    return spark.read.parquet(path)


def upsert_dim_table(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    pk: str,
    order_col: str | None = None,
    keep_versions: int = 2,
) -> None:
    """K4 — upsert (insert-or-replace by pk) into a parquet dim table.

    Equivalent of the reference's Phoenix `upsert into` per row
    (func/DimSinkFunction.java:59-72) done set-at-a-time: existing rows
    whose pk appears in the batch are replaced, others kept. The Redis
    cache invalidation at :39 is obsolete — readers broadcast the dim
    per micro-batch (SURVEY §2.6 J2).

    Commit protocol — version dirs + atomic pointer (the same shape as
    a Delta/Iceberg commit, minus the log): each upsert writes a fresh
    ``path/v{n+1}/`` parquet dir, then atomically replaces the one-line
    ``path/_CURRENT`` pointer file via ``os.replace`` (POSIX rename is
    atomic). A crash at ANY point leaves the pointer naming a complete
    version: before the rename readers still see ``v{n}``; after it
    they see ``v{n+1}``. Concurrent readers that resolved the pointer
    just before a commit keep reading their (still-present) ``v{n}``
    dir — the previous ``keep_versions - 1`` versions are retained and
    only older ones are GC'd, after the commit. Use ``read_dim_table``
    to read; it also understands legacy flat-parquet layouts and
    migrates them on the next upsert.
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

    cur = _current_version(path)
    legacy = cur is None and os.path.exists(path)
    if cur is not None:
        current = spark.read.parquet(os.path.join(path, cur))
        cur_n = int(cur[1:])
    elif legacy:
        current = spark.read.parquet(path)  # flat layout: migrate below
        cur_n = 0
    else:
        current = None
        cur_n = 0

    if current is not None:
        kept = current.join(updates.select(pk), pk, "left_anti")
        merged = kept.unionByName(updates, allowMissingColumns=True)
    else:
        merged = updates

    next_v = f"v{cur_n + 1}"
    if legacy:
        # force the merge plan to materialize BEFORE writing under
        # `path`: the source files sit flat in `path` itself and the
        # listing must not pick up the new version dir mid-write
        merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(os.path.join(path, next_v))
    # ---- commit point: atomic pointer replace ----
    tmp_ptr = os.path.join(path, f"{_POINTER}.tmp")
    with open(tmp_ptr, "w") as f:
        f.write(next_v + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp_ptr, os.path.join(path, _POINTER))
    # ---- post-commit GC (crash here is harmless: extra files only) ----
    if legacy:
        for name in os.listdir(path):
            full = os.path.join(path, name)
            if os.path.isfile(full) and name not in (_POINTER,):
                os.remove(full)  # old flat parquet/_SUCCESS files
    floor = cur_n + 2 - max(keep_versions, 1)
    for name in os.listdir(path):
        if name.startswith("v") and name[1:].isdigit() and int(name[1:]) < floor:
            shutil.rmtree(os.path.join(path, name), ignore_errors=True)


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

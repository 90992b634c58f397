"""SparkSession factory.

The reference configures each Flink app by hand (parallelism, checkpoint
interval, state backend — e.g. dwd/BaseLogApp.java:31-44). Here one
factory produces a session whose defaults are chosen for the execution
tier:

- local[N] testing: shuffle partitions ≈ cores, AQE on, Arrow on.
- cluster (100 TB target): same declarative plans; AQE handles runtime
  coalescing/skew, so the only per-deployment knobs are cores/memory.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def ship_package(spark: SparkSession) -> None:
    """Make this package importable by executor Python workers.

    Module-level Python functions (UDFs, applyInPandasWithState handlers)
    are pickled *by reference* — workers re-import the defining module.
    When the driver process runs from another cwd (the spark-graft
    driver does), the package isn't on the workers' path; shipping a
    zip via addPyFile fixes that once per SparkContext.
    """
    sc = spark.sparkContext
    if getattr(sc, "_gmall_pkg_shipped", False):
        return
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    stem = os.path.join(tempfile.gettempdir(), f"gmall_pkg_{os.getpid()}")
    archive = shutil.make_archive(
        stem, "zip", root_dir=os.path.dirname(pkg_dir), base_dir=os.path.basename(pkg_dir)
    )
    sc.addPyFile(archive)
    sc._gmall_pkg_shipped = True


def ensure_parallelism(df, min_partitions: int | None = None):
    """Round-robin repartition IFF the plan's scan parallelism is below
    the cluster's core count.

    Per-row-heavy operators (shingling, signatures, matmuls) inherit the
    scan's partitioning. A small benchmark table is often a single
    parquet file → a single input split → one task doing all the Python/
    codegen work while every other core idles. At real scale (100 TB =
    many splits) the condition is false and this is a NO-OP — no extra
    shuffle is ever added on big inputs; on small ones the shuffle moves
    only the operator's projected columns (call after .select).
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    # probe scan parallelism via the file list (sub-ms) instead of
    # df.rdd.getNumPartitions(), which forces a full physical plan
    # (~1 s of driver time per call). File count underestimates split
    # count for multi-split files; the worst case is an unnecessary
    # repartition of a small input, never a lost split.
    try:
        n_inputs = len(df.inputFiles())
    except Exception:
        n_inputs = 0
    if n_inputs == 0:
        n_inputs = df.rdd.getNumPartitions()
    if n_inputs < target:
        return df.repartition(target)
    return df


def default_cpus() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return int(env)
    return os.cpu_count() or 4


def get_spark(
    app_name: str = "gmall_flink_210726_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    Session timezone is pinned to UTC so event-time semantics are
    deterministic and oracle-comparable (DuckDB timestamps are UTC-naive).
    """
    cpus = cpus or default_cpus()
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # testdata timestamps are parquet TIMESTAMP(isAdjustedToUTC=false);
        # read them as TimestampType UTC instants (not TIMESTAMP_NTZ) so
        # unix_micros()/window() apply and values match the UTC-naive
        # DuckDB oracle under the UTC session timezone pinned above
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Keep shuffle spill + broadcast thresholds at defaults; AQE
        # auto-broadcasts small sides and coalesces tiny partitions.
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""Analytics extras, wave 11 (round 9): storage-layout scale levers.

x49 is the partition-pruning sibling of x45's bucketing: bucketing
removes the JOIN shuffle, partitioned layout removes the SCAN itself —
a month-filtered query over a month-partitioned table must read one
directory, not all of them. x50 is Z-order (Morton) clustering — the
multi-dimensional layout lever (Delta OPTIMIZE ZORDER's public core):
interleaving the bits of two filter columns makes ONE sort order serve
range filters on BOTH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_210726_spark.registry import register
from gmall_flink_210726_spark.sources.batch import load_table


@register(
    "x49_partition_pruning",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders
    WHERE strftime(o_orderdate, '%Y') = '1995'
    GROUP BY 1
    """,
    doc="Partition pruning as a first-class layout lever (x45's "
    "bucketing removes the JOIN shuffle; partitioned layout removes "
    "the SCAN): orders are written out partitioned by month "
    "(pay-at-ingest, exactly how a 100 TB fact table is laid down), "
    "and the year-filtered read must touch ONLY the matching month "
    "directories — tests/test_plans.py pins PartitionFilters on the "
    "scan and that partition count collapses from all months to 12. "
    "Revenue sums as exact per-row cents. The filter is applied on "
    "the PARTITION COLUMN so pruning happens at planning time, "
    "before any file is opened. Bench note: ~90% of this query's "
    "wall time is the in-query partitioned WRITE of the whole orders "
    "table (the deliberate pay-once ingest); the pruned read itself "
    "is planning-time file elimination and costs almost nothing — "
    "do not read the bench number as read latency.",
    tags=("analytics", "layout", "scan"),
)
def x49_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="x49_part_")
    try:
        (
            load_table(spark, sf_dir, "orders")
            .select(
                F.date_format("o_orderdate", "yyyy-MM").alias("month"),
                F.round(F.col("o_totalprice") * 100)
                .cast("long")
                .alias("cents"),
            )
            # cluster by the partition column before the write (guide
            # §6, round 15): partitionBy from N scan tasks otherwise
            # emits N files per month directory — the classic
            # small-files ingest tax paid again at read time
            .repartition("month")
            .write.partitionBy("month")
            .mode("overwrite")
            .parquet(out)
        )
        result = (
            spark.read.parquet(out)
            .where(F.col("month").startswith("1995-"))
            .groupBy("month")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.sum("cents").cast("long").alias("revenue_cents"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return result


@register(
    "x50_zorder_locality",
    oracle="""
    WITH g AS (SELECT user_id % 256 AS a, event_id % 256 AS b
               FROM events),
    z AS (SELECT a, b,
                 list_sum([(((a >> k) & 1) << (2*k))
                           + (((b >> k) & 1) << (2*k + 1))
                           for k in range(0, 8)]) AS zval
          FROM g)
    SELECT CAST(zval // 256 AS BIGINT) AS z_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(a) AS BIGINT) AS a_min,
           CAST(MAX(a) AS BIGINT) AS a_max,
           CAST(MIN(b) AS BIGINT) AS b_min,
           CAST(MAX(b) AS BIGINT) AS b_max
    FROM z GROUP BY 1
    """,
    doc="Z-order (Morton) clustering — the multi-dimensional layout "
    "lever behind Delta's OPTIMIZE ZORDER (public technique: bit-"
    "interleave the filter columns so ONE sort order serves range "
    "predicates on BOTH): each event's (user_id, event_id) grid "
    "coords interleave 8+8 bits into a 16-bit z-value, rows group by "
    "the z-value's top byte (= the layout's file/bucket id), and the "
    "output carries per-bucket min/max of BOTH dims — every bucket "
    "spans at most 16 values in each dimension BY CONSTRUCTION "
    "(the top 8 z-bits pin the top 4 bits of each coord), which is "
    "exactly the min/max-pruning guarantee a z-ordered table gives "
    "both filter columns. Pure-Column integer bit algebra, one "
    "shuffle on the bucket id; tests pin the <=16-span invariant.",
    tags=("analytics", "layout"),
)
def x50_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 256).alias("a"),
        (F.col("event_id") % 256).alias("b"),
    )
    interleave = " + ".join(
        f"((a div {1 << k}) % 2) * {1 << (2 * k)}"
        f" + ((b div {1 << k}) % 2) * {1 << (2 * k + 1)}"
        for k in range(8)
    )
    return (
        ev.withColumn("zval", F.expr(interleave))
        .groupBy(F.expr("zval div 256").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("a").cast("long").alias("a_min"),
            F.max("a").cast("long").alias("a_max"),
            F.min("b").cast("long").alias("b_min"),
            F.max("b").cast("long").alias("b_max"),
        )
    )


@register(
    "x51_dynamic_partition_pruning",
    oracle="""
    WITH f AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS cents
               FROM orders),
    d AS (SELECT printf('1995-%02d', m) AS month, m % 3 AS season
          FROM (SELECT unnest(range(1, 7)) AS m))
    SELECT CAST(season AS BIGINT) AS season,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM f JOIN d USING (month) GROUP BY season
    """,
    doc="DYNAMIC partition pruning — the join-driven sibling of "
    "x49's static pruning, and a Catalyst feature a 100 TB star "
    "join lives on: the fact table is laid down partitioned by "
    "month (same pay-once ingest as x49), then joined to a SMALL "
    "filtered dimension (six 1995 months with a season attribute). "
    "No literal month predicate exists on the fact side, so static "
    "pruning cannot fire; instead Catalyst injects a dynamicpruning "
    "subquery into the scan's PartitionFilters, reusing the dim's "
    "broadcast to skip every non-matching month directory at run "
    "time. tests/test_plans.py pins the dynamicpruningexpression on "
    "the scan. Bench note: like x49, most of the wall time is the "
    "deliberate in-query partitioned ingest. The oracle replays the "
    "join blind. Spark: DPP (SPARK-11150) over partitionBy parquet.",
    tags=("analytics", "layout", "scan"),
)
def x51_dynamic_partition_pruning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="x51_dpp_")
    try:
        (
            load_table(spark, sf_dir, "orders")
            .select(
                F.date_format("o_orderdate", "yyyy-MM").alias("month"),
                F.round(F.col("o_totalprice") * 100)
                .cast("long")
                .alias("cents"),
            )
            # cluster by the partition column before the write (guide
            # §6, round 15): partitionBy from N scan tasks otherwise
            # emits N files per month directory — the classic
            # small-files ingest tax paid again at read time
            .repartition("month")
            .write.partitionBy("month")
            .mode("overwrite")
            .parquet(out)
        )
        dim = (
            spark.range(1, 13)
            .where(F.col("id") <= 6)  # the selective dim predicate
            .select(
                F.format_string(
                    "1995-%02d", F.col("id").cast("int")
                ).alias("month"),
                (F.col("id") % 3).cast("long").alias("season"),
            )
        )
        result = (
            spark.read.parquet(out)
            .join(dim, "month")
            .groupBy("season")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.sum("cents").cast("long").alias("revenue_cents"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return result


@register(
    "x52_runtime_bloom_join",
    oracle="""
    SELECT CAST(l.l_quantity AS BIGINT) AS qty,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 400000
    GROUP BY 1
    """,
    doc="RUNTIME bloom-filter join pushdown (SPARK-32268) — the "
    "shuffle-join sibling of x51's DPP, and the third Catalyst "
    "runtime-filtering lever after static pruning (x49) and DPP "
    "(x51): when the probe side is too big to broadcast, Spark "
    "builds a bloom filter from the SELECTIVE build side "
    "(bloom_filter_agg over xxhash64 of the join key) and pushes a "
    "might_contain() predicate into the probe scan, discarding "
    "non-joining lineitem rows BEFORE the shuffle instead of after "
    "it — at 100 TB that is the difference between shuffling the "
    "fact table and shuffling the matches. Broadcast is disabled "
    "and the application-side threshold lowered for the demo "
    "(restored after); tests/test_plans.py pins might_contain + "
    "bloom_filter_agg in the optimized plan. The oracle replays the "
    "join blind; revenue sums as exact per-row cents.",
    tags=("analytics", "join", "scan"),
)
def x52_runtime_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "1",
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            F.col("l_quantity").cast("long").alias("qty"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents"),
        )
        o = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_totalprice") > 400000)
            .select("o_orderkey")
        )
        return (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("qty")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_items"),
                F.sum("cents").cast("long").alias("revenue_cents"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


@register(
    "x53_small_file_compaction",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders GROUP BY 1
    """,
    doc="Small-file COMPACTION — the lakehouse maintenance op "
    "(Delta OPTIMIZE / Iceberg rewrite_data_files) that every "
    "streaming ingest eventually owes: a micro-batch writer lands "
    "the orders table as 64 tiny files (the small-file problem: at "
    "100 TB that is millions of files, and scan planning + footer "
    "reads dominate), then compaction rewrites them into 4 "
    "scan-sized files using coalesce — which MERGES input splits "
    "WITHOUT a shuffle, the property that makes compaction cheap: "
    "rows never repartition, they just concatenate. The query "
    "aggregates from the COMPACTED copy, so the oracle (plain "
    "orders scan) doubles as a row-preservation proof across the "
    "rewrite; tests pin the 64 -> 4 file collapse and the "
    "shuffle-free rewrite plan. Bench note: the wall time IS the "
    "double write (pay-once maintenance), like x49/x51.",
    tags=("analytics", "layout", "scan"),
)
def x53_small_file_compaction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    small = tempfile.mkdtemp(prefix="x53_small_")
    big = tempfile.mkdtemp(prefix="x53_big_")
    try:
        (
            load_table(spark, sf_dir, "orders")
            .select(
                F.col("o_orderpriority").alias("priority"),
                F.round(F.col("o_totalprice") * 100)
                .cast("long")
                .alias("cents"),
            )
            .repartition(64)  # the streaming writer's tiny files
            .write.mode("overwrite")
            .parquet(small)
        )
        # compaction: merge splits, never shuffle rows
        spark.read.parquet(small).coalesce(4).write.mode(
            "overwrite"
        ).parquet(big)
        result = (
            spark.read.parquet(big)
            .groupBy("priority")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.sum("cents").cast("long").alias("revenue_cents"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(small, ignore_errors=True)
        shutil.rmtree(big, ignore_errors=True)
    return result

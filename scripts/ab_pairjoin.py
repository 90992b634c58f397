#!/usr/bin/env python
"""Round-15 A/B: shingle pair self-join shape.

A: current — let AQE pick the strategy (broadcast at sf0.1), the
   shingle subtree evaluated once per side (2 Generates).
B: repartition the shingle table by sh and force a merge join, so both
   sides share ONE exchange (ReusedExchange) and the explode runs once.
Times 3 reps of each on the dedup_ngram_jaccard shape (threshold 0.5,
max_df 100) and prints whether ReusedExchange appears.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gmall_flink_210726_spark.operators.dedup import _shingle_table
from gmall_flink_210726_spark.session import default_cpus, get_spark
from gmall_flink_210726_spark.sources.batch import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pairs_from(sh, hint):
    a, b = sh.alias("a"), sh.alias("b")
    if hint:
        b = b.hint("merge")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first("a.n_sh").alias("na"),
            F.first("b.n_sh").alias("nb"),
        )
    )
    j = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return inter.select("id_a", "id_b", j.alias("jaccard")).filter(
        F.col("jaccard") >= 0.5
    )


def main() -> None:
    spark = get_spark("ab-pairjoin", cpus=default_cpus())
    docs = load_table(spark, SF_DIR, "documents")
    base = _shingle_table(docs, "doc_id", "text", 3, 100)

    variants = {
        "A current (AQE choice)": pairs_from(base, hint=False),
        "B repartition+merge": pairs_from(
            base.repartition("sh"), hint=True
        ),
    }
    for name, df in variants.items():
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        plan = df._jdf.queryExecution().executedPlan().toString()
        print(
            name,
            times,
            "ReusedExchange" if "ReusedExchange" in plan else "no-reuse",
            f"Exchanges={plan.count('Exchange')}",
        )
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark harness: times every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Each query's plan is fully executed via the noop sink (computes every
column, writes nothing). Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gmall_flink_210726_spark.registry import load_all
from gmall_flink_210726_spark.session import default_cpus, get_spark


def run_query(spec, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = spec.fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def run_query_min(spec, spark, sf_dir: str, runs: int = 2) -> float:
    """Min over ``runs`` executions — load robustness: a single-shot
    time under transient machine load overstated several queries by
    4-12x in round 3; the min of two runs tracks the idle time."""
    return min(run_query(spec, spark, sf_dir) for _ in range(runs))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0  # unrecognized dir naming; still emit the JSON line
    spark = get_spark("gmall-bench", cpus=default_cpus())
    specs = load_all()

    # Warm the JVM/codegen once on the smallest table so per-query times
    # measure the plan, not session startup.
    try:
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    except Exception as exc:
        print(f"bench: warm-up read failed: {exc}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        try:
            timings[name] = round(run_query_min(spec, spark, sf_dir), 3)
        except Exception as exc:  # keep the bench line parseable
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            timings[name] = -1.0
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    line = json.dumps(
        {
            "metric": "total_query_wall_seconds",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
        }
    )
    # The driver's stdout capture has truncated the tail of this line
    # before (BENCH_r02 lost 20+ per-query times): persist the full line
    # in-repo and echo a copy to stderr, keeping stdout at exactly ONE
    # JSON line for the driver's parser.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"),
            "w",
        ) as f:
            f.write(line + "\n")
    except OSError as exc:
        print(f"bench: could not write BENCH_LOCAL.json: {exc}", file=sys.stderr)
    print(line, file=sys.stderr, flush=True)
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

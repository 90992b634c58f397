#!/usr/bin/env python
"""Dump .explain("formatted") for registered queries to plans/<tag>/.

Usage: python scripts/dump_plans.py <tag> [name ...]
  tag   subdirectory under plans/ (e.g. r14 writes plans/r14/<q>_before.txt
        when invoked as `dump_plans.py r14:before`).

With no names, dumps every registered query. Streaming twins execute
their micro-batch pipeline as a side effect of building the result
DataFrame; their dumped plan is the post-stream result plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_flink_210726_spark.registry import load_all
from gmall_flink_210726_spark.session import default_cpus, get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14:before"
    if ":" in tag:
        subdir, suffix = tag.split(":", 1)
    else:
        subdir, suffix = tag, "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        subdir,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("gmall-plan-dump", cpus=default_cpus())
    specs = load_all()
    targets = names or sorted(specs)
    for name in targets:
        spec = specs[name]
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN DUMP FAILED: {exc}\n"
        with open(path, "w") as f:
            f.write(plan)
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Stream splitting / multi-output — R1/R2 (SURVEY §2.4).

Flink side outputs (dwd/BaseLogApp.java:97-131) become N filtered
children of one parent DataFrame; ``explode`` replaces the manual
JSONArray iteration (dwd/BaseLogApp.java:113-125). In batch the common
parent is computed once (cache() it when writing all branches);
in streaming a single foreachBatch persists the micro-batch and writes
every branch (streaming/sinks.py).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_stream(df: DataFrame, branches: Mapping[str, Column]) -> dict[str, DataFrame]:
    """R1 — N-way split: each branch is a filter over the same parent.
    Branch conditions need not be disjoint (the reference's page branch
    is 'everything that is not a start event')."""
    return {name: df.filter(cond) for name, cond in branches.items()}


def explode_with_parent(
    df: DataFrame,
    array_col: str,
    parent_cols: Sequence[str],
    element_alias: str = "element",
) -> DataFrame:
    """R2 — flatten an array column, carrying parent fields onto each
    element (dwd/BaseLogApp.java:113-125 enriches displays with the
    parent page_id and ts)."""
    return df.select(*parent_cols, F.explode(F.col(array_col)).alias(element_alias))


def union_by_name(dfs: Sequence[DataFrame]) -> DataFrame:
    """U1 — union of homogeneous streams (dws/ProductStatsApp.java:188-191
    unions 7 metric streams). allowMissingColumns fills branch-specific
    columns with null, matching the reference's sparse POJO union."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out

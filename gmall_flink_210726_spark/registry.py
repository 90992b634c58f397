"""Query registry — the driver-facing correctness surface.

Every implemented operator from SURVEY.md §2 registers one (or more)
named queries here. A query is a ``(spark, sf_dir) -> DataFrame``
callable plus (when SQL-expressible) a DuckDB oracle SQL string over the
same parquet tables. ``__spark_entry__.py`` exposes this registry to the
driver verbatim.

Alias discipline: every computed column is aliased identically in the
Spark plan and the oracle SQL — the driver sorts columns by name before
hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""
    tags: tuple = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = "", tags: tuple = ()):
    def deco(fn):
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side-effect: registration)."""
    from gmall_flink_210726_spark.queries import (  # noqa: F401
        extras,
        extras2,
        extras3,
        extras4,
        extras5,
        extras6,
        extras7,
        extras8,
        extras9,
        extras10,
        extras11,
        gmall,
        gmall2,
        llm,
        llm2,
        llm3,
        llm4,
        llm5,
        llm6,
        llm7,
        llm8,
        llm9,
        llm10,
        llm11,
        llm12,
        llm13,
        llm14,
        llm15,
        llm16,
        llm17,
        llm18,
        llm19,
        streamq,
        streamq2,
        streamq3,
        tpch,
        tpch2,
        tpch3,
        tpch4,
    )

    return QUERIES

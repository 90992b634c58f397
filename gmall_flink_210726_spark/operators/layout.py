"""Data-layout optimization: Z-order (Morton) clustering for
multi-dimensional data skipping — the OPTIMIZE ZORDER analog on plain
parquet (public technique: Morton 1966; Delta/Iceberg expose the same
idea as table services).

Why it matters at 100 TB: parquet scans prune row groups / files by
min-max statistics, but a table sorted by ONE key has unbounded value
ranges for every OTHER key in each file. Interleaving the bits of two
(or more) keys into one sort key bounds every dimension's per-file
range, so predicates on EITHER column skip most files. The whole
operator is JVM Column bit arithmetic — codegen'd, no Python, and the
layout write is the standard repartitionByRange + sortWithinPartitions
recipe (one range shuffle).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns: result bit 2i is x's bit i, bit 2i+1 is y's bit i.
    Pure JVM shift/mask expression (2*bits disjoint-power terms whose
    sum is the OR), deterministic and oracle-expressible."""
    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a + b, terms).cast("long")


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical Morton expression as engine-portable SQL text
    (DuckDB oracle side) — generated from the same loop so the two
    can never drift."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_layout(
    df: DataFrame, x: str, y: str, n_files: int, bits: int = 16
) -> DataFrame:
    """Cluster ``df`` for two-dimensional data skipping: range-partition
    on the Morton key into ``n_files`` buckets and sort within each —
    writing the result gives every file a bounded range in BOTH x and
    y, so min-max pruning works for predicates on either. One range
    shuffle (sampled boundaries), no driver-side data movement."""
    z = zorder_key(x, y, bits).alias("_z")
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


# Hilbert curve, MSB-first 4-state machine (tables derived from the
# classic xy2d algorithm — Hamilton 2006 / Hacker's Delight ch. 16 —
# and exhaustively validated against it over the full 256x256 grid in
# tests/test_llm_ops.py). DIGIT[state*4+q] is the output base-4 digit
# for quadrant q = 2*bx + by; STATE[state*4+q] is the next state.
_HILBERT_DIGIT = (0, 1, 3, 2, 0, 3, 1, 2, 2, 1, 3, 0, 2, 3, 1, 0)
_HILBERT_STATE = (1, 0, 2, 0, 0, 3, 1, 1, 2, 2, 0, 3, 3, 1, 3, 2)


def _lut(table: tuple[int, ...], idx: Column) -> Column:
    """16-way lookup as array indexing — the index expression is
    referenced exactly ONCE, so the per-level state chain grows
    linearly (a CASE chain would copy the whole chain into each of its
    15 arms: 15^bits nodes)."""
    arr = F.array(*[F.lit(v) for v in table])
    return F.element_at(arr, (idx + 1).cast("int"))


def hilbert_key(x: Column | str, y: Column | str, bits: int = 8) -> Column:
    """Hilbert-curve index of the low ``bits`` bits of two non-negative
    integer columns — the stronger-locality sibling of
    :func:`zorder_key`: consecutive Hilbert keys are ALWAYS adjacent
    cells (Morton order jumps across the square at power-of-two
    boundaries), so range-partitioning by this key gives each file a
    tighter bounding box per dimension and better min-max pruning.

    MSB-first 4-state machine: per level the quadrant q = 2bx+by maps
    through a 16-entry digit/next-state table — the expression chain is
    LINEAR in ``bits`` (each level references the previous state once
    in each of two lookups), unlike the textbook rotate-and-reflect
    form whose coordinate reassignments grow 3^bits when unrolled."""
    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")
    state = F.lit(0)
    key = F.lit(0).cast("long")
    for i in range(bits - 1, -1, -1):
        q = (
            F.shiftright(xc, i).bitwiseAND(F.lit(1)) * 2
            + F.shiftright(yc, i).bitwiseAND(F.lit(1))
        )
        idx = state * 4 + q
        key = key * 4 + _lut(_HILBERT_DIGIT, idx).cast("long")
        state = _lut(_HILBERT_STATE, idx)
    return key


def hilbert_key_sql_ctes(
    x: str, y: str, base: str, key_cols: str, bits: int = 8
) -> str:
    """The identical Hilbert state machine as chained SQL CTEs (DuckDB
    oracle side), generated from the SAME tables so the two cannot
    drift. ``base`` is the name of a CTE providing (key_cols, x, y);
    returns CTE text ``h0 AS (...), ..., h{bits} AS (...)`` where
    ``h{bits}`` has (key_cols, hkey). One projection per level keeps
    the SQL linear in ``bits`` (an inlined nested form re-evaluates the
    state chain exponentially)."""

    def lut(table: tuple[int, ...], idx: str) -> str:
        arms = " ".join(
            f"WHEN {i} THEN {table[i]}" for i in range(16)
        )
        return f"(CASE {idx} {arms} END)"

    parts = [
        f"h0 AS (SELECT {key_cols}, CAST({x} AS BIGINT) AS hx,"
        f" CAST({y} AS BIGINT) AS hy, 0 AS st,"
        f" CAST(0 AS BIGINT) AS hkey FROM {base})"
    ]
    for lvl, i in enumerate(range(bits - 1, -1, -1)):
        q = f"(((hx >> {i}) & 1) * 2 + ((hy >> {i}) & 1))"
        idx = f"(st * 4 + {q})"
        parts.append(
            f"h{lvl + 1} AS (SELECT {key_cols}, hx, hy,"
            f" {lut(_HILBERT_STATE, idx)} AS st,"
            f" hkey * 4 + {lut(_HILBERT_DIGIT, idx)} AS hkey"
            f" FROM h{lvl})"
        )
    return ",\n    ".join(parts)

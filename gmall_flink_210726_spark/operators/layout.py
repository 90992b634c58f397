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

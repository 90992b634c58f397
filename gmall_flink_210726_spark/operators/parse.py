"""JSON parsing with dirty-record side output — P1/P2 (SURVEY §2.3).

The reference try-parses each Kafka string with fastjson and routes
failures to a 'dirty' side-output tag (dwd/BaseLogApp.java:51-63);
typed streams parse straight to POJOs (dwm/OrderWideApp.java:55-56).

Spark-first: ``from_json`` in PERMISSIVE mode with a corrupt-record
column. One pass over the data produces both branches as filtered
children of the same parent — Catalyst collapses the common subplan,
so this costs one scan, not two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def parse_json_column(
    df: DataFrame, col: str, schema: StructType, keep_raw: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Parse a JSON string column; return (good, dirty).

    good  — original columns + the parsed struct fields (flattened).
    dirty — rows whose JSON failed to parse (the raw string survives),
            ≈ the reference's dirty side output.
    """
    schema_with_corrupt = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )
    parsed = df.withColumn(
        "_parsed",
        F.from_json(
            F.col(col),
            schema_with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ),
    )
    is_dirty = F.col(f"_parsed.{CORRUPT_COL}").isNotNull() | F.col("_parsed").isNull()
    keep = [c for c in df.columns if keep_raw or c != col]
    good = parsed.filter(~is_dirty).select(*keep, F.col("_parsed.*")).drop(CORRUPT_COL)
    dirty = parsed.filter(is_dirty).select(*df.columns)
    return good, dirty

"""DuckDB-parity comparison mirroring the driver's t2 gate: sort columns
by name, normalize values, compare as an order-insensitive multiset.
Exact comparison (no float tolerance) — if this passes, the driver's
value-hash comparison passes.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from gmall_flink_210726_spark.sources.batch import TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_value(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return float(v).hex()  # exact binary representation
    if isinstance(v, pd.Timestamp):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return repr(v)


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(_norm_value(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def assert_frames_match(spark_df, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    spark_pdf = spark_df.toPandas()
    assert sorted(c.lower() for c in spark_pdf.columns) == sorted(
        c.lower() for c in oracle_pdf.columns
    ), f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    left, right = _normalize(spark_pdf), _normalize(oracle_pdf)
    assert len(left) == len(right), f"{name}: row count {len(left)} vs oracle {len(right)}"
    mism = [(a, b) for a, b in zip(left, right) if a != b]
    assert not mism, f"{name}: {len(mism)} mismatched rows; first: {mism[0]}"

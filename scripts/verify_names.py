"""Targeted driver-contract check: verify named queries() entries
against their oracle_sql() at a given sf dir (default sf0.01), with
the same sorted-column value normalization the driver uses.

Usage: python scripts/verify_names.py [--sf /root/testdata/sf0.01] name...
"""

import math
import sys

sys.path.insert(0, "/root/repo")


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return sorted(
        tuple(
            (
                v.hex()
                if isinstance(v, float) and not math.isnan(v)
                else str(v)
            )
            for v in r
        )
        for r in df.itertuples(index=False)
    )


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    bad = 0
    for name in args:
        if name not in qs:
            print("MISSING", name)
            bad += 1
            continue
        sdf = qs[name](spark, sf).toPandas()
        if name not in osql:
            print("ROWS-ONLY", name, len(sdf))
            continue
        odf = con.execute(osql[name]).df()
        if norm(sdf) == norm(odf):
            print("MATCH", name, len(sdf))
        else:
            print("MISMATCH", name, "spark:", len(sdf), "oracle:", len(odf))
            bad += 1
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

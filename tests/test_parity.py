"""Self-hosted version of the driver's t2 correctness gate: every
registered query with an oracle must match DuckDB exactly at sf0.001."""

from __future__ import annotations

import pytest

from gmall_flink_210726_spark.registry import load_all
from tests.conftest import SF_SMALL
from tests.oracle import assert_frames_match, duckdb_con

SPECS = load_all()


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_SMALL)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(n for n, s in SPECS.items() if s.oracle))
def test_query_matches_oracle(spark, con, name):
    spec = SPECS[name]
    spark_df = spec.fn(spark, SF_SMALL)
    oracle_pdf = con.execute(spec.oracle).df()
    assert_frames_match(spark_df, oracle_pdf, name)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_runs_nonempty(spark, name):
    df = SPECS[name].fn(spark, SF_SMALL)
    assert len(df.columns) > 0
    assert df.count() >= 0

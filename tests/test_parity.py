"""Self-hosted version of the driver's t2 correctness gate: every
registered query with an oracle must match DuckDB exactly at sf0.001
(default tier, every test run) and at sf0.01 — the driver's actual
gate scale (`@pytest.mark.slow` tier, ~10 min: `pytest tests/ -m
slow`). The slow tier closes the scale gap between self-check and
driver check: 79 of 156 queries have never been driver-sampled, so
this is their only pre-driver exposure at sf0.01."""

from __future__ import annotations

import pytest

from gmall_flink_210726_spark.registry import load_all
from tests.conftest import SF_MED, SF_SMALL
from tests.oracle import assert_frames_match, duckdb_con

SPECS = load_all()


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_SMALL)
    yield c
    c.close()


@pytest.fixture(scope="module")
def con_med():
    c = duckdb_con(SF_MED)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(n for n, s in SPECS.items() if s.oracle))
def test_query_matches_oracle(spark, con, name):
    spec = SPECS[name]
    spark_df = spec.fn(spark, SF_SMALL)
    oracle_pdf = con.execute(spec.oracle).df()
    assert_frames_match(spark_df, oracle_pdf, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(n for n, s in SPECS.items() if s.oracle))
def test_query_matches_oracle_sf001(spark, con_med, name):
    spec = SPECS[name]
    spark_df = spec.fn(spark, SF_MED)
    oracle_pdf = con_med.execute(spec.oracle).df()
    assert_frames_match(spark_df, oracle_pdf, name)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_runs_nonempty(spark, name):
    df = SPECS[name].fn(spark, SF_SMALL)
    assert len(df.columns) > 0
    assert df.count() >= 0

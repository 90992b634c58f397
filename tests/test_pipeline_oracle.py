"""End-to-end DuckDB oracle for the behavior-log pipeline: the full
BaseLog → UniqueVisit → UserJumpDetail → VisitorStats chain recomputed
in pure SQL over the same fixture JSON (SURVEY §5.2 golden pipeline
check — stronger than the per-operator invariants in test_apps.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from gmall_flink_210726_spark import fixtures
from gmall_flink_210726_spark.plans import apps

NOW_MS = 1_750_000_000_000


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("oracle_logs")
    path = str(d / "events.jsonl")
    with open(path, "w") as f:
        f.write("\n".join(fixtures.gen_log_events()))
    raw = spark.read.text(path)
    branches = apps.base_log_app(raw)
    con = duckdb.connect()
    # duckdb parses the same JSON lines (malformed lines are the dirty
    # branch → ignore_errors)
    con.execute(
        f"""
        CREATE VIEW ev AS
        SELECT common.mid AS mid, common.ar AS ar, common.ch AS ch,
               common.vc AS vc, common.is_new AS claimed_new,
               page.page_id AS page_id, page.last_page_id AS last_page_id,
               page.during_time AS during_time,
               start IS NOT NULL AS is_start, ts
        FROM read_json('{path}',
              columns={{'common': 'STRUCT(mid VARCHAR, vc VARCHAR, ch VARCHAR, ar VARCHAR, is_new VARCHAR)',
                        'page': 'STRUCT(page_id VARCHAR, last_page_id VARCHAR, item VARCHAR, item_type VARCHAR, during_time BIGINT)',
                        'displays': 'JSON', 'start': 'JSON', 'ts': 'BIGINT'}},
              format='newline_delimited', ignore_errors=true)
        WHERE ts IS NOT NULL
        """
    )
    # T6 replay, reference semantics: only CLAIMED-new events burn the
    # seen-marker — is_new='1' survives on the mid's first claimed-new
    # event only; '0'-claims pass through untouched
    con.execute(
        """
        CREATE VIEW ev_fixed AS
        SELECT *, CASE WHEN claimed_new = '1'
                        AND COUNT(*) FILTER (WHERE claimed_new = '1') OVER (
                              PARTITION BY mid ORDER BY ts, page_id NULLS FIRST
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) > 0
                       THEN '0' ELSE claimed_new END AS is_new
        FROM ev
        """
    )
    return {"branches": branches, "con": con}


def test_visitor_stats_matches_duckdb_pipeline(spark, setup):
    branches, con = setup["branches"], setup["con"]
    uv = apps.unique_visit_app(branches["page"])
    uj = apps.user_jump_detail_app(branches["page"])
    vs = apps.visitor_stats_app(branches["page"], uv, uj, now_ms=NOW_MS)
    got = {
        (r.stt, r.vc, r.ch, r.ar, r.is_new): (r.uv_ct, r.pv_ct, r.sv_ct, r.uj_ct, r.dur_sum)
        for r in vs.collect()
    }

    oracle = con.execute(
        """
        WITH page AS (SELECT * FROM ev_fixed WHERE NOT is_start),
        pv AS (SELECT stt, vc, ch, ar, is_new, 0 uv, 1 pv,
                      CASE WHEN last_page_id IS NULL THEN 1 ELSE 0 END sv,
                      0 uj, during_time dur
               FROM (SELECT strftime(make_timestamp((ts*1000 // 10000000) * 10000000),
                            '%Y-%m-%d %H:%M:%S') stt, * FROM page)),
        uv AS (SELECT strftime(make_timestamp((ts*1000 // 10000000) * 10000000),
                      '%Y-%m-%d %H:%M:%S') stt, vc, ch, ar, is_new,
                      1 uv, 0 pv, 0 sv, 0 uj, 0 dur
               FROM (SELECT *, row_number() OVER (
                        PARTITION BY mid, strftime(make_timestamp(ts*1000), '%Y-%m-%d')
                        ORDER BY ts, page_id) rn
                     FROM page WHERE last_page_id IS NULL)
               WHERE rn = 1),
        uj AS (SELECT strftime(make_timestamp((ts*1000 // 10000000) * 10000000),
                      '%Y-%m-%d %H:%M:%S') stt, vc, ch, ar, is_new,
                      0 uv, 0 pv, 0 sv, 1 uj, 0 dur
               FROM (SELECT *,
                        lead(ts) OVER (PARTITION BY mid ORDER BY ts, page_id NULLS FIRST) nxt,
                        lead(last_page_id IS NULL) OVER (PARTITION BY mid ORDER BY ts, page_id NULLS FIRST) nxt_entry
                     FROM page)
               WHERE last_page_id IS NULL
                 AND (nxt IS NULL OR nxt - ts > 60000
                      OR (nxt - ts <= 60000 AND nxt_entry))),
        unioned AS (SELECT * FROM pv UNION ALL SELECT * FROM uv UNION ALL SELECT * FROM uj)
        SELECT stt, vc, ch, ar, is_new,
               CAST(SUM(uv) AS BIGINT) uv_ct, CAST(SUM(pv) AS BIGINT) pv_ct,
               CAST(SUM(sv) AS BIGINT) sv_ct, CAST(SUM(uj) AS BIGINT) uj_ct,
               CAST(SUM(dur) AS BIGINT) dur_sum
        FROM unioned GROUP BY stt, vc, ch, ar, is_new
        """
    ).fetchall()
    expected = {
        (stt, vc, ch, ar, is_new): (uv, pv, sv, uj, dur)
        for stt, vc, ch, ar, is_new, uv, pv, sv, uj, dur in oracle
    }
    assert got == expected

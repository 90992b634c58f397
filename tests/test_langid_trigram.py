"""Char-trigram language ID: dense-profile smoothing, deterministic
argmax, improvement over marker words (operators/text3.py)."""

from __future__ import annotations

from tests.conftest import SF_SMALL


class TestTrigramLangId:
    def test_report_shape_and_improvement(self, spark):
        from gmall_flink_210726_spark.operators.text3 import (
            lang_id_trigram,
        )
        from gmall_flink_210726_spark.sources.batch import load_table

        docs = load_table(spark, SF_SMALL, "documents")
        rows = {r["lang"]: r for r in lang_id_trigram(docs).collect()}
        assert set(rows) == {"en", "de", "es", "fr", "zh"}
        n_total = sum(r["n_docs"] for r in rows.values())
        assert n_total == docs.count()
        # the brief's claim: trigram profiles beat 4 marker words
        tri = sum(r["n_tri_correct"] for r in rows.values())
        marker = sum(r["n_marker_correct"] for r in rows.values())
        assert tri > marker
        # marker words can never name zh; trigram must get some right
        assert rows["zh"]["n_marker_correct"] == 0
        assert rows["zh"]["n_tri_correct"] > 0

    def test_deterministic_across_runs(self, spark):
        from gmall_flink_210726_spark.operators.text3 import (
            lang_id_trigram,
        )
        from gmall_flink_210726_spark.sources.batch import load_table

        docs = load_table(spark, SF_SMALL, "documents")
        a = sorted(tuple(r) for r in lang_id_trigram(docs).collect())
        b = sorted(tuple(r) for r in lang_id_trigram(docs).collect())
        assert a == b

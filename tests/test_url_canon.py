"""URL canonicalization rules (operators/text.py canonicalize_url)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_flink_210726_spark.operators.text import canonicalize_url


def _canon(spark, *urls):
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [
        r["c"] for r in df.select(canonicalize_url("u").alias("c")).collect()
    ]


class TestCanonRules:
    def test_all_variants_collide(self, spark):
        got = _canon(
            spark,
            "http://example.com/p/3?b=2&a=1",
            "HTTP://EXAMPLE.COM:80/p/3?a=1&b=2#frag",
            "http://example.com/p/3?utm_source=feed&b=2&a=1",
            "http://Example.Com/p/3/?a=1&b=2",
        )
        assert set(got) == {"http://example.com/p/3?a=1&b=2"}

    def test_non_default_port_kept(self, spark):
        assert _canon(spark, "https://Host.Net:8443/x/") == [
            "https://host.net:8443/x"
        ]

    def test_default_https_port_stripped(self, spark):
        assert _canon(spark, "https://host.net:443/x") == [
            "https://host.net/x"
        ]

    def test_path_case_preserved(self, spark):
        assert _canon(spark, "http://H.com/CaseSensitive?Q=V") == [
            "http://h.com/CaseSensitive?Q=V"
        ]

    def test_bare_slash_kept(self, spark):
        assert _canon(spark, "http://h.org/") == ["http://h.org/"]

    def test_plan_is_pure_projection(self, spark):
        df = spark.range(10).select(
            F.concat(F.lit("http://x.com/"), F.col("id")).alias("u")
        )
        plan = (
            df.select(canonicalize_url("u").alias("c"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


class TestEmptyPath:
    def test_empty_path_normalized_to_slash(self, spark):
        """ADVICE r9 (low): RFC 3986 §6.2.3 — the empty path is
        equivalent to '/' for http(s); both spellings must collide."""
        got = _canon(
            spark,
            "http://example.com",
            "http://example.com/",
            "HTTP://EXAMPLE.COM:80#frag",
            "http://example.com?b=2&a=1",
        )
        assert got[:3] == ["http://example.com/"] * 3
        assert got[3] == "http://example.com/?a=1&b=2"

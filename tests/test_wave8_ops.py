"""Wave-8 operator unit tests: range-join decomposition edge cases,
prefix-filter losslessness (agreement with the all-shingle exact
pass), and KMV small-set / estimator behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_flink_210726_spark.operators.dedup import (
    ngram_jaccard_pairs,
    prefix_filter_pairs,
)
from gmall_flink_210726_spark.operators.joins import range_join
from gmall_flink_210726_spark.operators.sketch import kmv_distinct
from tests.conftest import SF_SMALL


class TestRangeJoin:
    def _ranges(self, spark, rows):
        return spark.createDataFrame(rows, "block string, lo long, hi long")

    def _points(self, spark, addrs):
        return spark.createDataFrame([(a,) for a in addrs], "addr long")

    def test_half_open_boundaries(self, spark):
        """lo is inclusive, hi exclusive — the two boundary points land
        deterministically."""
        ranges = self._ranges(spark, [("a", 0, 100), ("b", 100, 200)])
        pts = self._points(spark, [0, 99, 100, 199, 200])
        got = {
            (r["addr"], r["block"])
            for r in range_join(pts, ranges, "addr", "lo", "hi", 64).collect()
        }
        assert got == {(0, "a"), (99, "a"), (100, "b"), (199, "b")}

    def test_range_spanning_many_chunks(self, spark):
        """A range much wider than the granularity still matches every
        interior point exactly once (chunk explosion must not
        duplicate matches)."""
        ranges = self._ranges(spark, [("wide", 10, 1000)])
        pts = self._points(spark, list(range(0, 1100, 7)))
        rows = range_join(pts, ranges, "addr", "lo", "hi", 16).collect()
        addrs = sorted(r["addr"] for r in rows)
        assert addrs == [a for a in range(0, 1100, 7) if 10 <= a < 1000]
        assert len(addrs) == len(set(addrs))

    def test_empty_and_unmatched_ranges(self, spark):
        """hi <= lo ranges are dropped (BETWEEN semantics); points in
        no range produce no row."""
        ranges = self._ranges(spark, [("empty", 50, 50), ("inv", 60, 40)])
        pts = self._points(spark, [50, 45, 55])
        assert range_join(pts, ranges, "addr", "lo", "hi", 8).count() == 0

    def test_overlapping_ranges_multi_match(self, spark):
        """Overlapping ranges each match — the operator is a join, not
        a partitioner."""
        ranges = self._ranges(spark, [("a", 0, 100), ("b", 50, 150)])
        pts = self._points(spark, [75])
        got = sorted(r["block"] for r in range_join(
            pts, ranges, "addr", "lo", "hi", 32
        ).collect())
        assert got == ["a", "b"]


class TestPrefixFilterLossless:
    def test_agrees_with_all_shingle_exact_pass(self, spark):
        """The prefix filter is LOSSLESS for the threshold: pair-for-
        pair identical output (ids and jaccard) to the all-shingle
        exact join at the same t, on the real documents table."""
        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        full = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, threshold=0.6).collect()
        }
        pref = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in prefix_filter_pairs(docs, t_num=3, t_den=5).collect()
        }
        assert pref == full
        assert len(pref) > 0

    def test_prefix_boundary_docs(self, spark):
        """Two docs at exactly J = t must survive (the integer-ceil
        prefix length guarantees it; a one-short prefix would drop
        them). 3 shared + 2 unique shingles each -> J = 3/7 < 0.5;
        construct J exactly 0.6: |A|=|B|=8, inter=6 -> 6/10=0.6."""
        mk = lambda words: " ".join(words)
        common = [f"c{i} c{i} c{i}" for i in range(0)]  # unused
        # 3-gram shingles == distinct word triples; build via word runs:
        # doc with words w1..w10 has shingles (w1 w2 w3)..(w8 w9 w10)
        a = mk([f"s{i}" for i in range(10)])  # 8 shingles
        b = mk([f"s{i}" for i in range(8)] + ["x1", "x2"])  # shares 6
        docs = spark.createDataFrame(
            [(1, a), (2, b)], "doc_id long, text string"
        )
        rows = prefix_filter_pairs(docs, t_num=3, t_den=5).collect()
        assert len(rows) == 1
        assert abs(rows[0]["jaccard"] - 0.6) < 1e-12


class TestKMV:
    def test_small_set_falls_back_to_exact(self, spark):
        tagged = spark.createDataFrame(
            [("g", str(i)) for i in range(40)], "col_name string, v string"
        )
        row = kmv_distinct(tagged, k=256).collect()[0]
        assert row["exact_distinct"] == 40
        assert row["kmv_estimate"] == 40.0

    def test_estimate_within_tolerance(self, spark):
        """Bottom-256 estimator: rel error concentrates ~1/sqrt(k-2)
        (~6%); assert a loose 25% envelope on 5000 distinct values."""
        tagged = spark.createDataFrame(
            [("g", f"val-{i}") for i in range(5000)],
            "col_name string, v string",
        )
        row = kmv_distinct(tagged, k=256).collect()[0]
        assert row["exact_distinct"] == 5000
        assert abs(row["kmv_estimate"] - 5000) / 5000 < 0.25

    def test_duplicates_do_not_occupy_slots(self, spark):
        """KMV ranks DISTINCT hashes — 100x duplication must not move
        the estimate."""
        base = [("g", f"v{i}") for i in range(2000)]
        dup = base * 3
        e1 = kmv_distinct(
            spark.createDataFrame(base, "col_name string, v string"), k=256
        ).collect()[0]["kmv_estimate"]
        e2 = kmv_distinct(
            spark.createDataFrame(dup, "col_name string, v string"), k=256
        ).collect()[0]["kmv_estimate"]
        assert e1 == e2

    def test_nulls_ignored(self, spark):
        tagged = spark.createDataFrame(
            [("g", "a"), ("g", None), ("g", "b")], "col_name string, v string"
        )
        row = kmv_distinct(tagged, k=256).collect()[0]
        assert row["exact_distinct"] == 2


class TestKMVOverlap:
    def test_small_sets_exact_fallback(self, spark):
        """Unions under k: the estimator must return the EXACT
        intersection (union_k < k branch)."""
        from gmall_flink_210726_spark.operators.sketch import kmv_overlap

        rows = [("a", f"v{i}") for i in range(30)] + [
            ("b", f"v{i}") for i in range(20, 50)
        ]
        out = kmv_overlap(
            spark.createDataFrame(rows, "grp string, v string"), k=256
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r["exact_inter"] == 10
        assert r["kmv_inter_est"] == 10.0

    def test_sketch_path_within_tolerance(self, spark):
        """Unions over k: estimate within a loose envelope of truth
        (k=64 -> ~12% concentration; assert 40%)."""
        from gmall_flink_210726_spark.operators.sketch import kmv_overlap

        rows = [("a", f"v{i}") for i in range(1500)] + [
            ("b", f"v{i}") for i in range(1000, 2500)
        ]
        r = kmv_overlap(
            spark.createDataFrame(rows, "grp string, v string"), k=64
        ).collect()[0]
        assert r["exact_inter"] == 500
        assert r["union_k"] == 64
        assert abs(r["kmv_inter_est"] - 500) / 500 < 0.4

    def test_disjoint_sets(self, spark):
        from gmall_flink_210726_spark.operators.sketch import kmv_overlap

        rows = [("a", f"x{i}") for i in range(300)] + [
            ("b", f"y{i}") for i in range(300)
        ]
        r = kmv_overlap(
            spark.createDataFrame(rows, "grp string, v string"), k=64
        ).collect()[0]
        assert r["exact_inter"] == 0
        assert r["kmv_inter_est"] == 0.0


class TestPCAPower:
    def test_direction_matches_numpy(self, spark):
        """3 exact-integer power iterations must align with numpy's
        leading eigenvector of the same (rounded) Gram matrix —
        cosine > 0.99 on the real embeddings table."""
        import numpy as np

        from gmall_flink_210726_spark.registry import load_all

        out = (
            load_all()["emb_pca_power"]
            .fn(spark, SF_SMALL)
            .orderBy("dim")
            .collect()
        )
        v = np.array([r["loading"] for r in out])
        emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
        X = np.round(
            np.array([r["embedding"] for r in emb], dtype=np.float64), 6
        )
        G = X.T @ X
        w, U = np.linalg.eigh(G)
        top = U[:, -1]
        cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
        assert cos > 0.99
        # lambda_est approximates the top eigenvalue in gram units
        lam = out[0]["lambda_est"]
        assert abs(lam / w[-1] - 1) < 0.02


class TestSaltedJoin:
    def test_identical_to_plain_join(self, spark):
        """The salted join is lossless: row-identical output to the
        unsalted join, any n_salts."""
        from gmall_flink_210726_spark.operators.skew import salted_join

        fact = spark.createDataFrame(
            [(1, i, i * 10) for i in range(20)] + [(2, 99, 5)],
            "k long, rid long, v long",
        )
        dim = spark.createDataFrame([(1, "a"), (2, "b")], "k long, tag string")
        plain = sorted(map(tuple, fact.join(dim, "k").collect()))
        for n in (1, 4, 16):
            salted = sorted(
                map(
                    tuple,
                    salted_join(fact, dim, "k", F.col("rid"), n_salts=n).collect(),
                )
            )
            assert salted == plain

    def test_unmatched_fact_rows_drop(self, spark):
        from gmall_flink_210726_spark.operators.skew import salted_join

        fact = spark.createDataFrame([(7, 1, 1)], "k long, rid long, v long")
        dim = spark.createDataFrame([(1, "a")], "k long, tag string")
        assert salted_join(fact, dim, "k", F.col("rid")).count() == 0


class TestScd2RunCollapse:
    def test_consecutive_duplicates_collapse(self, spark):
        from gmall_flink_210726_spark.registry import load_all
        import datetime as dt

        # user 1: a a b b a -> versions a, b, a (3 rows, not 5)
        base = dt.datetime(2024, 1, 1)
        rows = [
            (100 + j, base + dt.timedelta(minutes=j), 1, t, 1.0, "{}")
            for j, t in enumerate(["a", "a", "b", "b", "a"])
        ]
        import tempfile, shutil, os

        d = tempfile.mkdtemp(prefix="scd2_test_")
        try:
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string",
            ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
            out = (
                load_all()["x31_scd2_history"]
                .fn(spark, d)
                .orderBy("version_n")
                .collect()
            )
            assert [r["event_type"] for r in out] == ["a", "b", "a"]
            assert [r["version_n"] for r in out] == [1, 2, 3]
            # intervals chain: each valid_to equals the next valid_from
            assert out[0]["valid_to_us"] == out[1]["valid_from_us"]
            assert out[1]["valid_to_us"] == out[2]["valid_from_us"]
            assert out[2]["valid_to_us"] == 0  # open current version
        finally:
            shutil.rmtree(d, ignore_errors=True)

"""Wave-7 operator tests: CMS one-sided error, quantization bounds,
centroid exactness."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gmall_flink_210726_spark.operators.embed import (
    label_centroids,
    quantize_int8_stats,
)
from gmall_flink_210726_spark.operators.sketch import cms_estimate


class TestCMS:
    def test_overestimates_never_under(self, spark):
        # 500 distinct keys into 4x256 cells — collisions guaranteed;
        # CMS error is one-sided: est >= exact for EVERY key
        wc = spark.range(500).select(
            F.concat(F.lit("k"), F.col("id")).alias("k"),
            (F.col("id") % 7 + 1).alias("ct"),
        )
        rows = cms_estimate(wc, "k", "ct").collect()
        assert len(rows) == 500
        assert all(r.cms_est >= r.exact_ct for r in rows)

    def test_exact_when_no_collision(self, spark):
        # 3 keys in 1024 cells: collision-free with overwhelming
        # probability under md5 -> estimates equal the truth
        wc = spark.createDataFrame(
            [Row(k="a", ct=5), Row(k="b", ct=7), Row(k="c", ct=11)]
        )
        got = {r.k: (r.exact_ct, r.cms_est) for r in
               cms_estimate(wc, "k", "ct").collect()}
        assert got == {"a": (5, 5), "b": (7, 7), "c": (11, 11)}


class TestQuantize:
    def test_checksum_bounds(self, spark):
        emb = spark.createDataFrame([
            Row(vec_id=1, embedding=[0.0, 10.0]),
            Row(vec_id=2, embedding=[1.0, 20.0]),
            Row(vec_id=3, embedding=[2.0, 30.0]),
        ])
        got = {r.dim: r for r in quantize_int8_stats(emb).collect()}
        # dim 0: values 0,1,2 -> q = 0, 128 (127.5 rounds up), 255
        assert got[0].q_sum == 0 + 128 + 255
        assert (got[0].dim_min, got[0].dim_max) == (0.0, 2.0)
        # dim 1: 10,20,30 -> same pattern
        assert got[1].q_sum == 0 + 128 + 255

    def test_constant_dim_quantizes_to_zero(self, spark):
        emb = spark.createDataFrame(
            [Row(vec_id=i, embedding=[5.0]) for i in range(4)]
        )
        r = quantize_int8_stats(emb).collect()[0]
        assert r.q_sum == 0 and r.q_sq_sum == 0


class TestCentroids:
    def test_exact_mean(self, spark):
        emb = spark.createDataFrame([
            Row(label=1, embedding=[1.0, 2.0]),
            Row(label=1, embedding=[3.0, 6.0]),
            Row(label=2, embedding=[10.0, 0.0]),
        ])
        got = {(r.label, r.dim): (r.n_vecs, r.centroid)
               for r in label_centroids(emb).collect()}
        assert got == {(1, 0): (2, 2.0), (1, 1): (2, 4.0),
                       (2, 0): (1, 10.0), (2, 1): (1, 0.0)}


class TestCMSAdditivity:
    def test_cells_merge_equals_single_pass(self, spark):
        """The st9 replay-safe merge property: cells built from disjoint
        slices and summed == cells built in one pass."""
        from pyspark.sql import functions as F

        from gmall_flink_210726_spark.operators.sketch import cms_cells

        full = spark.range(400).select(
            F.concat(F.lit("u"), (F.col("id") % 37)).alias("k"),
            F.lit(1).alias("ct"),
        )
        # split by hash of k (disjoint key slices)
        left = full.where(F.crc32("k") % 2 == 0)
        right = full.where(F.crc32("k") % 2 == 1)
        merged = (
            cms_cells(left, "k", "ct")
            .unionByName(cms_cells(right, "k", "ct"))
            .groupBy("j", "ctr")
            .agg(F.sum("cell").alias("cell"))
        )
        single = cms_cells(full, "k", "ct")
        got = {(r.j, r.ctr): r.cell for r in merged.collect()}
        want = {(r.j, r.ctr): r.cell for r in single.collect()}
        assert got == want


class TestMinhashCalibration:
    def test_identical_docs_estimate_one(self, spark):
        from pyspark.sql import Row
        from pyspark.sql import functions as F

        from gmall_flink_210726_spark.operators.sketch import (
            minhash_jaccard_calibration,
        )

        txt = "alpha beta gamma delta epsilon zeta eta theta"
        docs = spark.createDataFrame(
            [Row(doc_id=1, text=txt), Row(doc_id=2, text=txt),
             Row(doc_id=3, text="one two three four five six seven")]
        )
        pairs = spark.createDataFrame(
            [Row(id_a=1, id_b=2, jaccard=1.0), Row(id_a=1, id_b=3, jaccard=0.0)]
        )
        got = {(r.id_a, r.id_b): r.minhash_est
               for r in minhash_jaccard_calibration(docs, pairs).collect()}
        assert got[(1, 2)] == 1.0          # identical signatures
        assert got[(1, 3)] < 0.5           # disjoint shingles
        # every estimate is an exact multiple of 1/16
        assert all(abs(v * 16 - round(v * 16)) < 1e-12 for v in got.values())


class TestIncrementalRefresh:
    def test_merge_equals_full_recompute(self, spark):
        from pyspark.sql import functions as F

        from gmall_flink_210726_spark.operators.analytics import (
            incremental_agg_refresh,
        )

        rows = spark.range(1000).select(
            (F.col("id") % 7).alias("g"), (F.col("id") % 13).alias("v")
        )
        partials = [F.count(F.lit(1)).alias("ct"), F.sum("v").alias("vs")]
        merges = [F.sum("ct").cast("long").alias("ct"),
                  F.sum("vs").cast("long").alias("vs")]
        base = rows.where(F.col("id") % 3 != 0).groupBy("g").agg(*partials)
        delta = rows.where(F.col("id") % 3 == 0)
        merged = incremental_agg_refresh(base, delta, ["g"], partials, merges)
        full = rows.groupBy("g").agg(
            F.count(F.lit(1)).cast("long").alias("ct"),
            F.sum("v").cast("long").alias("vs"),
        )
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, full.collect())
        )


class TestCCFastPathAgreement:
    def test_driver_and_distributed_paths_identical(self, spark):
        """small_graph_edges gates a driver union-find; forcing the
        distributed rounds (gate=0) must give the identical clustering
        — otherwise the gate would change results with scale."""
        import random

        from pyspark.sql import Row

        from gmall_flink_210726_spark.operators.dedup import (
            connected_components,
        )

        rng = random.Random(11)
        edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(90)]
        edges = [(a, b) for a, b in edges if a != b]
        pairs = spark.createDataFrame(
            [Row(id_a=a, id_b=b) for a, b in edges]
        )
        nodes = spark.range(150).select(F.col("id"))
        fast = {(r.id, r.cluster_id) for r in
                connected_components(pairs, nodes).collect()}
        dist = {(r.id, r.cluster_id) for r in
                connected_components(pairs, nodes, small_graph_edges=0).collect()}
        assert fast == dist

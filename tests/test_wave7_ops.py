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

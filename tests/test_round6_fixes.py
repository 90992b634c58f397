"""Regression tests for the round-6 ADVICE fixes: order-preserving
bucket derivation (shard_binpack / systematic sampling under any
n_buckets), null-tolerant union-find fast path, and TIFF metadata-tag
skip behavior."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


class TestOrderPreservingBuckets:
    def test_shard_binpack_invariant_to_bucket_count(self, spark):
        """The (bucket, hk, id) global order must equal the md5
        lexicographic order for ANY n_buckets, so shard assignments
        are identical whether the prefix sum is decomposed over 256
        buckets or 64 (previously hexval % n scrambled the order for
        n < 256)."""
        from gmall_flink_210726_spark.operators.sketch import shard_binpack

        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        a = shard_binpack(
            docs, "doc_id", F.length("text"), 50_000, n_buckets=256
        ).collect()
        b = shard_binpack(
            docs, "doc_id", F.length("text"), 50_000, n_buckets=64
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_systematic_sample_invariant_to_bucket_count(self, spark):
        from gmall_flink_210726_spark.operators.sketch import (
            systematic_weighted_sample,
        )

        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        a = systematic_weighted_sample(
            docs, "doc_id", F.length("text"), 5_000, n_buckets=256
        ).collect()
        b = systematic_weighted_sample(
            docs, "doc_id", F.length("text"), 5_000, n_buckets=17
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestUnionFindNullEdges:
    def _pairs(self, spark):
        return spark.createDataFrame(
            [("a", "b"), (None, "a"), ("c", None), ("d", "e")],
            "id_a string, id_b string",
        )

    def _nodes(self, spark):
        return spark.createDataFrame(
            [("a",), ("b",), ("c",), ("d",), ("e",), ("z",)], "id string"
        )

    def test_fast_path_drops_null_edges_like_distributed_path(self, spark):
        """Null-keyed pairs must be dropped (join semantics), never a
        TypeError from max(None, str) inside driver union-find."""
        from gmall_flink_210726_spark.operators.dedup import (
            connected_components,
        )

        got = {
            r["id"]: r["cluster_id"]
            for r in connected_components(
                self._pairs(spark), self._nodes(spark)
            ).collect()
        }
        assert got == {
            "a": "a", "b": "a", "c": "c", "d": "d", "e": "d", "z": "z"
        }

    def test_star_fast_path_drops_null_edges(self, spark):
        from gmall_flink_210726_spark.operators.dedup import (
            connected_components_star,
        )

        got = {
            r["id"]: r["cluster_id"]
            for r in connected_components_star(
                self._pairs(spark), self._nodes(spark)
            ).collect()
        }
        assert got == {
            "a": "a", "b": "a", "c": "c", "d": "d", "e": "d", "z": "z"
        }


class TestTiffMetadataTags:
    def _build(self, extra_entries, le=True):
        e = "<" if le else ">"
        w = h = 2
        pix = bytes(range(w * h * 3))
        pix_off = 8
        sw = b"libtest\x00"
        sw_off = pix_off + len(pix)
        rat_off = sw_off + len(sw)
        ifd_off = rat_off + 8

        def entry(tag, typ, count, raw4):
            return struct.pack(e + "HHI", tag, typ, count) + raw4

        short_v = lambda v: struct.pack(e + "HH", v, 0)  # noqa: E731
        long_v = lambda v: struct.pack(e + "I", v)  # noqa: E731
        entries = [
            entry(256, 3, 1, short_v(w)),
            entry(257, 3, 1, short_v(h)),
            entry(273, 4, 1, long_v(pix_off)),
            entry(277, 3, 1, short_v(3)),
            entry(279, 4, 1, long_v(len(pix))),
        ] + [
            entry(*spec(sw, sw_off, rat_off, long_v, short_v))
            for spec in extra_entries
        ]
        blob = (
            (b"II" if le else b"MM")
            + struct.pack(e + "HI", 42, ifd_off)
            + pix
            + sw
            + struct.pack(e + "II", 72, 1)
            + struct.pack(e + "H", len(entries))
            + b"".join(entries)
            + struct.pack(e + "I", 0)
        )
        return blob, pix

    def test_ascii_and_rational_metadata_skipped(self):
        """Software (ASCII) and XResolution (RATIONAL) tags — ubiquitous
        in real-world TIFFs — must not abort pixel decode."""
        from gmall_flink_210726_spark.operators.tiff import _decode_tiff

        blob, pix = self._build(
            [
                lambda sw, so, ro, lv, sv: (305, 2, len(sw), lv(so)),
                lambda sw, so, ro, lv, sv: (282, 5, 1, lv(ro)),
            ]
        )
        assert _decode_tiff(blob) == (2, 2, 3, pix)

    def test_unsupported_type_on_decode_tag_still_fatal(self):
        """ImageWidth carried as RATIONAL is genuinely undecodable —
        the skip must not swallow decode-relevant tags."""
        from gmall_flink_210726_spark.operators.tiff import _decode_tiff

        blob, _ = self._build(
            [lambda sw, so, ro, lv, sv: (256, 5, 1, lv(ro))]
        )
        with pytest.raises(ValueError):
            _decode_tiff(blob)


class TestPageRankRobustness:
    def test_ten_iterations_match_integer_reference_and_conserve_mass(
        self, spark
    ):
        """iterations=10 exercises the lineage-truncation path (plan
        explosion guard); results must equal the exact integer-
        arithmetic reference bit-for-bit, and total rank mass must
        never exceed SCALE (truncation + dangling leakage only ever
        remove mass)."""
        from gmall_flink_210726_spark.operators.graph import SCALE, pagerank

        n_nodes = 40
        node_ids = [f"n{i:02d}" for i in range(n_nodes)]
        edges = [
            (node_ids[i], node_ids[(i * 7 + 3) % n_nodes], 1 + (i % 4))
            for i in range(n_nodes)
        ] + [
            (node_ids[i], node_ids[(i * 11 + 5) % n_nodes], 1 + (i % 3))
            for i in range(0, n_nodes, 2)
        ]
        # leave n00/n01 dangling (no out-edges) to exercise the
        # documented no-redistribution rule
        edges = [e for e in edges if e[0] not in (node_ids[0], node_ids[1])]

        ndf = spark.createDataFrame([(x,) for x in node_ids], "id string")
        edf = spark.createDataFrame(edges, "src string, dst string, w long")
        got = {
            r["id"]: r["pr_scaled"]
            for r in pagerank(ndf, edf, iterations=10).collect()
        }

        base = ((100 - 85) * SCALE // 100) // n_nodes
        outw: dict = {}
        for s, _, w in edges:
            outw[s] = outw.get(s, 0) + w
        pr = {x: SCALE // n_nodes for x in node_ids}
        for _ in range(10):
            inw: dict = {}
            for s, d, w in edges:
                inw[d] = inw.get(d, 0) + (pr[s] // outw[s]) * w
            pr = {x: base + (85 * inw.get(x, 0)) // 100 for x in node_ids}

        assert got == pr
        assert sum(got.values()) <= SCALE

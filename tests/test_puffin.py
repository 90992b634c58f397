"""Puffin container grammar + NDV trust chain (operators/puffin.py)."""

from __future__ import annotations

import json
import struct

from gmall_flink_210726_spark.operators.puffin import (
    _make_puffin_table,
    _puffin_kvals,
    make_puffin,
    parse_puffin,
    read_puffin_ndv,
)


class TestContainer:
    def test_roundtrip_plain_and_compressed(self):
        bm = {"type": "t1", "fields": [1],
              "properties": {"x": "1"}}
        for codec in (None, "lz4", "zstd"):
            b = dict(bm)
            if codec:
                b["compression-codec"] = codec
            for cf in (False, True):
                puf = make_puffin(
                    [(b, b"\x00\x01\x02\x03" * 10)],
                    compress_footer=cf,
                )
                got = parse_puffin(puf)
                assert got is not None, (codec, cf)
                assert got["footer_compressed"] == cf
                (meta, payload), = got["blobs"]
                assert payload == b"\x00\x01\x02\x03" * 10

    def test_grammar_refusals(self):
        bm = {"type": "t1", "fields": [1], "properties": {}}
        puf = bytearray(make_puffin([(bm, b"abcdef")]))
        # leading magic flip
        bad = bytes(b"XFA1") + bytes(puf[4:])
        assert parse_puffin(bad) is None
        # trailing magic flip
        assert parse_puffin(bytes(puf[:-1]) + b"Z") is None
        # reserved flag bit set
        bad2 = bytearray(puf)
        bad2[-8] |= 0x02
        assert parse_puffin(bytes(bad2)) is None
        # footer payload size lie
        bad3 = bytearray(puf)
        struct.pack_into("<I", bad3, len(bad3) - 12, 1)
        assert parse_puffin(bytes(bad3)) is None
        # unknown blob codec: never guess (JSON surgery puts a
        # codec name the reader has no decoder for into the footer)
        puf2 = make_puffin([(dict(bm), b"abcdef")])
        meta_start = puf2.index(b'{"blobs"')
        meta = json.loads(puf2[meta_start : len(puf2) - 12])
        meta["blobs"][0]["compression-codec"] = "snappy"
        fp = json.dumps(meta).encode()
        cooked = (
            puf2[: meta_start - 4]
            + b"PFA1"
            + fp
            + struct.pack("<I", len(fp))
            + struct.pack("<I", 0)
            + b"PFA1"
        )
        assert parse_puffin(cooked) is None
        # ... while the original parses fine
        assert parse_puffin(puf2) is not None

    def test_blob_range_tiling(self):
        """Overlapping / out-of-region blob ranges refuse."""
        bm1 = {"type": "t1", "fields": [1], "properties": {}}
        bm2 = {"type": "t1", "fields": [2], "properties": {}}
        puf = make_puffin([(bm1, b"aaaa"), (bm2, b"bbbb")])
        got = parse_puffin(puf)
        assert got is not None and len(got["blobs"]) == 2
        # cook blob 2's offset to overlap blob 1 (JSON surgery)
        meta_start = puf.index(b'{"blobs"')
        payload = puf[meta_start : len(puf) - 12]
        meta = json.loads(payload)
        meta["blobs"][1]["offset"] = meta["blobs"][0]["offset"]
        fp = json.dumps(meta).encode()
        cooked = (
            puf[: meta_start - 4]
            + b"PFA1"
            + fp
            + struct.pack("<I", len(fp))
            + struct.pack("<I", 0)
            + b"PFA1"
        )
        assert parse_puffin(cooked) is None


class TestNdvTrustChain:
    def test_fixture_stripes(self):
        for i in range(80):
            st = read_puffin_ndv(_make_puffin_table(i))
            bad = i % 13 == 0 or i % 17 == 0 or i % 19 == 0
            assert (st is None) == bad, i
            if st:
                assert st["ndv"] == len(set(_puffin_kvals(i)))

    def test_consistent_books_still_caught_by_data(self):
        """The 17-stripe: payload and claimed ndv agree with each
        other - only the cross-check against the data decode can
        catch the dropped value."""
        assert read_puffin_ndv(_make_puffin_table(17)) is None
        assert read_puffin_ndv(_make_puffin_table(34)) is None


class TestIcebergDv:
    """v3 deletion vectors in Puffin: framing, trust chain, and
    merge-on-read subtraction."""

    def test_dv_blob_framing(self):
        import struct
        import zlib

        from gmall_flink_210726_spark.operators.puffin import (
            decode_dv_blob,
        )
        from gmall_flink_210726_spark.operators.roaring import (
            rbm_array_encode,
        )

        pos = [1, 5, 9, 1000, (1 << 32) + 3]
        vec = rbm_array_encode(pos)
        assert vec[:4] == b"\xd1\xd3\x39\x64"  # the shared magic
        payload = (
            struct.pack(">I", len(vec))
            + vec
            + struct.pack(">I", zlib.crc32(vec))
        )
        assert decode_dv_blob(payload, len(pos)) == pos
        # length lie
        bad = struct.pack(">I", len(vec) + 1) + payload[4:]
        assert decode_dv_blob(bad, len(pos)) is None
        # crc flip
        bad2 = bytearray(payload)
        bad2[-1] ^= 1
        assert decode_dv_blob(bytes(bad2), len(pos)) is None
        # cardinality lie
        assert decode_dv_blob(payload, len(pos) + 1) is None

    def test_scan_stripes(self):
        from gmall_flink_210726_spark.operators.puffin import (
            _make_iceberg_dv_table,
            read_iceberg_dv_scan,
        )

        for i in (1, 2, 3, 4, 5):
            assert read_iceberg_dv_scan(
                _make_iceberg_dv_table(i)
            ) is not None, i
        for i in (13, 17, 19):  # crc / cardinality / range swap
            assert read_iceberg_dv_scan(
                _make_iceberg_dv_table(i)
            ) is None, i


class TestFooterOrderIndependence:
    def test_reordered_footer_entries_parse(self):
        """The spec mandates non-overlapping in-region blobs but not
        that footer metadata order match physical order — a reordered
        footer must still parse (ADVICE r13)."""
        bm1 = {"type": "t1", "fields": [1], "properties": {}}
        bm2 = {"type": "t1", "fields": [2], "properties": {}}
        puf = make_puffin([(bm1, b"aaaa"), (bm2, b"bbbb")])
        meta_start = puf.index(b'{"blobs"')
        payload = puf[meta_start : len(puf) - 12]
        meta = json.loads(payload)
        meta["blobs"].reverse()
        fp = json.dumps(meta).encode()
        cooked = (
            puf[: meta_start - 4]
            + b"PFA1"
            + fp
            + struct.pack("<I", len(fp))
            + struct.pack("<I", 0)
            + b"PFA1"
        )
        got = parse_puffin(cooked)
        assert got is not None and len(got["blobs"]) == 2
        # footer order preserved in the result
        assert got["blobs"][0][1] == b"bbbb"
        assert got["blobs"][1][1] == b"aaaa"


class TestIcebergStatsBinding:
    def test_model(self):
        from gmall_flink_210726_spark.operators.puffin import (
            _make_iceberg_stats_table,
            _stats_kvals,
            read_iceberg_stats_bound,
        )

        for i in (1, 2, 3, 4, 5):
            st = read_iceberg_stats_bound(_make_iceberg_stats_table(i))
            assert st is not None, i
            kv = _stats_kvals(i)
            assert st["ndv"] == len(set(kv))
            assert st["stale_ndv"] == len(set(kv)) + 1 + i % 7
            assert st["stale_ndv"] != st["ndv"]
            assert st["n_rows"] == len(kv)

    def test_snapshot_binding_is_load_bearing(self):
        """The stale stats file is internally VALID (it truthfully
        describes the old snapshot) — only snapshot-id binding keeps
        it unread. Rebinding the current entry onto it refuses."""
        from gmall_flink_210726_spark.operators.puffin import (
            _make_iceberg_stats_table,
            read_iceberg_stats_bound,
        )

        # i=19 is exactly that rebinding stripe
        assert read_iceberg_stats_bound(
            _make_iceberg_stats_table(19)
        ) is None

    def test_trust_refusals(self):
        from gmall_flink_210726_spark.operators.puffin import (
            _make_iceberg_stats_table,
            read_iceberg_stats_bound,
        )

        for i in (13, 26, 17, 34, 38):
            assert read_iceberg_stats_bound(
                _make_iceberg_stats_table(i)
            ) is None, i

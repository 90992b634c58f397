"""EBML/Matroska container walk (operators/ebml.py)."""

import struct
import zlib

from gmall_flink_210726_spark.operators.ebml import (
    _webm_nb,
    _webm_nc,
    make_webm,
    read_webm,
)


class TestVint:
    def test_id_keeps_marker_size_strips(self):
        from gmall_flink_210726_spark.operators.ebml import _read_vint

        # 4-byte element id keeps its marker bits
        data = bytes.fromhex("1a45dfa3")
        assert _read_vint(data, 0, True) == (0x1A45DFA3, 4)
        # 1-byte size 0x81 -> 1
        assert _read_vint(b"\x81", 0, False) == (1, 1)
        # 2-byte size 0x40 05 -> 5
        assert _read_vint(b"\x40\x05", 0, False) == (5, 2)

    def test_unknown_size_sentinel(self):
        from gmall_flink_210726_spark.operators.ebml import (
            _UNKNOWN,
            _read_vint,
        )

        assert _read_vint(b"\xff", 0, False) == (_UNKNOWN, 1)
        assert _read_vint(b"\x01" + b"\xff" * 7, 0, False) == (
            _UNKNOWN,
            8,
        )


class TestModel:
    def test_good_ids_match_formula(self):
        for i in (1, 2, 3, 4, 5, 6, 7, 8):
            st = read_webm(make_webm(i))
            assert st is not None, i
            nc = _webm_nc(i)
            assert st["n_clusters"] == nc
            assert st["n_blocks"] == sum(
                _webm_nb(i, c) for c in range(nc)
            )
            assert st["n_tracks"] == (2 if i % 2 else 1)
            assert st["width"] == 320 + 16 * (i % 20)

    def test_unknown_size_segment_parses_to_eof(self):
        """The fixture always writes the live-muxed unknown-size
        Segment (0x01 FF..FF) — the walk must run it to EOF."""
        blob = make_webm(1)
        seg_off = blob.find(bytes.fromhex("18538067"))
        assert blob[seg_off + 4 : seg_off + 12] == (
            b"\x01" + b"\xff" * 7
        )
        assert read_webm(blob) is not None


class TestTrustChain:
    def test_stripes_refuse(self):
        # Info CRC flip / cluster tiling lie / Duration lie
        for i in (13, 26, 17, 34, 19, 38):
            assert read_webm(make_webm(i)) is None, i

    def test_truncation_refuses(self):
        assert read_webm(make_webm(1)[:-5]) is None

    def test_block_for_undeclared_track_refuses(self):
        """Rewrite a SimpleBlock's track vint to reference track 7 —
        the walk must refuse rather than count it."""
        blob = bytearray(make_webm(2))  # even id: all blocks track 1
        # SimpleBlock element: id 0xA3, then size vint, then 0x81
        k = blob.find(b"\xa3")
        while k != -1:
            if blob[k + 2] == 0x81:  # size vint is 1 byte here
                blob[k + 2] = 0x87
                break
            k = blob.find(b"\xa3", k + 1)
        assert k != -1
        assert read_webm(bytes(blob)) is None

    def test_clusters_must_increase(self):
        """Two clusters with equal timestamps must refuse."""
        from gmall_flink_210726_spark.operators.ebml import (
            _ID_CLUSTER,
            _ID_CLUSTER_TS,
            _ID_DOCTYPE,
            _ID_DURATION,
            _ID_EBML,
            _ID_INFO,
            _ID_CRC32,
            _ID_SEGMENT,
            _ID_SIMPLE_BLOCK,
            _ID_TRACK_ENTRY,
            _ID_TRACK_NUMBER,
            _ID_TRACK_TYPE,
            _ID_TRACKS,
            _el,
            _enc_vint_id,
            _uint_el,
        )

        header = _el(_ID_EBML, _el(_ID_DOCTYPE, b"webm"))
        info_rest = _el(_ID_DURATION, struct.pack(">d", 0.0))
        info = _el(
            _ID_INFO,
            _el(
                _ID_CRC32,
                struct.pack("<I", zlib.crc32(info_rest)),
            )
            + info_rest,
        )
        tracks = _el(
            _ID_TRACKS,
            _el(
                _ID_TRACK_ENTRY,
                _uint_el(_ID_TRACK_NUMBER, 1)
                + _uint_el(_ID_TRACK_TYPE, 1),
            ),
        )
        blk = _el(
            _ID_SIMPLE_BLOCK,
            b"\x81" + struct.pack(">h", 0) + b"\x80" + b"xx",
        )
        cl = _el(_ID_CLUSTER, _uint_el(_ID_CLUSTER_TS, 0) + blk)
        seg = (
            _enc_vint_id(_ID_SEGMENT)
            + b"\x01"
            + b"\xff" * 7
            + info
            + tracks
            + cl
            + cl
        )
        assert read_webm(header + seg) is None

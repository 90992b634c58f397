"""MJPEG-in-MP4 frame sampling: container walk, sample-table
integrity, frame decode agreement, corrupt degrade
(operators/mjpeg.py)."""

from __future__ import annotations

import struct

from gmall_flink_210726_spark.operators.jpeg import _decode_jpeg
from gmall_flink_210726_spark.operators.mjpeg import (
    _frame_seed,
    _make_mjpeg,
    _walk_mjpeg,
)


class TestWalk:
    def test_fixture_roundtrip(self):
        for i in (1, 2, 3, 7, 9, 13):
            st = _walk_mjpeg(_make_mjpeg(i))
            n = 4 + i % 5
            assert st is not None, i
            assert st["n_frames"] == n
            assert st["n_decoded"] == (n + 1) // 2
            s0 = _frame_seed(i, 0)
            assert st["first_width"] == 8 * (1 + s0 % 4) - s0 % 5
            assert st["first_height"] == 8 * (1 + s0 % 3) - s0 % 3

    def test_pixel_sum_matches_direct_decode(self):
        i = 3
        blob = _make_mjpeg(i)
        st = _walk_mjpeg(blob)
        # recompute by decoding the same sampled frames directly
        from gmall_flink_210726_spark.operators.jpeg import _make_jpeg

        n = 4 + i % 5
        want = 0
        for j in range(0, n, 2):
            w, h, px = _decode_jpeg(_make_jpeg(_frame_seed(i, j)))
            want += int(px.sum(dtype="int64"))
        assert st["pixel_sum"] == want

    def test_truncated_mdat_degrades(self):
        assert _walk_mjpeg(_make_mjpeg(10)) is None  # corrupt stripe
        assert _walk_mjpeg(_make_mjpeg(20)) is None

    def test_size_table_lying_past_eof_degrades(self):
        blob = bytearray(_make_mjpeg(1))
        # inflate the last stsz entry so the promise exceeds the file
        idx = bytes(blob).find(b"stsz")
        n = struct.unpack_from(">I", blob, idx + 12)[0]
        last = idx + 16 + 4 * (n - 1)
        struct.pack_into(">I", blob, last,
                         struct.unpack_from(">I", blob, last)[0] + 999)
        assert _walk_mjpeg(bytes(blob)) is None

    def test_wrong_codec_degrades(self):
        blob = bytearray(_make_mjpeg(1))
        idx = bytes(blob).find(b"jpeg")  # stsd entry 4cc
        blob[idx : idx + 4] = b"avc1"
        assert _walk_mjpeg(bytes(blob)) is None

    def test_garbage_frame_bytes_degrade(self):
        blob = bytearray(_make_mjpeg(1))
        idx = bytes(blob).find(b"mdat")
        blob[idx + 8 : idx + 12] = b"\x00\x00\x00\x00"  # kill SOI
        assert _walk_mjpeg(bytes(blob)) is None

    def test_seed_never_hits_jpeg_corrupt_stripe(self):
        for i in range(200):
            for j in range(9):
                assert _frame_seed(i, j) % 13 != 0

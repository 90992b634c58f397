"""TIFF codec unit tests (pure Python, no Spark): fixture round-trip
vs LCG formulas on both byte orders, corrupt degradation, fuzz error
surface, multi-strip and inline-value coverage."""

from __future__ import annotations

import random
import struct

import pytest

from gmall_flink_210726_spark.operators.tiff import (
    _TIF_BAD,
    _TIF_H,
    _TIF_V,
    _TIF_W,
    _decode_tiff,
    _make_tiff,
)


class TestTIFF:
    def test_round_trip_both_endians(self):
        # even ids little-endian (II), odd big-endian (MM)
        for i in (2, 3, 4, 5, 100, 101):
            assert not _TIF_BAD(i)
            w, h, spp, data = _decode_tiff(_make_tiff(i))
            assert (w, h, spp) == (_TIF_W(i), _TIF_H(i), 3)
            assert data == bytes(
                _TIF_V(i, p, ch) for p in range(w * h) for ch in range(3)
            )

    def test_multi_strip_exercised(self):
        # h >= 3 with RowsPerStrip=2 -> at least two strips
        i = 5  # h = 1 + 5 % 7 = 6 -> 3 strips
        assert _TIF_H(i) >= 3
        w, h, _, data = _decode_tiff(_make_tiff(i))
        assert len(data) == w * h * 3

    def test_corrupt_blobs_raise(self):
        for i in (9, 18, 27):
            assert _TIF_BAD(i)
            with pytest.raises(ValueError):
                _decode_tiff(_make_tiff(i))

    def test_not_a_tiff(self):
        with pytest.raises(ValueError):
            _decode_tiff(b"GIF89a\x00\x00\x00\x00")

    def test_compressed_rejected(self):
        # patch the Compression entry value (tag 259) to 5 (LZW)
        blob = bytearray(_make_tiff(2))
        e = "<"
        # scan IFD entries for tag 259 and flip its value
        ifd_off = struct.unpack(e + "I", blob[4:8])[0]
        count = struct.unpack(e + "H", blob[ifd_off : ifd_off + 2])[0]
        for k in range(count):
            pos = ifd_off + 2 + 12 * k
            tag = struct.unpack(e + "H", blob[pos : pos + 2])[0]
            if tag == 259:
                blob[pos + 8 : pos + 10] = struct.pack(e + "H", 5)
        with pytest.raises(ValueError):
            _decode_tiff(bytes(blob))

    def test_fuzz_error_surface(self):
        rng = random.Random(3)
        for i in (2, 3, 10):
            blob = bytearray(_make_tiff(i))
            for _ in range(150):
                bb = bytearray(blob)
                for _ in range(rng.randrange(1, 5)):
                    bb[rng.randrange(len(bb))] = rng.randrange(256)
                try:
                    _decode_tiff(bytes(bb))
                except ValueError:
                    pass
        for _ in range(200):
            junk = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 120)))
            try:
                _decode_tiff(junk)
            except ValueError:
                pass

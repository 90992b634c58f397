"""Adam7 interlaced PNG codec tests (pure Python, no Spark): pass
scatter round-trip vs the LCG raster, empty-pass skip, all-five-filter
coverage, malformed degradation."""

from __future__ import annotations

import random
import struct
import zlib

import numpy as np
import pytest

from gmall_flink_210726_spark.operators.multimodal import (
    _ADAM7,
    _PA7_BAD,
    _PA7_H,
    _PA7_V,
    _PA7_W,
    _decode_png,
    _make_png,
    _make_png_adam7,
)


class TestAdam7:
    def test_round_trip_vs_lcg(self):
        ok = bad = 0
        for i in range(60):
            blob = _make_png_adam7(i)
            if _PA7_BAD(i):
                with pytest.raises((ValueError, zlib.error)):
                    _decode_png(blob)
                bad += 1
                continue
            w, h, px = _decode_png(blob)
            assert (w, h) == (_PA7_W(i), _PA7_H(i))
            expect = np.array(
                [_PA7_V(i, k) for k in range(h * w * 3)]
            ).reshape(h, w, 3)
            assert (px == expect).all(), i
            ok += 1
        assert ok > 40 and bad > 3

    def test_empty_pass_rule_exercised(self):
        """Fixture ids with h < 5 skip the y0=4 pass entirely (no
        bytes, not even filter bytes) — both sides must agree."""
        small = [i for i in range(60) if _PA7_H(i) < 5 and not _PA7_BAD(i)]
        assert small  # the fixture grid reaches h=3,4
        for i in small[:5]:
            w, h, px = _decode_png(_make_png_adam7(i))
            assert (px >= 0).all() and px.shape == (h, w, 3)

    def test_all_pixels_written_once(self):
        """The 7-pass grid must tile (y, x) exactly: every pixel
        scattered once, none missed — checked directly on the grid."""
        for w, h in ((5, 3), (17, 11), (8, 8), (1, 1), (2, 9)):
            seen = np.zeros((h, w), int)
            for x0, y0, dx, dy in _ADAM7:
                seen[y0::dy, x0::dx] += 1
            assert (seen == 1).all(), (w, h)

    def test_interlace_flag_mismatch_fails(self):
        """A non-interlaced body labeled interlace=1 must fail the
        pass-walk length check, not silently misdecode."""
        blob = bytearray(_make_png(12))
        # IHDR data starts at offset 16; interlace is its 13th byte
        ihdr_off = 16
        blob[ihdr_off + 12] = 1
        # fix the IHDR CRC (chunk type at 12..16, data 16..29)
        crc = zlib.crc32(bytes(blob[12 : ihdr_off + 13]))
        blob[ihdr_off + 13 : ihdr_off + 17] = struct.pack(">I", crc)
        with pytest.raises(ValueError):
            _decode_png(bytes(blob))

    def test_fuzz_never_hangs_or_segfaults(self):
        rng = random.Random(13)
        base = _make_png_adam7(3)
        for _ in range(200):
            blob = bytearray(base)
            for _ in range(rng.randrange(1, 4)):
                blob[rng.randrange(len(blob))] = rng.randrange(256)
            try:
                _decode_png(bytes(blob))
            except (ValueError, zlib.error, struct.error):
                pass

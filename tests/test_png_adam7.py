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


class TestPalettePNG:
    def test_round_trip_vs_palette_lcg(self):
        from gmall_flink_210726_spark.operators.multimodal import (
            _PPL_B,
            _PPL_BAD,
            _PPL_G,
            _PPL_H,
            _PPL_IDX,
            _PPL_P,
            _PPL_R,
            _PPL_W,
            _make_png_palette,
        )

        ok = bad = 0
        for i in range(60):
            blob = _make_png_palette(i)
            if _PPL_BAD(i):
                with pytest.raises((ValueError, zlib.error)):
                    _decode_png(blob)
                bad += 1
                continue
            w, h, px = _decode_png(blob)
            assert (w, h) == (_PPL_W(i), _PPL_H(i))
            P = _PPL_P(i)
            exp = np.zeros((h, w, 3), np.int64)
            for k in range(h * w):
                j = _PPL_IDX(i, k, P)
                exp[k // w, k % w] = (_PPL_R(i, j), _PPL_G(i, j), _PPL_B(i, j))
            assert (px == exp).all(), i
            ok += 1
        assert ok > 40 and bad > 3

    def test_bpp1_filter_unit_is_load_bearing(self):
        """A bpp=3 unfilter of a bpp=1-filtered Sub line must differ —
        proves the parameterization is exercised, not vacuous."""
        import numpy as np

        from gmall_flink_210726_spark.operators.multimodal import (
            _filter_scanline,
            _unfilter_scanline,
        )

        rng = np.random.RandomState(3)
        row = rng.randint(0, 256, 24).astype(np.uint8)
        prev = np.zeros(24, np.uint8)
        filt = np.frombuffer(
            _filter_scanline(1, row, prev, bpp=1), np.uint8
        )
        good = _unfilter_scanline(1, filt, prev.astype(np.int64), bpp=1)
        assert (good == row).all()
        wrong = _unfilter_scanline(1, filt, prev.astype(np.int64), bpp=3)
        assert not (wrong == row).all()

    def test_out_of_range_index_rejected(self):
        """Corrupt a palette image so an index exceeds the PLTE size:
        the decoder must raise, not wrap."""
        from gmall_flink_210726_spark.operators.multimodal import (
            _make_png_palette,
            _png_chunk,
        )

        blob = _make_png_palette(3)
        # rebuild with a truncated 2-entry palette; indices go to 15+
        sig_ihdr = blob[:33]
        rest = blob[33:]
        # locate PLTE chunk: length(4) 'PLTE' data crc
        assert rest[4:8] == b"PLTE"
        ln = int.from_bytes(rest[:4], "big")
        after = rest[12 + ln :]
        small = _png_chunk(b"PLTE", bytes(6))
        with pytest.raises(ValueError):
            _decode_png(sig_ihdr + small + after)

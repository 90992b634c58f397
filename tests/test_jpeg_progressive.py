"""Progressive-JPEG decoder tests: fixture roundtrip exactness,
baseline/progressive cross-validation on IDENTICAL coefficients
(including ZRL and split spectral bands), DC successive-approximation
with negative coefficients, honest rejection of the unsupported AC
refinement scan kind, and fuzz (the error surface must be ValueError
only — anything else kills a Spark task for one bad blob)."""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from gmall_flink_210726_spark.operators.jpeg import (
    _AC_BITS,
    _AC_VALS,
    _BitWriter,
    _DC_BITS,
    _DC_VALS,
    _PAC_BITS,
    _PAC_VALS,
    _PJPG_BAD,
    _PJPG_BH,
    _PJPG_BW,
    _PJPG_HPAD,
    _PJPG_V,
    _PJPG_WPAD,
    _decode_jpeg,
    _dht,
    _make_progressive_jpeg,
    _sos,
)

_Q = 8


def _headers(sof_marker: bytes, w: int, h: int) -> bytearray:
    out = bytearray(b"\xff\xd8")
    out += struct.pack(">2sH", b"\xff\xdb", 2 + 65) + bytes([0x00]) + bytes(
        [_Q] * 64
    )
    out += struct.pack(
        ">2sHBHHB", b"\xff" + sof_marker, 11, 8, h, w, 1
    ) + bytes([1, 0x11, 0])
    out += _dht(0, 0, _DC_BITS, _DC_VALS)
    out += _dht(1, 0, _PAC_BITS, _PAC_VALS)
    return out


def _pac(bwr: _BitWriter, sym: int) -> None:
    bwr.write(_PAC_VALS.index(sym), 4)


def _dc(bwr: _BitWriter, diff: int) -> None:
    cat = abs(diff).bit_length()
    bwr.write(cat, 4)
    if cat:
        bwr.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)


class TestProgressiveFixture:
    def test_fixture_roundtrip_exact(self):
        for i in (1, 2, 3, 5, 7, 11, 19, 37, 59):
            w, h, px = _decode_jpeg(_make_progressive_jpeg(i))
            bw, bh = _PJPG_BW(i), _PJPG_BH(i)
            assert (w, h) == (8 * bw - _PJPG_WPAD(i), 8 * bh - _PJPG_HPAD(i))
            exp = np.zeros((bh * 8, bw * 8), np.int64)
            for b in range(bw * bh):
                by, bx = b // bw, b % bw
                exp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _PJPG_V(i, b)
            assert (px[:, :, 0] == exp[:h, :w]).all()

    def test_corrupt_fixture_rejected(self):
        assert _PJPG_BAD(12)
        with pytest.raises(ValueError):
            _decode_jpeg(_make_progressive_jpeg(12))


class TestBaselineProgressiveCrossValidation:
    """Encode the SAME single-block coefficient set (DC = -7, AC +5 at
    zigzag 1, AC -5 at zigzag 34 — reached via ZRL) both as one
    baseline full-band scan and as four progressive scans (DC split by
    successive approximation, AC split across two spectral bands), and
    require bit-identical decoded pixels. Catches point-transform,
    refinement-bit, band-boundary, and ZRL bookkeeping errors without
    assuming anything about the IDCT."""

    def _baseline(self) -> bytes:
        out = _headers(b"\xc0", 8, 8)
        out += _sos([(1, 0, 0)], 0, 63, 0, 0)
        bwr = _BitWriter()
        _dc(bwr, -7)
        _pac(bwr, 0x03)  # run 0, size 3 at k=1
        bwr.write(5, 3)  # +5
        _pac(bwr, 0xF0)  # ZRL: k 2 -> 18
        _pac(bwr, 0xF0)  # ZRL: k 18 -> 34
        _pac(bwr, 0x03)
        bwr.write(2, 3)  # -5 (mag = -5 + 7)
        _pac(bwr, 0x00)  # EOB
        out += bwr.flush()
        out += b"\xff\xd9"
        return bytes(out)

    def _progressive(self) -> bytes:
        out = _headers(b"\xc2", 8, 8)
        # DC first, Al=1: sends -7 >> 1 = -4
        out += _sos([(1, 0, 0)], 0, 0, 0, 1)
        bwr = _BitWriter()
        _dc(bwr, -4)
        out += bwr.flush()
        # DC refinement, Ah=1 Al=0: low bit of -7 is 1
        out += _sos([(1, 0, 0)], 0, 0, 1, 0)
        bwr = _BitWriter()
        bwr.write(1, 1)
        out += bwr.flush()
        # AC band 1-17: +5 at k=1, then EOB closes the rest of the band
        out += _sos([(1, 0, 0)], 1, 17, 0, 0)
        bwr = _BitWriter()
        _pac(bwr, 0x03)
        bwr.write(5, 3)
        _pac(bwr, 0x00)
        out += bwr.flush()
        # AC band 18-63: ZRL (k 18 -> 34), -5 at k=34, EOB
        out += _sos([(1, 0, 0)], 18, 63, 0, 0)
        bwr = _BitWriter()
        _pac(bwr, 0xF0)
        _pac(bwr, 0x03)
        bwr.write(2, 3)
        _pac(bwr, 0x00)
        out += bwr.flush()
        out += b"\xff\xd9"
        return bytes(out)

    def test_identical_pixels(self):
        wb, hb, pb = _decode_jpeg(self._baseline())
        wp, hp, pp = _decode_jpeg(self._progressive())
        assert (wb, hb) == (wp, hp) == (8, 8)
        assert (pb == pp).all()
        # the coefficients are real: the image is NOT flat
        assert len(np.unique(pb)) > 1

    def test_refinement_bit_matters(self):
        """Dropping the DC refinement scan must change the output —
        proves the scan carries signal, not padding."""
        full = self._progressive()
        # rebuild without scan 2
        out = _headers(b"\xc2", 8, 8)
        out += _sos([(1, 0, 0)], 0, 0, 0, 1)
        bwr = _BitWriter()
        _dc(bwr, -4)
        out += bwr.flush()
        out += _sos([(1, 0, 0)], 1, 17, 0, 0)
        bwr = _BitWriter()
        _pac(bwr, 0x03)
        bwr.write(5, 3)
        _pac(bwr, 0x00)
        out += bwr.flush()
        out += b"\xff\xd9"
        _, _, ref = _decode_jpeg(full)
        _, _, cut = _decode_jpeg(bytes(out))
        assert not (ref == cut).all()


class TestProgressiveRejections:
    def test_ac_successive_refinement_rejected(self):
        out = _headers(b"\xc2", 8, 8)
        out += _sos([(1, 0, 0)], 1, 63, 1, 0)  # Ah>0 on an AC band
        out += b"\x00" + b"\xff\xd9"
        with pytest.raises(ValueError):
            _decode_jpeg(bytes(out))

    def test_interleaved_ac_scan_rejected(self):
        out = bytearray(b"\xff\xd8")
        out += struct.pack(">2sH", b"\xff\xdb", 2 + 65) + bytes(
            [0x00]
        ) + bytes([_Q] * 64)
        out += struct.pack(
            ">2sHBHHB", b"\xff\xc2", 14, 8, 8, 8, 2
        ) + bytes([1, 0x11, 0, 2, 0x11, 0])
        out += _dht(1, 0, _PAC_BITS, _PAC_VALS)
        out += _sos([(1, 0, 0), (2, 0, 0)], 1, 63, 0, 0)
        out += b"\x00" + b"\xff\xd9"
        with pytest.raises(ValueError):
            _decode_jpeg(bytes(out))

    def test_dc_scan_with_ac_band_rejected(self):
        out = _headers(b"\xc2", 8, 8)
        out += _sos([(1, 0, 0)], 0, 63, 0, 0)
        out += b"\x00" + b"\xff\xd9"
        with pytest.raises(ValueError):
            _decode_jpeg(bytes(out))

    def test_baseline_partial_band_rejected(self):
        out = _headers(b"\xc0", 8, 8)
        out += _sos([(1, 0, 0)], 1, 63, 0, 0)
        out += b"\x00" + b"\xff\xd9"
        with pytest.raises(ValueError):
            _decode_jpeg(bytes(out))


class TestProgressiveFuzz:
    def test_truncations_never_crash(self):
        blob = _make_progressive_jpeg(7)
        for n in range(len(blob)):
            try:
                _decode_jpeg(blob[:n])
            except ValueError:
                pass

    def test_bitflip_fuzz(self):
        rng = random.Random(1234)
        blob = bytearray(_make_progressive_jpeg(19))
        for _ in range(400):
            mut = bytearray(blob)
            pos = rng.randrange(len(mut))
            mut[pos] ^= 1 << rng.randrange(8)
            try:
                _decode_jpeg(bytes(mut))
            except ValueError:
                pass

    def test_random_bytes_never_crash(self):
        rng = random.Random(99)
        for _ in range(300):
            n = rng.randrange(0, 200)
            blob = b"\xff\xd8" + bytes(
                rng.randrange(256) for _ in range(n)
            )
            try:
                _decode_jpeg(blob)
            except ValueError:
                pass


class TestRestartIntervals:
    def test_fixture_roundtrip_exact(self):
        from gmall_flink_210726_spark.operators.jpeg import (
            _RJPG_BH,
            _RJPG_BW,
            _RJPG_HPAD,
            _RJPG_V,
            _RJPG_WPAD,
            _make_restart_jpeg,
        )

        for i in (1, 2, 3, 5, 9, 13, 17, 21):
            w, h, px = _decode_jpeg(_make_restart_jpeg(i))
            bw, bh = _RJPG_BW(i), _RJPG_BH(i)
            assert (w, h) == (8 * bw - _RJPG_WPAD(i), 8 * bh - _RJPG_HPAD(i))
            exp = np.zeros((bh * 8, bw * 8), np.int64)
            for b in range(bw * bh):
                exp[
                    (b // bw) * 8 : (b // bw) * 8 + 8,
                    (b % bw) * 8 : (b % bw) * 8 + 8,
                ] = _RJPG_V(i, b)
            assert (px[:, :, 0] == exp[:h, :w]).all()

    def test_out_of_sequence_restart_rejected(self):
        """Flipping an RST marker's sequence nibble must fail loudly —
        a resync to the wrong interval silently corrupts every
        following block otherwise."""
        from gmall_flink_210726_spark.operators.jpeg import _make_restart_jpeg

        blob = bytearray(_make_restart_jpeg(2))  # 4x3 blocks, 3 restarts
        # find the first RST marker (FFD0) in the entropy stream
        idx = bytes(blob).find(b"\xff\xd0")
        assert idx > 0
        blob[idx + 1] = 0xD5  # wrong sequence number
        with pytest.raises(ValueError):
            _decode_jpeg(bytes(blob))

    def test_missing_restart_rejected(self):
        from gmall_flink_210726_spark.operators.jpeg import _make_restart_jpeg

        blob = bytearray(_make_restart_jpeg(2))
        idx = bytes(blob).find(b"\xff\xd0")
        del blob[idx : idx + 2]
        with pytest.raises(ValueError):
            _decode_jpeg(bytes(blob))

    def test_restart_bitflip_fuzz(self):
        from gmall_flink_210726_spark.operators.jpeg import _make_restart_jpeg

        rng = random.Random(77)
        blob = bytearray(_make_restart_jpeg(2))
        for _ in range(400):
            mut = bytearray(blob)
            pos = rng.randrange(len(mut))
            mut[pos] ^= 1 << rng.randrange(8)
            try:
                _decode_jpeg(bytes(mut))
            except ValueError:
                pass


class TestChroma420:
    def test_fixture_roundtrip_against_pure_formulas(self):
        """Decoded RGB must equal the independent per-pixel recompute
        (math.floor over doubles — no shared code with the decoder)."""
        import math

        from gmall_flink_210726_spark.operators.jpeg import (
            _J420_CB,
            _J420_CR,
            _J420_HPAD,
            _J420_MH,
            _J420_MW,
            _J420_WPAD,
            _J420_Y,
            _make_jpeg420,
        )

        for i in (1, 2, 3, 7, 11, 29):
            w, h, px = _decode_jpeg(_make_jpeg420(i))
            mw, mh = _J420_MW(i), _J420_MH(i)
            assert (w, h) == (16 * mw - _J420_WPAD(i), 16 * mh - _J420_HPAD(i))
            exp = np.zeros((h, w, 3), np.int64)
            for yy in range(h):
                for xx in range(w):
                    m = (yy // 16) * mw + xx // 16
                    Y = _J420_Y(i, xx // 8, yy // 8, mw)
                    cb, cr = _J420_CB(i, m), _J420_CR(i, m)
                    clip = lambda v: min(255, max(0, v))  # noqa: E731
                    exp[yy, xx] = (
                        clip(math.floor(Y + 1.402 * (cr - 128) + 0.5)),
                        clip(
                            math.floor(
                                Y
                                - 0.344136 * (cb - 128)
                                - 0.714136 * (cr - 128)
                                + 0.5
                            )
                        ),
                        clip(math.floor(Y + 1.772 * (cb - 128) + 0.5)),
                    )
            assert (px == exp).all(), i

    def test_truncation_and_bitflip_fuzz(self):
        from gmall_flink_210726_spark.operators.jpeg import _make_jpeg420

        blob = bytearray(_make_jpeg420(7))
        for n in range(0, len(blob), 3):
            try:
                _decode_jpeg(bytes(blob[:n]))
            except ValueError:
                pass
        rng = random.Random(55)
        for _ in range(400):
            mut = bytearray(blob)
            mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
            try:
                _decode_jpeg(bytes(mut))
            except ValueError:
                pass

    def test_unsupported_sampling_rejected(self):
        """4x1 (0x41) sampling stays outside the subset."""
        from gmall_flink_210726_spark.operators.jpeg import _make_jpeg420

        blob = bytearray(_make_jpeg420(7))
        idx = bytes(blob).find(bytes([1, 0x22, 0]))
        blob[idx + 1] = 0x41
        with pytest.raises(ValueError):
            _decode_jpeg(bytes(blob))


class TestJpeg422:
    def test_decode_matches_independent_recompute(self):
        """4:2:2 decoded RGB must equal the per-pixel recompute: Y per
        8x8 block, chroma per 16x8 MCU (m = (y//8)*mw + x//16) — a
        4:2:0-style 16x16 chroma region would mismatch on any image
        with mh > 1."""
        import math

        from gmall_flink_210726_spark.operators.jpeg import (
            _J422_CB,
            _J422_CR,
            _J422_HPAD,
            _J422_MH,
            _J422_MW,
            _J422_WPAD,
            _J422_Y,
            _make_jpeg422,
        )

        for i in (1, 2, 3, 7, 11, 29):
            w, h, px = _decode_jpeg(_make_jpeg422(i))
            mw, mh = _J422_MW(i), _J422_MH(i)
            assert (w, h) == (16 * mw - _J422_WPAD(i), 8 * mh - _J422_HPAD(i))
            exp = np.zeros((h, w, 3), np.int64)
            for yy in range(h):
                for xx in range(w):
                    m = (yy // 8) * mw + xx // 16
                    Y = _J422_Y(i, xx // 8, yy // 8, mw)
                    cb, cr = _J422_CB(i, m), _J422_CR(i, m)
                    clip = lambda v: min(255, max(0, v))  # noqa: E731
                    exp[yy, xx] = (
                        clip(math.floor(Y + 1.402 * (cr - 128) + 0.5)),
                        clip(
                            math.floor(
                                Y
                                - 0.344136 * (cb - 128)
                                - 0.714136 * (cr - 128)
                                + 0.5
                            )
                        ),
                        clip(math.floor(Y + 1.772 * (cb - 128) + 0.5)),
                    )
            assert (px == exp).all(), i

    def test_corrupt_and_fuzz(self):
        from gmall_flink_210726_spark.operators.jpeg import (
            _J422_BAD,
            _make_jpeg422,
        )

        for i in (13, 26, 39):
            assert _J422_BAD(i)
            with pytest.raises(ValueError):
                _decode_jpeg(_make_jpeg422(i))
        rng = random.Random(56)
        blob = bytearray(_make_jpeg422(7))
        for _ in range(300):
            mut = bytearray(blob)
            mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
            try:
                _decode_jpeg(bytes(mut))
            except ValueError:
                pass

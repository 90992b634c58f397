"""GIF codec unit tests (pure Python, no Spark): LZW round-trip
including the KwKwK case and table resets, fixture round-trip vs LCG
formulas, corrupt-blob degradation, extension-block skipping."""

from __future__ import annotations

import random
import struct

import pytest

from gmall_flink_210726_spark.operators.gif import (
    _GIF_BAD,
    _GIF_H,
    _GIF_IDX,
    _GIF_NCOLORS,
    _GIF_PAL,
    _GIF_W,
    _decode_gif,
    _lzw_decode,
    _lzw_encode,
    _make_gif,
)


class TestLZW:
    def test_round_trip_random(self):
        rng = random.Random(7)
        for trial in range(50):
            n = rng.randrange(1, 300)
            seq = [rng.randrange(4) for _ in range(n)]
            assert _lzw_decode(_lzw_encode(seq, 2), 2, n) == seq

    def test_kwkwk_case(self):
        # aaaa... forces code == next_code on decode immediately
        seq = [1] * 64
        assert _lzw_decode(_lzw_encode(seq, 2), 2, 64) == seq

    def test_table_reset_past_4096(self):
        seq = [(i * 7 + i // 5) % 4 for i in range(20000)]
        assert _lzw_decode(_lzw_encode(seq, 2), 2, len(seq)) == seq

    def test_truncated_raises(self):
        enc = _lzw_encode([1, 2, 3, 0, 1, 2] * 10, 2)
        with pytest.raises(ValueError):
            _lzw_decode(enc[: len(enc) // 2], 2, 60)


class TestGIF:
    def test_fixture_round_trip(self):
        for i in (1, 2, 5, 17, 100, 255):
            assert not _GIF_BAD(i)
            w, h, pal, idx = _decode_gif(_make_gif(i))
            assert (w, h) == (_GIF_W(i), _GIF_H(i))
            assert idx == [_GIF_IDX(i, p) for p in range(w * h)]
            assert list(pal) == [
                _GIF_PAL(i, c, ch)
                for c in range(_GIF_NCOLORS)
                for ch in range(3)
            ]

    def test_corrupt_blobs_raise(self):
        for i in (11, 22, 33, 44):
            assert _GIF_BAD(i)
            with pytest.raises(ValueError):
                _decode_gif(_make_gif(i))

    def test_extension_blocks_skipped(self):
        # splice a graphic-control extension before the image descriptor
        blob = bytearray(_make_gif(3))
        desc_at = blob.index(0x2C, 13)
        gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        patched = bytes(blob[:desc_at]) + gce + bytes(blob[desc_at:])
        w, h, _pal, idx = _decode_gif(patched)
        assert (w, h) == (_GIF_W(3), _GIF_H(3))
        assert idx == [_GIF_IDX(3, p) for p in range(w * h)]

    def test_not_a_gif(self):
        with pytest.raises(ValueError):
            _decode_gif(b"PNG\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00")


class TestGIFFuzz:
    def test_random_bytes_never_crash(self):
        """The decoder's error surface is ValueError ONLY — any other
        exception would kill the whole Spark task for one bad blob."""
        rng = random.Random(42)
        for _ in range(300):
            n = rng.randrange(0, 200)
            blob = bytes(rng.randrange(256) for _ in range(n))
            try:
                _decode_gif(blob)
            except ValueError:
                pass

    def test_bitflip_fuzz_on_valid_gifs(self):
        """Single-byte corruptions of real GIFs either decode (the
        flip hit a don't-care byte or payload value) or raise
        ValueError — never IndexError/struct.error escape."""
        rng = random.Random(43)
        for i in (2, 7, 19):
            blob = bytearray(_make_gif(i))
            for _ in range(120):
                pos = rng.randrange(len(blob))
                old = blob[pos]
                blob[pos] = rng.randrange(256)
                try:
                    _decode_gif(bytes(blob))
                except ValueError:
                    pass
                finally:
                    blob[pos] = old


class TestInterlacedGIF:
    def test_interlace_round_trip(self):
        from gmall_flink_210726_spark.operators.gif import (
            _GIN_BAD,
            _GIN_H,
            _GIN_IDX,
            _GIN_W,
            _decode_gif,
            _make_gif_interlaced,
        )

        for i in (1, 2, 3, 4, 7, 101, 102):
            assert not _GIN_BAD(i)
            w, h, _pal, idx = _decode_gif(_make_gif_interlaced(i))
            assert (w, h) == (_GIN_W(i), _GIN_H(i))
            assert idx == [_GIN_IDX(i, p) for p in range(w * h)]

    def test_interlacing_actually_permutes_rows(self):
        """The stored LZW order must differ from display order (else the
        fixture would not exercise de-interlacing at all)."""
        from gmall_flink_210726_spark.operators.gif import _interlace_rows

        for h in range(5, 13):
            order = _interlace_rows(h)
            assert sorted(order) == list(range(h))
            assert order != list(range(h))

    def test_all_four_passes_carry_rows(self):
        from gmall_flink_210726_spark.operators.gif import _GIN_H, _interlace_rows

        for i in range(20):
            h = _GIN_H(i)
            assert h >= 5
            # pass lengths: 8-step from 0, 8-step from 4, 4-step from 2, 2-step from 1
            assert len(list(range(4, h, 8))) >= 1
            assert len(list(range(2, h, 4))) >= 1
            assert len(list(range(1, h, 2))) >= 1

    def test_corrupt_interlaced_blobs_raise(self):
        from gmall_flink_210726_spark.operators.gif import (
            _GIN_BAD,
            _decode_gif,
            _make_gif_interlaced,
        )

        for i in (10, 20, 30):
            assert _GIN_BAD(i)
            with pytest.raises(ValueError):
                _decode_gif(_make_gif_interlaced(i))

    def test_plain_gif_still_sequential(self):
        """The interlace branch must not fire for flag-0 images."""
        from gmall_flink_210726_spark.operators.gif import (
            _GIF_IDX,
            _decode_gif,
            _make_gif,
        )

        w, h, _pal, idx = _decode_gif(_make_gif(3))
        assert idx == [_GIF_IDX(3, p) for p in range(w * h)]


class TestAnimatedGIF:
    def test_frame_decode_and_order(self):
        from gmall_flink_210726_spark.operators.gif import (
            _GAN_IDX,
            _GAN_NF,
            _decode_gif_frames,
            _make_gif_animated,
        )

        for i in (1, 2, 3, 7, 30):
            w, h, pal, frames = _decode_gif_frames(_make_gif_animated(i))
            assert len(frames) == _GAN_NF(i)
            for f, (iw, ih, idx) in enumerate(frames):
                assert idx == [_GAN_IDX(i, f, p) for p in range(iw * ih)]

    def test_truncated_animation_rejected(self):
        from gmall_flink_210726_spark.operators.gif import (
            _GAN_BAD,
            _decode_gif_frames,
            _make_gif_animated,
        )

        assert _GAN_BAD(13)
        with pytest.raises(ValueError):
            _decode_gif_frames(_make_gif_animated(13))

    def test_animation_bitflip_fuzz(self):
        from gmall_flink_210726_spark.operators.gif import (
            _decode_gif_frames,
            _make_gif_animated,
        )

        rng = random.Random(31)
        blob = bytearray(_make_gif_animated(30))
        for _ in range(400):
            mut = bytearray(blob)
            mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
            try:
                _decode_gif_frames(bytes(mut))
            except ValueError:
                pass

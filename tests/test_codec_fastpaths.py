"""Round-14 optimization: the C-backed codec fast paths must agree with
their from-spec Python twins — on valid streams byte-exactly, and on
corrupted streams in OUTCOME (both decode to the same bytes or both
raise ValueError; which layer catches a given corruption may differ,
the walk-level degrade decision may not)."""

from __future__ import annotations

import random
import zlib

import pytest

from gmall_flink_210726_spark.operators.inflate import (
    _inflate_at,
    _inflate_at_py,
    _run_text,
    inflate,
)
from gmall_flink_210726_spark.operators.parquetmeta import (
    _snappy_decompress_py,
    snappy_decompress,
)


def _deflate(data: bytes, level: int = 6) -> bytes:
    c = zlib.compressobj(level, zlib.DEFLATED, -15)
    return c.compress(data) + c.flush()


class TestInflateFastPath:
    def test_valid_streams_agree_with_py_twin(self):
        for i in range(12):
            payload = _run_text(i, i % 5, 150 + 211 * i)
            for level in (0, 1, 6, 9):
                raw = _deflate(payload, level)
                assert _inflate_at(raw, 0) == _inflate_at_py(raw, 0)
                # offset + trailing garbage: same resume position
                blob = b"\xaa\xbb" + raw + b"tail"
                assert _inflate_at(blob, 2) == _inflate_at_py(blob, 2)

    def test_corrupt_streams_same_outcome(self):
        rng = random.Random(14)
        raw = _deflate(_run_text(3, 1, 900), 6)
        for _ in range(400):
            mut = bytearray(raw)
            mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
            mut = bytes(mut)
            try:
                a = _inflate_at_py(mut, 0)
            except ValueError:
                a = "VE"
            try:
                b = _inflate_at(mut, 0)
            except ValueError:
                b = "VE"
            assert a == b

    def test_truncation_raises(self):
        raw = _deflate(_run_text(5, 2, 500))
        for cut in range(0, len(raw) - 1, 5):
            with pytest.raises(ValueError):
                _inflate_at(raw[:cut], 0)

    def test_bomb_guard_preserved(self):
        # 64 MiB of zeros deflates tiny but exceeds the 16 MiB guard
        with pytest.raises(ValueError):
            inflate(_deflate(b"\x00" * (1 << 26), 9))


class TestSnappyFastPath:
    def test_valid_blocks_agree_with_py_twin(self):
        import pyarrow as pa

        codec = pa.Codec("snappy")
        for i in range(12):
            payload = _run_text(i, i % 4, 100 + 173 * i)
            block = bytes(codec.compress(payload))
            assert snappy_decompress(block) == payload
            assert _snappy_decompress_py(block) == payload

    def test_corrupt_blocks_same_outcome(self):
        import pyarrow as pa

        rng = random.Random(7)
        block = bytes(pa.Codec("snappy").compress(_run_text(2, 1, 800)))
        for _ in range(400):
            mut = bytearray(block)
            mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
            mut = bytes(mut)
            try:
                a = _snappy_decompress_py(mut)
            except ValueError:
                a = "VE"
            try:
                b = snappy_decompress(mut)
            except ValueError:
                b = "VE"
            assert a == b


class TestZstdFastPath:
    def test_fixture_streams_roundtrip_and_refuse(self):
        from gmall_flink_210726_spark.operators.zstd import (
            _make_zstd_stream,
            iter_zstd_frames,
        )

        for i in range(60):
            blob = _make_zstd_stream(i)
            try:
                frames = list(iter_zstd_frames(blob))
                err = None
            except ValueError:
                frames, err = None, "VE"
            if i % 9 == 0:
                assert err == "VE", i  # corrupt stripe must refuse
            else:
                assert err is None and frames, i

    def test_checksum_tamper_refuses_on_fast_path(self):
        from gmall_flink_210726_spark.operators.zstd import (
            _make_zstd_stream,
            iter_zstd_frames,
        )

        blob = bytearray(_make_zstd_stream(1))  # last frame checksummed
        blob[-1] ^= 0xFF
        with pytest.raises(ValueError):
            list(iter_zstd_frames(bytes(blob)))

    def test_dictionary_frames_still_take_spec_loop(self):
        # the .warc.zst dictionary convention exercises the fallback:
        # parse_zstd_dictionary output priming the window — the fast
        # path must not intercept did != 0 frames
        from gmall_flink_210726_spark.operators.warc import (
            _make_warc_zstd_stream,
            _walk_warc_zstd_text,
        )

        i = 5  # every 5th id rides the leading-dictionary convention
        blob = _make_warc_zstd_stream(i, "dict fallback text " * 8)
        st = _walk_warc_zstd_text(blob)
        assert st is not None

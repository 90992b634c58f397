"""LZ4 block + frame decode vs the reference encoder; XXH32 vectors;
linked-block windows; checksum paths (operators/lz4.py)."""

from __future__ import annotations

import random
import struct

import pyarrow as pa
import pytest

from gmall_flink_210726_spark.operators.lz4 import (
    add_lz4_content_checksum,
    iter_lz4_frames,
    lz4_block_decompress,
    lz4_frame_decompress,
    xxh32,
)


def _gen(rng, n, mode):
    if mode == 0:
        return bytes(rng.randrange(256) for _ in range(n))
    if mode == 1:
        unit = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 30)))
        return (unit * (n // len(unit) + 1))[:n]
    return bytes(rng.choice(b"abcd  ") for _ in range(n))


class TestXxh32:
    def test_known_vectors(self):
        assert xxh32(b"") == 0x02CC5D05
        assert xxh32(b"a") == 0x550D7456
        assert xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F

    def test_reference_frames_prove_hc(self):
        """Every reference-encoder frame carries HC =
        (XXH32(descriptor) >> 8) & 0xFF — the frame walk verifies it,
        so a wrong XXH32 could not decode ANY reference frame."""
        c = pa.Codec("lz4")
        for d in (b"", b"x", b"hello world " * 50):
            assert lz4_frame_decompress(bytes(c.compress(d))) == d


class TestRoundTrip:
    @pytest.mark.parametrize("mode", [0, 1, 2])
    def test_block_and_frame_vs_reference(self, mode):
        rng = random.Random(mode)
        cf, cr = pa.Codec("lz4"), pa.Codec("lz4_raw")
        for n in (0, 1, 30, 700, 6000, 60000):
            d = _gen(rng, n, mode)
            assert lz4_frame_decompress(bytes(cf.compress(d))) == d
            assert lz4_block_decompress(bytes(cr.compress(d)), n + 64) == d

    def test_linked_multi_block_frames(self):
        """> 64 KiB forces multiple blocks; the reference encoder
        links them (matches reach into previous blocks' output)."""
        rng = random.Random(7)
        c = pa.Codec("lz4")
        for size in (200_000, 500_000):
            unit = bytes(rng.randrange(256) for _ in range(37))
            d = (unit * (size // 37 + 1))[:size]
            assert lz4_frame_decompress(bytes(c.compress(d))) == d

    def test_multi_frame_and_skippable(self):
        c = pa.Codec("lz4")
        a, b = b"first " * 30, b"second " * 40
        skip = struct.pack("<II", 0x184D2A50, 3) + bytes(3)
        stream = bytes(c.compress(a)) + skip + bytes(c.compress(b))
        assert lz4_frame_decompress(stream) == a + b
        kinds = [(p is None, chk) for p, chk in iter_lz4_frames(stream)]
        assert kinds == [(False, False), (True, False), (False, False)]


class TestChecksumAndRejection:
    def test_content_checksum_catches_every_flip(self):
        d = b"checksum me " * 40
        fc = add_lz4_content_checksum(
            bytes(pa.Codec("lz4").compress(d))
        )
        assert lz4_frame_decompress(fc) == d
        assert list(iter_lz4_frames(fc))[0][1] is True
        for k in range(len(fc)):
            fr = bytearray(fc)
            fr[k] ^= 0x41
            with pytest.raises(ValueError):
                lz4_frame_decompress(bytes(fr))

    def test_bad_magic_and_garbage_never_crash(self):
        with pytest.raises(ValueError):
            lz4_frame_decompress(b"\x00\x01\x02\x03rest")
        rng = random.Random(5)
        for _ in range(300):
            g = b"\x04\x22\x4d\x18" + bytes(
                rng.randrange(256) for _ in range(rng.randrange(50))
            )
            try:
                lz4_frame_decompress(g)
            except ValueError:
                pass

    def test_zero_offset_rejected(self):
        # token: 1 literal + match(len 4), offset 0
        with pytest.raises(ValueError):
            lz4_block_decompress(b"\x10A\x00\x00")


class TestParquetLz4Pages:
    def test_column_agrees_with_pyarrow(self):
        import io

        import pyarrow.parquet as pq

        from gmall_flink_210726_spark.operators.parquetmeta import (
            _make_parquet,
            read_parquet_column_k,
        )

        for i in (2, 5, 13, 42):
            blob = _make_parquet(i, "LZ4", bad_stripe=13)
            st = read_parquet_column_k(blob)
            if i % 13 == 0:
                assert st is None
                continue
            t = pq.read_table(io.BytesIO(blob))
            assert st["n_values"] == t.num_rows
            assert st["k_sum"] == sum(t.column("k").to_pylist())


class TestCliInterop:
    """Frames from the reference CLI (skipped if absent) — exercises
    the block-checksum and content-checksum paths a library encoder
    does not write, plus block-independent mode."""

    CLI = "/root/miniconda/bin/lz4"

    def _cli(self, data: bytes, *flags: str) -> bytes:
        import os
        import subprocess
        import tempfile

        if not os.path.exists(self.CLI):
            pytest.skip("lz4 CLI not available")
        with tempfile.NamedTemporaryFile(delete=False) as f:
            f.write(data)
            path = f.name
        try:
            subprocess.run(
                [self.CLI, "-q", "-f", *flags, path, path + ".lz4"],
                check=True,
            )
            return open(path + ".lz4", "rb").read()
        finally:
            for p in (path, path + ".lz4"):
                try:
                    os.unlink(p)
                except OSError:
                    pass

    def test_block_checksums_verify(self):
        rng = random.Random(11)
        d = bytes(rng.choice(b"lz4 block checksum ") for _ in range(200_000))
        frame = self._cli(d, "-9", "-B4", "-BX")
        assert lz4_frame_decompress(frame) == d
        # smash a payload byte inside the first block: the BLOCK
        # checksum (not just content size) must catch it
        fr = bytearray(frame)
        fr[40] ^= 0x55
        with pytest.raises(ValueError):
            lz4_frame_decompress(bytes(fr))

    def test_content_checksum_and_independence(self):
        rng = random.Random(12)
        d = bytes(rng.choice(b"abcdef \n") for _ in range(300_000))
        frame = self._cli(d, "-1", "-B4", "-BI", "--content-size")
        assert lz4_frame_decompress(frame) == d

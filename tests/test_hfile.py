"""HBase HFile v2 walk (operators/hfile.py)."""

import struct

from gmall_flink_210726_spark.operators.hfile import (
    _hf_nrows,
    make_hfile,
    read_hfile,
)


class TestModel:
    def test_good_ids(self):
        for i in (1, 2, 3, 4, 5):
            st = read_hfile(make_hfile(i))
            assert st is not None, i
            assert st["n_cells"] == _hf_nrows(i)

    def test_multi_chunk_checksums(self):
        """Data blocks exceed bytesPerChecksum=256, so the chunked
        scheme is exercised with >1 chunk per block."""
        blob = make_hfile(2)
        # first block's covered size from its header
        (uncomp,) = struct.unpack_from(">i", blob, 12)
        assert 33 + uncomp > 256  # at least two chunks
        assert read_hfile(blob) is not None


class TestTrustChain:
    def test_stripes_refuse(self):
        # chunk-CRC flip / index offset lie / entryCount lie
        for i in (13, 26, 17, 34, 19, 38):
            assert read_hfile(make_hfile(i)) is None, i

    def test_truncation_refuses(self):
        assert read_hfile(make_hfile(1)[:-5]) is None

    def test_trailer_magic_required(self):
        blob = bytearray(make_hfile(1))
        blob[-212] ^= 1
        assert read_hfile(bytes(blob)) is None

    def test_version_gate(self):
        """major != 2 must refuse (v3 uses a protobuf trailer this
        walk does not speak)."""
        blob = bytearray(make_hfile(1))
        struct.pack_into(">I", blob, len(blob) - 4, (0 << 24) | 3)
        assert read_hfile(bytes(blob)) is None

    def test_prev_offset_chain(self):
        """Break a block's prevBlockOffset (re-checksummed so only
        the chain is wrong) — the walk must refuse."""
        from gmall_flink_210726_spark.operators.hfile import (
            _BPC,
            _HDR,
            _CKSUM_CRC32C,
        )
        from gmall_flink_210726_spark.operators.kafkalog import (
            crc32c,
        )

        blob = bytearray(make_hfile(2))
        # block 1 starts after block 0; find block 0's total size
        (on_disk0,) = struct.unpack_from(">i", blob, 8)
        b1 = _HDR + on_disk0
        assert blob[b1 : b1 + 8] == b"DATABLK*"
        struct.pack_into(">q", blob, b1 + 16, 12345)  # lying prev
        # recompute block 1's chunk checksums so ONLY the chain lies
        (uncomp1,) = struct.unpack_from(">i", blob, b1 + 12)
        covered = _HDR + uncomp1
        n_chunks = -(-covered // _BPC)
        for c in range(n_chunks):
            lo = b1 + c * _BPC
            hi = min(b1 + covered, lo + _BPC)
            struct.pack_into(
                ">I",
                blob,
                b1 + covered + 4 * c,
                crc32c(bytes(blob[lo:hi])),
            )
        assert _CKSUM_CRC32C == 2
        assert read_hfile(bytes(blob)) is None

"""BGZF random-access walk (operators/bgzf.py)."""

from gmall_flink_210726_spark.operators.bgzf import (
    _bgzf_len,
    _bgzf_nb,
    make_bgzf,
    read_bgzf,
)


class TestModel:
    def test_good_ids(self):
        for i in (1, 2, 3, 4, 5):
            st = read_bgzf(make_bgzf(i), i)
            assert st is not None, i
            nb = _bgzf_nb(i)
            assert st["n_blocks"] == nb
            assert st["total_uncompressed"] == sum(
                _bgzf_len(i, c) for c in range(nb)
            )

    def test_bgzip_interop(self):
        """The fixture's members are valid RFC 1952 gzip: stdlib
        gzip must decompress the concatenated stream to the same
        payload bytes."""
        import gzip

        from gmall_flink_210726_spark.operators.bgzf import (
            _bgzf_byte,
        )

        i = 2
        blob = make_bgzf(i)
        full = gzip.decompress(blob)
        want = b"".join(
            bytes(
                _bgzf_byte(i, c, j)
                for j in range(_bgzf_len(i, c))
            )
            for c in range(_bgzf_nb(i))
        )
        assert full == want


class TestTrustChain:
    def test_stripes_refuse(self):
        # ISIZE lie / missing EOF marker / CRC flip
        for i in (13, 26, 17, 34, 19, 38):
            assert read_bgzf(make_bgzf(i), i) is None, i

    def test_non_target_corruption_invisible(self):
        """Random access never inflates non-target blocks — a byte
        flip there must not change the result, while a full
        decompress of the same bytes fails."""
        import gzip

        import pytest

        i = 1  # target falls in block 0
        blob = bytearray(make_bgzf(i))
        st0 = read_bgzf(bytes(blob), i)
        assert st0 is not None and st0["target_block"] == 0
        # block 0's size from its BC subfield
        import struct

        bs0 = struct.unpack_from("<H", blob, 16)[0] + 1
        blob[bs0 + 30] ^= 0xFF  # inside block 1's deflate data
        st1 = read_bgzf(bytes(blob), i)
        assert st1 == st0
        with pytest.raises(Exception):
            gzip.decompress(bytes(blob))

    def test_truncation_refuses(self):
        assert read_bgzf(make_bgzf(1)[:-4], 1) is None

    def test_plain_gzip_refused(self):
        """A plain gzip member without the BC subfield is not
        BGZF."""
        import gzip

        assert read_bgzf(gzip.compress(b"x" * 100), 1) is None

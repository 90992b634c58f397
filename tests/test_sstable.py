"""LevelDB/RocksDB SSTable walk (operators/sstable.py)."""

from gmall_flink_210726_spark.operators.sstable import (
    _mask_crc,
    _sst_nk,
    make_sstable,
    read_sstable,
)


class TestMaskedCrc:
    def test_leveldb_masking_identity(self):
        """unmask(mask(c)) == c for the spec's rotation."""
        for c in (0, 1, 0xDEADBEEF, 0xFFFFFFFF, 0xA282EAD8):
            m = _mask_crc(c)
            rot = (m - 0xA282EAD8) & 0xFFFFFFFF
            back = ((rot >> 17) | (rot << 15)) & 0xFFFFFFFF
            assert back == c, c

    def test_mask_differs_from_raw(self):
        assert _mask_crc(0x12345678) != 0x12345678


class TestModel:
    def test_good_ids(self):
        for i in (1, 2, 3, 4, 5):
            st = read_sstable(make_sstable(i))
            assert st is not None, i
            assert st["n_entries"] == _sst_nk(i)
            assert st["key_bytes"] == 6 * _sst_nk(i)

    def test_snappy_and_raw_blocks_both_present(self):
        """Blocks alternate compression by (i + offset) parity —
        both decode paths run for every id."""
        st = read_sstable(make_sstable(1))
        assert st is not None and st["n_blocks"] >= 2


class TestTrustChain:
    def test_stripes_refuse(self):
        # CRC flip / restart-count lie / key-order swap
        for i in (13, 26, 17, 34, 19, 38):
            assert read_sstable(make_sstable(i)) is None, i

    def test_truncation_refuses(self):
        assert read_sstable(make_sstable(1)[:-6]) is None

    def test_magic_required(self):
        blob = bytearray(make_sstable(1))
        blob[-1] ^= 1
        assert read_sstable(bytes(blob)) is None

    def test_shared_prefix_actually_compresses(self):
        """Keys k00000/k00007/... share 2+ byte prefixes inside a
        restart run — the table must be smaller than the naive
        concatenation, proving prefix compression is real."""
        blob = make_sstable(2)
        nk = _sst_nk(2)
        naive = nk * (6 + 24)  # key + max value + varints, roughly
        assert len(blob) < naive + 2000
        # and a re-read returns every key despite the sharing
        st = read_sstable(blob)
        assert st is not None and st["n_entries"] == nk


class TestWal:
    def test_model(self):
        from gmall_flink_210726_spark.operators.sstable import (
            _wal_nw,
            make_leveldb_wal,
            read_leveldb_wal,
        )

        for i in (1, 2, 3, 4, 5):
            st = read_leveldb_wal(make_leveldb_wal(i))
            assert st is not None, i
            assert st["n_records"] == _wal_nw(i)

    def test_jumbo_record_spans_blocks(self):
        """Every fixture carries one ~40 KB record — bigger than a
        32 KiB block, so FIRST/MIDDLE/LAST reassembly always runs."""
        from gmall_flink_210726_spark.operators.sstable import (
            _WAL_BLOCK,
            make_leveldb_wal,
            read_leveldb_wal,
        )

        blob = make_leveldb_wal(1)
        assert len(blob) > _WAL_BLOCK  # at least two blocks
        assert read_leveldb_wal(blob) is not None

    def test_stripes_refuse(self):
        from gmall_flink_210726_spark.operators.sstable import (
            make_leveldb_wal,
            read_leveldb_wal,
        )

        # CRC flip / LAST->MIDDLE / padding junk
        for i in (13, 26, 17, 34, 19, 38):
            assert (
                read_leveldb_wal(make_leveldb_wal(i)) is None
            ), i

    def test_truncation_refuses(self):
        """Cutting mid-record leaves an unterminated FIRST or a
        short fragment — both refuse."""
        from gmall_flink_210726_spark.operators.sstable import (
            make_leveldb_wal,
            read_leveldb_wal,
        )

        blob = make_leveldb_wal(1)
        assert read_leveldb_wal(blob[:-100]) is None

    def test_orphan_middle_refuses(self):
        import struct as _struct

        from gmall_flink_210726_spark.operators.sstable import (
            _mask_crc,
            read_leveldb_wal,
        )
        from gmall_flink_210726_spark.operators.kafkalog import (
            crc32c,
        )

        payload = b"xx"
        frag = (
            _struct.pack(
                "<IHB",
                _mask_crc(crc32c(b"\x03" + payload)),
                len(payload),
                3,  # MIDDLE with no FIRST
            )
            + payload
        )
        assert read_leveldb_wal(frag) is None

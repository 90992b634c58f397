"""Arrow IPC walk with the from-spec flatbuffer reader
(operators/arrowipc.py)."""

import struct

from gmall_flink_210726_spark.operators.arrowipc import (
    _arrow_k,
    _arrow_m,
    _arrow_m_null,
    _arrow_n,
    make_arrow_ipc,
    read_arrow_ipc,
)


class TestFlatbufferReader:
    def test_against_pyarrow_footer(self):
        """The hand reader must agree with what pyarrow wrote:
        version, field names, block count."""
        import pyarrow as pa

        from gmall_flink_210726_spark.operators.arrowipc import _root

        blob = make_arrow_ipc(1)
        (flen,) = struct.unpack_from("<i", blob, len(blob) - 10)
        footer = _root(blob[len(blob) - 10 - flen : len(blob) - 10])
        assert footer.i16(0) == 4  # MetadataVersion V5 wire value
        schema = footer.tab(1)
        start, n = schema.vector(1)
        assert n == 3
        names = []
        for k in range(n):
            p = start + 4 * k
            fpos = p + struct.unpack_from("<I", schema.buf, p)[0]
            from gmall_flink_210726_spark.operators.arrowipc import _FB

            names.append(_FB(schema.buf, fpos).string(0))
        assert names == [b"k", b"m", b"s"]
        # cross-check with pyarrow's own reader
        t = pa.ipc.open_file(pa.BufferReader(blob)).read_all()
        assert t.schema.names == ["k", "m", "s"]


class TestModel:
    def test_good_ids_match_pyarrow(self):
        """The hand walk's sums must equal pyarrow's own decode."""
        import pyarrow as pa
        import pyarrow.compute as pc

        for i in (1, 2, 3, 4, 5):
            blob = make_arrow_ipc(i)
            st = read_arrow_ipc(blob)
            assert st is not None, i
            t = pa.ipc.open_file(pa.BufferReader(blob)).read_all()
            assert st["n_rows"] == t.num_rows
            assert st["k_sum"] == pc.sum(t["k"]).as_py()
            assert st["m_sum"] == pc.sum(t["m"]).as_py()
            assert st["null_count"] == t["m"].null_count

    def test_formula(self):
        for i in (6, 7, 8):
            st = read_arrow_ipc(make_arrow_ipc(i))
            n = _arrow_n(i)
            assert st["k_sum"] == sum(
                _arrow_k(i, r) for r in range(n)
            )
            assert st["m_sum"] == sum(
                _arrow_m(i, r)
                for r in range(n)
                if not _arrow_m_null(i, r)
            )


class TestTrustChain:
    def test_stripes_refuse(self):
        # validity-bit flip / metaDataLength lie / EOS corruption
        for i in (13, 26, 17, 34, 19, 38):
            assert read_arrow_ipc(make_arrow_ipc(i)) is None, i

    def test_validity_flip_invisible_to_pyarrow(self):
        """The 13-stripe's flipped validity bit produces a file
        pyarrow happily reads (it trusts the bitmap) — only the
        null-count books catch the inconsistency. That asymmetry is
        the point of the walk."""
        import pyarrow as pa

        blob = make_arrow_ipc(13)
        t = pa.ipc.open_file(pa.BufferReader(blob)).read_all()
        assert t.num_rows == _arrow_n(13)  # pyarrow: no complaint
        assert read_arrow_ipc(blob) is None  # the books refuse

    def test_truncation_refuses(self):
        assert read_arrow_ipc(make_arrow_ipc(1)[:-3]) is None

    def test_magic_required_both_ends(self):
        blob = bytearray(make_arrow_ipc(1))
        blob[0] ^= 1
        assert read_arrow_ipc(bytes(blob)) is None
        blob = bytearray(make_arrow_ipc(1))
        blob[-1] ^= 1
        assert read_arrow_ipc(bytes(blob)) is None


class TestDictionary:
    def test_model_vs_pyarrow(self):
        import pyarrow as pa

        from gmall_flink_210726_spark.operators.arrowipc import (
            make_arrow_dict,
            read_arrow_dict,
        )

        for i in (1, 2, 3, 4):
            blob = make_arrow_dict(i)
            st = read_arrow_dict(blob)
            assert st is not None, i
            t = pa.ipc.open_file(pa.BufferReader(blob)).read_all()
            assert st["n_rows"] == t.num_rows
            d = t["d"].combine_chunks()
            assert st["dict_size"] == len(d.dictionary)

    def test_stripes_refuse(self):
        from gmall_flink_210726_spark.operators.arrowipc import (
            make_arrow_dict,
            read_arrow_dict,
        )

        # OOB index / dict-block metaDataLength lie / bad offsets
        for i in (13, 26, 17, 34, 19, 38):
            assert read_arrow_dict(make_arrow_dict(i)) is None, i

    def test_oob_index_invisible_to_pyarrow_validate(self):
        """The 13-stripe's out-of-bounds index: pyarrow's reader
        opens the file without complaint (resolution is lazy) — the
        walk's bounds books catch it."""
        import pyarrow as pa

        from gmall_flink_210726_spark.operators.arrowipc import (
            make_arrow_dict,
            read_arrow_dict,
        )

        blob = make_arrow_dict(13)
        f = pa.ipc.open_file(pa.BufferReader(blob))
        assert f.num_record_batches >= 1  # opens fine
        assert read_arrow_dict(blob) is None

    def test_plain_file_refused_by_dict_walk_and_vice_versa(self):
        from gmall_flink_210726_spark.operators.arrowipc import (
            make_arrow_dict,
            make_arrow_ipc,
            read_arrow_dict,
            read_arrow_ipc,
        )

        # the plain walk refuses dictionary encoding outright
        assert read_arrow_ipc(make_arrow_dict(1)) is None
        # the dict walk accepts plain files only if the shape fits
        # (the plain fixture has a nullable column m -> utf8/int64
        # mix parses, dictionaries are simply absent)
        st = read_arrow_dict(make_arrow_ipc(1))
        assert st is None or st["dict_size"] == 0

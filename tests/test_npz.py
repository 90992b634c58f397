"""NPY/NPZ embedding-dump walk (operators/npz.py)."""

from gmall_flink_210726_spark.operators.npz import (
    _npz_cols,
    _npz_emb,
    _npz_rows,
    make_npz,
    parse_npy,
    read_npz_embeddings,
)


class TestNpyHeader:
    def test_roundtrip_against_numpy(self):
        import io

        import numpy as np

        arr = np.arange(12, dtype="<i8").reshape(3, 4)
        buf = io.BytesIO()
        np.lib.format.write_array(buf, arr, allow_pickle=False)
        got = parse_npy(buf.getvalue())
        assert got is not None
        hdr, data = got
        assert hdr["shape"] == (3, 4)
        assert hdr["descr"] == "<i8"
        assert len(data) == 12 * 8

    def test_fortran_order_header(self):
        import io

        import numpy as np

        arr = np.asfortranarray(
            np.arange(6, dtype="<f8").reshape(2, 3)
        )
        buf = io.BytesIO()
        np.lib.format.write_array(buf, arr, allow_pickle=False)
        hdr, _ = parse_npy(buf.getvalue())
        assert hdr["fortran_order"] is True


class TestModel:
    def test_good_ids(self):
        for i in (1, 2, 3, 4, 5):
            st = read_npz_embeddings(make_npz(i))
            assert st is not None, i
            assert st["emb_rows"] == _npz_rows(i)
            assert st["emb_cols"] == _npz_cols(i)

    def test_fortran_order_row0_is_order_sensitive(self):
        """Odd ids store emb in F order; the row-0 sum must match
        the logical first row, not the first d physical bytes —
        proving the striding is decoded, not assumed."""
        i = 3  # odd: fortran order
        st = read_npz_embeddings(make_npz(i))
        d = _npz_cols(i)
        n = _npz_rows(i)
        logical = sum(_npz_emb(i, 0, c) for c in range(d))
        # the WRONG (C-order) read of the same bytes:
        flat = [
            _npz_emb(i, r, c)
            for c in range(d)
            for r in range(n)
        ]
        wrong = sum(flat[:d])
        assert st["emb_row0_sum"] == logical
        assert logical != wrong  # the proof has teeth for this id


class TestTrustChain:
    def test_stripes_refuse(self):
        # shape lie / big-endian descr / clobbered newline
        for i in (13, 26, 17, 34, 19, 38):
            assert read_npz_embeddings(make_npz(i)) is None, i

    def test_numpy_itself_accepts_the_shape_lie_file_shape(self):
        """The 13-stripe's NPZ still has valid zip CRCs — the lie
        lives purely in the NPY header books."""
        import io
        import zipfile

        blob = make_npz(13)
        with zipfile.ZipFile(io.BytesIO(blob)) as z:
            assert z.testzip() is None  # all CRCs fine
        assert read_npz_embeddings(blob) is None

    def test_extra_member_refuses(self):
        import io
        import zipfile

        blob = make_npz(1)
        buf = io.BytesIO(blob)
        out = io.BytesIO()
        with zipfile.ZipFile(buf) as zin, zipfile.ZipFile(
            out, "w", zipfile.ZIP_STORED
        ) as zout:
            for nm in zin.namelist():
                zout.writestr(nm, zin.read(nm))
            zout.writestr("extra.npy", b"junk")
        assert read_npz_embeddings(out.getvalue()) is None

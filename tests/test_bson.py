"""BSON dump walk (operators/bson.py)."""

import struct

from gmall_flink_210726_spark.operators.bson import (
    _bson_nd,
    _enc_doc,
    _enc_string,
    make_bson_dump,
    read_bson_dump,
)


class TestModel:
    def test_good_ids(self):
        for i in (1, 2, 3, 4, 5):
            st = read_bson_dump(make_bson_dump(i))
            assert st is not None, i
            assert st["n_top_docs"] == _bson_nd(i)

    def test_nested_books(self):
        """An embedded doc's own length lie must refuse even though
        the outer doc's length is consistent."""
        inner = _enc_doc([(0x10, b"k", struct.pack("<i", 5))])
        lying_inner = (
            struct.pack("<i", struct.unpack("<i", inner[:4])[0] + 1)
            + inner[4:]
        )
        outer = _enc_doc([(0x03, b"m", lying_inner)])
        assert read_bson_dump(outer) is None
        good = _enc_doc([(0x03, b"m", inner)])
        assert read_bson_dump(good) is not None


class TestTrustChain:
    def test_stripes_refuse(self):
        # length lie / string NUL clobber / array key sequence
        for i in (13, 26, 17, 34, 19, 38):
            assert read_bson_dump(make_bson_dump(i)) is None, i

    def test_truncation_refuses(self):
        assert read_bson_dump(make_bson_dump(1)[:-2]) is None

    def test_trailing_garbage_refuses(self):
        assert read_bson_dump(make_bson_dump(1) + b"\x01") is None

    def test_unknown_type_refuses(self):
        doc = _enc_doc([(0x7F, b"x", b"")])
        assert read_bson_dump(doc) is None

    def test_bool_must_be_01(self):
        doc = _enc_doc([(0x08, b"b", b"\x02")])
        assert read_bson_dump(doc) is None

    def test_string_double_accounting(self):
        """The string's int32 length and its NUL must both hold —
        the spec's deliberate redundancy."""
        ok = _enc_doc([(0x02, b"s", _enc_string(b"abc"))])
        assert read_bson_dump(ok) is not None
        # length says 4 but only 3 chars + NUL: overshoot refused
        bad = _enc_doc(
            [(0x02, b"s", struct.pack("<i", 5) + b"abc\x00")]
        )
        assert read_bson_dump(bad) is None

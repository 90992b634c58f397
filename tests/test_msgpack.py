"""MessagePack canonical walk (operators/msgpack.py)."""

from gmall_flink_210726_spark.operators.msgpack import (
    _enc,
    _mp_nr,
    make_msgpack_stream,
    read_msgpack_stream,
)


class TestEncoder:
    def test_minimal_boundaries(self):
        assert _enc(127) == b"\x7f"
        assert _enc(128) == b"\xcc\x80"
        assert _enc(255) == b"\xcc\xff"
        assert _enc(256) == b"\xcd\x01\x00"
        assert _enc(-32) == b"\xe0"
        assert _enc(-33) == b"\xd0\xdf"
        assert _enc("x" * 31)[0] == 0xBF
        assert _enc("x" * 32)[:2] == b"\xd9\x20"


class TestModel:
    def test_good_ids(self):
        for i in (1, 2, 3, 4, 5):
            st = read_msgpack_stream(make_msgpack_stream(i))
            assert st is not None, i
            assert st["n_objects"] == _mp_nr(i)


class TestCanonicality:
    def test_stripes_refuse(self):
        # non-minimal uint16 / str8 overshoot / reserved 0xc1
        for i in (13, 26, 17, 34, 19, 38):
            assert (
                read_msgpack_stream(make_msgpack_stream(i))
                is None
            ), i

    def test_every_nonminimal_class_refuses(self):
        key = _enc("k")
        cases = [
            b"\xcc\x07",          # uint8 for fixint range
            b"\xcd\x00\x07",      # uint16 for fixint range
            b"\xce\x00\x00\x00\x07",
            b"\xd0\xf0",          # int8 for negative-fixint range
            b"\xd9\x05hello",     # str8 for fixstr range
            b"\xdc\x00\x02\x01\x02",  # array16 for fixarray range
        ]
        for bad in cases:
            blob = b"\x81" + key + bad
            assert read_msgpack_stream(blob) is None, bad

    def test_minimal_forms_accepted(self):
        blob = b"\x81" + _enc("k") + _enc(300)
        st = read_msgpack_stream(blob)
        assert st is not None and st["int_sum"] == 300

    def test_top_level_must_be_map(self):
        assert read_msgpack_stream(_enc([1, 2, 3])) is None

    def test_duplicate_keys_refuse(self):
        key = _enc("k")
        blob = b"\x82" + key + _enc(1) + key + _enc(2)
        assert read_msgpack_stream(blob) is None

    def test_invalid_utf8_refuses(self):
        blob = b"\x81" + _enc("k") + b"\xa2\xff\xfe"
        assert read_msgpack_stream(blob) is None

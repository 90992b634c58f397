"""Strict UTF-8 walker (operators/utf8.py)."""

from __future__ import annotations

import random

from gmall_flink_210726_spark.operators.utf8 import (
    _make_utf8,
    utf8_classify,
)


class TestStrictUtf8:
    def test_agrees_with_python_codec_on_fuzz(self):
        rnd = random.Random(11)
        for _ in range(20000):
            b = bytes(rnd.randrange(256) for _ in range(rnd.randrange(1, 5)))
            st = utf8_classify(b)
            try:
                b.decode("utf-8", "strict")
                ok = True
            except UnicodeDecodeError:
                ok = False
            assert (st is not None) == ok, b.hex()

    def test_overlong_rejected(self):
        assert utf8_classify(b"a\xc0\xaf") is None  # overlong '/'
        assert utf8_classify(b"\xe0\x80\xaf") is None

    def test_surrogate_rejected(self):
        assert utf8_classify(b"\xed\xa0\x80") is None

    def test_beyond_u10ffff_rejected(self):
        assert utf8_classify(b"\xf4\x90\x80\x80") is None

    def test_truncated_tail_rejected(self):
        assert utf8_classify(b"ok\xf0\x9f") is None

    def test_class_counts(self):
        st = utf8_classify("aé中\U0001f600".encode())
        assert st == {"n_ascii": 1, "n_2byte": 1, "n_3byte": 1,
                      "n_4byte": 1}

    def test_fixture_stripes(self):
        assert utf8_classify(_make_utf8(10)) is None
        assert utf8_classify(_make_utf8(15)) is None
        assert utf8_classify(_make_utf8(17)) is None
        assert utf8_classify(_make_utf8(1)) is not None

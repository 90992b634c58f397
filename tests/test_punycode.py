"""Punycode / IDNA decode (RFC 3492): the RFC's sample vectors,
stdlib-codec fuzz, strictness (operators/punycode.py)."""

from __future__ import annotations

import random

import pytest

from gmall_flink_210726_spark.operators.punycode import (
    idn_decode_label,
    idn_host_stats,
    punycode_decode,
)


class TestRfcVectors:
    def test_rfc3492_section7_samples(self):
        samples = {
            "egbpdaj6bu4bxfgehfvwxn": "ليهمابتكلموشعربي؟",
            "ihqwcrb4cv8a8dqg056pqjye": "他们为什么不说中文",
            "3B-ww4c5e180e575a65lsy2b": "3年B組金八先生",
            "-> $1.00 <--": "-> $1.00 <-",
        }
        for enc, want in samples.items():
            got = "".join(chr(c) for c in punycode_decode(enc))
            assert got == want, enc


class TestFuzz:
    def test_round_trip_vs_stdlib_codec(self):
        rng = random.Random(3492)
        alphabet = (
            "abz019"
            + "".join(chr(0x3B1 + j) for j in range(24))
            + "中日éñ"
        )
        for _ in range(2000):
            s = "".join(
                rng.choice(alphabet)
                for _ in range(rng.randrange(1, 12))
            )
            enc = s.encode("punycode").decode("ascii")
            assert (
                "".join(chr(c) for c in punycode_decode(enc)) == s
            ), s


class TestStrictness:
    def test_invalid_digit_rejected(self):
        with pytest.raises(ValueError):
            punycode_decode("ab!cd")

    def test_truncated_sequence_rejected(self):
        # digit '9' (value 35) always exceeds the threshold t <= 26,
        # so it demands a continuation digit that never comes
        with pytest.raises(ValueError):
            punycode_decode("9")

    def test_ascii_only_xn_label_is_spoof(self):
        # 'abc' encoded as punycode decodes to pure ASCII -> reject
        enc = "abc".encode("punycode").decode("ascii")
        assert idn_decode_label("xn--" + enc) is None

    def test_plain_labels_must_be_ldh(self):
        assert idn_decode_label("plain-09") == [
            ord(c) for c in "plain-09"
        ]
        assert idn_decode_label("bad_char") is None
        assert idn_decode_label("") is None

    def test_host_walk(self):
        enc = "gλμν".encode("punycode").decode("ascii")
        st = idn_host_stats(f"www.xn--{enc}.org")
        assert st is not None
        assert st["n_labels"] == 3 and st["n_idn_labels"] == 1
        assert st["n_cps"] == 3 + 4 + 3
        assert idn_host_stats("ok.xn--ab!c.org") is None

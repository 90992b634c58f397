"""Strict Base64 + data-URI extraction (operators/datauri.py)."""

from __future__ import annotations

import base64

import pytest

from gmall_flink_210726_spark.operators.datauri import (
    _extract_one,
    _make_datauri_page,
    b64decode_strict,
    scan_data_uris,
)


class TestStrictBase64:
    def test_agrees_with_stdlib(self):
        for n in range(0, 64):
            raw = bytes((k * 19 + n * 7) % 256 for k in range(n))
            enc = base64.b64encode(raw).decode()
            assert b64decode_strict(enc) == raw

    def test_invalid_char_rejected(self):
        with pytest.raises(ValueError):
            b64decode_strict("AB*A")

    def test_bad_length_rejected(self):
        with pytest.raises(ValueError):
            b64decode_strict("ABCDE")

    def test_padding_inside_body_rejected(self):
        with pytest.raises(ValueError):
            b64decode_strict("A=AA")

    def test_non_canonical_tail_rejected(self):
        # 'QQ==' decodes 'A'; 'QR==' has nonzero leftover bits
        assert b64decode_strict("QQ==") == b"A"
        with pytest.raises(ValueError):
            b64decode_strict("QR==")

    def test_missing_padding_rejected(self):
        with pytest.raises(ValueError):
            b64decode_strict("QQ")


class TestDataUriScan:
    def test_scan_finds_both(self):
        uris = scan_data_uris(_make_datauri_page(1))
        assert [m for m, _ in uris] == ["image/bmp", "text/plain"]

    def test_non_base64_uri_rejected(self):
        assert scan_data_uris('<a href="data:text/plain,raw">x</a>') is None

    def test_unclosed_quote_rejected(self):
        assert scan_data_uris('<img src="data:image/bmp;base64,AAAA') is None

    def test_corrupt_stripe_degrades(self):
        assert _extract_one(_make_datauri_page(8)) is None
        assert _extract_one(_make_datauri_page(24)) is None

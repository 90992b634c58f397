"""PDF FlateDecode text extraction: grammar walk, offset cross-check,
string-literal escapes, corrupt degrade (operators/pdf.py)."""

from __future__ import annotations

import re

from gmall_flink_210726_spark.operators.pdf import (
    _make_pdf,
    _scan_tj,
    extract_pdf_text,
)

TEXT = " ".join(f"w{k}" for k in range(12))


class TestWalk:
    def test_roundtrip(self):
        for i in (1, 2, 3, 5, 7):
            r = extract_pdf_text(_make_pdf(i, TEXT))
            n = 1 + i % 3
            assert r["n_pages"] == n
            assert r["n_objects"] == 2 + 2 * n
            assert r["n_text_ops"] == 3 * n
            assert f"Doc {i} page 0" in r["body_text"]
            assert "esc ( ) \\ done" in r["body_text"]

    def test_shifted_xref_degrades(self):
        assert extract_pdf_text(_make_pdf(9, TEXT)) is None
        assert extract_pdf_text(_make_pdf(18, TEXT)) is None

    def test_bad_header_degrades(self):
        blob = _make_pdf(1, TEXT)
        assert extract_pdf_text(b"%GIF" + blob[4:]) is None

    def test_xref_offset_must_hit_object_header(self):
        blob = bytearray(_make_pdf(1, TEXT))
        # shift object 1's xref entry by one byte
        x = bytes(blob).find(b"0000000000 65535 f")
        entry = x + 20
        off = int(blob[entry : entry + 10])
        blob[entry : entry + 10] = b"%010d" % (off + 1)
        assert extract_pdf_text(bytes(blob)) is None

    def test_wrong_length_degrades(self):
        blob = bytes(_make_pdf(1, TEXT))
        m = re.search(rb"/Length (\d+)", blob)
        bad = (
            blob[: m.start(1)]
            + b"%d" % (int(m.group(1)) + 4)
            + blob[m.end(1) :]
        )
        # the xref now points at stale offsets too; either check fires
        assert extract_pdf_text(bad) is None

    def test_missing_filter_degrades(self):
        blob = bytes(_make_pdf(1, TEXT))
        bad = blob.replace(b"/Filter /FlateDecode", b"/Filter /LZWDeeee", 1)
        assert extract_pdf_text(bad) is None

    def test_corrupt_stream_degrades(self):
        blob = bytearray(_make_pdf(1, TEXT))
        s = bytes(blob).find(b"stream\n") + 7
        blob[s : s + 4] = b"\xff\xff\xff\xff"
        assert extract_pdf_text(bytes(blob)) is None


class TestTjScan:
    def test_escapes_and_nesting(self):
        ops = rb"BT (a \( b \) c) Tj ET BT (x (nested) y) Tj ET"
        assert _scan_tj(ops) == ["a ( b ) c", "x (nested) y"]

    def test_non_tj_strings_ignored(self):
        ops = rb"(not shown) Td (shown) Tj"
        assert _scan_tj(ops) == ["shown"]

    def test_unbalanced_literal_rejected(self):
        assert _scan_tj(rb"BT (oops Tj ET") is None

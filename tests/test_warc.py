"""WARC record framing: grammar, exact-framing cross-check, corrupt
degrade, round-trip against stdlib gzip (operators/warc.py)."""

from __future__ import annotations

import gzip
import io

from gmall_flink_210726_spark.operators.warc import (
    _make_warc_stream,
    _walk_warc,
    make_warc_record,
    parse_warc_record,
)


class TestRecordGrammar:
    def test_minimal_response(self):
        rec = make_warc_record("response", "http://x/1", b"hello")
        r = parse_warc_record(rec)
        assert r is not None
        assert r["type"] == "response"
        assert r["uri"] == "http://x/1"
        assert r["ctype"] == ""
        assert r["content"] == b"hello"
        # the raw header map rides along (the revisit walk resolves
        # WARC-Refers-To / payload digests through it)
        assert r["fields"][b"warc-type"] == b"response"
        assert r["fields"][b"content-length"] == b"5"

    def test_warcinfo_needs_no_uri(self):
        r = parse_warc_record(make_warc_record("warcinfo", "", b"abc"))
        assert r["type"] == "warcinfo" and r["uri"] == ""

    def test_response_without_uri_rejected(self):
        rec = make_warc_record("response", "", b"x")
        assert parse_warc_record(rec) is None

    def test_bad_version_line(self):
        rec = make_warc_record("response", "http://x", b"x")
        assert parse_warc_record(b"WARC/0.9" + rec[8:]) is None

    def test_wrong_content_length(self):
        rec = make_warc_record("response", "http://x", b"abcdef",
                               declared_len=7)
        assert parse_warc_record(rec) is None

    def test_missing_terminator(self):
        rec = make_warc_record("response", "http://x", b"abcdef")
        assert parse_warc_record(rec[:-1]) is None

    def test_trailing_garbage_after_terminator(self):
        rec = make_warc_record("response", "http://x", b"abcdef")
        assert parse_warc_record(rec + b"junk") is None

    def test_duplicate_header_rejected(self):
        rec = make_warc_record("response", "http://x", b"ab")
        bad = rec.replace(b"WARC-Date:", b"Content-Length: 2\r\nWARC-Date:")
        assert parse_warc_record(bad) is None

    def test_header_without_colon_rejected(self):
        rec = make_warc_record("response", "http://x", b"ab")
        bad = rec.replace(b"WARC-Date: 2024-01-01T00:00:00Z",
                          b"NoColonHere")
        assert parse_warc_record(bad) is None

    def test_content_may_contain_crlf_crlf(self):
        body = b"first\r\n\r\nsecond"
        r = parse_warc_record(
            make_warc_record("response", "http://x", body)
        )
        assert r["content"] == body


class TestStreamWalk:
    def test_fixture_stream_stats(self):
        for i in (1, 2, 3, 5, 7):
            st = _walk_warc(_make_warc_stream(i))
            n = 1 + i % 4
            assert st["n_records"] == n
            assert st["n_responses"] == n - 1
            want_bytes = sum(120 + (i * 47 + 23 * j) % 400
                             for j in range(n))
            assert st["content_bytes"] == want_bytes
            if n > 1:
                assert st["first_uri"] == f"http://example.com/{i}/1"
            else:
                assert st["first_uri"] == ""

    def test_corrupt_stripe_crc_clean_but_framing_bad(self):
        # every 12th stream: gzip layer valid, WARC layer must reject
        from gmall_flink_210726_spark.operators.inflate import (
            iter_gzip_members,
        )

        blob = _make_warc_stream(12)
        assert iter_gzip_members(blob) is not None  # CRC-clean
        assert _walk_warc(blob) is None

    def test_members_roundtrip_through_stdlib_gzip(self):
        blob = _make_warc_stream(3)
        records = []
        with gzip.GzipFile(fileobj=io.BytesIO(blob)) as f:
            # stdlib reads concatenated members as one stream
            data = f.read()
        assert data.startswith(b"WARC/1.0\r\n")
        from gmall_flink_210726_spark.operators.inflate import (
            iter_gzip_members,
        )
        members = iter_gzip_members(blob)
        assert b"".join(p for _, p in members) == data
        for _, p in members:
            assert parse_warc_record(p) is not None
        del records

    def test_truncated_stream_degrades(self):
        blob = _make_warc_stream(5)
        assert _walk_warc(blob[:-7]) is None


class TestWarcHtmlE2E:
    def test_two_layer_composition(self):
        from gmall_flink_210726_spark.operators.warc import (
            _make_warc_html_stream,
            _walk_warc_html,
        )

        text = " ".join(f"w{k}" for k in range(12))
        st = _walk_warc_html(_make_warc_html_stream(1, text))
        assert st["n_records"] == 2
        assert st["title"] == "Doc 1"
        assert st["n_blocks"] == 5 + (1 + 1 % 3)  # + charset marker
        assert st["body_text"].startswith("Heading 1\n")
        assert st["body_text"].endswith("café 1 — naïve “résumé”")

    def test_html_layer_corruption_degrades(self):
        from gmall_flink_210726_spark.operators.warc import (
            _make_warc_html_stream,
            _walk_warc_html,
        )
        from gmall_flink_210726_spark.operators.inflate import (
            iter_gzip_members,
        )

        blob = _make_warc_html_stream(11, "a b c d")
        assert iter_gzip_members(blob) is not None  # gzip layer fine
        assert _walk_warc_html(blob) is None  # html layer rejects

    def test_warc_layer_corruption_degrades(self):
        from gmall_flink_210726_spark.operators.warc import (
            _make_warc_html_stream,
            _walk_warc_html,
        )

        assert _walk_warc_html(
            _make_warc_html_stream(12, "a b c d")
        ) is None


class TestWetConversion:
    def test_conversion_passthrough_and_blank_line_drop(self):
        from gmall_flink_210726_spark.operators.warc import (
            _gzip_member,
            _walk_warc_text,
            make_warc_record,
        )

        rec = make_warc_record(
            "conversion", "http://example.com/x", b"line one\n\nline two"
        )
        st = _walk_warc_text(_gzip_member(rec))
        assert st["n_conversions"] == 1 and st["n_responses"] == 0
        assert st["body_text"] == "line one\nline two"
        assert st["n_blocks"] == 2 and st["n_words"] == 4
        assert st["title"] == ""

    def test_mixed_stream_orders_response_then_conversion(self):
        from gmall_flink_210726_spark.operators.warc import (
            _gzip_member,
            _walk_warc_text,
            make_warc_record,
        )

        html = (
            b"<html><head><title>T</title></head>"
            b"<body><p>alpha beta</p></body></html>"
        )
        parts = [
            _gzip_member(make_warc_record("warcinfo", "", b"info")),
            _gzip_member(
                make_warc_record("response", "http://e.com/1", html)
            ),
            _gzip_member(
                make_warc_record("conversion", "http://e.com/1", b"gamma")
            ),
        ]
        st = _walk_warc_text(b"".join(parts))
        assert st["n_records"] == 3
        assert (st["n_responses"], st["n_conversions"]) == (1, 1)
        assert st["body_text"] == "alpha beta\ngamma"
        assert st["title"] == "T"

    def test_bad_length_degrades_whole_stream(self):
        from gmall_flink_210726_spark.operators.warc import (
            _gzip_member,
            _walk_warc_text,
            make_warc_record,
        )

        rec = make_warc_record(
            "conversion", "http://e.com", b"text", declared_len=5
        )
        assert _walk_warc_text(_gzip_member(rec)) is None


class TestWarcZstd:
    def test_zstd_container_matches_gzip_twin_semantics(self):
        from gmall_flink_210726_spark.operators.warc import (
            _make_warc_zstd_stream,
            _make_wet_stream,
            _walk_warc_text,
            _walk_warc_zstd_text,
        )

        txt = "alpha beta gamma delta epsilon zeta eta theta iota"
        for i in range(1, 30):
            zs = _walk_warc_zstd_text(_make_warc_zstd_stream(i, txt))
            gz = _walk_warc_text(_make_wet_stream(i, txt))
            assert (zs is None) == (gz is None), i
            if zs is not None:
                assert zs == gz, i  # identical record mix + bodies

    def test_skippable_dictionary_slot_is_ignored(self):
        import struct

        import pyarrow as pa

        from gmall_flink_210726_spark.operators.warc import (
            _walk_warc_zstd_text,
            make_warc_record,
        )

        c = pa.Codec("zstd")
        skip = struct.pack("<II", 0x184D2A50, 6) + bytes(6)
        rec = make_warc_record("conversion", "http://e.com", b"line")
        st = _walk_warc_zstd_text(skip + bytes(c.compress(rec)))
        assert st["n_records"] == 1 and st["body_text"] == "line"

    def test_bad_length_in_zstd_record_degrades(self):
        import pyarrow as pa

        from gmall_flink_210726_spark.operators.warc import (
            _walk_warc_zstd_text,
            make_warc_record,
        )

        c = pa.Codec("zstd")
        rec = make_warc_record(
            "conversion", "http://e.com", b"text", declared_len=5
        )
        assert _walk_warc_zstd_text(bytes(c.compress(rec))) is None


class TestWatEnvelope:
    """WAT metadata records (round 11): the JSON envelope walk and
    its degrade contract."""

    def test_links_extracted(self):
        from gmall_flink_210726_spark.operators.warc import (
            _make_wat_stream,
            _walk_warc_wat,
        )

        got = _walk_warc_wat(_make_wat_stream(7))
        assert got is not None
        assert got["n_metadata"] == 1
        assert got["n_links"] == 1 + 7 % 5
        assert got["n_warcinfo"] == 1

    def test_malformed_json_degrades(self):
        from gmall_flink_210726_spark.operators.warc import (
            _make_wat_stream,
            _walk_warc_wat,
        )

        assert _walk_warc_wat(_make_wat_stream(10)) is None

    def test_missing_envelope_path_degrades(self):
        import json

        from gmall_flink_210726_spark.operators.warc import (
            _gzip_member,
            _wat_links,
            _walk_warc_wat,
            make_warc_record,
        )

        assert _wat_links(b"{}") is None
        assert _wat_links(b'{"Envelope": {}}') is None
        assert _wat_links(b'{"Envelope": null}') is None
        # a Links entry without a url string is a grammar hole
        bad = json.dumps(
            {
                "Envelope": {
                    "Payload-Metadata": {
                        "HTTP-Response-Metadata": {
                            "HTML-Metadata": {"Links": [{"path": "x"}]}
                        }
                    }
                }
            }
        ).encode()
        assert _wat_links(bad) is None
        blob = _gzip_member(
            make_warc_record("metadata", "http://e.test/x", bad)
        )
        assert _walk_warc_wat(blob) is None

    def test_empty_links_list_ok(self):
        import json

        from gmall_flink_210726_spark.operators.warc import _wat_links

        ok = json.dumps(
            {
                "Envelope": {
                    "Payload-Metadata": {
                        "HTTP-Response-Metadata": {"HTML-Metadata": {}}
                    }
                }
            }
        ).encode()
        assert _wat_links(ok) == []


class TestCdxRandomAccess:
    def test_ranged_fetch_never_reads_outside(self):
        from gmall_flink_210726_spark.operators.warc import (
            _make_cdx_archive,
            cdx_lookup,
        )

        text = "alpha beta gamma delta"
        # i=5: n = 2 + 5%3 = 4 records, target = 5%4 = 1 — so
        # member 0 (corrupted below) is NOT the target; the guard
        # keeps the test honest if the fixture formula ever changes
        assert 5 % (2 + 5 % 3) != 0
        blob = bytearray(_make_cdx_archive(5, text))
        st0 = cdx_lookup(bytes(blob), "com,example)/doc/5")
        assert st0 is not None
        # locate the data.warc.gz TAR member (header at a 512-aligned
        # offset; the same string also appears inside the index JSON)
        b = bytes(blob)
        p = -1
        while True:
            p = b.find(b"data.warc.gz", p + 1)
            assert p >= 0
            if p % 512 == 0:
                break
        blob[p + 512 + 4 : p + 512 + 12] = b"\xde" * 8  # member 0
        st1 = cdx_lookup(bytes(blob), "com,example)/doc/5")
        assert st1 == st0  # corruption outside the range is invisible

    def test_index_lies_refused(self):
        from gmall_flink_210726_spark.operators.warc import (
            _make_cdx_archive,
            cdx_lookup,
        )

        text = "a b c d"
        for i, why in ((14, "offset+1"), (16, "length-1"),
                       (18, "digest"), (21, "unsorted")):
            assert cdx_lookup(
                _make_cdx_archive(i, text), f"com,example)/doc/{i}"
            ) is None, why
        # an absent urlkey refuses
        assert cdx_lookup(
            _make_cdx_archive(1, text), "com,example)/nope"
        ) is None

"""HTTP/1.1 response message layer (RFC 9110/9112) — status line,
header grammar incl. obs-fold, chunked framing with extensions and
trailers, content codings through the hand inflate, and every refusal
branch. Pure bytes, no Spark."""

from __future__ import annotations

import gzip
import zlib

import pytest

from gmall_flink_210726_spark.operators.httpmsg import (
    _dechunk,
    parse_http_request,
    parse_http_response,
)

_BODY = b"<html><body>hello http</body></html>"


def _msg(head_lines: list[bytes], body: bytes) -> bytes:
    return b"\r\n".join(head_lines) + b"\r\n\r\n" + body


def _chunked(body: bytes, step: int = 5) -> bytes:
    out = bytearray()
    for off in range(0, len(body), step):
        piece = body[off : off + step]
        out += format(len(piece), "x").encode() + b"\r\n" + piece + b"\r\n"
    out += b"0\r\n\r\n"
    return bytes(out)


# ----------------------------------------------------------- framing


def test_content_length_identity():
    raw = _msg(
        [b"HTTP/1.1 200 OK",
         b"Content-Type: text/html",
         b"Content-Length: " + str(len(_BODY)).encode()],
        _BODY,
    )
    m = parse_http_response(raw)
    assert m is not None
    assert m["status"] == 200 and m["reason"] == "OK"
    assert m["version"] == "HTTP/1.1"
    assert m["body"] == _BODY and not m["chunked"]


def test_content_length_lie_refused():
    for delta in (-1, 1):
        raw = _msg(
            [b"HTTP/1.1 200 OK",
             b"Content-Length: " + str(len(_BODY) + delta).encode()],
            _BODY,
        )
        assert parse_http_response(raw) is None


def test_close_delimited_body():
    raw = _msg([b"HTTP/1.0 200 OK", b"Server: x"], _BODY)
    m = parse_http_response(raw)
    assert m is not None and m["body"] == _BODY


def test_chunked_with_extension_and_trailer():
    chunks = (
        b"5;name=val\r\nhello\r\n"
        b"6\r\n world\r\n"
        b"0\r\n"
        b"X-Sum: 11\r\nX-Other: t\r\n"
        b"\r\n"
    )
    raw = _msg(
        [b"HTTP/1.1 200 OK", b"Transfer-Encoding: chunked"], chunks
    )
    m = parse_http_response(raw)
    assert m is not None and m["body"] == b"hello world"
    assert m["chunked"]


def test_chunk_size_lie_refused():
    # first chunk declares 6 bytes but carries 5: the CRLF check or
    # the exact-consumption check must catch the desync
    chunks = b"6\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    raw = _msg(
        [b"HTTP/1.1 200 OK", b"Transfer-Encoding: chunked"], chunks
    )
    assert parse_http_response(raw) is None


def test_chunked_trailing_garbage_refused():
    raw = _msg(
        [b"HTTP/1.1 200 OK", b"Transfer-Encoding: chunked"],
        _chunked(_BODY) + b"x",
    )
    assert parse_http_response(raw) is None


def test_dechunk_bad_grammar():
    for bad in (
        b"zz\r\nhi\r\n0\r\n\r\n",      # non-hex size
        b"2\r\nhi",                      # missing chunk CRLF
        b"2\r\nhiXX0\r\n\r\n",          # chunk not CRLF-terminated
        b"0\r\nnocolon\r\n\r\n",        # bad trailer field
        b"2\r\nhi\r\n",                  # no last-chunk
    ):
        with pytest.raises(ValueError):
            _dechunk(bad)


def test_te_and_cl_together_refused():
    # RFC 9112 §6.3.3: the request-smuggling ambiguity
    raw = _msg(
        [b"HTTP/1.1 200 OK",
         b"Transfer-Encoding: chunked",
         b"Content-Length: 11"],
        _chunked(b"hello world"),
    )
    assert parse_http_response(raw) is None


# ---------------------------------------------------- content codings


def test_gzip_coding():
    gz = gzip.compress(_BODY)
    raw = _msg(
        [b"HTTP/1.1 200 OK",
         b"Content-Encoding: gzip",
         b"Content-Length: " + str(len(gz)).encode()],
        gz,
    )
    m = parse_http_response(raw)
    assert m is not None and m["body"] == _BODY
    assert m["encodings"] == ("gzip",)


def test_deflate_coding_is_zlib():
    df = zlib.compress(_BODY, 6)
    raw = _msg(
        [b"HTTP/1.1 200 OK",
         b"Content-Encoding: deflate",
         b"Content-Length: " + str(len(df)).encode()],
        df,
    )
    m = parse_http_response(raw)
    assert m is not None and m["body"] == _BODY


def test_chunked_over_gzip():
    gz = gzip.compress(_BODY)
    raw = _msg(
        [b"HTTP/1.1 200 OK",
         b"Content-Encoding: gzip",
         b"Transfer-Encoding: chunked"],
        _chunked(gz, 7),
    )
    m = parse_http_response(raw)
    assert m is not None and m["body"] == _BODY
    assert m["chunked"] and m["encodings"] == ("gzip",)


def test_corrupt_gzip_coding_refused():
    gz = bytearray(gzip.compress(_BODY))
    gz[-1] ^= 1  # CRC byte: the hand inflate must catch it
    raw = _msg(
        [b"HTTP/1.1 200 OK",
         b"Content-Encoding: gzip",
         b"Content-Length: " + str(len(gz)).encode()],
        bytes(gz),
    )
    assert parse_http_response(raw) is None


def test_unknown_coding_refused():
    raw = _msg(
        [b"HTTP/1.1 200 OK",
         b"Content-Encoding: zstd",
         b"Content-Length: 2"],
        b"zz",
    )
    assert parse_http_response(raw) is None


# ------------------------------------------------------ header grammar


def test_obs_fold_joined():
    raw = _msg(
        [b"HTTP/1.1 200 OK",
         b"X-Long: part one",
         b"\t part two",
         b"Content-Length: " + str(len(_BODY)).encode()],
        _BODY,
    )
    m = parse_http_response(raw)
    assert m is not None
    assert m["headers"]["x-long"] == "part one part two"


def test_repeated_header_joins_but_framing_dups_refuse():
    raw = _msg(
        [b"HTTP/1.1 200 OK",
         b"Via: a",
         b"Via: b",
         b"Content-Length: " + str(len(_BODY)).encode()],
        _BODY,
    )
    m = parse_http_response(raw)
    assert m is not None and m["headers"]["via"] == "a, b"
    raw2 = _msg(
        [b"HTTP/1.1 200 OK",
         b"Content-Length: " + str(len(_BODY)).encode(),
         b"Content-Length: " + str(len(_BODY)).encode()],
        _BODY,
    )
    assert parse_http_response(raw2) is None


def test_bad_status_lines_refused():
    for line in (
        b"HTTP/2 200 OK",          # wrong version
        b"HTTP/1.1 20 OK",         # 2-digit code
        b"HTTP/1.1 2000 OK",       # 4-digit code
        b"HTTP/1.1 2OO OK",        # non-digit
        b"HTTP/1.1",               # no code
        b"GET / HTTP/1.1",         # a request, not a response
    ):
        raw = _msg([line, b"Content-Length: 0"], b"")
        assert parse_http_response(raw) is None


def test_reasonless_status_line_ok():
    raw = _msg([b"HTTP/1.1 204", b"Content-Length: 0"], b"")
    m = parse_http_response(raw)
    assert m is not None and m["status"] == 204 and m["reason"] == ""


def test_whitespace_before_colon_refused():
    raw = _msg(
        [b"HTTP/1.1 200 OK", b"Bad Header : v", b"Content-Length: 0"],
        b"",
    )
    assert parse_http_response(raw) is None


# ------------------------------------------------- WARC fixture layer


def test_warc_http_fixture_walk_variants_and_stripes():
    from gmall_flink_210726_spark.operators.warc import (
        _make_warc_http_stream,
        _walk_warc_http,
    )

    text = "alpha beta gamma delta epsilon zeta eta theta"
    for i in range(1, 90):
        st = _walk_warc_http(_make_warc_http_stream(i, text))
        bad = i % 11 == 0 or i % 13 == 0 or i % 17 == 0
        if bad:
            assert st is None, i
            continue
        assert st is not None, i
        v = i % 5
        assert st["n_records"] == 2 and st["n_http"] == 1
        assert st["status_sum"] == 200
        assert st["n_chunked"] == (1 if v in (1, 3) else 0), i
        assert st["n_gzip"] == (1 if v in (2, 3) else 0), i
        assert st["n_deflate"] == (1 if v == 4 else 0), i
        assert st["title"] == f"Doc {i}"


def test_walk_warc_html_peels_http_records_too():
    """L170's walk accepts a stream mixing bare and HTTP-bearing
    response records — the Content-Type dispatch, not a sniff."""
    from gmall_flink_210726_spark.operators.html import _make_html
    from gmall_flink_210726_spark.operators.warc import (
        _gzip_member,
        _make_http_response,
        _walk_warc_html,
        make_warc_record,
    )

    page = _make_html(3, "one two three four").encode("latin-1")
    bare = make_warc_record("response", "http://e/1", page)
    http = make_warc_record(
        "response",
        "http://e/2",
        _make_http_response(3, page),
        ctype="application/http; msgtype=response",
    )
    st = _walk_warc_html(_gzip_member(bare) + _gzip_member(http))
    assert st is not None and st["n_records"] == 2
    # both bodies extracted: block count doubles the single-page walk
    single = _walk_warc_html(_gzip_member(bare))
    assert st["n_blocks"] == 2 * single["n_blocks"]


def test_http_record_with_body_masquerading_as_bare_degrades():
    """An HTTP-bearing record whose message is malformed degrades the
    stream even though the gzip and WARC layers are intact."""
    from gmall_flink_210726_spark.operators.warc import (
        _gzip_member,
        _walk_warc_http,
        make_warc_record,
    )

    bad_http = b"HTTP/1.1 200 OK\r\nContent-Length: 99\r\n\r\nshort"
    rec = make_warc_record(
        "response",
        "http://e/x",
        bad_http,
        ctype="application/http; msgtype=response",
    )
    assert _walk_warc_http(_gzip_member(rec)) is None


def test_wet_mixed_walk_peels_http_responses_too():
    """The combined WARC/WET door also dispatches on Content-Type."""
    from gmall_flink_210726_spark.operators.html import _make_html
    from gmall_flink_210726_spark.operators.warc import (
        _gzip_member,
        _make_http_response,
        _walk_warc_text,
        make_warc_record,
    )

    page = _make_html(3, "one two three four").encode("latin-1")
    http = make_warc_record(
        "response",
        "http://e/2",
        _make_http_response(3, page),
        ctype="application/http; msgtype=response",
    )
    conv = make_warc_record("conversion", "http://e/3", b"line a\nline b")
    st = _walk_warc_text(_gzip_member(http) + _gzip_member(conv))
    assert st is not None
    assert st["n_responses"] == 1 and st["n_conversions"] == 1
    assert st["title"] == "Doc 3"


# -------------------------------------------------- request messages


def test_request_grammar():
    from gmall_flink_210726_spark.operators.httpmsg import (
        parse_http_request,
    )

    req = parse_http_request(
        b"GET /doc/7 HTTP/1.1\r\nHost: e.com\r\n\r\n"
    )
    assert req is not None
    assert req["method"] == "GET" and req["target"] == "/doc/7"
    assert req["body"] == b""
    post = parse_http_request(
        b"POST /f HTTP/1.1\r\nHost: e\r\nContent-Length: 3\r\n\r\nq=1"
    )
    assert post is not None and post["body"] == b"q=1"
    for bad in (
        b"GET /x\r\n\r\n",                         # no version
        b"GET  /x HTTP/1.1\r\n\r\n",               # empty target piece
        b"GET /x HTTP/2\r\n\r\n",                  # wrong version
        b"G@T /x HTTP/1.1\r\n\r\n",                # bad method tchar
        b"GET /x HTTP/1.1\r\n\r\nleftover",        # bodyless + bytes
        b"POST /x HTTP/1.1\r\nContent-Length: 9\r\n\r\nq=1",  # CL lie
        b"POST /x HTTP/1.1\r\nContent-Length: 3\r\n"
        b"Transfer-Encoding: chunked\r\n\r\nq=1",  # TE+CL
    ):
        assert parse_http_request(bad) is None, bad


def test_reqresp_fixture_walk_and_stripes():
    from gmall_flink_210726_spark.operators.warc import (
        _make_warc_reqresp_stream,
        _walk_warc_reqresp,
    )

    text = "alpha beta gamma delta"
    for i in range(1, 60):
        st = _walk_warc_reqresp(_make_warc_reqresp_stream(i, text))
        bad = any(i % m == 0 for m in (11, 13, 17, 21, 27))
        if bad:
            assert st is None, i
            continue
        assert st is not None, i
        post = i % 2 == 1
        assert st["n_records"] == 3 and st["n_requests"] == 1
        assert st["n_post"] == (1 if post else 0)
        assert st["req_body_len"] == (len(f"q={i}") if post else 0)
        assert st["status_sum"] == 200


def test_mis_threaded_pair_refused():
    """A request whose target names a different path than its own
    record URI must degrade (the i%21 stripe proves it end-to-end;
    this pins the check in isolation)."""
    from gmall_flink_210726_spark.operators.warc import (
        _gzip_member,
        _walk_warc_reqresp,
        make_warc_record,
    )

    req = make_warc_record(
        "request",
        "http://example.com/doc/5",
        b"GET /doc/6 HTTP/1.1\r\nHost: example.com\r\n\r\n",
        ctype="application/http; msgtype=request",
    )
    assert _walk_warc_reqresp(_gzip_member(req)) is None


def test_te_nonchunked_codings_refused():
    """A Transfer-Encoding whose final coding is not chunked leaves
    the body still transfer-coded; letting it flow onward would feed
    gzip bytes to the HTML extractor — both sides must refuse
    anything beyond identity (ADVICE r12)."""
    assert parse_http_response(
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip\r\n\r\nXX"
    ) is None
    # identity-only TE is a no-op: close-delimited body flows
    ok = parse_http_response(
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: identity\r\n\r\nhi"
    )
    assert ok is not None and ok["body"] == b"hi"
    # request side: a pre-chunked coding we cannot decode refuses too
    chunked = b"2\r\nhi\r\n0\r\n\r\n"
    assert parse_http_request(
        b"POST /x HTTP/1.1\r\nHost: e\r\n"
        b"Transfer-Encoding: gzip, chunked\r\n\r\n" + chunked
    ) is None
    good = parse_http_request(
        b"POST /x HTTP/1.1\r\nHost: e\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + chunked
    )
    assert good is not None and good["body"] == b"hi"


def test_content_type_charset_param():
    from gmall_flink_210726_spark.operators.httpmsg import (
        content_type_charset,
    )

    assert content_type_charset("text/html; charset=UTF-8") == "utf-8"
    assert content_type_charset("text/html;charset=iso-8859-1") == (
        "iso-8859-1"
    )
    assert content_type_charset(
        'text/html; charset="Windows-1252"'
    ) == "windows-1252"
    assert content_type_charset(
        'text/html; CHARSET="utf\\-8"'
    ) == "utf-8"  # quoted-pair unescaping
    assert content_type_charset("text/html") is None
    assert content_type_charset(None) is None
    assert content_type_charset("text/html; charset=") is None
    assert content_type_charset('text/html; charset="unclosed') is None
    # first parameter wins over a later duplicate
    assert content_type_charset(
        "text/html; charset=utf-8; charset=latin-1"
    ) == "utf-8"
    # unrelated params skipped
    assert content_type_charset(
        "multipart/form-data; boundary=x; charset=utf-16"
    ) == "utf-16"


class TestWarcRevisit:
    def test_model(self):
        from gmall_flink_210726_spark.operators.warc import (
            _make_warc_revisit_stream,
            _rv_count,
            _rv_len,
            _walk_warc_revisit,
        )

        for i in (1, 2, 3, 4, 5):
            st = _walk_warc_revisit(_make_warc_revisit_stream(i))
            assert st is not None, i
            nu = 2 + i % 3
            assert st["n_responses"] == nu
            assert st["n_revisits"] == sum(
                _rv_count(i, u) for u in range(nu)
            )
            assert st["saved_bytes"] == sum(
                _rv_count(i, u) * _rv_len(i, u) for u in range(nu)
            )

    def test_trust_refusals(self):
        from gmall_flink_210726_spark.operators.warc import (
            _make_warc_revisit_stream,
            _walk_warc_revisit,
        )

        # dangling refers-to / digest off / response digest lie
        for i in (13, 26, 17, 34, 19, 38):
            assert (
                _walk_warc_revisit(_make_warc_revisit_stream(i))
                is None
            ), i

    def test_forward_reference_refuses(self):
        """A revisit before its target (forward reference) refuses —
        single-pass resolution is the streamable contract."""
        from gmall_flink_210726_spark.operators.inflate import (
            iter_gzip_members,
        )
        from gmall_flink_210726_spark.operators.warc import (
            _make_warc_revisit_stream,
            _walk_warc_revisit,
        )

        blob = _make_warc_revisit_stream(1)
        # i=1: members = [warcinfo, resp0, rev0.., resp1, ...]
        # find raw member boundaries by re-splitting the gzip stream
        members = iter_gzip_members(blob)
        assert members is not None
        # move the LAST member (a revisit for the last response) to
        # the front, before its target
        import zlib
        import struct

        from gmall_flink_210726_spark.operators.warc import (
            _gzip_member,
        )

        payloads = [p for _n, p in members]
        # i=1 member order: warcinfo, resp0, rev(0,0), resp1,
        # rev(1,0), rev(1,1), resp2 — move rev(0,0) before resp0
        assert b"WARC-Type: revisit" in payloads[2]
        reordered = (
            [payloads[0], payloads[2], payloads[1]] + payloads[3:]
        )
        cooked = b"".join(_gzip_member(p) for p in reordered)
        assert _walk_warc_revisit(cooked) is None
        assert _walk_warc_revisit(blob) is not None

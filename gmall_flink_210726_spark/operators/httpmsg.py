"""HTTP/1.1 response message layer (RFC 9110 / RFC 9112) for WARC
``response`` records.

Real CommonCrawl ``response`` records do not carry bare HTML: the WARC
content block is a full HTTP response — status line, header fields,
often ``Transfer-Encoding: chunked`` framing and ``Content-Encoding:
gzip``/``deflate`` compression — and only after BOTH layers are peeled
does the HTML start. This module implements that message layer from
the RFCs, reusing the hand RFC 1951/1950/1952 decoders in
``operators/inflate.py`` for the content codings.

Grammar enforced (RFC 9112 §2.1, §4, §5, §7.1):

    status-line  = HTTP-version SP status-code SP [reason-phrase] CRLF
    field-line   = field-name ":" OWS field-value OWS CRLF
    obs-fold     = CRLF 1*( SP / HTAB )      (continuation; §5.2)
    message      = status-line *field-line CRLF [ body ]

Body framing (RFC 9112 §6.3, applied in precedence order):

1. ``Transfer-Encoding`` whose FINAL coding is ``chunked`` → chunked
   framing: ``chunk-size [;ext] CRLF chunk-data CRLF`` repeated, a
   ``0`` last-chunk, optional trailer fields, final CRLF — and the
   record must END there (a WARC capture holds exactly one message,
   so trailing bytes mean a desynchronized chunk-size lie).
2. A message bearing BOTH ``Transfer-Encoding`` and
   ``Content-Length`` is refused outright — the request-smuggling
   ambiguity RFC 9112 §6.3.3 tells receivers to treat as an error.
3. ``Content-Length: N`` → the body is EXACTLY N bytes and the record
   must end there (lie stripe: N±1 desyncs and must degrade).
4. Neither → connection-close delimiting: the rest of the record is
   the body (legal in captures; RFC 9112 §6.3 item 8).

Content codings (RFC 9110 §8.4.1), applied in REVERSE of the
``Content-Encoding`` list order: ``gzip``/``x-gzip`` through the
CRC-proven multi-member gzip walk, ``deflate`` through the RFC 1950
zlib wrapper (Adler-32 checked), ``identity`` a no-op. ``br`` is
decoded by the hand RFC 7932 brotli decoder when
``operators/brotli.py`` provides it; any other coding refuses (the
whole record degrades — wrong text is worse than no text).

Reference parity: the reference repo's ingest starts at Kafka JSON
(`gmall-logger` HTTP collector, SURVEY §2.1 S4); this module is the
training-data-pipeline extension that lets the same front door read
raw web-archive captures.

No Spark imports here — pure bytes → dict, called from the
Arrow-batched WARC walks in ``operators/warc.py``.
"""

from __future__ import annotations

from gmall_flink_210726_spark.operators.inflate import (
    iter_gzip_members,
    zlib_decompress,
)

_CRLF = b"\r\n"
_TCHAR = set(b"!#$%&'*+-.^_`|~0123456789"
             b"abcdefghijklmnopqrstuvwxyz"
             b"ABCDEFGHIJKLMNOPQRSTUVWXYZ")


def _parse_fields(lines: list[bytes]) -> dict[str, str] | None:
    """field-lines (obs-fold already joined by the caller's split
    logic being line-based: we join here) -> {lower-name: value};
    repeated field names append with ", " (RFC 9110 §5.2 list
    semantics) EXCEPT the framing fields Content-Length /
    Transfer-Encoding / Content-Encoding, whose duplication is
    exactly the smuggling ambiguity we refuse."""
    # obs-fold: a line starting with SP/HTAB continues the previous
    joined: list[bytes] = []
    for ln in lines:
        if ln[:1] in (b" ", b"\t"):
            if not joined:
                return None  # fold before any field line
            joined[-1] += b" " + ln.strip()
        else:
            joined.append(ln)
    fields: dict[str, str] = {}
    for ln in joined:
        colon = ln.find(b":")
        if colon <= 0:
            return None
        name = ln[:colon]
        if any(c not in _TCHAR for c in name):
            return None  # includes whitespace-before-colon (§5.1)
        key = name.decode("ascii").lower()
        try:
            val = ln[colon + 1 :].strip(b" \t").decode("latin-1")
        except UnicodeDecodeError:  # pragma: no cover - latin-1 total
            return None
        if key in fields:
            if key in (
                "content-length",
                "transfer-encoding",
                "content-encoding",
            ):
                return None
            fields[key] = fields[key] + ", " + val
        else:
            fields[key] = val
    return fields


def _dechunk(data: bytes) -> bytes:
    """RFC 9112 §7.1 chunked decoding with exact-consumption: the
    buffer must hold exactly one chunked body (sizes, last-chunk,
    trailer section, final CRLF) and nothing after."""
    out = bytearray()
    pos = 0
    while True:
        eol = data.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("http: truncated chunk-size line")
        size_line = data[pos:eol]
        semi = size_line.find(b";")
        size_hex = size_line[:semi] if semi >= 0 else size_line
        size_hex = size_hex.strip(b" \t")
        if not size_hex or any(
            c not in b"0123456789abcdefABCDEF" for c in size_hex
        ):
            raise ValueError("http: bad chunk size")
        size = int(size_hex, 16)
        pos = eol + 2
        if size == 0:
            break
        if pos + size + 2 > len(data):
            raise ValueError("http: truncated chunk data")
        out.extend(data[pos : pos + size])
        if data[pos + size : pos + size + 2] != _CRLF:
            raise ValueError("http: chunk data not CRLF-terminated")
        pos += size + 2
    # trailer section: zero or more field lines, then an empty line
    while True:
        eol = data.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("http: truncated trailer section")
        if eol == pos:  # the empty line
            pos = eol + 2
            break
        if data.find(b":", pos, eol) <= pos:
            raise ValueError("http: bad trailer field")
        pos = eol + 2
    if pos != len(data):
        raise ValueError("http: bytes after last-chunk")
    return bytes(out)


def _decode_codings(body: bytes, encodings: list[str]) -> bytes:
    """Apply Content-Encoding codings in reverse list order."""
    for enc in reversed(encodings):
        if enc in ("", "identity"):
            continue
        if enc in ("gzip", "x-gzip"):
            members = iter_gzip_members(body)
            if members is None or not members:
                raise ValueError("http: bad gzip content coding")
            body = b"".join(p for _n, p in members)
        elif enc == "deflate":
            body = zlib_decompress(body)
        elif enc == "br":
            from gmall_flink_210726_spark.operators.brotli import (
                brotli_decompress,
            )

            body = brotli_decompress(body)
        else:
            raise ValueError(f"http: unsupported coding {enc!r}")
    return body


def content_type_charset(content_type: str | None) -> str | None:
    """Extract the ``charset`` parameter from a ``Content-Type`` field
    value (RFC 9110 §8.3): ``type "/" subtype *( OWS ";" OWS
    token "=" ( token / quoted-string ) )``. Returns the charset
    lower-cased, or None when absent/malformed. Charset names are
    case-insensitive (RFC 2978 §4); quoted-string backslash escapes
    are honored. The FIRST charset parameter wins (duplicates are a
    malformed field — real servers emit at most one; we keep the
    first rather than refuse, matching browser behavior)."""
    if not content_type:
        return None
    # split on ';' OUTSIDE quoted-strings (a legal quoted parameter
    # value may contain ';' — RFC 9110 quoted-string grammar)
    parts = []
    cur = []
    in_q = False
    esc = False
    for ch in content_type:
        if esc:
            cur.append(ch)
            esc = False
        elif in_q and ch == "\\":
            cur.append(ch)
            esc = True
        elif ch == '"':
            cur.append(ch)
            in_q = not in_q
        elif ch == ";" and not in_q:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    for param in parts[1:]:
        eq = param.find("=")
        if eq < 0:
            continue
        name = param[:eq].strip(" \t").lower()
        if name != "charset":
            continue
        val = param[eq + 1 :].strip(" \t")
        if val.startswith('"'):
            # quoted-string: unescape \x pairs, require closing quote
            out = []
            i = 1
            closed = False
            while i < len(val):
                c = val[i]
                if c == "\\" and i + 1 < len(val):
                    out.append(val[i + 1])
                    i += 2
                elif c == '"':
                    closed = True
                    break
                else:
                    out.append(c)
                    i += 1
            if not closed:
                return None
            val = "".join(out)
        if not val:
            return None
        return val.lower()
    return None


def parse_http_response(raw: bytes) -> dict | None:
    """One WARC content block -> the decoded HTTP response, or None
    on any message-layer violation (module doc contract).

    Returns ``{'status': int, 'reason': str, 'version': str,
    'headers': {lower-name: value}, 'chunked': bool,
    'encodings': tuple[str, ...], 'body': bytes}`` where ``body``
    is fully de-framed AND de-coded."""
    sep = raw.find(_CRLF + _CRLF)
    if sep < 0:
        return None
    head_lines = raw[:sep].split(_CRLF)
    status_line = head_lines[0]
    parts = status_line.split(b" ", 2)
    if len(parts) < 2:
        return None
    version = parts[0]
    if version not in (b"HTTP/1.0", b"HTTP/1.1"):
        return None
    code = parts[1]
    if len(code) != 3 or not code.isdigit():
        return None
    reason = parts[2].decode("latin-1") if len(parts) == 3 else ""
    fields = _parse_fields(head_lines[1:])
    if fields is None:
        return None
    rest = raw[sep + 4 :]

    te = fields.get("transfer-encoding")
    cl = fields.get("content-length")
    chunked = False
    if te is not None:
        if cl is not None:
            return None  # RFC 9112 §6.3.3 smuggling ambiguity
        codings = [c.strip().lower() for c in te.split(",")]
        if codings and codings[-1] == "chunked":
            chunked = True
            try:
                body = _dechunk(rest)
            except ValueError:
                return None
            if any(c not in ("", "chunked") for c in codings[:-1]):
                return None  # transfer codings beyond chunked
        else:
            # TE present but final coding is not chunked: the body is
            # close-delimited (§6.3 item 7) BUT still transfer-coded.
            # We never decode transfer codings other than chunked, so
            # letting still-coded bytes flow onward would violate the
            # module contract (wrong text is worse than no text) —
            # refuse anything beyond the identity no-ops.
            if any(c not in ("", "identity") for c in codings):
                return None
            body = rest
    elif cl is not None:
        if not cl.isdigit():
            return None
        n = int(cl)
        if len(rest) != n:
            return None  # Content-Length lie / desync
        body = rest
    else:
        body = rest  # connection-close delimited capture

    enc = fields.get("content-encoding", "")
    encodings = tuple(
        e.strip().lower() for e in enc.split(",")
    ) if enc else ()
    try:
        body = _decode_codings(body, list(encodings))
    except (ValueError, ImportError):
        return None  # ImportError: 'br' before brotli.py exists
    return {
        "status": int(code),
        "reason": reason,
        "version": version.decode("ascii"),
        "headers": fields,
        "chunked": chunked,
        "encodings": encodings,
        "body": body,
    }


def parse_http_request(raw: bytes) -> dict | None:
    """The request half of the message layer (RFC 9112 §3) — what a
    WARC ``request`` record (msgtype=request) carries: request-line
    ``method SP request-target SP HTTP-version``, the same field
    grammar as responses, and body framing limited to what captured
    requests use (absent body, or exact Content-Length; TE+CL refused
    the same way). Returns ``{'method', 'target', 'version',
    'headers', 'body'}`` or None."""
    sep = raw.find(_CRLF + _CRLF)
    if sep < 0:
        return None
    head_lines = raw[:sep].split(_CRLF)
    parts = head_lines[0].split(b" ")
    if len(parts) != 3:
        return None
    method, target, version = parts
    if not method or any(c not in _TCHAR for c in method):
        return None
    if not target or b" " in target:
        return None
    if version not in (b"HTTP/1.0", b"HTTP/1.1"):
        return None
    fields = _parse_fields(head_lines[1:])
    if fields is None:
        return None
    rest = raw[sep + 4 :]
    te = fields.get("transfer-encoding")
    cl = fields.get("content-length")
    if te is not None and cl is not None:
        return None  # RFC 9112 §6.3.3
    if te is not None:
        codings = [c.strip().lower() for c in te.split(",")]
        if codings and codings[-1] == "chunked":
            if any(c not in ("", "chunked") for c in codings[:-1]):
                return None  # transfer codings beyond chunked (as in
                # parse_http_response — we cannot decode them)
            try:
                body = _dechunk(rest)
            except ValueError:
                return None
        else:
            return None  # a request body needs explicit framing
    elif cl is not None:
        if not cl.isdigit() or len(rest) != int(cl):
            return None
        body = rest
    else:
        if rest:
            return None  # bodyless request must end at the headers
        body = b""
    return {
        "method": method.decode("ascii"),
        "target": target.decode("latin-1"),
        "version": version.decode("ascii"),
        "headers": fields,
        "body": body,
    }

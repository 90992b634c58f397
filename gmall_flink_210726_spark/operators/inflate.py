"""Hand-written INFLATE (RFC 1951 DEFLATE decoder) + ZIP integration.

The crown decoder of the container family: ``operators/zipc.py`` walks
STORED-only archives; this module decodes REAL compressed entries with
a from-scratch inflate — LSB-first bit reader, stored blocks, the
fixed Huffman code, and full dynamic-Huffman blocks (code-length
alphabet with 16/17/18 repeat codes, length codes 257-285 and distance
codes 0-29 with their extra-bit tables, LZ77 back-reference copy).
The fixtures are compressed by zlib itself (raw deflate, wbits=-15),
so the decoder is validated against the reference implementation on
every row — plus the ZIP CRC-32 check downstream.

Same corrupt-stripe and scale contracts as every decoder in the
package: grammar violations degrade to ``format='unknown'``;
Arrow-batched mapInPandas; only integer stats shuffle.

Grammar source: RFC 1951 (public specification).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

# RFC 1951 §3.2.5: length codes 257..285 -> (extra bits, base length)
_LEN_EXTRA = (
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
    3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0,
)
_LEN_BASE = (
    3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31,
    35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258,
)
# distance codes 0..29
_DIST_EXTRA = (
    0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6,
    7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13,
)
_DIST_BASE = (
    1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193,
    257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
    8193, 12289, 16385, 24577,
)
# §3.2.7: order of code-length code lengths
_CLC_ORDER = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)

_MAX_OUT = 1 << 24  # decompression-bomb guard


class _Bits:
    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for k in range(n):
            if self.pos >= len(self.data):
                raise ValueError("out of input")
            v |= ((self.data[self.pos] >> self.bit) & 1) << k
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _build_huffman(lengths: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman per RFC 1951 §3.2.2: map (nbits, code) ->
    symbol.

    Validates the Kraft inequality while building: a bit-length
    histogram that oversubscribes the canonical code budget raises
    immediately (instead of silently producing colliding table entries
    that decode garbage until a downstream CRC check), and a table
    with more than one symbol must be a COMPLETE code (the sole
    RFC-sanctioned incomplete shape is the one-distance-code case,
    §3.2.7 note)."""
    counts = [0] * 16
    for ln in lengths:
        if ln < 0 or ln > 15:
            raise ValueError("code length out of range")
        if ln:
            counts[ln] += 1
    left = 1
    for nbits in range(1, 16):
        left <<= 1
        left -= counts[nbits]
        if left < 0:
            raise ValueError("oversubscribed Huffman code")
    nsyms = sum(counts)
    if nsyms > 1 and left != 0:
        raise ValueError("incomplete Huffman code")
    table: dict[tuple[int, int], int] = {}
    max_len = max(lengths) if lengths else 0
    code = 0
    for nbits in range(1, max_len + 1):
        for sym, ln in enumerate(lengths):
            if ln == nbits:
                table[(nbits, code)] = sym
                code += 1
        code <<= 1
    return table


def _read_symbol(bits: _Bits, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for nbits in range(1, 16):
        code = (code << 1) | bits.read(1)  # Huffman codes are MSB-first
        sym = table.get((nbits, code))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code")


# RFC 1951 §3.2.6: the fixed distance code is defined over ALL 32
# five-bit codes (30-31 "will never actually occur" — rejected at the
# use site), so the table is a complete code under the Kraft check.
_FIXED_LIT = _build_huffman(
    [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8
)
_FIXED_DIST = _build_huffman([5] * 32)


def _inflate_at(data: bytes, start: int) -> tuple[bytes, int]:
    """RFC 1951 raw-deflate decode beginning at byte offset ``start``;
    returns ``(payload, end_pos)`` where ``end_pos`` is the byte-
    aligned position just past the final block (so gzip-member walks
    can resume at the trailer). Raises ValueError on any grammar
    violation or output larger than the bomb guard.

    C-backed (optimization round 14, guide §4.2): the zlib C library is
    the RFC's own reference implementation and ~80x faster than the
    from-spec Python block loop below; the module contract is preserved
    exactly — ValueError only (zlib.error is wrapped), same bomb guard,
    same byte-aligned resume position via ``unused_data``.
    ``_inflate_at_py`` is the from-spec twin, kept as executable
    documentation of RFC 1951 and differentially fuzz-tested against
    this path in tests/test_codec_fastpaths.py."""
    d = zlib.decompressobj(wbits=-15)
    try:
        out = d.decompress(memoryview(data)[start:], _MAX_OUT + 1)
    except zlib.error as exc:
        raise ValueError(f"deflate: {exc}") from None
    if len(out) > _MAX_OUT:
        raise ValueError("output too large")
    if not d.eof:
        raise ValueError("truncated deflate stream")
    return out, len(data) - len(d.unused_data)


def _inflate_at_py(data: bytes, start: int) -> tuple[bytes, int]:
    """From-spec RFC 1951 block loop (the round-1..13 decoder). This
    single block loop serves both ``inflate()`` and ``_walk_gzip`` —
    the decoder exists exactly once (round-9 ADVICE: the inlined gzip
    copy had drifted)."""
    bits = _Bits(data)
    bits.pos = start
    out = bytearray()
    while True:
        bfinal = bits.read(1)
        btype = bits.read(2)
        if btype == 0:  # stored
            bits.align()
            if bits.pos + 4 > len(data):
                raise ValueError("truncated stored header")
            ln, nln = struct.unpack_from("<HH", data, bits.pos)
            if ln ^ nln != 0xFFFF:
                raise ValueError("stored LEN/NLEN mismatch")
            bits.pos += 4
            if bits.pos + ln > len(data):
                raise ValueError("truncated stored block")
            out += data[bits.pos : bits.pos + ln]
            bits.pos += ln
        elif btype in (1, 2):
            if btype == 1:
                lit_t, dist_t = _FIXED_LIT, _FIXED_DIST
            else:  # dynamic Huffman
                hlit = bits.read(5) + 257
                hdist = bits.read(5) + 1
                hclen = bits.read(4) + 4
                clc = [0] * 19
                for k in range(hclen):
                    clc[_CLC_ORDER[k]] = bits.read(3)
                clc_t = _build_huffman(clc)
                lens: list[int] = []
                while len(lens) < hlit + hdist:
                    sym = _read_symbol(bits, clc_t)
                    if sym < 16:
                        lens.append(sym)
                    elif sym == 16:
                        if not lens:
                            raise ValueError("repeat with no previous")
                        lens += [lens[-1]] * (3 + bits.read(2))
                    elif sym == 17:
                        lens += [0] * (3 + bits.read(3))
                    else:
                        lens += [0] * (11 + bits.read(7))
                if len(lens) != hlit + hdist:
                    raise ValueError("code-length overrun")
                lit_t = _build_huffman(lens[:hlit])
                dist_t = _build_huffman(lens[hlit:])
            while True:
                sym = _read_symbol(bits, lit_t)
                if sym < 256:
                    out.append(sym)
                elif sym == 256:
                    break
                elif sym <= 285:
                    li = sym - 257
                    length = _LEN_BASE[li] + bits.read(_LEN_EXTRA[li])
                    dsym = _read_symbol(bits, dist_t)
                    if dsym > 29:
                        raise ValueError("bad distance symbol")
                    dist = _DIST_BASE[dsym] + bits.read(_DIST_EXTRA[dsym])
                    if dist > len(out):
                        raise ValueError("distance past start")
                    for _ in range(length):
                        out.append(out[-dist])
                else:
                    raise ValueError("bad literal/length symbol")
                if len(out) > _MAX_OUT:
                    raise ValueError("output too large")
        else:
            raise ValueError("reserved block type")
        if len(out) > _MAX_OUT:
            raise ValueError("output too large")
        if bfinal:
            break
    bits.align()
    return bytes(out), bits.pos


def inflate(data: bytes) -> bytes:
    """RFC 1951 raw-deflate decode; raises ValueError on any grammar
    violation or output larger than the bomb guard."""
    return _inflate_at(data, 0)[0]


def zlib_decompress(data: bytes) -> bytes:
    """RFC 1950 zlib wrapper over the hand inflate — the third member
    of the DEFLATE container family (raw: ZIP entries; gzip: RFC 1952
    members; zlib: PNG IDAT / PDF FlateDecode-with-predictors): CMF/FLG
    validation (CM must be 8, window <= 32 KiB, the 16-bit header must
    be divisible by 31, preset dictionaries unsupported), the shared
    ``_inflate_at`` block loop, then an Adler-32 trailer proof over the
    decompressed output. Strict end-of-stream: trailing bytes after
    the trailer are a grammar violation."""
    if len(data) < 6:
        raise ValueError("short zlib stream")
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8 or cmf >> 4 > 7:
        raise ValueError("bad zlib CM/CINFO")
    if (cmf * 256 + flg) % 31 != 0:
        raise ValueError("bad zlib header check")
    if flg & 0x20:
        raise ValueError("FDICT unsupported")
    out, pos = _inflate_at(data, 2)
    if pos + 4 != len(data):
        raise ValueError("bad zlib trailer framing")
    (adler,) = struct.unpack_from(">I", data, pos)
    if zlib.adler32(out) & 0xFFFFFFFF != adler:
        raise ValueError("adler32 mismatch")
    return out


# --------------------------------------------------------------------------
# DEFLATE-entry ZIP walk (method 8), reusing zipc's record grammar.
# --------------------------------------------------------------------------

ZIPD_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_entries", LongType()),
        StructField("total_uncompressed", LongType()),
        StructField("payload_sum", LongType()),
        StructField("first_name", StringType()),
    ]
)


def _walk_zip_deflate(data: bytes) -> dict | None:
    from gmall_flink_210726_spark.operators.zipc import (
        _CENTRAL_SIG,
        _EOCD_SIG,
        _LOCAL_SIG,
    )

    end = len(data)
    eocd = data.rfind(_EOCD_SIG, max(0, end - 22 - 65535))
    if eocd < 0 or eocd + 22 > end:
        return None
    (disk, cddisk, n_this, n_total, cdsize, cdoff, clen) = struct.unpack_from(
        "<HHHHIIH", data, eocd + 4
    )
    if disk != 0 or cddisk != 0 or n_this != n_total or n_total == 0:
        return None
    if eocd + 22 + clen != end or cdoff + cdsize != eocd:
        return None
    pos = cdoff
    n = total_u = total_c = psum = 0
    first_name = ""
    for _ in range(n_total):
        if pos + 46 > eocd or data[pos : pos + 4] != _CENTRAL_SIG:
            return None
        (
            _vm, _vn, flags, method, _t, _d, crc, csize, usize,
            nlen, elen, comlen, _dsk, _ia, _ea, lho,
        ) = struct.unpack_from("<HHHHHHIIIHHHHHII", data, pos + 4)
        if flags != 0 or method != 8:
            return None  # DEFLATE only here
        name = data[pos + 46 : pos + 46 + nlen]
        if lho + 30 + nlen > eocd or data[lho : lho + 4] != _LOCAL_SIG:
            return None
        (l_nlen, l_elen) = struct.unpack_from("<HH", data, lho + 26)
        if l_nlen != nlen or data[lho + 30 : lho + 30 + nlen] != name:
            return None
        body = lho + 30 + l_nlen + l_elen
        if body + csize > eocd:
            return None
        try:
            payload = inflate(data[body : body + csize])
        except ValueError:
            return None
        if len(payload) != usize or zlib.crc32(payload) != crc:
            return None
        if n == 0:
            first_name = name.decode("latin-1")
        n += 1
        total_u += usize
        total_c += csize
        psum += sum(payload)
        pos += 46 + nlen + elen + comlen
    if pos != eocd:
        return None
    # total_c (compressed extent) is validated against the record
    # bounds but NOT emitted: it depends on the encoder's choices, so
    # no blind oracle could recompute it
    del total_c
    return {
        "n_entries": n,
        "total_uncompressed": total_u,
        "payload_sum": psum,
        "first_name": first_name,
    }


def _zipd_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for mid, blob in zip(pdf["media_id"], pdf["content"]):
        mid = int(mid)
        row = {
            "media_id": mid,
            "format": "unknown",
            "n_entries": 0,
            "total_uncompressed": 0,
            "payload_sum": 0,
            "first_name": "",
        }
        b = bytes(blob) if blob is not None else b""
        try:
            st = _walk_zip_deflate(b)
        except Exception:
            st = None
        if st is not None:
            row.update(format="zip", **st)
        out.append(row)
    return pd.DataFrame(out, columns=[f.name for f in ZIPD_SCHEMA.fields])


def zip_deflate_stats(df: DataFrame) -> DataFrame:
    """DEFLATE-entry ZIP walk with hand-written inflate (module doc)."""
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _zipd_batch(pdf)

    return df.select("media_id", "content").mapInPandas(gen, ZIPD_SCHEMA)


def _run_text(i: int, j: int, size: int) -> bytes:
    """Compressible deterministic payload: 5-byte runs over a 7-letter
    alphabet, STATELESS per position (byte k depends only on (i, j,
    k//5)) so a DuckDB oracle recomputes the byte sum blind while
    DEFLATE's Huffman + LZ77 paths both exercise."""
    return bytes(
        97 + ((i * 7 + 13 * j + (k // 5) * 11) % 7) for k in range(size)
    )


def _make_zip_deflate(i: int) -> bytes:
    from gmall_flink_210726_spark.operators.zipc import (
        _CENTRAL_SIG,
        _EOCD_SIG,
        _LOCAL_SIG,
    )

    locals_ = bytearray()
    centrals = bytearray()
    n = 2 + i % 4
    for j in range(n):
        name = f"d_{i}_{j}.txt".encode("ascii")
        size = 200 + (i * 41 + 31 * j) % 600
        payload = _run_text(i, j, size)
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        cdata = comp.compress(payload) + comp.flush()
        crc = zlib.crc32(payload)
        off = len(locals_)
        locals_ += (
            _LOCAL_SIG
            + struct.pack("<HHHHHIIIHH", 20, 0, 8, 0, 0, crc,
                          len(cdata), size, len(name), 0)
            + name
            + cdata
        )
        centrals += (
            _CENTRAL_SIG
            + struct.pack(
                "<HHHHHHIIIHHHHHII",
                20, 20, 0, 8, 0, 0, crc, len(cdata), size,
                len(name), 0, 0, 0, 0, 0, off,
            )
            + name
        )
    cdoff = len(locals_)
    eocd = _EOCD_SIG + struct.pack(
        "<HHHHIIH", 0, 0, n, n, len(centrals), cdoff, 0
    )
    blob = bytes(locals_ + centrals + eocd)
    return blob[: len(blob) - 25] if i % 14 == 0 else blob


def synthesize_zip_deflate_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of DEFLATE-compressed zips (zlib-made, so
    the hand inflate is validated against the reference coder)."""
    from gmall_flink_210726_spark.operators.multimodal import MEDIA_SCHEMA
    from gmall_flink_210726_spark.session import (
        ensure_parallelism,
        ship_package,
    )

    ship_package(docs.sparkSession)
    docs = ensure_parallelism(docs.select("doc_id"))

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": [_make_zip_deflate(int(i)) for i in ids],
                    "meta": [
                        {
                            "format": "zip",
                            "width": 0,
                            "height": 0,
                            "sample_rate": 0,
                        }
                        for _ in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


# --------------------------------------------------------------------------
# Multi-member gzip (RFC 1952) — the WARC/WET convention: one gzip
# member per record, concatenated into a single stream.
# --------------------------------------------------------------------------

GZIP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_members", LongType()),
        StructField("total_uncompressed", LongType()),
        StructField("payload_sum", LongType()),
        StructField("first_name", StringType()),
    ]
)


def iter_gzip_members(data: bytes) -> list[tuple[str, bytes]] | None:
    """Concatenated-member gzip walk: RFC 1952 header (magic, CM=8,
    FLG with optional FNAME), raw-deflate body via the hand inflate,
    CRC-32 + ISIZE trailer validation per member. Returns the ordered
    ``(fname, payload)`` list, or ``None`` on any grammar violation —
    the shared front end for the gzip-stats query AND the WARC record
    framing on top (one member per WARC record, ISO 28500 Annex C /
    the CommonCrawl convention)."""
    pos, end = 0, len(data)
    members: list[tuple[str, bytes]] = []
    while pos < end:
        if pos + 10 > end:
            return None
        if data[pos : pos + 2] != b"\x1f\x8b" or data[pos + 2] != 8:
            return None
        flg = data[pos + 3]
        if flg & 0xE0:  # reserved bits must be zero
            return None
        if flg & 0x04:  # FEXTRA unsupported here
            return None
        hpos = pos + 10
        name = ""
        if flg & 0x08:  # FNAME: zero-terminated
            z = data.find(b"\x00", hpos)
            if z < 0:
                return None
            name = data[hpos:z].decode("latin-1")
            hpos = z + 1
        if flg & 0x10:  # FCOMMENT
            z = data.find(b"\x00", hpos)
            if z < 0:
                return None
            hpos = z + 1
        if flg & 0x02:  # FHCRC
            hpos += 2
        if hpos > end:
            return None
        # the shared block loop returns the byte-aligned end position,
        # so the member trailer is read exactly where the body stopped
        try:
            out, tpos = _inflate_at(data, hpos)
        except ValueError:
            return None
        if tpos + 8 > end:
            return None
        crc, isize = struct.unpack_from("<II", data, tpos)
        if zlib.crc32(out) != crc or len(out) & 0xFFFFFFFF != isize:
            return None
        members.append((name, out))
        pos = tpos + 8
    if not members or pos != end:
        return None
    return members


def _walk_gzip(data: bytes) -> dict | None:
    """Aggregate stats over ``iter_gzip_members`` (GZIP_SCHEMA)."""
    members = iter_gzip_members(data)
    if members is None:
        return None
    return {
        "n_members": len(members),
        "total_uncompressed": sum(len(p) for _, p in members),
        "payload_sum": sum(sum(p) for _, p in members),
        "first_name": members[0][0],
    }


def _gzip_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for mid, blob in zip(pdf["media_id"], pdf["content"]):
        mid = int(mid)
        row = {
            "media_id": mid,
            "format": "unknown",
            "n_members": 0,
            "total_uncompressed": 0,
            "payload_sum": 0,
            "first_name": "",
        }
        b = bytes(blob) if blob is not None else b""
        try:
            st = _walk_gzip(b)
        except Exception:
            st = None
        if st is not None:
            row.update(format="gzip", **st)
        out.append(row)
    return pd.DataFrame(out, columns=[f.name for f in GZIP_SCHEMA.fields])


def gzip_member_stats(df: DataFrame) -> DataFrame:
    """Multi-member gzip walk over MEDIA_SCHEMA blobs."""
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _gzip_batch(pdf)

    return df.select("media_id", "content").mapInPandas(gen, GZIP_SCHEMA)


def _make_gzip_stream(i: int) -> bytes:
    """Deterministic concatenated gzip stream (WARC/WET shape):
    ``1 + i % 4`` members with FNAME headers and run-text payloads of
    ``150 + (i*43 + 29*j) % 500`` bytes; every 13th id truncated."""
    parts = []
    for j in range(1 + i % 4):
        name = f"rec_{i}_{j}".encode("ascii")
        payload = _run_text(i, j, 150 + (i * 43 + 29 * j) % 500)
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        body = c.compress(payload) + c.flush()
        parts.append(
            b"\x1f\x8b\x08\x08"  # magic, CM=8, FLG=FNAME
            + b"\x00\x00\x00\x00"  # mtime
            + b"\x00\x03"  # XFL, OS=unix
            + name
            + b"\x00"
            + body
            + struct.pack("<II", zlib.crc32(payload), len(payload))
        )
    blob = b"".join(parts)
    return blob[: len(blob) - 9] if i % 13 == 0 else blob


def synthesize_gzip_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of multi-member gzip streams."""
    from gmall_flink_210726_spark.operators.multimodal import MEDIA_SCHEMA
    from gmall_flink_210726_spark.session import (
        ensure_parallelism,
        ship_package,
    )

    ship_package(docs.sparkSession)
    docs = ensure_parallelism(docs.select("doc_id"))

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": [_make_gzip_stream(int(i)) for i in ids],
                    "meta": [
                        {
                            "format": "gzip",
                            "width": 0,
                            "height": 0,
                            "sample_rate": 0,
                        }
                        for _ in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)

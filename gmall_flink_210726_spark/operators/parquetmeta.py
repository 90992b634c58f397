"""Parquet footer walk — a from-scratch Thrift compact-protocol
reader over REAL parquet bytes (written by pyarrow, the reference
coder, exactly the way zlib validates the hand inflate).

A 100 TB lakehouse engine plans every scan from file FOOTERS: row
counts, row-group boundaries, column chunks. This operator is that
planning pass, hand-decoded:

- file framing: ``PAR1`` magic at BOTH ends, 4-byte little-endian
  footer length, bounds-checked against the file;
- **Thrift compact protocol** (the parquet.thrift wire format):
  ULEB128 varints, zigzag integers, short/long-form field headers
  with field-id deltas, size-prefixed binaries, list headers with
  the 15-element escape, nested structs — parsed generically into
  ``{field_id: value}`` maps so unknown/optional fields (statistics,
  encodings, created_by) skip cleanly;
- **FileMetaData interpretation** (parquet-format): field 2 = schema
  element list (leaf count + names), field 3 = num_rows, field 4 =
  row groups (each with field 3 = its num_rows);
- integrity cross-check: the SUM of per-row-group num_rows must equal
  the file-level num_rows — the footer's own books must balance.

Corrupt-stripe contract: bad magic, an out-of-bounds footer length,
or an invalid type nibble degrades to ``format='unknown'``.
Arrow-batched ``mapInPandas``, zero shuffle.

Grammar sources: Apache Thrift compact protocol spec;
apache/parquet-format FileMetaData (both public).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType


class _Reader:
    __slots__ = ("data", "pos", "end")

    def __init__(self, data: bytes, pos: int, end: int):
        self.data = data
        self.pos = pos
        self.end = end

    def byte(self) -> int:
        if self.pos >= self.end:
            raise ValueError("thrift: out of input")
        b = self.data[self.pos]
        self.pos += 1
        return b

    def varint(self) -> int:
        out = shift = 0
        while True:
            b = self.byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7
            if shift > 63:
                raise ValueError("thrift: varint too long")

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)

    def take(self, n: int) -> bytes:
        if n < 0 or self.pos + n > self.end:
            raise ValueError("thrift: bad length")
        b = self.data[self.pos : self.pos + n]
        self.pos += n
        return b


def _read_value(r: _Reader, ctype: int, container: bool = False):
    if ctype in (1, 2):  # BOOL
        if container:
            # Inside LIST/SET/MAP a bool element is a standalone byte
            # (0x01 true / 0x02 false) — only STRUCT fields fold the
            # value into the field-header type nibble. ColumnIndex's
            # list<bool> null_pages is the shape that exercises this.
            b = r.byte()
            if b not in (1, 2):
                raise ValueError("thrift: bad bool element")
            return b == 1
        return ctype == 1  # true/false encoded in the field header
    if ctype == 3:  # BYTE
        return r.byte()
    if ctype in (4, 5, 6):  # I16 / I32 / I64
        return r.zigzag()
    if ctype == 7:  # DOUBLE: 8 raw bytes
        return struct.unpack("<d", r.take(8))[0]
    if ctype == 8:  # BINARY / STRING
        return r.take(r.varint())
    if ctype in (9, 10):  # LIST / SET
        head = r.byte()
        size = head >> 4
        etype = head & 0x0F
        if size == 15:
            size = r.varint()
        return [_read_value(r, etype, container=True) for _ in range(size)]
    if ctype == 11:  # MAP
        size = r.varint()
        if size == 0:
            return {}
        kv = r.byte()
        return {
            _read_value(r, kv >> 4, container=True): _read_value(
                r, kv & 0x0F, container=True
            )
            for _ in range(size)
        }
    if ctype == 12:  # STRUCT
        return _read_struct(r)
    raise ValueError(f"thrift: bad type {ctype}")


def _read_struct(r: _Reader) -> dict[int, object]:
    fields: dict[int, object] = {}
    fid = 0
    while True:
        head = r.byte()
        if head == 0:  # STOP
            return fields
        delta = head >> 4
        ctype = head & 0x0F
        if delta:
            fid += delta
        else:
            fid = r.zigzag()
        fields[fid] = _read_value(r, ctype)


def parse_parquet_footer(data: bytes) -> dict | None:
    """Framing + FileMetaData walk + books-balance cross-check."""
    if len(data) < 12 or data[:4] != b"PAR1" or data[-4:] != b"PAR1":
        return None
    (flen,) = struct.unpack_from("<I", data, len(data) - 8)
    start = len(data) - 8 - flen
    if flen <= 0 or start < 4:
        return None
    try:
        meta = _read_struct(_Reader(data, start, len(data) - 8))
    except ValueError:
        return None
    num_rows = meta.get(3)
    schema = meta.get(2)
    row_groups = meta.get(4)
    if (
        not isinstance(num_rows, int)
        or not isinstance(schema, list)
        or not isinstance(row_groups, list)
    ):
        return None
    # SchemaElement: field 4 = name (binary), field 5 = num_children.
    # The first element is the root; leaves have no children.
    leaves = [
        el
        for el in schema[1:]
        if isinstance(el, dict) and not el.get(5)
    ]
    names = [
        el.get(4, b"").decode("utf-8", "replace") for el in leaves
    ]
    rg_rows = []
    for rg in row_groups:
        if not isinstance(rg, dict) or not isinstance(rg.get(3), int):
            return None
        rg_rows.append(rg[3])
    if sum(rg_rows) != num_rows:
        return None  # the footer's books must balance
    return {
        "n_rows": num_rows,
        "n_row_groups": len(row_groups),
        "n_columns": len(names),
        "first_column": names[0] if names else "",
        "max_rg_rows": max(rg_rows) if rg_rows else 0,
    }


PQMETA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_rows", LongType()),
        StructField("n_row_groups", LongType()),
        StructField("n_columns", LongType()),
        StructField("first_column", StringType()),
        StructField("max_rg_rows", LongType()),
    ]
)


def _pqmeta_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for mid, blob in zip(pdf["media_id"], pdf["content"]):
        mid = int(mid)
        row = {
            "media_id": mid,
            "format": "unknown",
            "n_rows": 0,
            "n_row_groups": 0,
            "n_columns": 0,
            "first_column": "",
            "max_rg_rows": 0,
        }
        b = bytes(blob) if blob is not None else b""
        try:
            st = parse_parquet_footer(b)
        except Exception:
            st = None
        if st is not None:
            row.update(format="parquet", **st)
        out.append(row)
    return pd.DataFrame(out, columns=[f.name for f in PQMETA_SCHEMA.fields])


def parquet_footer_stats(df: DataFrame) -> DataFrame:
    """Hand-decoded footer planning pass over MEDIA_SCHEMA blobs."""
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _pqmeta_batch(pdf)

    return df.select("media_id", "content").mapInPandas(gen, PQMETA_SCHEMA)


# --------------------------------------------------------------------------
# Fixture synthesis — REAL parquet files written by pyarrow
# --------------------------------------------------------------------------


def _make_parquet(i: int, compression: str = "NONE",
                  bad_stripe: int = 7) -> bytes:
    """``10 + i % 90`` rows, columns (k BIGINT, v DOUBLE, s VARCHAR),
    ``1 + i % 3`` row groups (row_group_size = ceil(n/groups); for
    n >= 10 and groups <= 3 the group count is exact). Every 7th id
    gets its footer-length word smashed to 0x7FFFFFFF — framing the
    bounds check must reject."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 10 + i % 90
    g = 1 + i % 3
    table = pa.table(
        {
            "k": pa.array(
                [(i * 7 + 3 * r) % 1000 for r in range(n)], pa.int64()
            ),
            "v": pa.array([float(r) for r in range(n)], pa.float64()),
            "s": pa.array([f"r{r % 10}" for r in range(n)]),
        }
    )
    buf = io.BytesIO()
    pq.write_table(
        table,
        buf,
        row_group_size=-(-n // g),
        compression=compression,
        write_statistics=False,
        use_dictionary=False,
        write_page_checksum=True,
    )
    blob = bytearray(buf.getvalue())
    if i % bad_stripe == 0:
        struct.pack_into("<I", blob, len(blob) - 8, 0x7FFFFFFF)
    return bytes(blob)


def _flip_first_page_value(blob: bytes) -> bytes:
    """CRC-lie stripe: XOR one byte inside the FIRST data page's
    VALUES region of column k. Counts, levels and framing all stay
    valid — only the page CRC can catch it (without verification the
    walk would return a silently wrong k_sum)."""
    (flen,) = struct.unpack_from("<I", blob, len(blob) - 8)
    meta = _read_struct(
        _Reader(blob, len(blob) - 8 - flen, len(blob) - 8)
    )
    cm = meta[4][0][1][0][3]  # rg0 -> cc0 -> ColumnMetaData
    off = cm[9]
    r = _Reader(blob, off, len(blob))
    ph = _read_struct(r)
    (dlen,) = struct.unpack_from("<I", blob, r.pos)
    out = bytearray(blob)
    out[r.pos + 4 + dlen + 5] ^= 0x55  # inside the first int64s
    return bytes(out)


def synthesize_parquet_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of real parquet files."""
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
                    "content": [
                        _flip_first_page_value(_make_parquet(int(i)))
                        if i % 10 == 0 and i % 7 != 0
                        else _make_parquet(int(i))
                        for i in ids
                    ],
                    "meta": [
                        {
                            "format": "parquet",
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
# Column-chunk DATA read — the step past the footer: walk the 'k'
# column's data pages (PageHeader thrift, v1 DATA_PAGE), decode the
# definition levels (parquet's RLE/bit-packed hybrid, bit width 1 for
# a non-nested optional column) and the PLAIN int64 values. The page
# grammar is what a vectorized reader actually executes per stripe.
# --------------------------------------------------------------------------


def _decode_rle_hybrid(data: bytes, n: int, bit_width: int) -> list[int]:
    """Parquet RLE/bit-packed hybrid (parquet-format Encodings.md),
    general bit width 0-32: varint header — LSB 0: RLE run (count =
    header >> 1, one fixed-width little-endian value); LSB 1: bit-
    packed groups (header >> 1 groups of 8 values, each group
    ``bit_width`` bytes, values packed LSB-first). Bit width 0 is the
    single-entry-dictionary degenerate: every value is 0, no bytes.
    A run or group count far past ``n`` is a corruption bomb, not
    writer padding (padding is < one group), and raises."""
    if bit_width == 0:
        return [0] * n
    if bit_width > 32:
        raise ValueError("rle: bit width too large")
    out: list[int] = []
    r = _Reader(data, 0, len(data))
    vw = (bit_width + 7) // 8
    mask = (1 << bit_width) - 1
    while len(out) < n:
        header = r.varint()
        if header & 1 == 0:
            run = header >> 1
            if run > n - len(out) + 64:
                raise ValueError("rle: run overflows value count")
            raw = r.take(vw)
            val = int.from_bytes(raw, "little")
            out.extend([val] * run)
        else:
            groups = header >> 1
            if groups * 8 > n - len(out) + 64:
                raise ValueError("rle: groups overflow value count")
            raw = r.take(groups * bit_width)
            for gi in range(groups):
                word = int.from_bytes(
                    raw[gi * bit_width : (gi + 1) * bit_width], "little"
                )
                for j in range(8):
                    out.append((word >> (j * bit_width)) & mask)
    return out[:n]


def _page_decompress(page: bytes, codec: int, usize: int) -> bytes | None:
    """Undo the page codec with the repo's own decoders, proving the
    decoded length against the header's uncompressed_page_size:
    0 UNCOMPRESSED passthrough, 1 SNAPPY via the hand block
    decompressor, 2 GZIP via the hand RFC 1952 member walk over the
    shared ``_inflate_at`` block loop (CRC-32 + ISIZE proven per
    member), 6 ZSTD via the from-scratch RFC 8878 frame decoder
    (FSE + Huffman + sequences). Returns None on any codec-grammar
    violation."""
    if codec == 0:
        return page if len(page) == usize else None
    if codec == 1:
        try:
            out = snappy_decompress(page)
        except ValueError:
            return None
        return out if len(out) == usize else None
    if codec == 2:
        from gmall_flink_210726_spark.operators.inflate import (
            iter_gzip_members,
        )

        members = iter_gzip_members(page)
        if members is None:
            return None
        out = b"".join(payload for _, payload in members)
        return out if len(out) == usize else None
    if codec == 6:
        from gmall_flink_210726_spark.operators.zstd import zstd_decompress

        try:
            out = zstd_decompress(page)
        except ValueError:
            return None
        return out if len(out) == usize else None
    if codec == 7:  # LZ4_RAW: one plain LZ4 block per page
        from gmall_flink_210726_spark.operators.lz4 import (
            lz4_block_decompress,
        )

        try:
            out = lz4_block_decompress(page, usize)
        except ValueError:
            return None
        return out if len(out) == usize else None
    return None


# UNCOMPRESSED / SNAPPY / GZIP / ZSTD / LZ4_RAW — every parquet
# codec in practical use, all hand-decoded
_CODECS = (0, 1, 2, 6, 7)


def read_parquet_column_k(
    data: bytes, collect_values: bool = False, name: bytes = b"k"
) -> dict | None:
    """Footer -> every row group's 'k' column chunk -> data pages ->
    def levels + PLAIN int64 values. With ``collect_values`` the
    decoded values ride along under a "values" key (the
    deletion-vector scan needs per-row values to subtract deleted
    positions). Cross-checks at every layer:
    column type INT64, codec UNCOMPRESSED/SNAPPY/GZIP (hand
    decoders, decoded length proven), page type DATA_PAGE with PLAIN
    encoding, def levels all 1 (no nulls written), per-page value
    counts summing to the chunk's num_values, and the chunk counts
    summing to the file num_rows."""
    if len(data) < 12 or data[:4] != b"PAR1" or data[-4:] != b"PAR1":
        return None
    (flen,) = struct.unpack_from("<I", data, len(data) - 8)
    start = len(data) - 8 - flen
    if flen <= 0 or start < 4:
        return None
    try:
        meta = _read_struct(_Reader(data, start, len(data) - 8))
    except ValueError:
        return None
    num_rows = meta.get(3)
    row_groups = meta.get(4)
    if not isinstance(num_rows, int) or not isinstance(row_groups, list):
        return None
    total_vals = ksum = n_pages = 0
    collected: list[int] = []
    for rg in row_groups:
        cols = rg.get(1) if isinstance(rg, dict) else None
        if not isinstance(cols, list):
            return None
        chunk = None
        for cc in cols:
            cm = cc.get(3) if isinstance(cc, dict) else None
            if (
                isinstance(cm, dict)
                and cm.get(3) == [name]  # path_in_schema
            ):
                chunk = cm
                break
        if chunk is None:
            return None
        codec = chunk.get(4)
        if chunk.get(1) != 2 or codec not in _CODECS:  # INT64 only
            return None
        n_vals = chunk.get(5)
        off = chunk.get(9)
        if not isinstance(n_vals, int) or not isinstance(off, int):
            return None
        got = 0
        pos = off
        try:
            while got < n_vals:
                r = _Reader(data, pos, len(data))
                ph = _read_struct(r)
                if ph.get(1) != 0:  # DATA_PAGE v1 only
                    return None
                dph = ph.get(5)
                if not isinstance(dph, dict) or dph.get(2) != 0:  # PLAIN
                    return None
                pn = dph.get(1)
                psize = ph.get(3)
                usize = ph.get(2)
                if not isinstance(pn, int) or not isinstance(psize, int):
                    return None
                page = data[r.pos : r.pos + psize]
                if len(page) != psize:
                    return None
                crc = ph.get(4)
                if crc is not None:
                    # optional page CRC (standard CRC-32 over the
                    # serialized, still-compressed page bytes, spec
                    # PageHeader.crc) — the one integrity layer that
                    # catches a flipped VALUE byte no count/level
                    # cross-check can see
                    import zlib as _zlib

                    if _zlib.crc32(page) != crc & 0xFFFFFFFF:
                        return None
                page = _page_decompress(page, codec, usize)
                if page is None:
                    return None
                (dlen,) = struct.unpack_from("<I", page, 0)
                levels = _decode_rle_hybrid(page[4 : 4 + dlen], pn, 1)
                if len(levels) != pn or any(v != 1 for v in levels):
                    return None  # nulls were never written
                vals = page[4 + dlen :]
                if len(vals) != 8 * pn:
                    return None
                decoded = struct.unpack_from(f"<{pn}q", vals, 0)
                ksum += sum(decoded)
                if collect_values:
                    collected.extend(decoded)
                got += pn
                n_pages += 1
                pos = r.pos + psize
        except ValueError:
            return None
        if got != n_vals:
            return None
        total_vals += n_vals
    if total_vals != num_rows:
        return None  # chunk counts must sum to the file row count
    out = {"n_values": total_vals, "k_sum": ksum, "n_pages": n_pages}
    if collect_values:
        out["values"] = collected
    return out


PQCOL_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_values", LongType()),
        StructField("k_sum", LongType()),
        StructField("n_pages", LongType()),
    ]
)


def _pqcol_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for mid, blob in zip(pdf["media_id"], pdf["content"]):
        mid = int(mid)
        row = {
            "media_id": mid,
            "format": "unknown",
            "n_values": 0,
            "k_sum": 0,
            "n_pages": 0,
        }
        b = bytes(blob) if blob is not None else b""
        try:
            st = read_parquet_column_k(b)
        except Exception:
            st = None
        if st is not None:
            row.update(format="parquet", **st)
        out.append(row)
    return pd.DataFrame(out, columns=[f.name for f in PQCOL_SCHEMA.fields])


def parquet_column_stats(df: DataFrame) -> DataFrame:
    """Hand-decoded column-chunk read over MEDIA_SCHEMA blobs."""
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _pqcol_batch(pdf)

    return df.select("media_id", "content").mapInPandas(gen, PQCOL_SCHEMA)


# --------------------------------------------------------------------------
# Snappy block-format decompressor (the public Google format spec;
# parquet's default page codec) — hand-written so the engine reads
# SNAPPY-compressed pages with zero codec library: preamble varint =
# uncompressed length, then a tag stream of literals and three copy
# forms (1/2/4-byte offsets) with LZ77 overlapping back-copy.
# --------------------------------------------------------------------------


def snappy_decompress(data: bytes) -> bytes:
    """Raw snappy block decode. C-backed (optimization round 14, guide
    §4.2): the block's own leading uvarint gives the exact output size,
    so the Arrow C++ snappy codec decodes it ~75x faster than the
    from-spec tag loop in ``_snappy_decompress_py`` (kept as executable
    documentation and differentially fuzz-tested in
    tests/test_codec_fastpaths.py). snappy's RawUncompress produces
    exactly the declared length or fails, so the returned buffer can
    never carry a garbage tail; errors map to the module's ValueError
    contract."""
    r = _Reader(data, 0, len(data))
    want = r.varint()
    if want > (1 << 26):
        raise ValueError("snappy: bomb guard")
    global _PA_SNAPPY
    if _PA_SNAPPY is None:
        import pyarrow as pa

        _PA_SNAPPY = pa.Codec("snappy")
    try:
        return bytes(_PA_SNAPPY.decompress(data, want))
    except Exception as exc:
        raise ValueError(f"snappy: {exc}") from None


_PA_SNAPPY = None


def _snappy_decompress_py(data: bytes) -> bytes:
    """From-spec snappy block decode (the round-1..13 decoder)."""
    r = _Reader(data, 0, len(data))
    want = r.varint()
    if want > (1 << 26):
        raise ValueError("snappy: bomb guard")
    out = bytearray()
    while r.pos < r.end:
        tag = r.byte()
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:  # 60-63: length in the next 1-4 bytes
                nb = ln - 59
                ln = int.from_bytes(r.take(nb), "little")
            out += r.take(ln + 1)
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 7) + 4
            off = ((tag & 0xE0) << 3) | r.byte()
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(r.take(2), "little")
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(r.take(4), "little")
        if off == 0 or off > len(out):
            raise ValueError("snappy: bad copy offset")
        for _ in range(ln):  # overlapping copies are the LZ77 point
            out.append(out[-off])
    if len(out) != want:
        raise ValueError("snappy: length mismatch")
    return bytes(out)


def synthesize_parquet_snappy_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of SNAPPY-compressed parquet files (every
    9th footer-length word smashed)."""
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
                    "content": [
                        _make_parquet(int(i), "SNAPPY", bad_stripe=9)
                        for i in ids
                    ],
                    "meta": [
                        {
                            "format": "parquet",
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
# RLE_DICTIONARY + nullable read — the page shape pyarrow/Spark write
# BY DEFAULT for string columns (dictionary page + RLE/bit-packed
# index pages, definition levels with a real 0/1 null mix). Without
# this the from-scratch read path misses most real lakehouse files.
# --------------------------------------------------------------------------


def read_parquet_column_s_dict(
    data: bytes, name: bytes = b"s", collect_values: bool = False
) -> dict | None:
    """Footer -> every row group's 's' column chunk -> DICTIONARY
    page (PLAIN byte-array values, fully consumed) -> data pages
    (RLE_DICTIONARY / PLAIN_DICTIONARY): definition levels via the
    RLE/bit-packed hybrid (bit width 1, real nulls), then a 1-byte
    index bit width and the hybrid-coded dictionary indices (count =
    the page's NON-NULL total, every index bounds-checked against
    the dictionary). Cross-checks: column type BYTE_ARRAY, codec in
    the hand-decoder family, dict-page value list consumes exactly
    the page, per-page value counts (nulls included) sum to the
    chunk's num_values, chunk counts sum to the file row count.

    Returns aggregate proof the decode was right: total/null value
    counts, data-page count, summed per-group dictionary sizes, and
    byte-value checksums over both the materialized column and the
    dictionaries themselves."""
    if len(data) < 12 or data[:4] != b"PAR1" or data[-4:] != b"PAR1":
        return None
    (flen,) = struct.unpack_from("<I", data, len(data) - 8)
    start = len(data) - 8 - flen
    if flen <= 0 or start < 4:
        return None
    try:
        meta = _read_struct(_Reader(data, start, len(data) - 8))
    except ValueError:
        return None
    num_rows = meta.get(3)
    row_groups = meta.get(4)
    if not isinstance(num_rows, int) or not isinstance(row_groups, list):
        return None
    n_values = n_nulls = n_pages = dict_size = 0
    value_bytes_sum = dict_bytes_sum = 0
    collected: list[bytes | None] = []
    for rg in row_groups:
        cols = rg.get(1) if isinstance(rg, dict) else None
        if not isinstance(cols, list):
            return None
        chunk = None
        for cc in cols:
            cm = cc.get(3) if isinstance(cc, dict) else None
            if isinstance(cm, dict) and cm.get(3) == [name]:
                chunk = cm
                break
        if chunk is None:
            return None
        codec = chunk.get(4)
        if chunk.get(1) != 6 or codec not in _CODECS:  # BYTE_ARRAY
            return None
        n_vals = chunk.get(5)
        dict_off = chunk.get(11)  # dictionary_page_offset
        if not isinstance(n_vals, int) or not isinstance(dict_off, int):
            return None
        try:
            # --- dictionary page ---
            r = _Reader(data, dict_off, len(data))
            ph = _read_struct(r)
            if ph.get(1) != 2:  # DICTIONARY_PAGE
                return None
            dph = ph.get(7)
            # encoding PLAIN (format v2) or PLAIN_DICTIONARY (v1)
            if not isinstance(dph, dict) or dph.get(2) not in (0, 2):
                return None
            nd = dph.get(1)
            psize, usize = ph.get(3), ph.get(2)
            if not isinstance(nd, int) or not isinstance(psize, int):
                return None
            page = data[r.pos : r.pos + psize]
            if len(page) != psize:
                return None
            page = _page_decompress(page, codec, usize)
            if page is None:
                return None
            dvals: list[bytes] = []
            pos = 0
            for _ in range(nd):
                if pos + 4 > len(page):
                    return None
                (ln,) = struct.unpack_from("<I", page, pos)
                pos += 4
                if pos + ln > len(page):
                    return None
                dvals.append(page[pos : pos + ln])
                pos += ln
            if pos != len(page):
                return None  # the value list must consume the page
            dsums = [sum(v) for v in dvals]
            # --- data pages ---
            got = 0
            pos = r.pos + psize
            while got < n_vals:
                r2 = _Reader(data, pos, len(data))
                ph2 = _read_struct(r2)
                if ph2.get(1) != 0:  # DATA_PAGE v1
                    return None
                dph2 = ph2.get(5)
                # RLE_DICTIONARY (v2) or PLAIN_DICTIONARY (v1)
                if not isinstance(dph2, dict) or dph2.get(2) not in (2, 8):
                    return None
                pn = dph2.get(1)
                psize2, usize2 = ph2.get(3), ph2.get(2)
                if not isinstance(pn, int) or not isinstance(psize2, int):
                    return None
                page2 = data[r2.pos : r2.pos + psize2]
                if len(page2) != psize2:
                    return None
                page2 = _page_decompress(page2, codec, usize2)
                if page2 is None or len(page2) < 4:
                    return None
                (dlen,) = struct.unpack_from("<I", page2, 0)
                if 4 + dlen > len(page2):
                    return None
                levels = _decode_rle_hybrid(page2[4 : 4 + dlen], pn, 1)
                if len(levels) != pn or any(v not in (0, 1) for v in levels):
                    return None
                nn = sum(levels)
                body = page2[4 + dlen :]
                idx: list[int] = []
                if nn:
                    if not body:
                        return None
                    bw = body[0]
                    idx = _decode_rle_hybrid(body[1:], nn, bw)
                    if len(idx) != nn or any(
                        j >= len(dvals) for j in idx
                    ):
                        return None
                    value_bytes_sum += sum(dsums[j] for j in idx)
                if collect_values:
                    it = iter(idx)
                    collected.extend(
                        dvals[next(it)] if lv else None
                        for lv in levels
                    )
                n_nulls += pn - nn
                got += pn
                n_pages += 1
                pos = r2.pos + psize2
        except ValueError:
            return None
        if got != n_vals:
            return None
        n_values += n_vals
        dict_size += nd
        dict_bytes_sum += sum(dsums)
    if n_values != num_rows:
        return None  # chunk counts must sum to the file row count
    out = {
        "n_values": n_values,
        "n_nulls": n_nulls,
        "n_pages": n_pages,
        "dict_size": dict_size,
        "value_bytes_sum": value_bytes_sum,
        "dict_bytes_sum": dict_bytes_sum,
    }
    if collect_values:
        out["values"] = collected
    return out


PQDICT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_values", LongType()),
        StructField("n_nulls", LongType()),
        StructField("n_pages", LongType()),
        StructField("dict_size", LongType()),
        StructField("value_bytes_sum", LongType()),
        StructField("dict_bytes_sum", LongType()),
    ]
)


def _pqdict_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for mid, blob in zip(pdf["media_id"], pdf["content"]):
        mid = int(mid)
        row = {
            "media_id": mid,
            "format": "unknown",
            "n_values": 0,
            "n_nulls": 0,
            "n_pages": 0,
            "dict_size": 0,
            "value_bytes_sum": 0,
            "dict_bytes_sum": 0,
        }
        b = bytes(blob) if blob is not None else b""
        try:
            st = read_parquet_column_s_dict(b)
        except Exception:
            st = None
        if st is not None:
            row.update(format="parquet", **st)
        out.append(row)
    return pd.DataFrame(out, columns=[f.name for f in PQDICT_SCHEMA.fields])


def parquet_dict_stats(df: DataFrame) -> DataFrame:
    """Hand-decoded dictionary-column read over MEDIA_SCHEMA blobs."""
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _pqdict_batch(pdf)

    return df.select("media_id", "content").mapInPandas(gen, PQDICT_SCHEMA)


def _make_parquet_dict(i: int, bad_stripe: int = 8) -> bytes:
    """``10 + i % 90`` rows, ``1 + i % 3`` row groups; column 's' is
    NULLABLE (every (7r+i)%5==0 row) and dictionary-encoded
    (use_dictionary, <=9 distinct 'w<digit>' values so the encoder
    never falls back to PLAIN). Every ``bad_stripe``-th id gets the
    first dictionary PageHeader overwritten with 0xFF — a thrift
    type-15 field header the struct walk must reject."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 10 + i % 90
    g = 1 + i % 3
    m = 4 + i % 6
    table = pa.table(
        {
            "k": pa.array(
                [(i * 7 + 3 * r) % 1000 for r in range(n)], pa.int64()
            ),
            "s": pa.array(
                [
                    None
                    if (7 * r + i) % 5 == 0
                    else f"w{(i + 3 * r) % m}"
                    for r in range(n)
                ],
                pa.string(),
            ),
        }
    )
    buf = io.BytesIO()
    pq.write_table(
        table,
        buf,
        row_group_size=-(-n // g),
        compression="NONE",
        write_statistics=False,
        use_dictionary=["s"],
    )
    blob = bytearray(buf.getvalue())
    if i % bad_stripe == 0:
        off = (
            pq.ParquetFile(io.BytesIO(bytes(blob)))
            .metadata.row_group(0)
            .column(1)
            .dictionary_page_offset
        )
        blob[off : off + 4] = b"\xff\xff\xff\xff"
    return bytes(blob)


def synthesize_parquet_dict_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of dictionary-encoded nullable parquet."""
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
                    "content": [_make_parquet_dict(int(i)) for i in ids],
                    "meta": [
                        {
                            "format": "parquet",
                            "width": 0,
                            "height": 0,
                            "sample_rate": 0,
                        }
                        for _ in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


def synthesize_parquet_gzip_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of GZIP-compressed parquet files (every
    11th footer-length word smashed)."""
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
                    "content": [
                        _make_parquet(int(i), "GZIP", bad_stripe=11)
                        for i in ids
                    ],
                    "meta": [
                        {
                            "format": "parquet",
                            "width": 0,
                            "height": 0,
                            "sample_rate": 0,
                        }
                        for _ in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


def synthesize_parquet_zstd_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of ZSTD-compressed parquet files (every
    9th footer-length word smashed)."""
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
                    "content": [
                        _make_parquet(int(i), "ZSTD", bad_stripe=9)
                        for i in ids
                    ],
                    "meta": [
                        {
                            "format": "parquet",
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
# Parquet v2 data pages + the delta encodings modern writers default
# to (parquet-format Encodings.md): DELTA_BINARY_PACKED for integers
# (zigzag first value + per-block zigzag min_delta + bit-packed
# miniblock deltas) and DELTA_LENGTH_BYTE_ARRAY for strings (a
# delta-packed length run, then the concatenated bytes). V2 pages
# carry their definition-level byte length explicitly in the
# DataPageHeaderV2 and never compress the level bytes.
# --------------------------------------------------------------------------


def _delta_binary_packed(data: bytes, pos: int) -> tuple[list[int], int]:
    """Decode one DELTA_BINARY_PACKED run starting at ``pos``.
    Returns (values, new_pos). Raises ValueError on any grammar
    violation (bit width > 64, counts that do not close, overruns)."""
    r = _Reader(data, pos, len(data))
    block_size = r.varint()
    n_mini = r.varint()
    total = r.varint()
    first = r.zigzag()
    if (
        block_size <= 0
        or n_mini <= 0
        or block_size % 128
        or block_size % n_mini
    ):
        raise ValueError("delta: bad block geometry")
    per_mini = block_size // n_mini
    if per_mini % 32:
        raise ValueError("delta: miniblock size not a multiple of 32")
    out = [first]
    if total == 0:
        raise ValueError("delta: empty run")  # always >= 1 per spec
    while len(out) < total:
        min_delta = r.zigzag()
        widths = r.take(n_mini)
        for w in widths:
            if len(out) >= total:
                break
            if w > 64:
                raise ValueError("delta: bit width too large")
            take = min(per_mini, total - len(out))
            if w == 0:
                vals = [0] * take
            else:
                raw = r.take(per_mini * w // 8)
                word = int.from_bytes(raw, "little")
                mask = (1 << w) - 1
                vals = [
                    (word >> (j * w)) & mask for j in range(take)
                ]
            prev = out[-1]
            for d in vals:
                prev += min_delta + d
                out.append(prev)
    return out[:total], r.pos


def read_parquet_columns_v2(data: bytes) -> dict | None:
    """Footer -> column chunks 'k' (INT64, DELTA_BINARY_PACKED) and
    's' (BYTE_ARRAY, DELTA_LENGTH_BYTE_ARRAY) -> DATA_PAGE_V2 pages.
    Cross-checks: per-page num_values (nulls included) sum to each
    chunk's num_values, chunks sum to the file row count, the V2
    header's definition-levels byte length frames exactly, the
    delta runs' own total_value_count matches the page, and the
    string section's concatenated bytes are consumed exactly."""
    if len(data) < 12 or data[:4] != b"PAR1" or data[-4:] != b"PAR1":
        return None
    (flen,) = struct.unpack_from("<I", data, len(data) - 8)
    start = len(data) - 8 - flen
    if flen <= 0 or start < 4:
        return None
    try:
        meta = _read_struct(_Reader(data, start, len(data) - 8))
    except ValueError:
        return None
    num_rows = meta.get(3)
    row_groups = meta.get(4)
    if not isinstance(num_rows, int) or not isinstance(row_groups, list):
        return None
    n_values = n_pages = 0
    k_sum = s_bytes_sum = 0
    for rg in row_groups:
        cols = rg.get(1) if isinstance(rg, dict) else None
        if not isinstance(cols, list):
            return None
        chunks: dict[bytes, dict] = {}
        for cc in cols:
            cm = cc.get(3) if isinstance(cc, dict) else None
            if isinstance(cm, dict) and cm.get(3) in ([b"k"], [b"s"]):
                chunks[cm[3][0]] = cm
        if set(chunks) != {b"k", b"s"}:
            return None
        rg_rows = rg.get(3)
        if not isinstance(rg_rows, int):
            return None
        for name, want_type, want_enc in (
            (b"k", 2, 5),   # INT64, DELTA_BINARY_PACKED
            (b"s", 6, 6),   # BYTE_ARRAY, DELTA_LENGTH_BYTE_ARRAY
        ):
            chunk = chunks[name]
            codec = chunk.get(4)
            if chunk.get(1) != want_type or codec not in _CODECS:
                return None
            n_vals = chunk.get(5)
            off = chunk.get(9)
            if not isinstance(n_vals, int) or not isinstance(off, int):
                return None
            try:
                got = 0
                pos = off
                while got < n_vals:
                    r = _Reader(data, pos, len(data))
                    ph = _read_struct(r)
                    if ph.get(1) != 3:  # DATA_PAGE_V2
                        return None
                    dph = ph.get(8)
                    if not isinstance(dph, dict) or dph.get(4) != want_enc:
                        return None
                    pn = dph.get(1)
                    nnull = dph.get(2)
                    dlen = dph.get(5)
                    rlen = dph.get(6)
                    psize, usize = ph.get(3), ph.get(2)
                    if (
                        not isinstance(pn, int)
                        or not isinstance(psize, int)
                        or not isinstance(dlen, int)
                        or rlen != 0
                        or nnull != 0  # fixture columns are dense
                    ):
                        return None
                    page = data[r.pos : r.pos + psize]
                    if len(page) != psize:
                        return None
                    # v2: level bytes are NEVER compressed; the data
                    # section is, unless is_compressed (field 7) = false
                    levels = page[:dlen]
                    if dlen:
                        lv = _decode_rle_hybrid(levels, pn, 1)
                        if len(lv) != pn or any(v != 1 for v in lv):
                            return None
                    body = page[dlen:]
                    if dph.get(7, True):
                        body = _page_decompress(
                            body, codec, usize - dlen
                        )
                        if body is None:
                            return None
                    vals, used = _delta_binary_packed(body, 0)
                    if len(vals) != pn:
                        return None
                    if name == b"k":
                        if used != len(body):
                            return None
                        k_sum += sum(vals)
                    else:
                        if any(v < 0 for v in vals):
                            return None
                        if used + sum(vals) != len(body):
                            return None  # bytes must be consumed exactly
                        s_bytes_sum += sum(body[used:])
                        n_pages += 0  # counted on the k walk only
                    if name == b"k":
                        n_pages += 1
                    got += pn
                    pos = r.pos + psize
                if got != n_vals:
                    return None
                if name == b"k":
                    if n_vals != rg_rows:
                        return None
                    n_values += n_vals
            except ValueError:
                return None
    if n_values != num_rows:
        return None
    return {
        "n_values": n_values,
        "n_pages": n_pages,
        "k_sum": k_sum,
        "s_bytes_sum": s_bytes_sum,
    }


def _make_parquet_v2(i: int, bad_stripe: int = 10) -> bytes:
    """``10 + i % 90`` rows, ``1 + i % 3`` row groups, format-v2 data
    pages: column 'k' INT64 DELTA_BINARY_PACKED with NEGATIVE values
    (zigzag + negative min_delta both exercise), column 's'
    DELTA_LENGTH_BYTE_ARRAY. Page codec rotates NONE/SNAPPY/GZIP/ZSTD
    by id — all four hand decoders under the v2 page shape. Every
    ``bad_stripe``-th id gets its first 'k' data PageHeader smashed."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 10 + i % 90
    g = 1 + i % 3
    table = pa.table(
        {
            "k": pa.array(
                [(i * 7 + 3 * r) % 1000 - 400 for r in range(n)],
                pa.int64(),
            ),
            "s": pa.array([f"word{(i + 2 * r) % 9}" for r in range(n)]),
        }
    )
    buf = io.BytesIO()
    pq.write_table(
        table,
        buf,
        version="2.6",
        data_page_version="2.0",
        use_dictionary=False,
        column_encoding={
            "k": "DELTA_BINARY_PACKED",
            "s": "DELTA_LENGTH_BYTE_ARRAY",
        },
        compression=("NONE", "SNAPPY", "GZIP", "ZSTD")[i % 4],
        write_statistics=False,
        row_group_size=-(-n // g),
    )
    blob = bytearray(buf.getvalue())
    if i % bad_stripe == 0:
        off = (
            pq.ParquetFile(io.BytesIO(bytes(blob)))
            .metadata.row_group(0)
            .column(0)
            .data_page_offset
        )
        blob[off : off + 4] = b"\xff\xff\xff\xff"
    return bytes(blob)


PQV2_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_values", LongType()),
        StructField("n_pages", LongType()),
        StructField("k_sum", LongType()),
        StructField("s_bytes_sum", LongType()),
    ]
)


def _pqv2_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for mid, blob in zip(pdf["media_id"], pdf["content"]):
        mid = int(mid)
        row = {
            "media_id": mid,
            "format": "unknown",
            "n_values": 0,
            "n_pages": 0,
            "k_sum": 0,
            "s_bytes_sum": 0,
        }
        b = bytes(blob) if blob is not None else b""
        try:
            st = read_parquet_columns_v2(b)
        except Exception:
            st = None
        if st is not None:
            row.update(format="parquet", **st)
        out.append(row)
    return pd.DataFrame(out, columns=[f.name for f in PQV2_SCHEMA.fields])


def parquet_v2_stats(df: DataFrame) -> DataFrame:
    """Hand-decoded v2-page delta-encoded read over MEDIA blobs."""
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _pqv2_batch(pdf)

    return df.select("media_id", "content").mapInPandas(gen, PQV2_SCHEMA)


def synthesize_parquet_v2_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of format-v2 delta-encoded parquet files."""
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
                    "content": [_make_parquet_v2(int(i)) for i in ids],
                    "meta": [
                        {
                            "format": "parquet",
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
# The remaining v2 encodings: BYTE_STREAM_SPLIT for floating point
# (k-th bytes of all values grouped into k streams — a pure
# transposition that makes FP bytes compressible) and
# DELTA_BYTE_ARRAY for strings (front coding: delta-packed PREFIX
# lengths, then a DELTA_LENGTH_BYTE_ARRAY suffix section; value i =
# value[i-1][:prefix_len[i]] + suffix[i]).
# --------------------------------------------------------------------------


def _delta_byte_array(body: bytes) -> list[bytes]:
    """DELTA_BYTE_ARRAY decode; consumes ``body`` exactly."""
    prefixes, pos = _delta_binary_packed(body, 0)
    suffix_lens, pos = _delta_binary_packed(body, pos)
    if len(prefixes) != len(suffix_lens):
        raise ValueError("dba: prefix/suffix count mismatch")
    out: list[bytes] = []
    for plen, slen in zip(prefixes, suffix_lens):
        if plen < 0 or slen < 0 or pos + slen > len(body):
            raise ValueError("dba: bad lengths")
        if plen > (len(out[-1]) if out else 0):
            raise ValueError("dba: prefix longer than previous value")
        prev = out[-1][:plen] if plen else b""
        out.append(prev + body[pos : pos + slen])
        pos += slen
    if pos != len(body):
        raise ValueError("dba: body not consumed exactly")
    return out


def read_parquet_columns_bss_dba(data: bytes) -> dict | None:
    """Footer -> column chunks 'v' (DOUBLE, BYTE_STREAM_SPLIT) and
    's' (BYTE_ARRAY, DELTA_BYTE_ARRAY) over DATA_PAGE_V2 pages.
    Proofs: quarter-sums of the reconstructed doubles (the fixture
    writes exact quarter values, so 4*v is integer-exact) and the
    byte-value checksum of the front-decoded strings."""
    if len(data) < 12 or data[:4] != b"PAR1" or data[-4:] != b"PAR1":
        return None
    (flen,) = struct.unpack_from("<I", data, len(data) - 8)
    start = len(data) - 8 - flen
    if flen <= 0 or start < 4:
        return None
    try:
        meta = _read_struct(_Reader(data, start, len(data) - 8))
    except ValueError:
        return None
    num_rows = meta.get(3)
    row_groups = meta.get(4)
    if not isinstance(num_rows, int) or not isinstance(row_groups, list):
        return None
    n_values = n_pages = 0
    v_q_sum = s_bytes_sum = 0
    for rg in row_groups:
        cols = rg.get(1) if isinstance(rg, dict) else None
        if not isinstance(cols, list):
            return None
        chunks: dict[bytes, dict] = {}
        for cc in cols:
            cm = cc.get(3) if isinstance(cc, dict) else None
            if isinstance(cm, dict) and cm.get(3) in ([b"v"], [b"s"]):
                chunks[cm[3][0]] = cm
        if set(chunks) != {b"v", b"s"}:
            return None
        for name, want_type, want_enc in (
            (b"v", 5, 9),   # DOUBLE, BYTE_STREAM_SPLIT
            (b"s", 6, 7),   # BYTE_ARRAY, DELTA_BYTE_ARRAY
        ):
            chunk = chunks[name]
            codec = chunk.get(4)
            if chunk.get(1) != want_type or codec not in _CODECS:
                return None
            n_vals = chunk.get(5)
            off = chunk.get(9)
            if not isinstance(n_vals, int) or not isinstance(off, int):
                return None
            try:
                got = 0
                pos = off
                while got < n_vals:
                    r = _Reader(data, pos, len(data))
                    ph = _read_struct(r)
                    if ph.get(1) != 3:  # DATA_PAGE_V2
                        return None
                    dph = ph.get(8)
                    if not isinstance(dph, dict) or dph.get(4) != want_enc:
                        return None
                    pn, nnull = dph.get(1), dph.get(2)
                    dlen, rlen = dph.get(5), dph.get(6)
                    psize, usize = ph.get(3), ph.get(2)
                    if (
                        not isinstance(pn, int)
                        or not isinstance(psize, int)
                        or not isinstance(dlen, int)
                        or rlen != 0
                        or nnull != 0
                    ):
                        return None
                    page = data[r.pos : r.pos + psize]
                    if len(page) != psize:
                        return None
                    if dlen:
                        lv = _decode_rle_hybrid(page[:dlen], pn, 1)
                        if len(lv) != pn or any(v != 1 for v in lv):
                            return None
                    body = page[dlen:]
                    if dph.get(7, True):
                        body = _page_decompress(body, codec, usize - dlen)
                        if body is None:
                            return None
                    if name == b"v":
                        if len(body) != 8 * pn:
                            return None
                        for k in range(pn):
                            # transpose back: byte j of value k sits
                            # at stream j, position k
                            word = bytes(
                                body[j * pn + k] for j in range(8)
                            )
                            (val,) = struct.unpack("<d", word)
                            q = val * 4.0
                            if q != int(q):
                                return None  # fixture contract broken
                            v_q_sum += int(q)
                        n_pages += 1
                    else:
                        vals = _delta_byte_array(body)
                        if len(vals) != pn:
                            return None
                        s_bytes_sum += sum(sum(v) for v in vals)
                    got += pn
                    pos = r.pos + psize
                if got != n_vals:
                    return None
                if name == b"v":
                    n_values += n_vals
            except ValueError:
                return None
    if n_values != num_rows:
        return None
    return {
        "n_values": n_values,
        "n_pages": n_pages,
        "v_q_sum": v_q_sum,
        "s_bytes_sum": s_bytes_sum,
    }


def _make_parquet_bss(i: int, bad_stripe: int = 11) -> bytes:
    """``10 + i % 90`` rows, ``1 + i % 3`` row groups, v2 pages:
    column 'v' DOUBLE in exact quarters (so 4*v is integer — the
    reconstruction proof stays in integer space), BYTE_STREAM_SPLIT;
    column 's' front-codable strings, DELTA_BYTE_ARRAY. Codec
    rotates by id. Every ``bad_stripe``-th id gets the first 'v'
    PageHeader smashed."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 10 + i % 90
    g = 1 + i % 3
    table = pa.table(
        {
            "v": pa.array(
                [((i * 7 + 3 * r) % 1000 - 300) / 4 for r in range(n)],
                pa.float64(),
            ),
            "s": pa.array(
                [f"pre_{i % 5}_{(i + 3 * r) % 9}" for r in range(n)]
            ),
        }
    )
    buf = io.BytesIO()
    pq.write_table(
        table,
        buf,
        version="2.6",
        data_page_version="2.0",
        use_dictionary=False,
        column_encoding={
            "v": "BYTE_STREAM_SPLIT",
            "s": "DELTA_BYTE_ARRAY",
        },
        compression=("NONE", "SNAPPY", "GZIP", "ZSTD")[i % 4],
        write_statistics=False,
        row_group_size=-(-n // g),
    )
    blob = bytearray(buf.getvalue())
    if i % bad_stripe == 0:
        off = (
            pq.ParquetFile(io.BytesIO(bytes(blob)))
            .metadata.row_group(0)
            .column(0)
            .data_page_offset
        )
        blob[off : off + 4] = b"\xff\xff\xff\xff"
    return bytes(blob)


PQBSS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_values", LongType()),
        StructField("n_pages", LongType()),
        StructField("v_q_sum", LongType()),
        StructField("s_bytes_sum", LongType()),
    ]
)


def parquet_bss_stats(df: DataFrame) -> DataFrame:
    """Hand-decoded BYTE_STREAM_SPLIT + DELTA_BYTE_ARRAY read."""
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)
    cols = [f.name for f in PQBSS_SCHEMA.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                mid = int(mid)
                row = {
                    "media_id": mid,
                    "format": "unknown",
                    "n_values": 0,
                    "n_pages": 0,
                    "v_q_sum": 0,
                    "s_bytes_sum": 0,
                }
                b = bytes(blob) if blob is not None else b""
                try:
                    st = read_parquet_columns_bss_dba(b)
                except Exception:
                    st = None
                if st is not None:
                    row.update(format="parquet", **st)
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return df.select("media_id", "content").mapInPandas(gen, PQBSS_SCHEMA)


def synthesize_parquet_bss_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of BYTE_STREAM_SPLIT/DELTA_BYTE_ARRAY
    parquet files."""
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
                    "content": [_make_parquet_bss(int(i)) for i in ids],
                    "meta": [
                        {
                            "format": "parquet",
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
# Statistics-based row-group skipping — the Iceberg/Delta "data
# skipping" planning trick: a scan with a range predicate reads the
# footer's per-chunk min/max statistics and never opens a row group
# whose [min, max] cannot intersect the predicate. For groups that
# ARE read, the decoded values' true min/max are cross-checked
# against the stats — lying statistics on a read group degrade the
# file (for skipped groups trust is inherent to the technique; that
# asymmetry is the documented contract of every stats-pruning
# engine).
# --------------------------------------------------------------------------


def parquet_stats_skip(
    data: bytes, lo: int, hi: int
) -> dict | None:
    """Footer stats walk + predicate ``lo <= k <= hi`` with
    row-group skipping; reads only unskippable groups' pages
    (PLAIN int64 v1 pages, required column)."""
    if len(data) < 12 or data[:4] != b"PAR1" or data[-4:] != b"PAR1":
        return None
    (flen,) = struct.unpack_from("<I", data, len(data) - 8)
    start = len(data) - 8 - flen
    if flen <= 0 or start < 4:
        return None
    try:
        meta = _read_struct(_Reader(data, start, len(data) - 8))
    except ValueError:
        return None
    num_rows = meta.get(3)
    row_groups = meta.get(4)
    if not isinstance(num_rows, int) or not isinstance(row_groups, list):
        return None
    n_groups = len(row_groups)
    n_skipped = n_match = match_sum = n_rows_seen = 0
    for rg in row_groups:
        cols = rg.get(1) if isinstance(rg, dict) else None
        if not isinstance(cols, list):
            return None
        chunk = None
        for cc in cols:
            cm = cc.get(3) if isinstance(cc, dict) else None
            if isinstance(cm, dict) and cm.get(3) == [b"k"]:
                chunk = cm
                break
        if chunk is None or chunk.get(1) != 2 or chunk.get(4) != 0:
            return None  # INT64, UNCOMPRESSED only here
        n_vals = chunk.get(5)
        off = chunk.get(9)
        stats = chunk.get(12)
        if not isinstance(n_vals, int) or not isinstance(off, int):
            return None
        n_rows_seen += n_vals
        smin = smax = None
        if isinstance(stats, dict):
            raw_max, raw_min = stats.get(5), stats.get(6)
            if isinstance(raw_min, bytes) and len(raw_min) == 8:
                smin = int.from_bytes(raw_min, "little", signed=True)
            if isinstance(raw_max, bytes) and len(raw_max) == 8:
                smax = int.from_bytes(raw_max, "little", signed=True)
        if smin is not None and smax is not None and (
            smax < lo or smin > hi
        ):
            n_skipped += 1  # planning-time elimination: pages untouched
            continue
        # read the group's pages
        try:
            got = 0
            pos = off
            vmin = vmax = None
            while got < n_vals:
                r = _Reader(data, pos, len(data))
                ph = _read_struct(r)
                if ph.get(1) != 0:
                    return None
                dph = ph.get(5)
                if not isinstance(dph, dict) or dph.get(2) != 0:
                    return None
                pn = dph.get(1)
                psize = ph.get(3)
                if not isinstance(pn, int) or not isinstance(psize, int):
                    return None
                page = data[r.pos : r.pos + psize]
                if len(page) != psize:
                    return None
                (dlen,) = struct.unpack_from("<I", page, 0)
                levels = _decode_rle_hybrid(page[4 : 4 + dlen], pn, 1)
                if len(levels) != pn or any(v != 1 for v in levels):
                    return None
                body = page[4 + dlen :]
                if len(body) != 8 * pn:
                    return None
                for k in range(pn):
                    (val,) = struct.unpack_from("<q", body, 8 * k)
                    vmin = val if vmin is None or val < vmin else vmin
                    vmax = val if vmax is None or val > vmax else vmax
                    if lo <= val <= hi:
                        n_match += 1
                        match_sum += val
                got += pn
                pos = r.pos + psize
            if got != n_vals:
                return None
            # stats truthfulness cross-check on READ groups
            if smin is not None and vmin is not None and smin != vmin:
                return None
            if smax is not None and vmax is not None and smax != vmax:
                return None
        except ValueError:
            return None
    if n_rows_seen != num_rows:
        return None
    return {
        "n_groups": n_groups,
        "n_skipped": n_skipped,
        "n_match": n_match,
        "match_sum": match_sum,
    }


def _make_parquet_stats(i: int, bad_stripe: int = 12) -> bytes:
    """``20 + i % 60`` rows of ``k = (i % 12) * 40 + r`` (a KNOWN
    contiguous range per file), ``1 + i % 4`` row groups, v1 PLAIN
    pages WITH statistics. Against the [300, 449] predicate this
    geometry yields all three planner outcomes: ~half the files
    fully skipped, a quarter fully read, and ~20%% MIXED (some
    groups skipped, some read — the case that actually proves
    per-group pruning). Every ``bad_stripe``-th id's footer length
    is smashed."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 20 + i % 60
    g = 1 + i % 4
    base = (i % 12) * 40
    table = pa.table(
        {"k": pa.array([base + r for r in range(n)], pa.int64())}
    )
    buf = io.BytesIO()
    pq.write_table(
        table,
        buf,
        row_group_size=-(-n // g),
        compression="NONE",
        write_statistics=True,
        use_dictionary=False,
    )
    blob = bytearray(buf.getvalue())
    if i % bad_stripe == 0:
        struct.pack_into("<I", blob, len(blob) - 8, 0x7FFFFFFF)
    return bytes(blob)


PQSKIP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_groups", LongType()),
        StructField("n_skipped", LongType()),
        StructField("n_match", LongType()),
        StructField("match_sum", LongType()),
    ]
)


def parquet_skip_stats(df: DataFrame, lo: int, hi: int) -> DataFrame:
    """Stats-pruned range scan over MEDIA_SCHEMA parquet blobs."""
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)
    cols = [f.name for f in PQSKIP_SCHEMA.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                mid = int(mid)
                row = {
                    "media_id": mid,
                    "format": "unknown",
                    "n_groups": 0,
                    "n_skipped": 0,
                    "n_match": 0,
                    "match_sum": 0,
                }
                b = bytes(blob) if blob is not None else b""
                try:
                    st = parquet_stats_skip(b, lo, hi)
                except Exception:
                    st = None
                if st is not None:
                    row.update(format="parquet", **st)
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return df.select("media_id", "content").mapInPandas(gen, PQSKIP_SCHEMA)


def synthesize_parquet_stats_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of statistics-bearing parquet files."""
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
                    "content": [_make_parquet_stats(int(i)) for i in ids],
                    "meta": [
                        {
                            "format": "parquet",
                            "width": 0,
                            "height": 0,
                            "sample_rate": 0,
                        }
                        for _ in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


def synthesize_parquet_lz4_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of LZ4_RAW-compressed parquet files (every
    13th footer-length word smashed)."""
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
                    "content": [
                        _make_parquet(int(i), "LZ4", bad_stripe=13)
                        for i in ids
                    ],
                    "meta": [
                        {
                            "format": "parquet",
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
# Nested (LIST) columns: repetition levels + Dremel record assembly
# --------------------------------------------------------------------------


def _schema_leaf_levels(
    schema: list,
) -> dict[tuple[bytes, ...], tuple[int, int, int]] | None:
    """Pre-order walk of the flattened SchemaElement list ->
    ``{path: (max_def, max_rep, physical_type)}`` per leaf.

    Dremel levels (Melnik et al., VLDB 2010 §4.1): walking root->leaf,
    every OPTIONAL or REPEATED ancestor (incl. the leaf) bumps the
    max definition level; every REPEATED ancestor bumps the max
    repetition level. SchemaElement fields: 1=type, 3=repetition_type
    (0 REQUIRED / 1 OPTIONAL / 2 REPEATED), 4=name, 5=num_children."""
    if not schema or not isinstance(schema[0], dict):
        return None
    out: dict[tuple[bytes, ...], tuple[int, int, int]] = {}
    idx = 1

    def walk(path: tuple[bytes, ...], dl: int, rl: int) -> bool:
        nonlocal idx
        if idx >= len(schema):
            return False
        el = schema[idx]
        idx += 1
        if not isinstance(el, dict):
            return False
        rep = el.get(3, 0)
        if rep in (1, 2):
            dl += 1
        if rep == 2:
            rl += 1
        name = el.get(4)
        if not isinstance(name, bytes):
            return False
        p = path + (name,)
        nch = el.get(5) or 0
        if nch == 0:
            out[p] = (dl, rl, el.get(1, -1))
            return True
        return all(walk(p, dl, rl) for _ in range(nch))

    nroot = schema[0].get(5) or 0
    for _ in range(nroot):
        if not walk((), 0, 0):
            return None
    if idx != len(schema):
        return None  # the flattened tree must consume the list exactly
    return out


def _assemble_list_records(
    reps: list[int],
    defs: list[int],
    vals: list,
    max_def: int,
    leaf_optional: bool = True,
) -> list[list | None] | None:
    """Dremel record assembly for ONE repeated level (max_rep == 1,
    the parquet LIST/MAP shape), over an optional collection whose
    leaf is OPTIONAL (lists, map values) or REQUIRED (map keys):

    - rep 0 opens a new record; rep 1 appends to the open list;
    - def 0 -> the collection itself is NULL (no value);
    - def max_def - (2 if leaf_optional else 1) -> present but EMPTY;
    - def max_def-1 (optional leaf only) -> a NULL element slot;
    - def max_def   -> a present element (consumes the next value).

    Returns None on any grammar violation (a rep-1 entry with no open
    list, an element-level def on an empty/null marker, leftover
    values) — level streams must be internally consistent."""
    empty_def = max_def - 2 if leaf_optional else max_def - 1
    records: list[list | None] = []
    vi = 0
    for rp, df in zip(reps, defs):
        if df > max_def or df < 0:
            return None
        if rp == 0:
            if df == 0:
                records.append(None)
            elif df == empty_def:
                records.append([])
            elif df == max_def or (leaf_optional and df == max_def - 1):
                cur: list = []
                if df == max_def:
                    if vi >= len(vals):
                        return None
                    cur.append(vals[vi])
                    vi += 1
                else:
                    cur.append(None)
                records.append(cur)
            else:
                return None
        else:  # rep == 1: continuation of the open record's list
            if not records or not isinstance(records[-1], list):
                return None
            if df == max_def:
                if vi >= len(vals):
                    return None
                records[-1].append(vals[vi])
                vi += 1
            elif leaf_optional and df == max_def - 1:
                records[-1].append(None)
            else:
                return None  # a list/null marker cannot continue a record
    if vi != len(vals):
        return None  # every decoded value must be placed exactly once
    return records


def _read_list_chunk(
    data: bytes, chunk: dict, max_def: int, ptype: int, max_rep: int = 1
) -> tuple[list[int], list[int], list, int] | None:
    """Walk one LIST leaf column chunk's data pages, BOTH page
    formats: v1 (whole page compressed; 4-byte-length-prefixed RLE
    repetition levels, then definition levels, then values) and v2
    (rep/def level byte lengths in the header, levels ALWAYS
    uncompressed and OUTSIDE the codec, is_compressed applying to
    the values alone, plus v2's own per-page books: the rep==0 count
    must equal the header's num_rows). Level bit widths derive from
    max_rep/max_def; values are PLAIN for exactly the def==max_def
    entries. Returns the pooled (reps, defs, values, n_pages) for
    record assembly; None on any grammar violation, including a
    smashed level stream."""
    codec = chunk.get(4)
    if chunk.get(1) != ptype or codec not in _CODECS:
        return None
    n_vals, off = chunk.get(5), chunk.get(9)
    if not isinstance(n_vals, int) or not isinstance(off, int):
        return None
    def_bits = max_def.bit_length()
    rep_bits = max_rep.bit_length()
    reps: list[int] = []
    defs: list[int] = []
    vals: list = []
    got = n_pages = 0
    pos = off
    while got < n_vals:
        r = _Reader(data, pos, len(data))
        ph = _read_struct(r)
        ptype_page = ph.get(1)
        psize, usize = ph.get(3), ph.get(2)
        if not isinstance(psize, int):
            return None
        raw = data[r.pos : r.pos + psize]
        if len(raw) != psize:
            return None
        if ptype_page == 0:  # DATA_PAGE v1: whole page compressed
            dph = ph.get(5)
            # values PLAIN; def (field 3) + rep (field 4) levels RLE
            if (
                not isinstance(dph, dict)
                or dph.get(2) != 0
                or dph.get(3) != 3
                or dph.get(4) != 3
            ):
                return None
            pn = dph.get(1)
            if not isinstance(pn, int):
                return None
            page = _page_decompress(raw, codec, usize)
            if page is None or len(page) < 4:
                return None
            if max_rep > 0:
                (rlen,) = struct.unpack_from("<I", page, 0)
                if 4 + rlen + 4 > len(page):
                    return None  # smashed repetition-level stream
                preps = _decode_rle_hybrid(
                    page[4 : 4 + rlen], pn, rep_bits
                )
                at = 4 + rlen
            else:  # max_rep == 0: the rep section is NOT WRITTEN
                preps = [0] * pn
                at = 0
            (dlen,) = struct.unpack_from("<I", page, at)
            body_at = at + 4 + dlen
            if body_at > len(page):
                return None  # smashed definition-level stream
            pdefs = _decode_rle_hybrid(
                page[at + 4 : body_at], pn, def_bits
            )
            body = page[body_at:]
        elif ptype_page == 3:  # DATA_PAGE_V2: levels OUTSIDE the codec
            dph = ph.get(8)
            if not isinstance(dph, dict) or dph.get(4) != 0:  # PLAIN
                return None
            pn = dph.get(1)
            n_rows_hdr = dph.get(3)
            dll = dph.get(5)
            rll = dph.get(6)
            if (
                not isinstance(pn, int)
                or not isinstance(dll, int)
                or not isinstance(rll, int)
                or rll + dll > len(raw)
            ):
                return None
            preps = _decode_rle_hybrid(raw[:rll], pn, rep_bits)
            pdefs = _decode_rle_hybrid(raw[rll : rll + dll], pn, def_bits)
            # v2's own books: rep==0 entries must equal its num_rows
            if isinstance(n_rows_hdr, int) and (
                sum(1 for x in preps if x == 0) != n_rows_hdr
            ):
                return None
            vbody = raw[rll + dll :]
            if dph.get(7, True):  # is_compressed applies to values only
                body = _page_decompress(
                    vbody, codec, usize - rll - dll
                )
                if body is None:
                    return None
            else:  # raw values regardless of the chunk codec
                body = vbody
                if len(body) != usize - rll - dll:
                    return None
        else:
            return None
        if len(preps) != pn or len(pdefs) != pn:
            return None
        npresent = sum(1 for d in pdefs if d == max_def)
        if ptype == 2:  # INT64
            if len(body) != 8 * npresent:
                return None
            vals.extend(struct.unpack_from(f"<{npresent}q", body, 0))
        else:  # BYTE_ARRAY
            bpos = 0
            for _ in range(npresent):
                if bpos + 4 > len(body):
                    return None
                (ln,) = struct.unpack_from("<I", body, bpos)
                bpos += 4
                if bpos + ln > len(body):
                    return None
                vals.append(body[bpos : bpos + ln])
                bpos += ln
            if bpos != len(body):
                return None  # values must consume the page exactly
        reps.extend(preps)
        defs.extend(pdefs)
        got += pn
        n_pages += 1
        pos = r.pos + psize
    if got != n_vals:
        return None  # per-page counts must sum to the chunk num_values
    return reps, defs, vals, n_pages


def read_parquet_nested(data: bytes) -> dict | None:
    """Nested-column parquet read from scratch: repetition levels +
    Dremel record assembly over the standard 3-level LIST shape —
    ``optional group (LIST) { repeated group list { optional leaf } }``
    — i.e. this repo's own ``embeddings.embedding`` column shape and
    the dominant layout of real lakehouse array columns.

    Per column (``arr`` list<int64>, ``tags`` list<string>): the
    schema walk derives (max_def=3, max_rep=1) from the repetition
    types (never hardcoded), every v1 data page yields its two
    4-byte-length-prefixed RLE/bit-packed level streams plus PLAIN
    values, and `_assemble_list_records` rebuilds the records.
    Cross-checks at every layer: per-page level counts == the page
    num_values, values consumed exactly, per-page counts sum to the
    chunk num_values, per-row-group ASSEMBLED RECORD counts (rep==0
    entries) equal the row group's num_rows for BOTH columns, and
    row-group rows sum to the file num_rows. Any smashed level
    stream degrades to None.

    Returns checksums the oracle recomputes blind: record/page
    counts, element sum + null/empty-list breakdown for the int
    list, and element count / byte-length sum / null-list counts
    for the string list."""
    if len(data) < 12 or data[:4] != b"PAR1" or data[-4:] != b"PAR1":
        return None
    (flen,) = struct.unpack_from("<I", data, len(data) - 8)
    start = len(data) - 8 - flen
    if flen <= 0 or start < 4:
        return None
    try:
        meta = _read_struct(_Reader(data, start, len(data) - 8))
    except ValueError:
        return None
    num_rows = meta.get(3)
    schema = meta.get(2)
    row_groups = meta.get(4)
    if (
        not isinstance(num_rows, int)
        or not isinstance(schema, list)
        or not isinstance(row_groups, list)
    ):
        return None
    leaves = _schema_leaf_levels(schema)
    if leaves is None:
        return None
    arr_path = next(
        (p for p in leaves if p and p[0] == b"arr"), None
    )
    tag_path = next(
        (p for p in leaves if p and p[0] == b"tags"), None
    )
    if arr_path is None or tag_path is None:
        return None
    arr_def, arr_rep, arr_type = leaves[arr_path]
    tag_def, tag_rep, tag_type = leaves[tag_path]
    # the 3-level LIST contract this reader implements
    if (arr_def, arr_rep, arr_type) != (3, 1, 2):
        return None
    if (tag_def, tag_rep, tag_type) != (3, 1, 6):
        return None
    out = {
        "n_records": 0,
        "n_pages": 0,
        "arr_sum": 0,
        "arr_elems": 0,
        "arr_null_elems": 0,
        "arr_null_lists": 0,
        "arr_empty_lists": 0,
        "tag_count": 0,
        "tag_len_sum": 0,
        "tag_null_lists": 0,
        "tag_empty_lists": 0,
    }
    total = 0
    for rg in row_groups:
        if not isinstance(rg, dict) or not isinstance(rg.get(3), int):
            return None
        rg_rows = rg[3]
        cols = rg.get(1)
        if not isinstance(cols, list):
            return None
        chunks: dict[bytes, dict] = {}
        for cc in cols:
            cm = cc.get(3) if isinstance(cc, dict) else None
            if isinstance(cm, dict) and isinstance(cm.get(3), list):
                path = cm[3]
                if path:
                    chunks[path[0]] = cm
        if b"arr" not in chunks or b"tags" not in chunks:
            return None
        try:
            got_a = _read_list_chunk(data, chunks[b"arr"], 3, 2)
            got_t = _read_list_chunk(data, chunks[b"tags"], 3, 6)
        except ValueError:
            return None
        if got_a is None or got_t is None:
            return None
        reps_a, defs_a, vals_a, pages_a = got_a
        reps_t, defs_t, vals_t, pages_t = got_t
        recs_a = _assemble_list_records(reps_a, defs_a, vals_a, 3)
        recs_t = _assemble_list_records(reps_t, defs_t, vals_t, 3)
        if recs_a is None or recs_t is None:
            return None
        # both columns must assemble to exactly the row group's rows
        if len(recs_a) != rg_rows or len(recs_t) != rg_rows:
            return None
        out["n_records"] += rg_rows
        out["n_pages"] += pages_a + pages_t
        for rec in recs_a:
            if rec is None:
                out["arr_null_lists"] += 1
            elif not rec:
                out["arr_empty_lists"] += 1
            else:
                for v in rec:
                    if v is None:
                        out["arr_null_elems"] += 1
                    else:
                        out["arr_elems"] += 1
                        out["arr_sum"] += v
        for rec in recs_t:
            if rec is None:
                out["tag_null_lists"] += 1
            elif not rec:
                out["tag_empty_lists"] += 1
            else:
                for v in rec:
                    if v is not None:
                        out["tag_count"] += 1
                        out["tag_len_sum"] += len(v)
        total += rg_rows
    if total != num_rows:
        return None  # row-group rows must sum to the file row count
    return out


PQNEST_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_records", LongType()),
        StructField("n_pages", LongType()),
        StructField("arr_sum", LongType()),
        StructField("arr_elems", LongType()),
        StructField("arr_null_elems", LongType()),
        StructField("arr_null_lists", LongType()),
        StructField("arr_empty_lists", LongType()),
        StructField("tag_count", LongType()),
        StructField("tag_len_sum", LongType()),
        StructField("tag_null_lists", LongType()),
        StructField("tag_empty_lists", LongType()),
    ]
)


def _pqnest_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    zero = {f.name: 0 for f in PQNEST_SCHEMA.fields if f.name != "format"}
    for mid, blob in zip(pdf["media_id"], pdf["content"]):
        row = dict(zero, media_id=int(mid), format="unknown")
        b = bytes(blob) if blob is not None else b""
        try:
            st = read_parquet_nested(b)
        except Exception:
            st = None
        if st is not None:
            row.update(format="parquet", **st)
        out.append(row)
    return pd.DataFrame(out, columns=[f.name for f in PQNEST_SCHEMA.fields])


def parquet_nested_stats(df: DataFrame) -> DataFrame:
    """Hand-decoded nested (LIST) column read over MEDIA_SCHEMA blobs."""
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _pqnest_batch(pdf)

    return df.select("media_id", "content").mapInPandas(gen, PQNEST_SCHEMA)


def _make_parquet_nested(
    i: int, bad_stripe: int = 13, page_version: str = "1.0"
) -> bytes:
    """``10 + i % 90`` records, ``1 + i % 3`` row groups; column
    ``arr`` is a NULLABLE list<int64> (null when (i+5r)%7==0, empty
    when ==1, else 1+(i+r)%4 elements with every (i+r+3j)%11==0
    element null) and ``tags`` a nullable list<string> (null when
    (i+2r)%5==0, else r%3 elements 'tag<(i+4r+j)%100>' with every
    (i+r+j)%13==0 element null). The page codec rotates through all
    five hand-decoded families by ``i % 5`` (NONE / SNAPPY / GZIP /
    ZSTD / LZ4_RAW). Every ``bad_stripe``-th id gets the first
    ``arr`` data page's leading body word smashed to 0xFFFFFFFF —
    the repetition-level length prefix on uncompressed pages, a
    codec-grammar bomb on compressed ones; the reader must reject
    either way."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 10 + i % 90
    g = 1 + i % 3
    arr: list = []
    tags: list = []
    for r in range(n):
        m7 = (i + 5 * r) % 7
        if m7 == 0:
            arr.append(None)
        elif m7 == 1:
            arr.append([])
        else:
            arr.append(
                [
                    None
                    if (i + r + 3 * j) % 11 == 0
                    else (i + 3 * r + 17 * j) % 1000
                    for j in range(1 + (i + r) % 4)
                ]
            )
        if (i + 2 * r) % 5 == 0:
            tags.append(None)
        else:
            tags.append(
                [
                    None
                    if (i + r + j) % 13 == 0
                    else f"tag{(i + 4 * r + j) % 100}"
                    for j in range(r % 3)
                ]
            )
    table = pa.table(
        {
            "arr": pa.array(arr, pa.list_(pa.int64())),
            "tags": pa.array(tags, pa.list_(pa.string())),
        }
    )
    buf = io.BytesIO()
    pq.write_table(
        table,
        buf,
        row_group_size=-(-n // g),
        compression=("NONE", "SNAPPY", "GZIP", "ZSTD", "LZ4")[i % 5],
        write_statistics=False,
        use_dictionary=False,
        data_page_version=page_version,
    )
    blob = bytearray(buf.getvalue())
    if i % bad_stripe == 0:
        off = (
            pq.ParquetFile(io.BytesIO(bytes(blob)))
            .metadata.row_group(0)
            .column(0)
            .data_page_offset
        )
        # skip the thrift PageHeader, then smash the first body word
        # (v1: the rep-level length prefix on NONE pages, codec
        # grammar on compressed ones; v2: the raw rep-level RLE
        # stream itself, breaking the rep==0/num_rows books)
        r = _Reader(bytes(blob), off, len(blob))
        _read_struct(r)
        blob[r.pos : r.pos + 4] = b"\xff\xff\xff\xff"
    return bytes(blob)


def synthesize_parquet_nested_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of nested (two LIST columns) parquet."""
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
                    "content": [_make_parquet_nested(int(i)) for i in ids],
                    "meta": [
                        {
                            "format": "parquet",
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
# Nested MAP columns: two leaf streams sharing one repetition structure
# --------------------------------------------------------------------------


def read_parquet_map(data: bytes) -> dict | None:
    """Nested MAP column read from scratch over the standard 3-level
    shape — ``optional group (MAP) { repeated group key_value {
    required key; optional value } }`` — the OTHER dominant nested
    layout of real lakehouse schemas beside LIST.

    A map is TWO leaf columns sharing one repetition structure: the
    REQUIRED ``key`` leaf (max_def=2: 0 null map / 1 empty / 2 key)
    and the OPTIONAL ``value`` leaf (max_def=3: 0 null map / 1 empty
    / 2 null value / 3 value), both derived from the schema walk.
    Each chunk is page-walked and Dremel-assembled independently,
    then ZIPPED with the structural cross-check unique to maps: both
    leaves must agree record-by-record on null/empty/entry-count —
    a key stream and value stream that disagree is a corrupt file,
    not a shorter map. Page/chunk/row-group count books must balance
    exactly as in the LIST reader; a smashed page degrades.

    Returns checksums the oracle recomputes blind: record/page/
    entry counts, null/empty-map breakdown, key byte-length sum,
    null-value count and value sum."""
    if len(data) < 12 or data[:4] != b"PAR1" or data[-4:] != b"PAR1":
        return None
    (flen,) = struct.unpack_from("<I", data, len(data) - 8)
    start = len(data) - 8 - flen
    if flen <= 0 or start < 4:
        return None
    try:
        meta = _read_struct(_Reader(data, start, len(data) - 8))
    except ValueError:
        return None
    num_rows = meta.get(3)
    schema = meta.get(2)
    row_groups = meta.get(4)
    if (
        not isinstance(num_rows, int)
        or not isinstance(schema, list)
        or not isinstance(row_groups, list)
    ):
        return None
    leaves = _schema_leaf_levels(schema)
    if leaves is None:
        return None
    key_path = next(
        (p for p in leaves if p and p[0] == b"m" and p[-1] == b"key"),
        None,
    )
    val_path = next(
        (p for p in leaves if p and p[0] == b"m" and p[-1] == b"value"),
        None,
    )
    if key_path is None or val_path is None:
        return None
    if leaves[key_path] != (2, 1, 6):  # required BYTE_ARRAY key
        return None
    if leaves[val_path] != (3, 1, 2):  # optional INT64 value
        return None
    out = {
        "n_records": 0,
        "n_pages": 0,
        "n_null_maps": 0,
        "n_empty_maps": 0,
        "n_entries": 0,
        "key_len_sum": 0,
        "n_null_vals": 0,
        "val_sum": 0,
    }
    total = 0
    for rg in row_groups:
        if not isinstance(rg, dict) or not isinstance(rg.get(3), int):
            return None
        rg_rows = rg[3]
        cols = rg.get(1)
        if not isinstance(cols, list):
            return None
        chunks: dict[bytes, dict] = {}
        for cc in cols:
            cm = cc.get(3) if isinstance(cc, dict) else None
            if isinstance(cm, dict) and isinstance(cm.get(3), list):
                path = cm[3]
                if path:
                    chunks[path[-1]] = cm
        if b"key" not in chunks or b"value" not in chunks:
            return None
        try:
            got_k = _read_list_chunk(data, chunks[b"key"], 2, 6)
            got_v = _read_list_chunk(data, chunks[b"value"], 3, 2)
        except ValueError:
            return None
        if got_k is None or got_v is None:
            return None
        reps_k, defs_k, vals_k, pages_k = got_k
        reps_v, defs_v, vals_v, pages_v = got_v
        recs_k = _assemble_list_records(
            reps_k, defs_k, vals_k, 2, leaf_optional=False
        )
        recs_v = _assemble_list_records(reps_v, defs_v, vals_v, 3)
        if recs_k is None or recs_v is None:
            return None
        if len(recs_k) != rg_rows or len(recs_v) != rg_rows:
            return None
        # the zip cross-check: both leaves must tell the SAME story
        for ks, vs in zip(recs_k, recs_v):
            if (ks is None) != (vs is None):
                return None
            if ks is None:
                out["n_null_maps"] += 1
                continue
            if len(ks) != len(vs):
                return None
            if not ks:
                out["n_empty_maps"] += 1
                continue
            for k, v in zip(ks, vs):
                if k is None:
                    return None  # a map key is REQUIRED
                out["n_entries"] += 1
                out["key_len_sum"] += len(k)
                if v is None:
                    out["n_null_vals"] += 1
                else:
                    out["val_sum"] += v
        out["n_records"] += rg_rows
        out["n_pages"] += pages_k + pages_v
        total += rg_rows
    if total != num_rows:
        return None
    return out


PQMAP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_records", LongType()),
        StructField("n_pages", LongType()),
        StructField("n_null_maps", LongType()),
        StructField("n_empty_maps", LongType()),
        StructField("n_entries", LongType()),
        StructField("key_len_sum", LongType()),
        StructField("n_null_vals", LongType()),
        StructField("val_sum", LongType()),
    ]
)


def _pqmap_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    zero = {f.name: 0 for f in PQMAP_SCHEMA.fields if f.name != "format"}
    for mid, blob in zip(pdf["media_id"], pdf["content"]):
        row = dict(zero, media_id=int(mid), format="unknown")
        b = bytes(blob) if blob is not None else b""
        try:
            st = read_parquet_map(b)
        except Exception:
            st = None
        if st is not None:
            row.update(format="parquet", **st)
        out.append(row)
    return pd.DataFrame(out, columns=[f.name for f in PQMAP_SCHEMA.fields])


def parquet_map_stats(df: DataFrame) -> DataFrame:
    """Hand-decoded nested MAP column read over MEDIA_SCHEMA blobs."""
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _pqmap_batch(pdf)

    return df.select("media_id", "content").mapInPandas(gen, PQMAP_SCHEMA)


def _make_parquet_map(i: int, bad_stripe: int = 14) -> bytes:
    """``8 + i % 50`` records, ``1 + i % 3`` row groups; column ``m``
    is a nullable map<string, int64> (null when (i+3r)%6==0, else
    r%3 entries: key 'k<(i+r+j)%9>' — consecutive j keeps keys
    distinct — value null when (i+2r+j)%7==0 else (i+5r+11j)%500).
    Codec rotates NONE/SNAPPY/ZSTD by id. Every ``bad_stripe``-th id
    smashes the VALUE chunk's first page body word — the key stream
    still parses, so only the zip/record cross-checks catch it."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 8 + i % 50
    g = 1 + i % 3
    rows: list = []
    for r in range(n):
        if (i + 3 * r) % 6 == 0:
            rows.append(None)
        else:
            rows.append(
                [
                    (
                        f"k{(i + r + j) % 9}",
                        None
                        if (i + 2 * r + j) % 7 == 0
                        else (i + 5 * r + 11 * j) % 500,
                    )
                    for j in range(r % 3)
                ]
            )
    table = pa.table(
        {"m": pa.array(rows, pa.map_(pa.string(), pa.int64()))}
    )
    buf = io.BytesIO()
    pq.write_table(
        table,
        buf,
        row_group_size=-(-n // g),
        compression=("NONE", "SNAPPY", "ZSTD")[i % 3],
        write_statistics=False,
        use_dictionary=False,
    )
    blob = bytearray(buf.getvalue())
    if i % bad_stripe == 0:
        off = (
            pq.ParquetFile(io.BytesIO(bytes(blob)))
            .metadata.row_group(0)
            .column(1)  # the value chunk
            .data_page_offset
        )
        r = _Reader(bytes(blob), off, len(blob))
        _read_struct(r)
        blob[r.pos : r.pos + 4] = b"\xff\xff\xff\xff"
    return bytes(blob)


def synthesize_parquet_map_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of nested MAP-column parquet."""
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
                    "content": [_make_parquet_map(int(i)) for i in ids],
                    "meta": [
                        {
                            "format": "parquet",
                            "width": 0,
                            "height": 0,
                            "sample_rate": 0,
                        }
                        for _ in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


def synthesize_parquet_nested_v2_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of nested parquet with DATA_PAGE_V2 pages."""
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
                    "content": [
                        _make_parquet_nested(int(i), page_version="2.0")
                        for i in ids
                    ],
                    "meta": [
                        {
                            "format": "parquet",
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
# General Dremel: arbitrary nesting depth (list<list<...>>, max_rep >= 2)
# --------------------------------------------------------------------------


def _schema_leaf_chains(
    schema: list,
) -> dict[tuple[bytes, ...], tuple[list[tuple[str, int]], int]] | None:
    """Pre-order walk -> per leaf ``(chain, physical_type)`` where
    chain is the root->leaf list of LEVEL-BEARING nodes as
    ``('opt'|'rep'|'req', def_level)`` (required GROUPS add no level
    and are omitted; the leaf is always included, a required leaf
    carrying the def level of its deepest level-bearing ancestor).
    This is the full Dremel structure the (max_def, max_rep) summary
    of `_schema_leaf_levels` collapses."""
    if not schema or not isinstance(schema[0], dict):
        return None
    out: dict = {}
    idx = 1

    def walk(
        path: tuple[bytes, ...], dl: int, chain: list[tuple[str, int]]
    ) -> bool:
        nonlocal idx
        if idx >= len(schema):
            return False
        el = schema[idx]
        idx += 1
        if not isinstance(el, dict):
            return False
        rep = el.get(3, 0)
        link: list[tuple[str, int]] = []
        if rep == 1:
            dl += 1
            link = [("opt", dl)]
        elif rep == 2:
            dl += 1
            link = [("rep", dl)]
        name = el.get(4)
        if not isinstance(name, bytes):
            return False
        p = path + (name,)
        nch = el.get(5) or 0
        if nch == 0:
            leaf_link = link if link else [("req", dl)]
            out[p] = (chain + leaf_link, el.get(1, -1))
            return True
        return all(walk(p, dl, chain + link) for _ in range(nch))

    nroot = schema[0].get(5) or 0
    for _ in range(nroot):
        if not walk((), 0, []):
            return None
    if idx != len(schema):
        return None
    return out


def _assemble_records_deep(
    reps: list[int],
    defs: list[int],
    vals: list,
    chain: list[tuple[str, int]],
) -> list | None:
    """FULL Dremel record assembly (Melnik et al. §4.2) over the
    parquet collection-chain grammar: zero or more (optional group,
    repeated group) pairs, then a leaf ('opt' nullable or 'req').
    Handles ANY nesting depth — the entry's repetition level selects
    which already-open list continues, the definition level selects
    how deep new structure is defined (an 'opt' node undefined at d
    places None, a 'rep' node undefined leaves the just-created list
    empty, a defined leaf consumes one value). Subsumes the depth-1
    special case of `_assemble_list_records` (agreement is
    unit-pinned)."""
    rep_levels = [dl for k, dl in chain if k == "rep"]
    rep_pos = [j for j, (k, _) in enumerate(chain) if k == "rep"]
    max_rep = len(rep_levels)
    records: list = []
    stack: list[list] = []  # stack[j] = open list at rep depth j+1
    vi = 0
    for r, d in zip(reps, defs):
        if r < 0 or r > max_rep:
            return None
        if r == 0:
            records.append(None)

            def put(v, _recs=records):
                _recs[-1] = v

            stack = []
            ci = 0
        else:
            if len(stack) < r:
                return None  # continuation of a list never opened
            del stack[r:]
            if d < rep_levels[r - 1]:
                return None  # a continuation must be defined here
            put = stack[r - 1].append
            ci = rep_pos[r - 1] + 1
        while True:
            kind, dl = chain[ci]
            is_leaf = ci == len(chain) - 1
            if kind == "opt":
                if d < dl:
                    put(None)
                    break
                if is_leaf:
                    if vi >= len(vals):
                        return None
                    put(vals[vi])
                    vi += 1
                    break
                nxt_kind, nxt_dl = chain[ci + 1]
                if nxt_kind != "rep":
                    return None  # not a collection chain
                lst: list = []
                put(lst)
                if d < nxt_dl:
                    break  # defined but EMPTY collection
                stack.append(lst)
                put = lst.append
                ci += 2
            elif kind == "req" and is_leaf:
                if vi >= len(vals):
                    return None
                put(vals[vi])
                vi += 1
                break
            else:
                return None  # grammar this assembler does not claim
    if vi != len(vals):
        return None
    return records


def read_parquet_deep(data: bytes) -> dict | None:
    """Arbitrary-depth nested read: ``list<list<int64>>`` (max_rep=2,
    max_def=5) through the FULL Dremel assembler — the shape the
    3-level special case cannot express, proving the reader handles
    real deeply-nested lakehouse schemas (feature tensors, token
    span trees) rather than just the depth-1 LIST layout.

    The chain (opt,1)(rep,2)(opt,3)(rep,4)(opt,5) is DERIVED from
    the schema walk (`_schema_leaf_chains`), never assumed; levels
    decode at their true bit widths (rep 2 bits, def 3 bits); record
    assembly is `_assemble_records_deep`. Books: per-page counts sum
    to the chunk, assembled records equal each row group's num_rows,
    groups sum to the file. Returns nested-structure checksums the
    oracle recomputes blind at every depth: outer/inner null+empty
    breakdowns, element count/null count/sum."""
    if len(data) < 12 or data[:4] != b"PAR1" or data[-4:] != b"PAR1":
        return None
    (flen,) = struct.unpack_from("<I", data, len(data) - 8)
    start = len(data) - 8 - flen
    if flen <= 0 or start < 4:
        return None
    try:
        meta = _read_struct(_Reader(data, start, len(data) - 8))
    except ValueError:
        return None
    num_rows = meta.get(3)
    schema = meta.get(2)
    row_groups = meta.get(4)
    if (
        not isinstance(num_rows, int)
        or not isinstance(schema, list)
        or not isinstance(row_groups, list)
    ):
        return None
    chains = _schema_leaf_chains(schema)
    if chains is None:
        return None
    path = next((p for p in chains if p and p[0] == b"arr2"), None)
    if path is None:
        return None
    chain, ptype = chains[path]
    if ptype != 2:  # INT64 leaf
        return None
    rep_levels = [dl for k, dl in chain if k == "rep"]
    max_rep = len(rep_levels)
    max_def = chain[-1][1]
    if max_rep != 2 or max_def != 5:  # the list<list<int64>> contract
        return None
    out = {
        "n_records": 0,
        "n_pages": 0,
        "outer_null": 0,
        "outer_empty": 0,
        "inner_lists": 0,
        "inner_null": 0,
        "inner_empty": 0,
        "n_elems": 0,
        "n_null_elems": 0,
        "elem_sum": 0,
    }
    total = 0
    for rg in row_groups:
        if not isinstance(rg, dict) or not isinstance(rg.get(3), int):
            return None
        rg_rows = rg[3]
        cols = rg.get(1)
        if not isinstance(cols, list):
            return None
        chunk = None
        for cc in cols:
            cm = cc.get(3) if isinstance(cc, dict) else None
            if (
                isinstance(cm, dict)
                and isinstance(cm.get(3), list)
                and cm[3]
                and cm[3][0] == b"arr2"
            ):
                chunk = cm
                break
        if chunk is None:
            return None
        try:
            got = _read_list_chunk(data, chunk, max_def, 2, max_rep)
        except ValueError:
            return None
        if got is None:
            return None
        reps, defs, vals, pages = got
        recs = _assemble_records_deep(reps, defs, vals, chain)
        if recs is None or len(recs) != rg_rows:
            return None
        out["n_records"] += rg_rows
        out["n_pages"] += pages
        for rec in recs:
            if rec is None:
                out["outer_null"] += 1
            elif not rec:
                out["outer_empty"] += 1
            else:
                for inner in rec:
                    if inner is None:
                        out["inner_null"] += 1
                        continue
                    out["inner_lists"] += 1
                    if not inner:
                        out["inner_empty"] += 1
                        continue
                    for v in inner:
                        if v is None:
                            out["n_null_elems"] += 1
                        else:
                            out["n_elems"] += 1
                            out["elem_sum"] += v
        total += rg_rows
    if total != num_rows:
        return None
    return out


PQDEEP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_records", LongType()),
        StructField("n_pages", LongType()),
        StructField("outer_null", LongType()),
        StructField("outer_empty", LongType()),
        StructField("inner_lists", LongType()),
        StructField("inner_null", LongType()),
        StructField("inner_empty", LongType()),
        StructField("n_elems", LongType()),
        StructField("n_null_elems", LongType()),
        StructField("elem_sum", LongType()),
    ]
)


def _pqdeep_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    zero = {f.name: 0 for f in PQDEEP_SCHEMA.fields if f.name != "format"}
    for mid, blob in zip(pdf["media_id"], pdf["content"]):
        row = dict(zero, media_id=int(mid), format="unknown")
        b = bytes(blob) if blob is not None else b""
        try:
            st = read_parquet_deep(b)
        except Exception:
            st = None
        if st is not None:
            row.update(format="parquet", **st)
        out.append(row)
    return pd.DataFrame(out, columns=[f.name for f in PQDEEP_SCHEMA.fields])


def parquet_deep_stats(df: DataFrame) -> DataFrame:
    """Depth-2 nested (list<list<int64>>) read over MEDIA_SCHEMA."""
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _pqdeep_batch(pdf)

    return df.select("media_id", "content").mapInPandas(gen, PQDEEP_SCHEMA)


def _make_parquet_deep(i: int, bad_stripe: int = 16) -> bytes:
    """``8 + i % 40`` records, ``1 + i % 3`` row groups; ``arr2`` is
    a doubly-nested nullable list<list<int64>>: outer null when
    (i+2r)%6==0, outer empty when ==1, else 1+(i+r)%3 inner lists;
    inner null when (i+r+2j)%5==0, empty when ==1, else 1+(i+j)%3
    elements, each null when (i+r+j+k)%9==0 else (i+4r+7j+13k)%300.
    Codec rotates NONE/SNAPPY/ZSTD; page version rotates v1/v2 by
    i%2. Every ``bad_stripe``-th id smashes the first data page's
    leading body word."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 8 + i % 40
    g = 1 + i % 3
    rows: list = []
    for r in range(n):
        m6 = (i + 2 * r) % 6
        if m6 == 0:
            rows.append(None)
        elif m6 == 1:
            rows.append([])
        else:
            outer = []
            for j in range(1 + (i + r) % 3):
                m5 = (i + r + 2 * j) % 5
                if m5 == 0:
                    outer.append(None)
                elif m5 == 1:
                    outer.append([])
                else:
                    outer.append(
                        [
                            None
                            if (i + r + j + k) % 9 == 0
                            else (i + 4 * r + 7 * j + 13 * k) % 300
                            for k in range(1 + (i + j) % 3)
                        ]
                    )
            rows.append(outer)
    table = pa.table(
        {"arr2": pa.array(rows, pa.list_(pa.list_(pa.int64())))}
    )
    buf = io.BytesIO()
    pq.write_table(
        table,
        buf,
        row_group_size=-(-n // g),
        compression=("NONE", "SNAPPY", "ZSTD")[i % 3],
        write_statistics=False,
        use_dictionary=False,
        data_page_version=("1.0", "2.0")[i % 2],
    )
    blob = bytearray(buf.getvalue())
    if i % bad_stripe == 0:
        off = (
            pq.ParquetFile(io.BytesIO(bytes(blob)))
            .metadata.row_group(0)
            .column(0)
            .data_page_offset
        )
        r = _Reader(bytes(blob), off, len(blob))
        _read_struct(r)
        blob[r.pos : r.pos + 4] = b"\xff\xff\xff\xff"
    return bytes(blob)


def synthesize_parquet_deep_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of doubly-nested list<list<int64>> parquet."""
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
                    "content": [_make_parquet_deep(int(i)) for i in ids],
                    "meta": [
                        {
                            "format": "parquet",
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
# STRUCT columns: definition levels without repetition
# --------------------------------------------------------------------------


def read_parquet_struct(data: bytes) -> dict | None:
    """Nested STRUCT column read — the non-repeated nesting shape:
    ``optional group s { optional int64 a; optional binary b }``.
    Each field is its own leaf chunk carrying DEFINITION levels only
    (max_rep=0, so pages have NO repetition section — the spec's
    conditional layout, exercised here): def 0 = the struct itself
    is null, 1 = the field is null, 2 = value. Both leaves must
    agree row-by-row on WHICH rows are struct-null — a def-0 in one
    leaf and not the other is a corrupt file (the struct analog of
    the MAP zip cross-check). Chains derive from `_schema_leaf_chains`
    ((opt,1)(opt,2) per leaf, validated)."""
    if len(data) < 12 or data[:4] != b"PAR1" or data[-4:] != b"PAR1":
        return None
    (flen,) = struct.unpack_from("<I", data, len(data) - 8)
    start = len(data) - 8 - flen
    if flen <= 0 or start < 4:
        return None
    try:
        meta = _read_struct(_Reader(data, start, len(data) - 8))
    except ValueError:
        return None
    num_rows = meta.get(3)
    schema = meta.get(2)
    row_groups = meta.get(4)
    if (
        not isinstance(num_rows, int)
        or not isinstance(schema, list)
        or not isinstance(row_groups, list)
    ):
        return None
    chains = _schema_leaf_chains(schema)
    if chains is None:
        return None
    a_path = next(
        (p for p in chains if p == (b"s", b"a")), None
    )
    b_path = next(
        (p for p in chains if p == (b"s", b"b")), None
    )
    if a_path is None or b_path is None:
        return None
    expect = [("opt", 1), ("opt", 2)]
    if chains[a_path] != (expect, 2) or chains[b_path] != (expect, 6):
        return None
    out = {
        "n_records": 0,
        "n_pages": 0,
        "n_null_structs": 0,
        "a_nulls": 0,
        "a_sum": 0,
        "b_nulls": 0,
        "b_len_sum": 0,
    }
    total = 0
    for rg in row_groups:
        if not isinstance(rg, dict) or not isinstance(rg.get(3), int):
            return None
        rg_rows = rg[3]
        cols = rg.get(1)
        if not isinstance(cols, list):
            return None
        chunks: dict[bytes, dict] = {}
        for cc in cols:
            cm = cc.get(3) if isinstance(cc, dict) else None
            if isinstance(cm, dict) and isinstance(cm.get(3), list):
                path = cm[3]
                if len(path) == 2 and path[0] == b"s":
                    chunks[path[1]] = cm
        if b"a" not in chunks or b"b" not in chunks:
            return None
        try:
            got_a = _read_list_chunk(data, chunks[b"a"], 2, 2, max_rep=0)
            got_b = _read_list_chunk(data, chunks[b"b"], 2, 6, max_rep=0)
        except ValueError:
            return None
        if got_a is None or got_b is None:
            return None
        _, defs_a, vals_a, pages_a = got_a
        _, defs_b, vals_b, pages_b = got_b
        # no repetition: one level entry per ROW, exactly
        if len(defs_a) != rg_rows or len(defs_b) != rg_rows:
            return None
        ai = bi = 0
        for da, db in zip(defs_a, defs_b):
            if (da == 0) != (db == 0):
                return None  # leaves disagree on struct nullity
            if da == 0:
                out["n_null_structs"] += 1
                continue
            if da == 1:
                out["a_nulls"] += 1
            else:
                if ai >= len(vals_a):
                    return None
                out["a_sum"] += vals_a[ai]
                ai += 1
            if db == 1:
                out["b_nulls"] += 1
            else:
                if bi >= len(vals_b):
                    return None
                out["b_len_sum"] += len(vals_b[bi])
                bi += 1
        if ai != len(vals_a) or bi != len(vals_b):
            return None
        out["n_records"] += rg_rows
        out["n_pages"] += pages_a + pages_b
        total += rg_rows
    if total != num_rows:
        return None
    return out


PQSTRUCT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_records", LongType()),
        StructField("n_pages", LongType()),
        StructField("n_null_structs", LongType()),
        StructField("a_nulls", LongType()),
        StructField("a_sum", LongType()),
        StructField("b_nulls", LongType()),
        StructField("b_len_sum", LongType()),
    ]
)


def _pqstruct_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    zero = {
        f.name: 0 for f in PQSTRUCT_SCHEMA.fields if f.name != "format"
    }
    for mid, blob in zip(pdf["media_id"], pdf["content"]):
        row = dict(zero, media_id=int(mid), format="unknown")
        b = bytes(blob) if blob is not None else b""
        try:
            st = read_parquet_struct(b)
        except Exception:
            st = None
        if st is not None:
            row.update(format="parquet", **st)
        out.append(row)
    return pd.DataFrame(
        out, columns=[f.name for f in PQSTRUCT_SCHEMA.fields]
    )


def parquet_struct_stats(df: DataFrame) -> DataFrame:
    """Hand-decoded STRUCT column read over MEDIA_SCHEMA blobs."""
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _pqstruct_batch(pdf)

    return df.select("media_id", "content").mapInPandas(
        gen, PQSTRUCT_SCHEMA
    )


def _make_parquet_struct(i: int, bad_stripe: int = 15) -> bytes:
    """``9 + i % 60`` records, ``1 + i % 3`` row groups; column ``s``
    is a nullable struct<a int64, b string>: struct null when
    (i+4r)%7==0; a null when (i+r)%5==0 else (i+6r)%700; b null when
    (i+3r)%4==0 else 'v<(i+2r)%30>'. Codec rotates NONE/SNAPPY/GZIP.
    Every ``bad_stripe``-th id smashes field b's first page body
    word — field a still parses, so the nullity-agreement
    cross-check (or the level stream itself) must catch it."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 9 + i % 60
    g = 1 + i % 3
    rows: list = []
    for r in range(n):
        if (i + 4 * r) % 7 == 0:
            rows.append(None)
        else:
            rows.append(
                {
                    "a": None if (i + r) % 5 == 0 else (i + 6 * r) % 700,
                    "b": None
                    if (i + 3 * r) % 4 == 0
                    else f"v{(i + 2 * r) % 30}",
                }
            )
    table = pa.table(
        {
            "s": pa.array(
                rows, pa.struct([("a", pa.int64()), ("b", pa.string())])
            )
        }
    )
    buf = io.BytesIO()
    pq.write_table(
        table,
        buf,
        row_group_size=-(-n // g),
        compression=("NONE", "SNAPPY", "GZIP")[i % 3],
        write_statistics=False,
        use_dictionary=False,
    )
    blob = bytearray(buf.getvalue())
    if i % bad_stripe == 0:
        off = (
            pq.ParquetFile(io.BytesIO(bytes(blob)))
            .metadata.row_group(0)
            .column(1)  # field b
            .data_page_offset
        )
        r = _Reader(bytes(blob), off, len(blob))
        _read_struct(r)
        blob[r.pos : r.pos + 4] = b"\xff\xff\xff\xff"
    return bytes(blob)


def synthesize_parquet_struct_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of STRUCT-column parquet."""
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
                    "content": [
                        _make_parquet_struct(int(i)) for i in ids
                    ],
                    "meta": [
                        {
                            "format": "parquet",
                            "width": 0,
                            "height": 0,
                            "sample_rate": 0,
                        }
                        for _ in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


def parquet_leaf_fields(data: bytes) -> list[tuple[int | None, bytes]] | None:
    """Footer schema walk -> [(field_id, name)] for every LEAF
    element (num_children absent/0), in schema order. field_id is
    SchemaElement field 9 (the identifier Iceberg resolves columns
    by); None when the writer did not assign one."""
    if len(data) < 12 or data[:4] != b"PAR1" or data[-4:] != b"PAR1":
        return None
    (flen,) = struct.unpack_from("<I", data, len(data) - 8)
    start = len(data) - 8 - flen
    if flen <= 0 or start < 4:
        return None
    try:
        meta = _read_struct(_Reader(data, start, len(data) - 8))
    except ValueError:
        return None
    schema = meta.get(2)
    if not isinstance(schema, list) or not schema:
        return None
    out: list[tuple[int | None, bytes]] = []
    for el in schema[1:]:  # element 0 is the root
        if not isinstance(el, dict):
            return None
        if el.get(5, 0):  # num_children > 0: a group, not a leaf
            continue
        name = el.get(4)
        if not isinstance(name, bytes):
            return None
        fid = el.get(9)
        out.append((fid if isinstance(fid, int) else None, name))
    return out

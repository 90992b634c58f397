"""Baseline TIFF decode with stdlib alone — no codec libraries.

Beyond-reference surface (BASELINE.json north star): the sixth real
codec next to BMP/WAV (operators/multimodal.py), PNG (stdlib zlib),
baseline JPEG (operators/jpeg.py) and GIF89a (operators/gif.py).
Everything here is from the public TIFF 6.0 specification: the
byte-order header (II little / MM big endian, magic 42), the IFD
entry walk (tag, type, count, inline-value-or-offset — the 4-byte
inline rule INCLUDING short arrays packed into the value field), and
multi-strip pixel data via StripOffsets / StripByteCounts /
RowsPerStrip.

Supported subset (honestly bounded): uncompressed (Compression=1)
8-bit grayscale or RGB (SamplesPerPixel 1 or 3), single IFD, no tiles,
no planar configuration 2. Anything else raises ValueError and the
Spark operator degrades the row to format='unknown'.

Fixture strategy (the gif/_make_jpeg pattern): the synthesizer writes
REAL multi-strip TIFFs (RowsPerStrip=2 so the strip walk actually
executes) with pixel values from LCG formulas in (id, position,
channel) that a DuckDB oracle recomputes blind; odd ids are written
big-endian (MM) so BOTH byte orders are exercised on-wire.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

# ---------------------------------------------------------------- fixture
# formulas shared with the DuckDB oracle in queries/llm7.py
_TIF_W = lambda i: 2 + i % 11  # noqa: E731
_TIF_H = lambda i: 1 + i % 7  # noqa: E731
_TIF_BAD = lambda i: i % 9 == 0  # noqa: E731
_TIF_V = lambda i, p, ch: (i * 23 + 5 * p + 11 * ch) % 256  # noqa: E731
_ROWS_PER_STRIP = 2

TIFF_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixels", LongType()),
        StructField("rgb_sum", LongType()),
    ]
)


def _make_tiff(i: int) -> bytes:
    w, h = _TIF_W(i), _TIF_H(i)
    big = i % 2 == 1
    e = ">" if big else "<"
    pix = bytes(
        _TIF_V(i, p, ch) for p in range(w * h) for ch in range(3)
    )
    # strips of _ROWS_PER_STRIP rows each
    strips = []
    for r0 in range(0, h, _ROWS_PER_STRIP):
        nrows = min(_ROWS_PER_STRIP, h - r0)
        strips.append(pix[r0 * w * 3 : (r0 + nrows) * w * 3])
    n_strips = len(strips)

    # layout: header(8) | bits-per-sample array(6) | offset arrays |
    # strip data | IFD
    bits_off = 8
    so_off = bits_off + 6  # strip offsets array (LONG each)
    sbc_off = so_off + 4 * n_strips
    data_off = sbc_off + 4 * n_strips
    offs, lens, pos = [], [], data_off
    for s in strips:
        offs.append(pos)
        lens.append(len(s))
        pos += len(s)
    ifd_off = pos

    def entry(tag, typ, count, value):
        return struct.pack(e + "HHI", tag, typ, count) + value

    def short_v(v):
        return struct.pack(e + "HH", v, 0)

    def long_v(v):
        return struct.pack(e + "I", v)

    entries = [
        entry(256, 3, 1, short_v(w)),  # ImageWidth
        entry(257, 3, 1, short_v(h)),  # ImageLength
        entry(258, 3, 3, long_v(bits_off)),  # BitsPerSample -> offset
        entry(259, 3, 1, short_v(1)),  # Compression: none
        entry(262, 3, 1, short_v(2)),  # Photometric: RGB
        entry(
            273,
            4,
            n_strips,
            long_v(so_off) if n_strips > 1 else long_v(offs[0]),
        ),  # StripOffsets
        entry(277, 3, 1, short_v(3)),  # SamplesPerPixel
        entry(278, 3, 1, short_v(_ROWS_PER_STRIP)),  # RowsPerStrip
        entry(
            279,
            4,
            n_strips,
            long_v(sbc_off) if n_strips > 1 else long_v(lens[0]),
        ),  # StripByteCounts
    ]
    blob = bytearray()
    blob += (b"MM" if big else b"II") + struct.pack(e + "HI", 42, ifd_off)
    blob += struct.pack(e + "HHH", 8, 8, 8)
    blob += b"".join(struct.pack(e + "I", o) for o in offs)
    blob += b"".join(struct.pack(e + "I", n) for n in lens)
    for s in strips:
        blob += s
    blob += struct.pack(e + "H", len(entries)) + b"".join(entries)
    blob += struct.pack(e + "I", 0)  # no next IFD
    out = bytes(blob)
    if _TIF_BAD(i):
        return out[: max(8, len(out) * 2 // 5)]  # drops strips and/or IFD
    return out


# ---------------------------------------------------------------- decoder

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4}

# tags the pixel decode actually consults — an unsupported value type
# on any OTHER tag is skipped, not fatal
_DECODE_TAGS = frozenset({256, 257, 258, 259, 273, 277, 278, 279, 284})


def _read_values(b: bytes, e: str, typ: int, count: int, raw: bytes):
    """IFD entry values — inline when they fit 4 bytes, else at the
    offset stored in the value field (the TIFF 6.0 rule)."""
    if typ not in _TYPE_SIZE:
        raise ValueError("unsupported IFD type")
    size = _TYPE_SIZE[typ] * count
    if size <= 4:
        src = raw
    else:
        (off,) = struct.unpack(e + "I", raw)
        if off + size > len(b):
            raise ValueError("IFD value out of range")
        src = b[off : off + size]
    fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
    if fmt is None:
        raise ValueError("unsupported IFD type")
    return list(struct.unpack(e + fmt * count, src[:size]))


def _decode_tiff(b: bytes):
    """Returns (w, h, samples_per_pixel, flat pixel bytes)."""
    if len(b) < 8:
        raise ValueError("too short")
    if b[:2] == b"II":
        e = "<"
    elif b[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF")
    magic, ifd_off = struct.unpack(e + "HI", b[2:8])
    if magic != 42:
        raise ValueError("bad magic")
    if ifd_off + 2 > len(b):
        raise ValueError("IFD out of range")
    (n_entries,) = struct.unpack(e + "H", b[ifd_off : ifd_off + 2])
    tags = {}
    pos = ifd_off + 2
    if pos + 12 * n_entries > len(b):
        raise ValueError("IFD truncated")
    for _ in range(n_entries):
        tag, typ, count = struct.unpack(e + "HHI", b[pos : pos + 8])
        try:
            tags[tag] = _read_values(b, e, typ, count, b[pos + 8 : pos + 12])
        except ValueError:
            # metadata tags irrelevant to pixel decode (ASCII
            # Software/DateTime, RATIONAL X/YResolution, ...) must not
            # abort the whole image; only a decode-relevant tag with an
            # unreadable type/value is fatal
            if tag in _DECODE_TAGS:
                raise
        pos += 12
    for req in (256, 257, 273, 279):
        if req not in tags:
            raise ValueError("missing required tag")
    w, h = tags[256][0], tags[257][0]
    if tags.get(259, [1])[0] != 1:
        raise ValueError("compressed TIFF unsupported")
    spp = tags.get(277, [1])[0]
    if spp not in (1, 3):
        raise ValueError("unsupported samples per pixel")
    if any(v != 8 for v in tags.get(258, [8])):
        raise ValueError("non-8-bit samples unsupported")
    if tags.get(284, [1])[0] != 1:
        raise ValueError("planar config unsupported")
    if w <= 0 or h <= 0 or w * h * spp > 1 << 28:
        raise ValueError("bad dimensions")
    data = bytearray()
    for off, n in zip(tags[273], tags[279]):
        if off + n > len(b):
            raise ValueError("strip out of range")
        data += b[off : off + n]
    need = w * h * spp
    if len(data) < need:
        raise ValueError("pixel data short")
    return w, h, spp, bytes(data[:need])


def _tiff_pixels_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for media_id, blob in zip(pdf["media_id"], pdf["content"]):
        b = bytes(blob) if blob is not None else b""
        row = {
            "media_id": int(media_id),
            "format": "unknown",
            "width": 0,
            "height": 0,
            "n_pixels": 0,
            "rgb_sum": 0,
        }
        try:
            w, h, spp, data = _decode_tiff(b)
            row.update(
                format="tiff",
                width=int(w),
                height=int(h),
                n_pixels=int(w) * int(h),
                rgb_sum=int(sum(data)),
            )
        except (ValueError, struct.error, IndexError):
            pass
        out.append(row)
    return pd.DataFrame(out, columns=[f.name for f in TIFF_SCHEMA.fields])


def synthesize_tiff_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of REAL multi-strip TIFF blobs, one per
    doc_id; odd ids big-endian, ids hitting _TIF_BAD truncated."""
    from gmall_flink_210726_spark.operators.multimodal import MEDIA_SCHEMA
    from gmall_flink_210726_spark.session import ensure_parallelism, ship_package

    ship_package(docs.sparkSession)
    docs = ensure_parallelism(docs.select("doc_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": [_make_tiff(i) for i in ids],
                    "meta": [
                        {
                            "format": "corrupt" if _TIF_BAD(i) else "tiff",
                            "width": _TIF_W(i),
                            "height": _TIF_H(i),
                            "sample_rate": 0,
                        }
                        for i in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


def tiff_pixel_stats(df: DataFrame) -> DataFrame:
    """REAL baseline-TIFF decode over MEDIA_SCHEMA input: byte-order
    header, IFD walk with the 4-byte inline-value rule, multi-strip
    assembly, per-image RGB sums. Corrupt/unsupported blobs degrade to
    format='unknown' zeroed rows. Arrow-batched mapInPandas."""
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _tiff_pixels_batch(pdf)

    return df.select("media_id", "content").mapInPandas(gen, TIFF_SCHEMA)

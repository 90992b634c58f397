"""REAL MP4 / ISO-BMFF container parsing over binary columns.

Beyond-reference surface (BASELINE.json north star), sibling of the
PNG/JPEG/GIF/TIFF/BMP/WAV decoders: a genuine ISO base-media-file-format
box walk — `ftyp` brand read, recursive descent into the `moov`
container, `mvhd` v0 timescale/duration parse at their spec offsets,
`trak` child count, and an exact byte sum over the `mdat` payload.
This is the metadata-extraction step a video ingestion pipeline runs
BEFORE any codec work (which frames to decode, how long the clip is,
whether the container is well-formed) — frame decoding itself is the
`multimodal_frame_sample` stub's job.

Box grammar implemented (ISO/IEC 14496-12 §4.2): every box is
``uint32 size | 4cc type | payload``; ``size`` covers the header;
containers (`moov`, `trak`) hold a concatenated child-box sequence.
Oversized/truncated/zero-size boxes abort the walk and degrade the row
to ``format='unknown'`` (the corrupt-stripe contract every decoder in
this package follows).

Scale design: identical to the other decoders — Arrow-batched
mapInPandas, blobs cross into Python once per batch, a handful of
integer stats per file is all that shuffles.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

MP4_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("brand", StringType()),
        StructField("timescale", LongType()),
        StructField("duration_ms", LongType()),
        StructField("n_tracks", LongType()),
        StructField("n_boxes", LongType()),
        StructField("mdat_bytes", LongType()),
        StructField("payload_sum", LongType()),
    ]
)

_CONTAINERS = {b"moov", b"trak"}


def _walk(data: bytes, start: int, end: int, st: dict) -> bool:
    """Recursive box walk over data[start:end); accumulates stats in
    ``st``. Returns False on any grammar violation."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            return False
        size, btype = struct.unpack_from(">I4s", data, pos)
        if size < 8 or pos + size > end:
            return False
        st["n_boxes"] += 1
        body = pos + 8
        if btype == b"ftyp":
            if size < 16:
                return False
            st["brand"] = data[body : body + 4].decode("latin-1")
        elif btype == b"mvhd":
            # v0: version/flags(4) ctime(4) mtime(4) timescale(4) dur(4)
            if size < 8 + 20 or data[body] != 0:
                return False
            st["timescale"], st["duration"] = struct.unpack_from(
                ">II", data, body + 12
            )
        elif btype == b"trak":
            st["n_tracks"] += 1
        elif btype == b"mdat":
            st["mdat_bytes"] = size - 8
            st["payload_sum"] = sum(data[body : pos + size])
        if btype in _CONTAINERS:
            if not _walk(data, body, pos + size, st):
                return False
        pos += size
    return pos == end


def _mp4_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for mid, blob in zip(pdf["media_id"], pdf["content"]):
        mid = int(mid)
        row = {
            "media_id": mid,
            "format": "unknown",
            "brand": "",
            "timescale": 0,
            "duration_ms": 0,
            "n_tracks": 0,
            "n_boxes": 0,
            "mdat_bytes": 0,
            "payload_sum": 0,
        }
        st = {
            "brand": None,
            "timescale": 0,
            "duration": 0,
            "n_tracks": 0,
            "n_boxes": 0,
            "mdat_bytes": 0,
            "payload_sum": 0,
        }
        b = bytes(blob) if blob is not None else b""
        if _walk(b, 0, len(b), st) and st["brand"] and st["timescale"] > 0:
            row.update(
                format="mp4",
                brand=st["brand"],
                timescale=st["timescale"],
                # integer ms, truncating division (positive operands:
                # Python // == SQL // here)
                duration_ms=st["duration"] * 1000 // st["timescale"],
                n_tracks=st["n_tracks"],
                n_boxes=st["n_boxes"],
                mdat_bytes=st["mdat_bytes"],
                payload_sum=st["payload_sum"],
            )
        out.append(row)
    return pd.DataFrame(out, columns=[f.name for f in MP4_SCHEMA.fields])


def mp4_box_stats(df: DataFrame) -> DataFrame:
    """ISO-BMFF box-tree parse + mdat byte stats over MEDIA_SCHEMA
    blobs (see module doc)."""
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _mp4_batch(pdf)

    return df.select("media_id", "content").mapInPandas(gen, MP4_SCHEMA)


_IDENTITY_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def synthesize_mp4_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of REAL minimal-but-compliant MP4 blobs:
    ftyp(brand cycles isom/mp42/avc1) + moov(mvhd v0 with LCG
    timescale/duration + n_tracks x trak(tkhd v0)) + mdat with LCG
    payload bytes — every field a formula of the id so a DuckDB oracle
    recomputes the whole output blind. Every 13th id is truncated
    mid-moov — the corrupt stripe that must degrade to 'unknown'."""
    from gmall_flink_210726_spark.operators.multimodal import MEDIA_SCHEMA
    from gmall_flink_210726_spark.session import (
        ensure_parallelism,
        ship_package,
    )

    ship_package(docs.sparkSession)
    docs = ensure_parallelism(docs.select("doc_id"))

    def make(i: int) -> bytes:
        brand = (b"isom", b"mp42", b"avc1")[i % 3]
        timescale = 1000 * (1 + i % 4)
        duration = 500 + i % 1000
        n_tracks = 1 + i % 3
        n = 64 + i % 128
        ftyp = struct.pack(">I4s4sI4s", 24, b"ftyp", brand, 0, b"isom")
        mvhd = (
            struct.pack(">I4s", 108, b"mvhd")
            + struct.pack(">IIIII", 0, 0, 0, timescale, duration)
            + struct.pack(">iHH", 0x00010000, 0x0100, 0)
            + b"\x00" * 8
            + _IDENTITY_MATRIX
            + b"\x00" * 24
            + struct.pack(">I", n_tracks + 1)
        )
        traks = b""
        for t in range(n_tracks):
            tkhd = (
                struct.pack(">I4s", 92, b"tkhd")
                + struct.pack(">IIIIII", 0, 0, 0, t + 1, 0, duration)
                + b"\x00" * 16
                + _IDENTITY_MATRIX
                + struct.pack(">ii", 0, 0)
            )
            traks += struct.pack(">I4s", 8 + len(tkhd), b"trak") + tkhd
        moov = struct.pack(">I4s", 8 + len(mvhd) + len(traks), b"moov")
        moov += mvhd + traks
        payload = bytes((i * 17 + 11 * j) % 256 for j in range(n))
        mdat = struct.pack(">I4s", 8 + n, b"mdat") + payload
        blob = ftyp + moov + mdat
        return blob[:30] if i % 13 == 0 else blob

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": [make(int(i)) for i in ids],
                    "meta": [
                        {
                            "format": "mp4",
                            "width": 0,
                            "height": 0,
                            "sample_rate": 0,
                        }
                        for _ in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)

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


_MAX_DEPTH = 16


def _walk(data: bytes, start: int, end: int, st: dict, depth: int = 0) -> bool:
    """Recursive box walk over data[start:end); accumulates stats in
    ``st``. Returns False on any grammar violation. Depth-capped so a
    malformed deeply-nested container tree degrades instead of
    exhausting the stack."""
    if depth > _MAX_DEPTH:
        return False
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
            if not _walk(data, body, pos + size, st, depth + 1):
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
        try:
            ok = _walk(b, 0, len(b), st)
        except Exception:
            ok = False
        if ok and st["brand"] and st["timescale"] > 0:
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
        # 24 declared == 24 actual: major brand + minor version + TWO
        # compatible brands (isom + the major brand again).
        ftyp = struct.pack(">I4s4sI4s4s", 24, b"ftyp", brand, 0, b"isom", brand)
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


# --------------------------------------------------------------------------
# Sample tables (stbl): the frame-sampling entry point video needs.
# --------------------------------------------------------------------------

SAMPLES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("track_id", LongType()),
        StructField("codec", StringType()),
        StructField("n_samples", LongType()),
        StructField("duration_ticks", LongType()),
        StructField("total_bytes", LongType()),
        StructField("n_chunks", LongType()),
        StructField("first_offset", LongType()),
    ]
)

_STBL_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk_tracks(data: bytes, start: int, end: int, out: dict, depth: int = 0):
    """Box walk collecting per-track sample-table stats. ``out`` holds
    ``tracks`` (list of per-track dicts) and ``cur`` (the track being
    filled while inside its trak subtree). Returns False on any
    grammar violation — the whole blob then degrades."""
    if depth > _MAX_DEPTH:
        return False
    pos = start
    while pos < end:
        if pos + 8 > end:
            return False
        size, btype = struct.unpack_from(">I4s", data, pos)
        if size < 8 or pos + size > end:
            return False
        body, bend = pos + 8, pos + size
        if btype == b"trak":
            if out["cur"] is not None:  # nested trak is not a thing
                return False
            out["cur"] = {
                "track_id": 0,
                "codec": "",
                "n_samples": -1,
                "duration_ticks": -1,
                "total_bytes": -1,
                "n_chunks": -1,
                "first_offset": -1,
            }
            if not _walk_tracks(data, body, bend, out, depth + 1):
                return False
            t = out["cur"]
            out["cur"] = None
            # a track must have produced all four tables coherently
            if min(t["n_samples"], t["duration_ticks"], t["total_bytes"],
                   t["n_chunks"]) < 0 or not t["codec"]:
                return False
            out["tracks"].append(t)
        elif btype in _STBL_CONTAINERS:
            if not _walk_tracks(data, body, bend, out, depth + 1):
                return False
        elif out["cur"] is not None:
            t = out["cur"]
            if btype == b"tkhd":
                # v0: version/flags(4) ctime(4) mtime(4) track_id(4)
                if size < 8 + 16 or data[body] != 0:
                    return False
                t["track_id"] = struct.unpack_from(">I", data, body + 12)[0]
            elif btype == b"stsd":
                # version/flags(4) entry_count(4) entry(size(4) 4cc ...)
                if size < 8 + 16:
                    return False
                n_ent = struct.unpack_from(">I", data, body + 4)[0]
                if n_ent != 1:
                    return False
                esize, fourcc = struct.unpack_from(">I4s", data, body + 8)
                if esize < 16 or body + 8 + esize > bend:
                    return False
                t["codec"] = fourcc.decode("latin-1")
            elif btype == b"stts":
                n_ent = struct.unpack_from(">I", data, body + 4)[0]
                if size != 16 + 8 * n_ent:
                    return False
                cnt = dur = 0
                for k in range(n_ent):
                    c, d = struct.unpack_from(">II", data, body + 8 + 8 * k)
                    cnt += c
                    dur += c * d
                t["stts_count"], t["duration_ticks"] = cnt, dur
            elif btype == b"stsz":
                fixed, n_s = struct.unpack_from(">II", data, body + 4)
                if fixed != 0 or size != 20 + 4 * n_s:
                    return False
                t["n_samples"] = n_s
                t["total_bytes"] = sum(
                    struct.unpack_from(f">{n_s}I", data, body + 12)
                )
            elif btype == b"stco":
                n_c = struct.unpack_from(">I", data, body + 4)[0]
                if size != 16 + 4 * n_c or n_c < 1:
                    return False
                t["n_chunks"] = n_c
                t["first_offset"] = struct.unpack_from(">I", data, body + 8)[0]
        pos += size
    return pos == end


def _samples_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for mid, blob in zip(pdf["media_id"], pdf["content"]):
        mid = int(mid)
        st = {"tracks": [], "cur": None}
        b = bytes(blob) if blob is not None else b""
        try:
            ok = _walk_tracks(b, 0, len(b), st)
        except Exception:
            ok = False
        # stts sample count must agree with stsz's for every track
        ok = ok and st["tracks"] and all(
            t.pop("stts_count", -1) == t["n_samples"] for t in st["tracks"]
        )
        if ok:
            for t in st["tracks"]:
                out.append({"media_id": mid, **t})
        else:
            out.append(
                {
                    "media_id": mid,
                    "track_id": 0,
                    "codec": "unknown",
                    "n_samples": 0,
                    "duration_ticks": 0,
                    "total_bytes": 0,
                    "n_chunks": 0,
                    "first_offset": 0,
                }
            )
    return pd.DataFrame(out, columns=[f.name for f in SAMPLES_SCHEMA.fields])


def mp4_sample_tables(df: DataFrame) -> DataFrame:
    """Per-track stsd/stts/stsz/stco parse over MEDIA_SCHEMA blobs:
    codec 4cc, sample count (stsz, cross-checked against the stts run
    total), duration in timescale ticks, exact byte extent, chunk
    count and first chunk offset — the metadata a frame sampler needs
    to seek without decoding. Corrupt blobs degrade to ONE
    codec='unknown' row (the corrupt-stripe contract)."""
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _samples_batch(pdf)

    return df.select("media_id", "content").mapInPandas(gen, SAMPLES_SCHEMA)


def synthesize_mp4_sampletables(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of MP4 blobs with full trak/mdia/minf/stbl
    trees (stsd+stts+stsz+stco per track) — every field an LCG formula
    of (doc_id, track index) so a DuckDB oracle recomputes the decoded
    output blind. Every 11th id is truncated mid-stbl — the corrupt
    stripe that must degrade to one codec='unknown' row."""
    from gmall_flink_210726_spark.operators.multimodal import MEDIA_SCHEMA
    from gmall_flink_210726_spark.session import (
        ensure_parallelism,
        ship_package,
    )

    ship_package(docs.sparkSession)
    docs = ensure_parallelism(docs.select("doc_id"))

    def make(i: int) -> bytes:
        brand = (b"isom", b"mp42", b"avc1")[i % 3]
        n_tracks = 1 + i % 3
        ftyp = struct.pack(">I4s4sI4s4s", 24, b"ftyp", brand, 0, b"isom", brand)
        traks = b""
        for t in range(n_tracks):
            tkhd = struct.pack(
                ">I4sIII", 24, b"tkhd", 0, 0, 0
            ) + struct.pack(">I", t + 1)
            codec = (b"avc1", b"mp4a", b"hvc1")[(i + t) % 3]
            entry = struct.pack(">I4s", 16, codec) + b"\x00" * 8
            stsd = struct.pack(">I4sII", 16 + len(entry), b"stsd", 0, 1) + entry
            n_s = 8 + (i + 3 * t) % 13
            a = 1 + (i + t) % 4
            d1 = 100 + (i * 7 + t) % 50
            d2 = 200 + (i * 11 + 3 * t) % 60
            stts = struct.pack(
                ">I4sII IIII".replace(" ", ""),
                16 + 16, b"stts", 0, 2, a, d1, n_s - a, d2,
            )
            sizes = [50 + (i * 13 + 7 * t + 29 * j) % 100 for j in range(n_s)]
            stsz = struct.pack(">I4sIII", 20 + 4 * n_s, b"stsz", 0, 0, n_s)
            stsz += struct.pack(f">{n_s}I", *sizes)
            n_c = 1 + (i + t) % 3
            offs = [1000 * (t + 1) + 512 * c + i % 97 for c in range(n_c)]
            stco = struct.pack(">I4sII", 16 + 4 * n_c, b"stco", 0, n_c)
            stco += struct.pack(f">{n_c}I", *offs)
            stbl_body = stsd + stts + stsz + stco
            stbl = struct.pack(">I4s", 8 + len(stbl_body), b"stbl") + stbl_body
            minf = struct.pack(">I4s", 8 + len(stbl), b"minf") + stbl
            mdia = struct.pack(">I4s", 8 + len(minf), b"mdia") + minf
            trak_body = tkhd + mdia
            traks += struct.pack(">I4s", 8 + len(trak_body), b"trak") + trak_body
        moov = struct.pack(">I4s", 8 + len(traks), b"moov") + traks
        blob = ftyp + moov
        return blob[: len(blob) - 23] if i % 11 == 0 else blob

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

"""REAL ZIP (PKWARE APPNOTE) central-directory walk over binary
columns.

The second archive-container decoder beside ``operators/tar.py``: the
ZIP grammar is the structural inverse of tar's streaming headers — the
authoritative index lives at the END (End-Of-Central-Directory record
found by back-scan, then the central directory), and each central
entry must cross-check against its local file header. This walk is
what an ingestion pipeline runs to index a zip corpus without
decompressing: entry names, sizes, offsets — plus a REAL CRC-32
verification of every STORED payload (zlib.crc32), the integrity
check the format was designed around.

Corrupt-stripe contract: a missing/garbled EOCD, central/local
signature mismatch, name disagreement between central and local
records, CRC mismatch, or out-of-range offsets degrade the row to
``format='unknown'``.

Scale design: Arrow-batched mapInPandas; integer stats per archive
shuffle, payloads never do.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

ZIP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_entries", LongType()),
        StructField("total_bytes", LongType()),
        StructField("payload_sum", LongType()),
        StructField("cd_size", LongType()),
        StructField("first_name", StringType()),
    ]
)

_LOCAL_SIG = b"PK\x03\x04"
_CENTRAL_SIG = b"PK\x01\x02"
_EOCD_SIG = b"PK\x05\x06"


def _walk_zip(data: bytes) -> dict | None:
    end = len(data)
    # EOCD back-scan (comment may pad up to 64 KiB; scan what's there)
    scan_from = max(0, end - 22 - 65535)
    eocd = data.rfind(_EOCD_SIG, scan_from)
    if eocd < 0 or eocd + 22 > end:
        return None
    (disk, cddisk, n_this, n_total, cdsize, cdoff, clen) = struct.unpack_from(
        "<HHHHIIH", data, eocd + 4
    )
    if disk != 0 or cddisk != 0 or n_this != n_total or n_total == 0:
        return None
    if eocd + 22 + clen != end:
        return None
    if cdoff + cdsize != eocd:
        return None
    pos = cdoff
    n = total = psum = 0
    first_name = ""
    for _ in range(n_total):
        if pos + 46 > eocd or data[pos : pos + 4] != _CENTRAL_SIG:
            return None
        (
            _vm, _vn, flags, method, _t, _d, crc, csize, usize,
            nlen, elen, comlen, _dsk, _ia, _ea, lho,
        ) = struct.unpack_from("<HHHHHHIIIHHHHHII", data, pos + 4)
        if flags != 0 or method != 0 or csize != usize:
            return None  # STORED only, no flags
        name = data[pos + 46 : pos + 46 + nlen]
        # cross-check against the local file header
        if lho + 30 + nlen > eocd or data[lho : lho + 4] != _LOCAL_SIG:
            return None
        (l_nlen, l_elen) = struct.unpack_from("<HH", data, lho + 26)
        if l_nlen != nlen or data[lho + 30 : lho + 30 + nlen] != name:
            return None
        body = lho + 30 + l_nlen + l_elen
        if body + usize > eocd:
            return None
        payload = data[body : body + usize]
        if zlib.crc32(payload) != crc:
            return None  # the REAL integrity check
        if n == 0:
            first_name = name.decode("latin-1")
        n += 1
        total += usize
        psum += sum(payload)
        pos += 46 + nlen + elen + comlen
    if pos != eocd:
        return None
    return {
        "n_entries": n,
        "total_bytes": total,
        "payload_sum": psum,
        "cd_size": cdsize,
        "first_name": first_name,
    }


def _zip_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for mid, blob in zip(pdf["media_id"], pdf["content"]):
        mid = int(mid)
        row = {
            "media_id": mid,
            "format": "unknown",
            "n_entries": 0,
            "total_bytes": 0,
            "payload_sum": 0,
            "cd_size": 0,
            "first_name": "",
        }
        b = bytes(blob) if blob is not None else b""
        try:
            st = _walk_zip(b)
        except Exception:
            st = None
        if st is not None:
            row.update(format="zip", **st)
        out.append(row)
    return pd.DataFrame(out, columns=[f.name for f in ZIP_SCHEMA.fields])


def zip_entry_stats(df: DataFrame) -> DataFrame:
    """ZIP central-directory walk over MEDIA_SCHEMA blobs."""
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _zip_batch(pdf)

    return df.select("media_id", "content").mapInPandas(gen, ZIP_SCHEMA)


def _make_zip(i: int) -> bytes:
    """Deterministic STORED-only zip: ``2 + i % 5`` entries named
    ``f_{i}_{j}.bin`` with LCG payloads of ``40 + (i*29 + 17*j) % 200``
    bytes and REAL CRC-32s; every 12th id loses its EOCD tail."""
    locals_ = bytearray()
    centrals = bytearray()
    offsets = []
    n = 2 + i % 5
    for j in range(n):
        name = f"f_{i}_{j}.bin".encode("ascii")
        size = 40 + (i * 29 + 17 * j) % 200
        payload = bytes((i * 23 + 11 * j + 5 * k) % 256 for k in range(size))
        crc = zlib.crc32(payload)
        offsets.append(len(locals_))
        locals_ += (
            _LOCAL_SIG
            + struct.pack("<HHHHHIIIHH", 20, 0, 0, 0, 0, crc, size, size,
                          len(name), 0)
            + name
            + payload
        )
        centrals += (
            _CENTRAL_SIG
            + struct.pack(
                "<HHHHHHIIIHHHHHII",
                20, 20, 0, 0, 0, 0, crc, size, size,
                len(name), 0, 0, 0, 0, 0, offsets[-1],
            )
            + name
        )
    cdoff = len(locals_)
    eocd = _EOCD_SIG + struct.pack(
        "<HHHHIIH", 0, 0, n, n, len(centrals), cdoff, 0
    )
    blob = bytes(locals_ + centrals + eocd)
    return blob[: len(blob) - 30] if i % 12 == 0 else blob


def synthesize_zip_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of STORED-only zip archives."""
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
                    "content": [_make_zip(int(i)) for i in ids],
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

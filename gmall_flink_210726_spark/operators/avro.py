"""Avro object-container file walk — a from-scratch reader for the
Kafka-ecosystem ingest format (Apache Avro 1.11 spec, public): the
container the gmall reference's topics would carry in production
(Confluent pipelines land Kafka streams as Avro before parquet
compaction; cf. the reference's Kafka plumbing at
gmall-realtime/src/main/java/com/guohaoyu/util/MyKafkaUtil.java:21-48).

Implemented from the spec:

- file header: ``Obj\\x01`` magic, file-metadata MAP (block-framed:
  zigzag-long pair count with the negative-count + byte-size form,
  string keys, bytes values; terminated by count 0) carrying
  ``avro.schema`` (JSON) and ``avro.codec``, then the 16-byte sync
  marker;
- data blocks: zigzag-long record count, zigzag-long byte size, the
  (possibly compressed) serialized records, and the sync marker,
  which MUST equal the header's (a flipped sync byte degrades);
- block codecs: ``null`` passthrough, ``deflate`` = raw DEFLATE
  through the repo's hand inflate, ``snappy`` = the hand snappy
  block decoder + the codec's 4-byte BIG-endian CRC-32 of the
  UNCOMPRESSED data (checked);
- a SCHEMA-DRIVEN value decoder over the parsed ``avro.schema``:
  null / boolean / int / long (zigzag varints) / float / double /
  string / bytes (zigzag-long length prefix) / record / union
  (zigzag branch index, bounds-checked) / array + map (block-framed
  like the metadata map) / enum / fixed;
- cross-checks: every block must decode EXACTLY its declared record
  count and consume its payload exactly; the trailing sync marker
  must match; unions must index a real branch.

All varint/zigzag plumbing is shared with the parquet Thrift walk
(`parquetmeta._Reader`) — Avro longs are the same wire format.
Arrow-batched ``mapInPandas``, zero shuffle.

Fixture files are written by a deliberately separate, minimal
encoder in this module (no Avro library ships in the container);
the deflate codec uses stdlib zlib as the reference ENCODER (the
zstd/LZ4 test precedent: hand decoder proven against a reference
encoder), and the snappy codec emits literal-only frames, which are
valid snappy by construction.
"""

from __future__ import annotations

import json
import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

from gmall_flink_210726_spark.operators.parquetmeta import (
    _Reader,
    snappy_decompress,
)

_MAGIC = b"Obj\x01"


def _zz_long(r: _Reader) -> int:
    return r.zigzag()


def _bytes(r: _Reader) -> bytes:
    n = r.zigzag()
    if n < 0:
        raise ValueError("avro: negative length")
    return r.take(n)


def _decode_value(r: _Reader, schema):
    """Schema-driven Avro datum decode (spec 'Data Serialization')."""
    if isinstance(schema, list):  # union: zigzag branch index
        idx = r.zigzag()
        if idx < 0 or idx >= len(schema):
            raise ValueError("avro: union branch out of range")
        return _decode_value(r, schema[idx])
    if isinstance(schema, dict):
        t = schema.get("type")
        if t == "record":
            return {
                f["name"]: _decode_value(r, f["type"])
                for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                c = r.zigzag()
                if c == 0:
                    return out
                if c < 0:  # negative-count form carries a byte size
                    r.zigzag()
                    c = -c
                out.extend(
                    _decode_value(r, schema["items"]) for _ in range(c)
                )
        if t == "map":
            m = {}
            while True:
                c = r.zigzag()
                if c == 0:
                    return m
                if c < 0:
                    r.zigzag()
                    c = -c
                for _ in range(c):
                    k = _bytes(r).decode("utf-8")
                    m[k] = _decode_value(r, schema["values"])
        if t == "enum":
            idx = r.zigzag()
            syms = schema["symbols"]
            if idx < 0 or idx >= len(syms):
                raise ValueError("avro: enum index out of range")
            return syms[idx]
        if t == "fixed":
            return r.take(int(schema["size"]))
        schema = t  # {"type": "long"} primitive wrapper form
    if schema == "null":
        return None
    if schema == "boolean":
        b = r.byte()
        if b not in (0, 1):
            raise ValueError("avro: bad boolean byte")
        return b == 1
    if schema in ("int", "long"):
        return r.zigzag()
    if schema == "float":
        return struct.unpack("<f", r.take(4))[0]
    if schema == "double":
        return struct.unpack("<d", r.take(8))[0]
    if schema == "string":
        return _bytes(r).decode("utf-8")
    if schema == "bytes":
        return _bytes(r)
    raise ValueError(f"avro: unsupported schema {schema!r}")


def _read_meta_map(r: _Reader) -> dict[bytes, bytes]:
    meta: dict[bytes, bytes] = {}
    while True:
        c = r.zigzag()
        if c == 0:
            return meta
        if c < 0:
            r.zigzag()  # byte size of the block, skippable
            c = -c
        for _ in range(c):
            k = _bytes(r)
            meta[k] = _bytes(r)


def read_avro_container(
    data: bytes,
) -> tuple[list, str, int] | None:
    """Container walk -> (records, codec, n_blocks); None on any
    grammar violation: bad magic, unknown codec, sync mismatch, a
    block that does not decode exactly its declared count, CRC
    failure on a snappy block."""
    if len(data) < 4 or data[:4] != _MAGIC:
        return None
    r = _Reader(data, 4, len(data))
    try:
        meta = _read_meta_map(r)
        sync = r.take(16)
        schema = json.loads(meta[b"avro.schema"].decode("utf-8"))
        codec = meta.get(b"avro.codec", b"null").decode("ascii")
        if codec not in ("null", "deflate", "snappy"):
            return None
        records: list = []
        n_blocks = 0
        while r.pos < r.end:
            count = r.zigzag()
            size = r.zigzag()
            if count <= 0 or size < 0:
                return None
            payload = r.take(size)
            if r.take(16) != sync:
                return None  # corrupt sync marker
            if codec == "deflate":
                from gmall_flink_210726_spark.operators.inflate import (
                    inflate,
                )

                payload = inflate(payload)
            elif codec == "snappy":
                if len(payload) < 4:
                    return None
                (crc,) = struct.unpack(">I", payload[-4:])
                payload = snappy_decompress(payload[:-4])
                if zlib.crc32(payload) != crc:
                    return None
            br = _Reader(payload, 0, len(payload))
            for _ in range(count):
                records.append(_decode_value(br, schema))
            if br.pos != br.end:
                return None  # records must consume the block exactly
            n_blocks += 1
    except (ValueError, KeyError, UnicodeDecodeError):
        return None
    return records, codec, n_blocks


# --------------------------------------------------------------------------
# Fixture writer (minimal, separate from the reader)
# --------------------------------------------------------------------------

_SCHEMA = {
    "type": "record",
    "name": "Event",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "vals", "type": {"type": "array", "items": "long"}},
    ],
}


def _zz_enc(v: int) -> bytes:
    u = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _snappy_literal(data: bytes) -> bytes:
    """Literal-only snappy block (valid snappy by construction):
    varint uncompressed length, then <=60-byte literal runs."""
    out = bytearray()
    n = len(data)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            break
    for pos in range(0, len(data), 60):
        chunk = data[pos : pos + 60]
        out.append((len(chunk) - 1) << 2)
        out += chunk
    return bytes(out)


def _enc_record(i: int, r: int) -> bytes:
    out = bytearray(_zz_enc((5 * i + 3 * r) % 1000))
    if (i + r) % 4 == 0:
        out += _zz_enc(0)  # union branch: null
    else:
        s = f"n{(i + 2 * r) % 50}".encode()
        out += _zz_enc(1) + _zz_enc(len(s)) + s
    nv = r % 4
    if nv:
        out += _zz_enc(nv)
        for k in range(nv):
            out += _zz_enc((i + 7 * r + k) % 100)
    out += _zz_enc(0)  # array terminator
    return bytes(out)


def _make_avro(i: int, bad_stripe: int = 9) -> bytes:
    """``8 + i % 40`` records over ``1 + i % 3`` blocks; codec
    rotates null/deflate/snappy by id. Every ``bad_stripe``-th id
    gets one byte of the FIRST block's trailing sync marker flipped
    — the reader must notice the mismatch and degrade."""
    n = 8 + i % 40
    g = 1 + i % 3
    codec = ("null", "deflate", "snappy")[i % 3]
    sync = bytes((i * 31 + 7 * k) % 256 for k in range(16))
    schema_json = json.dumps(_SCHEMA).encode()
    head = bytearray(_MAGIC)
    head += _zz_enc(2)
    for k, v in (
        (b"avro.schema", schema_json),
        (b"avro.codec", codec.encode()),
    ):
        head += _zz_enc(len(k)) + k + _zz_enc(len(v)) + v
    head += _zz_enc(0)
    head += sync
    out = bytearray(head)
    per = -(-n // g)
    first_sync_at = -1
    for b0 in range(0, n, per):
        recs = list(range(b0, min(b0 + per, n)))
        payload = b"".join(_enc_record(i, r) for r in recs)
        if codec == "deflate":
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = c.compress(payload) + c.flush()
        elif codec == "snappy":
            crc = struct.pack(">I", zlib.crc32(payload))
            payload = _snappy_literal(payload) + crc
        out += _zz_enc(len(recs)) + _zz_enc(len(payload)) + payload
        if first_sync_at < 0:
            first_sync_at = len(out)
        out += sync
    if i % bad_stripe == 0:
        out[first_sync_at + 5] ^= 0x40
    return bytes(out)


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------

AVRO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("codec", StringType()),
        StructField("n_records", LongType()),
        StructField("n_blocks", LongType()),
        StructField("id_sum", LongType()),
        StructField("name_count", LongType()),
        StructField("name_len_sum", LongType()),
        StructField("vals_count", LongType()),
        StructField("vals_sum", LongType()),
    ]
)


def _avro_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for mid, blob in zip(pdf["media_id"], pdf["content"]):
        row = {
            "media_id": int(mid),
            "format": "unknown",
            "codec": "",
            "n_records": 0,
            "n_blocks": 0,
            "id_sum": 0,
            "name_count": 0,
            "name_len_sum": 0,
            "vals_count": 0,
            "vals_sum": 0,
        }
        b = bytes(blob) if blob is not None else b""
        try:
            got = read_avro_container(b)
        except Exception:
            got = None
        if got is not None:
            records, codec, n_blocks = got
            row.update(
                format="avro",
                codec=codec,
                n_records=len(records),
                n_blocks=n_blocks,
                id_sum=sum(rec["id"] for rec in records),
                name_count=sum(
                    1 for rec in records if rec["name"] is not None
                ),
                name_len_sum=sum(
                    len(rec["name"])
                    for rec in records
                    if rec["name"] is not None
                ),
                vals_count=sum(len(rec["vals"]) for rec in records),
                vals_sum=sum(sum(rec["vals"]) for rec in records),
            )
        out.append(row)
    return pd.DataFrame(out, columns=[f.name for f in AVRO_SCHEMA.fields])


def avro_container_stats(df: DataFrame) -> DataFrame:
    """Hand-decoded Avro object-container walk over MEDIA_SCHEMA blobs."""
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _avro_batch(pdf)

    return df.select("media_id", "content").mapInPandas(gen, AVRO_SCHEMA)


def synthesize_avro_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of Avro object-container files."""
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
                    "content": [_make_avro(int(i)) for i in ids],
                    "meta": [
                        {
                            "format": "avro",
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
# Generic encoder (fixture side): the inverse of _decode_value for the
# types the repo's Avro fixtures use — lets other operators (e.g. the
# Iceberg metadata walk) synthesize real containers from any schema.
# --------------------------------------------------------------------------


def _enc_datum(schema, v) -> bytes:
    if isinstance(schema, list):  # union: pick the branch by nullness
        for idx, br in enumerate(schema):
            if (br == "null") == (v is None):
                return _zz_enc(idx) + (
                    b"" if v is None else _enc_datum(br, v)
                )
        raise ValueError("avro encode: no union branch fits")
    if isinstance(schema, dict):
        t = schema.get("type")
        if t == "record":
            return b"".join(
                _enc_datum(f["type"], v[f["name"]])
                for f in schema["fields"]
            )
        if t == "array":
            out = b""
            if v:
                out += _zz_enc(len(v))
                out += b"".join(
                    _enc_datum(schema["items"], x) for x in v
                )
            return out + _zz_enc(0)
        if t == "map":
            out = b""
            if v:
                out += _zz_enc(len(v))
                for k, x in v.items():
                    kb = k.encode("utf-8")
                    out += _zz_enc(len(kb)) + kb
                    out += _enc_datum(schema["values"], x)
            return out + _zz_enc(0)
        schema = t
    if schema == "null":
        return b""
    if schema == "boolean":
        return b"\x01" if v else b"\x00"
    if schema in ("int", "long"):
        return _zz_enc(int(v))
    if schema == "double":
        return struct.pack("<d", float(v))
    if schema == "string":
        b = v.encode("utf-8")
        return _zz_enc(len(b)) + b
    if schema == "bytes":
        return _zz_enc(len(v)) + v
    raise ValueError(f"avro encode: unsupported {schema!r}")


def make_avro_container(
    schema: dict,
    records: list,
    codec: str = "null",
    sync: bytes = b"\x00" * 16,
    per_block: int = 1000,
) -> bytes:
    """Render a complete object-container file for any schema the
    generic encoder covers (round-trip-pinned against the reader)."""
    schema_json = json.dumps(schema).encode()
    out = bytearray(_MAGIC)
    out += _zz_enc(2)
    for k, v in (
        (b"avro.schema", schema_json),
        (b"avro.codec", codec.encode()),
    ):
        out += _zz_enc(len(k)) + k + _zz_enc(len(v)) + v
    out += _zz_enc(0)
    out += sync
    for b0 in range(0, len(records), per_block):
        recs = records[b0 : b0 + per_block]
        payload = b"".join(_enc_datum(schema, r) for r in recs)
        if codec == "deflate":
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = c.compress(payload) + c.flush()
        elif codec == "snappy":
            crc = struct.pack(">I", zlib.crc32(payload))
            payload = _snappy_literal(payload) + crc
        out += _zz_enc(len(recs)) + _zz_enc(len(payload)) + payload
        out += sync
    return bytes(out)


# --------------------------------------------------------------------------
# Schema resolution (spec 'Schema Resolution'): reader vs writer schema
# --------------------------------------------------------------------------

_PROMOTIONS = {
    ("int", "long"), ("int", "float"), ("int", "double"),
    ("long", "float"), ("long", "double"), ("float", "double"),
    ("string", "bytes"), ("bytes", "string"),
}


def _type_name(schema) -> str:
    if isinstance(schema, dict):
        return schema.get("type", "")
    if isinstance(schema, str):
        return schema
    return "union"


def _json_default(schema, dv):
    """Interpret a reader field's JSON default per its type (for a
    union, the default applies to the FIRST branch, per spec)."""
    if isinstance(schema, list):
        return _json_default(schema[0], dv)
    t = _type_name(schema)
    if t == "null":
        return None
    if t in ("int", "long"):
        return int(dv)
    if t in ("float", "double"):
        return float(dv)
    if t == "string":
        return str(dv)
    if t == "bytes":
        return str(dv).encode("latin-1")
    if t == "boolean":
        return bool(dv)
    if t == "array":
        return [_json_default(schema["items"], x) for x in dv]
    raise ValueError(f"avro: unsupported default for {t}")


def _decode_resolved(r: _Reader, wsch, rsch):
    """Decode per the WRITER schema, shaped per the READER schema
    (Avro spec 'Schema Resolution'): record fields matched by NAME
    (extra writer fields decoded and discarded, missing reader
    fields filled from their defaults — no default is an error),
    primitive promotions (int>long>float>double, string<->bytes),
    unions resolved branch-wise. Raises ValueError on any mismatch."""
    if isinstance(wsch, list):  # writer union: pick the branch first
        idx = r.zigzag()
        if idx < 0 or idx >= len(wsch):
            raise ValueError("avro: union branch out of range")
        return _decode_resolved(r, wsch[idx], rsch)
    if isinstance(rsch, list):  # reader union: first matching branch
        wname = _type_name(wsch)
        for br in rsch:
            bn = _type_name(br)
            if bn == wname or (wname, bn) in _PROMOTIONS:
                return _decode_resolved(r, wsch, br)
        raise ValueError("avro: no reader union branch matches")
    wt, rt = _type_name(wsch), _type_name(rsch)
    if wt == "record" and rt == "record":
        rfields = {f["name"]: f for f in rsch["fields"]}
        out = {}
        seen = set()
        for wf in wsch["fields"]:
            name = wf["name"]
            if name in rfields:
                out[name] = _decode_resolved(
                    r, wf["type"], rfields[name]["type"]
                )
                seen.add(name)
            else:  # extra writer field: consume and discard
                _decode_value(r, wf["type"])
        for rf in rsch["fields"]:
            if rf["name"] not in seen:
                if "default" not in rf:
                    raise ValueError(
                        f"avro: field {rf['name']} missing with no default"
                    )
                out[rf["name"]] = _json_default(
                    rf["type"], rf["default"]
                )
        return out
    if wt == "array" and rt == "array":
        out = []
        while True:
            c = r.zigzag()
            if c == 0:
                return out
            if c < 0:
                r.zigzag()
                c = -c
            out.extend(
                _decode_resolved(r, wsch["items"], rsch["items"])
                for _ in range(c)
            )
    if wt == "map" and rt == "map":
        m = {}
        while True:
            c = r.zigzag()
            if c == 0:
                return m
            if c < 0:
                r.zigzag()
                c = -c
            for _ in range(c):
                k = _bytes(r).decode("utf-8")
                m[k] = _decode_resolved(
                    r, wsch["values"], rsch["values"]
                )
    if wt == rt:
        return _decode_value(r, wsch)
    if (wt, rt) in _PROMOTIONS:
        v = _decode_value(r, wsch)
        if rt in ("float", "double"):
            return float(v)
        if rt == "long":
            return int(v)
        if rt == "bytes":
            return v.encode("utf-8")
        if rt == "string":
            return v.decode("utf-8")
    raise ValueError(f"avro: cannot resolve writer {wt} as reader {rt}")


def read_avro_resolved(
    data: bytes, reader_schema: dict
) -> tuple[list, str, int] | None:
    """Container walk decoding every record against ``reader_schema``
    (schema evolution: the reader's view of old data); None on any
    container violation or unresolvable schema pair."""
    if len(data) < 4 or data[:4] != _MAGIC:
        return None
    r = _Reader(data, 4, len(data))
    try:
        meta = _read_meta_map(r)
        sync = r.take(16)
        wschema = json.loads(meta[b"avro.schema"].decode("utf-8"))
        codec = meta.get(b"avro.codec", b"null").decode("ascii")
        if codec not in ("null", "deflate", "snappy"):
            return None
        records: list = []
        n_blocks = 0
        while r.pos < r.end:
            count = r.zigzag()
            size = r.zigzag()
            if count <= 0 or size < 0:
                return None
            payload = r.take(size)
            if r.take(16) != sync:
                return None
            if codec == "deflate":
                from gmall_flink_210726_spark.operators.inflate import (
                    inflate,
                )

                payload = inflate(payload)
            elif codec == "snappy":
                if len(payload) < 4:
                    return None
                (crc,) = struct.unpack(">I", payload[-4:])
                payload = snappy_decompress(payload[:-4])
                if zlib.crc32(payload) != crc:
                    return None
            br = _Reader(payload, 0, len(payload))
            for _ in range(count):
                records.append(
                    _decode_resolved(br, wschema, reader_schema)
                )
            if br.pos != br.end:
                return None
            n_blocks += 1
    except (ValueError, KeyError, UnicodeDecodeError):
        return None
    return records, codec, n_blocks


# --------------------------------------------------------------------------
# Evolution fixture: v1-writer containers read through a v2 reader
# --------------------------------------------------------------------------

READER_V2 = {
    "type": "record",
    "name": "Event",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "qty", "type": "long"},  # promoted from writer int
        {"name": "name", "type": ["null", "string"]},  # NO default
        {"name": "score", "type": "long", "default": 7},
    ],
}


def _writer_schema_v1(with_name: bool) -> dict:
    fields = [
        {"name": "id", "type": "long"},
        {"name": "qty", "type": "int"},
    ]
    if with_name:
        fields.append({"name": "name", "type": ["null", "string"]})
    fields.append(
        {"name": "vals", "type": {"type": "array", "items": "long"}}
    )
    return {"type": "record", "name": "Event", "fields": fields}


def _make_avro_v1(i: int, bad_stripe: int = 10) -> bytes:
    """v1-writer container: id long, qty INT (the reader promotes it
    to long), name nullable string, vals array (the reader DROPS it
    — the skip path must still consume the bytes exactly). Every
    ``bad_stripe``-th id's writer omits ``name`` — a perfectly valid
    container on its own that the v2 READER must refuse (its name
    field has no default)."""
    with_name = i % bad_stripe != 0
    n = 6 + i % 30
    recs = []
    for r in range(n):
        rec = {
            "id": (5 * i + 3 * r) % 1000,
            "qty": (i + 2 * r) % 50,
            "vals": [(i + r + k) % 30 for k in range(r % 3)],
        }
        if with_name:
            rec["name"] = (
                None if (i + r) % 4 == 0 else f"n{(i + 2 * r) % 50}"
            )
        recs.append(rec)
    return make_avro_container(
        _writer_schema_v1(with_name),
        recs,
        codec=("null", "deflate", "snappy")[i % 3],
        sync=bytes((i * 37 + 11 * k) % 256 for k in range(16)),
        per_block=max(1, n // (1 + i % 3)),
    )


AVRO_EVO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_records", LongType()),
        StructField("id_sum", LongType()),
        StructField("qty_sum", LongType()),
        StructField("name_count", LongType()),
        StructField("name_len_sum", LongType()),
        StructField("score_sum", LongType()),
    ]
)


def _avro_evo_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for mid, blob in zip(pdf["media_id"], pdf["content"]):
        row = {
            "media_id": int(mid),
            "format": "unknown",
            "n_records": 0,
            "id_sum": 0,
            "qty_sum": 0,
            "name_count": 0,
            "name_len_sum": 0,
            "score_sum": 0,
        }
        b = bytes(blob) if blob is not None else b""
        try:
            got = read_avro_resolved(b, READER_V2)
        except Exception:
            got = None
        if got is not None:
            records, _, _ = got
            row.update(
                format="avro",
                n_records=len(records),
                id_sum=sum(rec["id"] for rec in records),
                qty_sum=sum(rec["qty"] for rec in records),
                name_count=sum(
                    1 for rec in records if rec["name"] is not None
                ),
                name_len_sum=sum(
                    len(rec["name"])
                    for rec in records
                    if rec["name"] is not None
                ),
                score_sum=sum(rec["score"] for rec in records),
            )
        out.append(row)
    return pd.DataFrame(
        out, columns=[f.name for f in AVRO_EVO_SCHEMA.fields]
    )


def avro_evolution_stats(df: DataFrame) -> DataFrame:
    """Reader-schema (v2) decode of v1-writer containers."""
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _avro_evo_batch(pdf)

    return df.select("media_id", "content").mapInPandas(
        gen, AVRO_EVO_SCHEMA
    )


def synthesize_avro_v1_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of v1-writer Avro containers."""
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
                    "content": [_make_avro_v1(int(i)) for i in ids],
                    "meta": [
                        {
                            "format": "avro",
                            "width": 0,
                            "height": 0,
                            "sample_rate": 0,
                        }
                        for _ in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)

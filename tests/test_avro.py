"""Avro object-container walk: schema-driven datum decode, block
framing, codecs, sync/CRC degrades (operators/avro.py)."""

from __future__ import annotations

import json
import struct
import zlib

from gmall_flink_210726_spark.operators.avro import (
    _MAGIC,
    _decode_value,
    _make_avro,
    _snappy_literal,
    _zz_enc,
    read_avro_container,
)
from gmall_flink_210726_spark.operators.parquetmeta import (
    _Reader,
    snappy_decompress,
)


def _rdr(b: bytes) -> _Reader:
    return _Reader(b, 0, len(b))


class TestDatumDecode:
    def test_zigzag_longs(self):
        for v in (0, -1, 1, -2, 63, 64, -65, 12345, -99999, 2**40):
            assert _decode_value(_rdr(_zz_enc(v)), "long") == v

    def test_string_and_bytes(self):
        b = _zz_enc(5) + b"hello"
        assert _decode_value(_rdr(b), "string") == "hello"
        assert _decode_value(_rdr(b), "bytes") == b"hello"

    def test_union_branch_bounds(self):
        assert _decode_value(_rdr(_zz_enc(0)), ["null", "long"]) is None
        assert _decode_value(
            _rdr(_zz_enc(1) + _zz_enc(7)), ["null", "long"]
        ) == 7
        try:
            _decode_value(_rdr(_zz_enc(2)), ["null", "long"])
            raise AssertionError("union overflow accepted")
        except ValueError:
            pass

    def test_boolean_strict_byte(self):
        assert _decode_value(_rdr(b"\x01"), "boolean") is True
        assert _decode_value(_rdr(b"\x00"), "boolean") is False
        try:
            _decode_value(_rdr(b"\x02"), "boolean")
            raise AssertionError("bad boolean byte accepted")
        except ValueError:
            pass

    def test_array_negative_count_form(self):
        # block of -2 items (with byte size), then terminator
        sch = {"type": "array", "items": "long"}
        body = (
            _zz_enc(-2)
            + _zz_enc(2)
            + _zz_enc(3)
            + _zz_enc(4)
            + _zz_enc(0)
        )
        assert _decode_value(_rdr(body), sch) == [3, 4]

    def test_map_and_enum_and_fixed(self):
        m = {"type": "map", "values": "long"}
        body = _zz_enc(1) + _zz_enc(1) + b"k" + _zz_enc(9) + _zz_enc(0)
        assert _decode_value(_rdr(body), m) == {"k": 9}
        e = {"type": "enum", "symbols": ["A", "B"]}
        assert _decode_value(_rdr(_zz_enc(1)), e) == "B"
        f = {"type": "fixed", "size": 3}
        assert _decode_value(_rdr(b"xyz"), f) == b"xyz"


class TestContainerWalk:
    def test_all_codecs_roundtrip(self):
        for i in (1, 2, 3, 4, 5, 30):  # null/deflate/snappy rotation
            got = read_avro_container(_make_avro(i))
            assert got is not None, i
            recs, codec, nb = got
            assert len(recs) == 8 + i % 40
            assert nb == 1 + i % 3
            assert codec == ("null", "deflate", "snappy")[i % 3]

    def test_sync_flip_degrades(self):
        assert read_avro_container(_make_avro(0)) is None
        assert read_avro_container(_make_avro(9)) is None
        assert read_avro_container(_make_avro(18)) is None

    def test_bad_magic_and_truncation(self):
        blob = _make_avro(1)
        assert read_avro_container(b"Obj\x02" + blob[4:]) is None
        assert read_avro_container(blob[:-10]) is None
        assert read_avro_container(b"") is None

    def test_snappy_crc_checked(self):
        """A correct snappy frame with a lying CRC must degrade."""
        blob = bytearray(_make_avro(2))  # snappy codec
        base = read_avro_container(bytes(blob))
        assert base is not None
        # the CRC is the 4 bytes before the LAST sync (16 bytes)
        blob[-17] ^= 0xFF
        assert read_avro_container(bytes(blob)) is None

    def test_block_must_consume_payload_exactly(self):
        """Hand-built container whose block declares 1 record but
        carries trailing junk -> degrade."""
        schema = json.dumps({"type": "long"}).encode()
        sync = bytes(range(16))
        head = (
            _MAGIC
            + _zz_enc(1)
            + _zz_enc(11)
            + b"avro.schema"
            + _zz_enc(len(schema))
            + schema
            + _zz_enc(0)
            + sync
        )
        payload = _zz_enc(7) + b"\x00"  # one long + 1 junk byte
        blob = head + _zz_enc(1) + _zz_enc(len(payload)) + payload + sync
        assert read_avro_container(blob) is None
        ok = head + _zz_enc(1) + _zz_enc(1) + _zz_enc(7) + sync
        got = read_avro_container(ok)
        assert got is not None and got[0] == [7]


class TestSnappyLiteralWriter:
    def test_valid_against_hand_decoder(self):
        for size in (0, 1, 59, 60, 61, 200):
            data = bytes((7 * k) % 256 for k in range(size))
            assert snappy_decompress(_snappy_literal(data)) == data

    def test_crc_is_zlib_crc32_big_endian(self):
        blob = _make_avro(2)
        got = read_avro_container(blob)
        assert got is not None
        # sanity: struct/zlib agree on a known vector
        assert struct.pack(">I", zlib.crc32(b"abc")) == b"\x35\x24\x41\xc2"

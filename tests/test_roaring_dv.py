"""Roaring portable serialization, RFC 1924 base85, and the Delta
deletion-vector merge-on-read scan. Pure-python, no Spark."""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from gmall_flink_210726_spark.operators.deltadv import (
    _deleted,
    _file_rows,
    _k_val,
    _make_delta_dv_table,
    scan_delta_table_mor,
)
from gmall_flink_210726_spark.operators.roaring import (
    b85_decode,
    b85_encode,
    rbm_array_decode,
    rbm_array_encode,
    roaring_decode,
    roaring_encode,
)

# ------------------------------------------------------------- base85


def test_b85_roundtrip_and_strictness():
    rng = random.Random(3)
    for n in range(0, 33):
        data = bytes(rng.randrange(256) for _ in range(n))
        dec = b85_decode(b85_encode(data))
        assert dec[: len(data)] == data and not any(dec[len(data) :])
    with pytest.raises(ValueError):
        b85_decode("abcd")  # not a multiple of 5
    with pytest.raises(ValueError):
        b85_decode('"""""')  # digit outside the RFC 1924 alphabet
    with pytest.raises(ValueError):
        b85_decode("~~~~~")  # group > 0xFFFFFFFF


# ------------------------------------------------------------- roaring


def test_roaring_all_container_kinds_roundtrip():
    rng = random.Random(11)
    for trial in range(60):
        kind = trial % 4
        vals = set()
        if kind == 0:  # sparse arrays
            vals.update(rng.randrange(1 << 20) for _ in range(150))
        elif kind == 1:  # dense chunk -> bitmap container
            vals.update(rng.sample(range(65536), 5000))
        elif kind == 2:  # contiguous -> run containers
            s = rng.randrange(1 << 18)
            vals.update(range(s, s + 2500))
        else:  # mixture across keys
            vals.update(range(100, 5000))
            vals.update((7 << 16) + v for v in rng.sample(range(65536), 4500))
        vals = sorted(vals)
        blob = roaring_encode(vals)
        out, end = roaring_decode(blob)
        assert out == vals and end == len(blob)


def test_roaring_container_choice_follows_size_rule():
    # one 2500-long run: run container (2+4 bytes) beats array (5000)
    blob = roaring_encode(list(range(2500)))
    (cookie,) = struct.unpack_from("<H", blob, 0)
    assert cookie == 12347
    # 5000 scattered (even) values: no run wins; bitmap (card > 4096)
    blob = roaring_encode(list(range(0, 10000, 2)))
    (cookie,) = struct.unpack_from("<H", blob, 0)
    assert cookie == 12346


def test_rbm_array_64bit_and_flips():
    vals = sorted(
        set(
            [5, 100, (1 << 32) + 3, (1 << 32) + 4, (1 << 33) + 7]
            + list(range(1000, 1500))
        )
    )
    blob = rbm_array_encode(vals)
    assert rbm_array_decode(blob) == vals
    for pos in range(len(blob)):
        b = bytearray(blob)
        b[pos] ^= 0xFF
        try:
            assert rbm_array_decode(bytes(b)) != vals
        except ValueError:
            pass


# ------------------------------------------------- merge-on-read scan


@pytest.mark.parametrize("i", [1, 2, 3, 4, 5, 7, 8, 16, 29, 58, 101])
def test_mor_scan_matches_formula(i):
    st = scan_delta_table_mor(_make_delta_dv_table(i))
    m = 2 + i % 3
    deleted = live = ks = 0
    for f in range(m):
        rows = _file_rows(i, f)
        has_dv = not (f == m - 1 and i % 2 == 0)
        dels = set(_deleted(i, f, rows)) if has_dv else set()
        deleted += len(dels)
        live += rows - len(dels)
        ks += sum(_k_val(i, f, j) for j in range(rows) if j not in dels)
    assert st == {
        "n_commits": 3,
        "live_files": m,
        "dv_count": m - (1 if i % 2 == 0 else 0),
        "deleted_rows": deleted,
        "live_rows": live,
        "k_sum": ks,
    }


def test_dv_crc_flip_and_cardinality_lie_degrade():
    for i in (13, 26, 39):  # CRC flip inside the FINAL DV's bitmap
        assert scan_delta_table_mor(_make_delta_dv_table(i)) is None
    for i in (9, 18, 27):  # descriptor cardinality overstated by one
        assert scan_delta_table_mor(_make_delta_dv_table(i)) is None


def test_dv_without_protocol_feature_refuses():
    blob = bytearray(_make_delta_dv_table(1))
    # downgrade the declared reader feature; the replay must refuse
    # a DV-bearing table that never declared deletionVectors
    patched = bytes(blob).replace(
        b'"readerFeatures": ["deletionVectors"]', b'"readerFeatures": []'
    )
    assert scan_delta_table_mor(patched) is None


def test_crc_is_what_catches_the_flip():
    # reproduce the resolve chain by hand: the flipped byte leaves
    # every framing field (version, size, offset) intact
    blob = _make_delta_dv_table(13)
    from gmall_flink_210726_spark.operators.wds import _iter_tar_members

    dv_files = [
        p
        for n, p in _iter_tar_members(blob)
        if "deletion_vector_" in n
    ]
    assert len(dv_files) == 1 and dv_files[0][0] == 1
    # first DV entry still frames correctly: size word + crc present
    (size0,) = struct.unpack_from(">I", dv_files[0], 1)
    data0 = dv_files[0][5 : 5 + size0]
    (crc0,) = struct.unpack_from(">I", dv_files[0], 5 + size0)
    assert zlib.crc32(data0) == crc0  # the UNTOUCHED partial DV

"""CBOR (RFC 8949) decode/encode: Appendix A vectors, round-trip
fuzz, strictness, and the record-sequence walk. No Spark."""

from __future__ import annotations

import math
import random

import pytest

from gmall_flink_210726_spark.operators.cbor import (
    _HALF_X4,
    _make_cbor_blob,
    cbor_dumps,
    cbor_loads,
    cbor_sequence,
    read_cbor_records,
    Tag,
    UNDEFINED,
)

_APPENDIX_A = [
    ("00", 0), ("01", 1), ("0a", 10), ("17", 23), ("1818", 24),
    ("1903e8", 1000), ("1a000f4240", 1000000),
    ("1b000000e8d4a51000", 1000000000000),
    ("20", -1), ("29", -10), ("3863", -100), ("3903e7", -1000),
    ("f90000", 0.0), ("f93c00", 1.0), ("fb3ff199999999999a", 1.1),
    ("f93e00", 1.5), ("f97bff", 65504.0), ("fa47c35000", 100000.0),
    ("f90001", 5.960464477539063e-08), ("f9c400", -4.0),
    ("f4", False), ("f5", True), ("f6", None),
    ("40", b""), ("4401020304", b"\x01\x02\x03\x04"),
    ("60", ""), ("6161", "a"), ("6449455446", "IETF"),
    ('62225c', '"\\'), ("80", []), ("83010203", [1, 2, 3]),
    ("8301820203820405", [1, [2, 3], [4, 5]]),
    ("a0", {}), ("a201020304", {1: 2, 3: 4}),
    ("a26161016162820203", {"a": 1, "b": [2, 3]}),
    ("c11a514b67b0", Tag(1, 1363896240)),
    ("7f657374726561646d696e67ff", "streaming"),
    ("9fff", []), ("9f018202039f0405ffff", [1, [2, 3], [4, 5]]),
    ("bf61610161629f0203ffff", {"a": 1, "b": [2, 3]}),
]


@pytest.mark.parametrize("hx,want", _APPENDIX_A)
def test_rfc8949_appendix_a(hx, want):
    assert cbor_loads(bytes.fromhex(hx)) == want


def test_half_float_specials():
    assert cbor_loads(bytes.fromhex("f97c00")) == float("inf")
    assert cbor_loads(bytes.fromhex("f9fc00")) == float("-inf")
    assert math.isnan(cbor_loads(bytes.fromhex("f97e00")))


def test_roundtrip_fuzz():
    rng = random.Random(2)

    def rand_val(d=0):
        k = rng.randrange(10 if d < 3 else 6)
        if k == 0:
            return rng.randrange(-(10**12), 10**12)
        if k == 1:
            return bytes(rng.randrange(256) for _ in range(rng.randrange(20)))
        if k == 2:
            return "".join(rng.choice("abcé中") for _ in range(rng.randrange(12)))
        if k == 3:
            return rng.choice([True, False, None, UNDEFINED])
        if k == 4:
            return float(rng.randrange(-1000, 1000)) / 4
        if k == 5:
            return rng.random()
        if k == 6:
            return [rand_val(d + 1) for _ in range(rng.randrange(5))]
        if k == 7:
            return {f"k{j}": rand_val(d + 1) for j in range(rng.randrange(4))}
        if k == 8:
            return Tag(rng.randrange(100), rand_val(d + 1))
        return rng.randrange(2**63, 2**64)

    for _ in range(500):
        v = rand_val()
        for ind in (False, True):
            assert cbor_loads(cbor_dumps(v, ind)) == v


@pytest.mark.parametrize(
    "hx",
    [
        "1817",  # non-minimal 1-byte width
        "190017",  # non-minimal 2-byte width
        "ff",  # break outside a container
        "a101",  # unpaired map key
        "5f6161ff",  # text chunk inside an indefinite byte string
        "0000",  # trailing bytes
        "1c",  # reserved additional info
        "f801",  # invalid two-byte simple value
        "61",  # truncated text
    ],
)
def test_strictness(hx):
    with pytest.raises(ValueError):
        cbor_loads(bytes.fromhex(hx))


def test_sequence():
    blob = cbor_dumps(1) + cbor_dumps("two") + cbor_dumps([3])
    assert cbor_sequence(blob) == [1, "two", [3]]
    with pytest.raises(ValueError):
        cbor_sequence(b"")


@pytest.mark.parametrize("i", [1, 2, 3, 5, 7, 16, 29, 58, 101])
def test_records_walk_matches_formula(i):
    st = read_cbor_records(_make_cbor_blob(i))
    nr = 2 + i % 4
    assert st == {
        "n_records": nr,
        "id_sum": sum(100 * i + j for j in range(nr)),
        "neg_sum": sum(-((i + j) % 50) - 1 for j in range(nr)),
        "tag_text_len": sum(
            sum(len(f"t{(i + j + k) % 20}") for k in range(1 + (i + j) % 3))
            for j in range(nr)
        ),
        "blob_len_sum": sum(5 + (i + j) % 9 for j in range(nr)),
        "ts_sum": sum(1700000000 + i + j for j in range(nr)),
        "half_x4_sum": sum(_HALF_X4[(i + j) % 4] for j in range(nr)),
        "n_true": sum((i + j) % 3 == 0 for j in range(nr)),
        "n_null": sum((i + j) % 3 == 2 for j in range(nr)),
    }


def test_records_degrade_stripes():
    for i in (13, 26, 0, 9, 18):
        assert read_cbor_records(_make_cbor_blob(i)) is None


def test_duplicate_map_keys_refused():
    import pytest as _pytest
    from gmall_flink_210726_spark.operators.cbor import cbor_loads

    # {1: 2, 1: 3} definite, and the indefinite twin — RFC 8949 §5.6
    with _pytest.raises(ValueError, match="duplicate map key"):
        cbor_loads(bytes.fromhex("a2010201 03".replace(" ", "")))
    with _pytest.raises(ValueError, match="duplicate map key"):
        cbor_loads(bytes.fromhex("bf0102010 3ff".replace(" ", "")))

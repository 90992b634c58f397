"""Parquet split-block bloom filters: the hand XXH64 pinned against
Spark's JVM xxhash64 and the reference vectors, the SBBF block math,
the hand Thrift-compact writer validated by pyarrow reading the file
back, and the skipping walk's full trust chain."""

from __future__ import annotations

import io
import struct

import pyarrow.parquet as pq
import pytest

from gmall_flink_210726_spark.operators.pqbloom import (
    _bloom_params,
    _h_int64,
    _make_parquet_bloom,
    read_parquet_bloom_lookup,
    sbbf_check,
    sbbf_insert,
    write_parquet_bloom,
    xxh64,
)

# ------------------------------------------------------------- XXH64


def test_xxh64_reference_vectors():
    # the xxHash repository's published seed-0 vectors
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"abc") == 0x44BC2CF5AD770999


def test_xxh64_against_spark_jvm(spark):
    """Spark's xxhash64 over BinaryType is XXH64 with seed 42 — an
    independent JVM implementation covering every tail length and
    the >=32-byte accumulator path."""
    import pyspark.sql.functions as F

    payloads = [bytes(range(n)) for n in range(0, 70)] + [
        b"\xff" * 33,
        b"parquet split block bloom filter test payload exceeding "
        b"thirty-two bytes",
    ]
    df = spark.createDataFrame(
        [(p,) for p in payloads], "b binary"
    ).select(F.xxhash64("b").alias("h"))
    jvm = [r.h for r in df.collect()]
    ours = [
        v - (1 << 64) if (v := xxh64(p, 42)) >= (1 << 63) else v
        for p in payloads
    ]
    assert jvm == ours


# -------------------------------------------------------------- SBBF


def test_sbbf_insert_check_roundtrip():
    bitset = bytearray(32 * 4)
    hashes = [_h_int64(v) for v in range(100)]
    for h in hashes:
        sbbf_insert(bitset, h)
    assert all(sbbf_check(bytes(bitset), h) for h in hashes)
    # sparsely-filled filter: far values overwhelmingly absent
    misses = sum(
        sbbf_check(bytes(bitset), _h_int64(v))
        for v in range(10_000, 10_200)
    )
    assert misses <= 3


def test_sbbf_single_block_masks_eight_words():
    bitset = bytearray(32)
    sbbf_insert(bitset, _h_int64(7))
    words = struct.unpack("<8I", bytes(bitset))
    # one bit in each of the eight 32-bit words
    assert all(bin(w).count("1") == 1 for w in words)


# ------------------------------------------------- hand writer layer


def test_pyarrow_reads_handwritten_file():
    groups = [[1, 2, 3, 4], [100, 200, 300, 400], [7, 7, 7, 7]]
    blob = write_parquet_bloom(groups, 2)
    t = pq.read_table(io.BytesIO(blob))
    assert t.column("k").to_pylist() == [v for g in groups for v in g]
    md = pq.ParquetFile(io.BytesIO(blob)).metadata
    assert md.num_row_groups == 3


def test_walk_skips_absent_and_finds_present():
    groups = [[10, 20, 30], [40, 50, 60], [70, 80, 90]]
    blob = write_parquet_bloom(groups, 2)
    st = read_parquet_bloom_lookup(blob, 50)
    assert st is not None
    assert st["n_found"] == 1 and st["found_group"] == 1
    assert st["n_maybe"] >= 1 and st["n_groups"] == 3
    absent = read_parquet_bloom_lookup(blob, 555)
    assert absent is not None and absent["n_found"] == 0
    assert absent["found_group"] == -1


def test_length_lie_refused():
    groups = [[1, 2], [3, 4]]
    blob = write_parquet_bloom(groups, 2, len_lie_group=1)
    assert read_parquet_bloom_lookup(blob, 3) is None


def test_false_negative_lie_caught_when_group_read():
    groups = [[10, 20, 30], [40, 50, 60]]
    blob = write_parquet_bloom(
        groups, 2, clear_value=(1, 60), keep_value=50
    )
    # probe 50 opens group 1; the re-probe of 60 must catch the lie
    assert read_parquet_bloom_lookup(blob, 50) is None
    # an honest file with the same shape passes
    honest = write_parquet_bloom(groups, 2)
    assert read_parquet_bloom_lookup(honest, 50) is not None


def test_truncation_refused():
    blob = write_parquet_bloom([[1, 2, 3]], 2)
    assert read_parquet_bloom_lookup(blob[:-1], 1) is None
    assert read_parquet_bloom_lookup(blob[4:], 1) is None


# ------------------------------------------------------ fixture walk


@pytest.mark.parametrize("i", [1, 2, 3, 4, 5, 7, 9, 11, 13, 63, 137])
def test_fixture_matches_formula(i):
    g, _nb, q, present = _bloom_params(i)
    st = read_parquet_bloom_lookup(_make_parquet_bloom(i), q)
    if i % 7 == 0 or i % 9 == 0:
        assert st is None
        return
    assert st is not None and st["n_groups"] == g
    assert st["n_found"] == (1 if present else 0)
    assert st["n_maybe"] == st["n_found"]  # no false positives
    if present:
        fg = (i % 137) % g
        assert st["found_group"] == fg
        assert st["k_sum_read"] == 1000 * (24 * fg + 276 * g) + 24 * i


def test_no_false_positive_over_driver_id_range():
    """The oracle equates n_maybe with presence — legal only because
    the fixture filters are measured false-positive-free over every
    doc_id the driver ever feeds (0..4999 covers sf0.001/0.01/0.1;
    spot stride here, the exhaustive sweep ran at build time)."""
    for i in range(0, 5000, 97):
        if i % 7 == 0 or i % 9 == 0:
            continue
        g, _nb, q, present = _bloom_params(i)
        st = read_parquet_bloom_lookup(_make_parquet_bloom(i), q)
        assert st is not None
        assert st["n_maybe"] == (1 if present else 0), i


def test_sbbf_reads_parquet_mr_written_blooms(spark):
    """Cross-writer validation: Spark's parquet-mr writes real SBBF
    sections (only when the column falls back from dictionary
    encoding, hence the high-cardinality values); the hand header
    parse + xxh64 + block check must accept every written value and
    reject values outside the written set (up to the bloom's tiny
    FPP)."""
    import glob
    import struct as _struct
    import tempfile

    from gmall_flink_210726_spark.operators.parquetmeta import (
        _read_struct,
        _Reader,
    )

    d = tempfile.mkdtemp(prefix="sparkbloom_")
    (
        spark.range(0, 400000)
        .selectExpr("id * 2654435761 as k")
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#k", "true")
        .parquet(d)
    )
    f = glob.glob(d + "/*.parquet")[0]
    data = open(f, "rb").read()
    (flen,) = _struct.unpack_from("<I", data, len(data) - 8)
    meta = _read_struct(
        _Reader(data, len(data) - 8 - flen, len(data) - 8)
    )
    cm = meta[4][0][1][0][3]
    bf_off, bf_len = cm[14], cm[15]
    r = _Reader(data, bf_off, len(data))
    hdr = _read_struct(r)
    nbytes = hdr[1]
    assert (r.pos - bf_off) + nbytes == bf_len
    for fid in (2, 3, 4):  # BLOCK / XXHASH / UNCOMPRESSED unions
        assert isinstance(hdr[fid], dict) and 1 in hdr[fid]
    bitset = data[r.pos : r.pos + nbytes]
    # every written value must probe positive (no false negatives)
    for i in range(0, 400000, 1777):
        assert sbbf_check(bitset, _h_int64(i * 2654435761))
    # unwritten values overwhelmingly probe negative
    fp = sum(
        sbbf_check(bitset, _h_int64(v)) for v in range(1, 500, 2)
    )
    assert fp <= 2


# --------------------------------------------------- BYTE_ARRAY keys


def test_string_bloom_fixture_and_stripes():
    from gmall_flink_210726_spark.operators.pqbloom import (
        _bloom_str_params,
        _make_parquet_bloom_str,
        read_parquet_bloom_lookup,
    )

    skipped = total = 0
    for i in range(1, 80):
        g, _nb, q, present = _bloom_str_params(i)
        st = read_parquet_bloom_lookup(
            _make_parquet_bloom_str(i), q, ptype=6
        )
        if i % 7 == 0 or i % 9 == 0:
            assert st is None, i
            continue
        assert st is not None, i
        assert st["n_groups"] == g
        assert st["n_found"] == (1 if present else 0)
        if present:
            assert st["found_group"] == (i % 137) % g
        skipped += st["n_skipped"]
        total += st["n_groups"]
    # strings have no usable min/max: the bloom must do the skipping
    assert skipped / total > 0.6, (skipped, total)


def test_string_bloom_false_negative_lie_caught():
    from gmall_flink_210726_spark.operators.pqbloom import (
        read_parquet_bloom_lookup,
        write_parquet_bloom,
    )

    groups = [[b"u/a", b"u/b", b"u/c"], [b"u/d", b"u/e", b"u/f"]]
    blob = write_parquet_bloom(
        groups, 2, clear_value=(1, b"u/f"), keep_value=b"u/e"
    )
    assert read_parquet_bloom_lookup(blob, b"u/e", ptype=6) is None
    honest = write_parquet_bloom(groups, 2)
    st = read_parquet_bloom_lookup(honest, b"u/e", ptype=6)
    assert st is not None and st["found_group"] == 1


def test_pyarrow_reads_handwritten_string_file():
    import pyarrow.parquet as _pq

    from gmall_flink_210726_spark.operators.pqbloom import (
        write_parquet_bloom,
    )

    groups = [[b"alpha", b"beta"], [b"gamma", b"delta"]]
    blob = write_parquet_bloom(groups, 2)
    t = _pq.read_table(io.BytesIO(blob))
    assert t.column("k").to_pylist() == [
        b"alpha", b"beta", b"gamma", b"delta"
    ]


def test_sbbf_reads_parquet_mr_written_string_blooms(spark):
    """The BYTE_ARRAY hash convention (raw bytes, no length prefix)
    pinned against parquet-mr's string blooms."""
    import glob
    import struct as _struct
    import tempfile

    from gmall_flink_210726_spark.operators.parquetmeta import (
        _read_struct,
        _Reader,
    )

    d = tempfile.mkdtemp(prefix="sparkbloomstr_")
    (
        spark.range(0, 300000)
        .selectExpr("concat('url/', cast(id * 48271 as string)) as k")
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#k", "true")
        .parquet(d)
    )
    f = glob.glob(d + "/*.parquet")[0]
    data = open(f, "rb").read()
    (flen,) = _struct.unpack_from("<I", data, len(data) - 8)
    meta = _read_struct(
        _Reader(data, len(data) - 8 - flen, len(data) - 8)
    )
    cm = meta[4][0][1][0][3]
    assert 14 in cm, "no bloom written (dictionary did not fall back)"
    r = _Reader(data, cm[14], len(data))
    hdr = _read_struct(r)
    bitset = data[r.pos : r.pos + hdr[1]]
    from gmall_flink_210726_spark.operators.pqbloom import (
        _h_bytes,
        sbbf_check,
    )

    for i in range(0, 300000, 1333):
        assert sbbf_check(
            bitset, _h_bytes(f"url/{i * 48271}".encode())
        ), i
    fp = sum(
        sbbf_check(bitset, _h_bytes(f"url/x{v}".encode()))
        for v in range(250)
    )
    assert fp <= 2

"""ORC DECIMAL/TIMESTAMP columns and the stripe ROW_INDEX, decoded
from scratch and pinned against real pyarrow.orc writes. No Spark."""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.orc as orc_mod
import pytest

from gmall_flink_210726_spark.operators.orc2 import (
    _dec_str,
    _dec_ts_rows,
    _make_orc_dec,
    _make_orc_rowindex,
    _parse_nanos,
    _rowindex_params,
    read_orc_dec_ts,
    read_orc_rowindex,
)

# -------------------------------------------------- decimal rendering


def test_dec_str_matches_orc_statistics_style():
    assert _dec_str(19119, 2) == "191.19"
    assert _dec_str(19190, 2) == "191.9"
    assert _dec_str(0, 2) == "0"
    assert _dec_str(-350, 2) == "-3.5"
    assert _dec_str(5, 2) == "0.05"
    assert _dec_str(7, 0) == "7"


def test_parse_nanos_trailing_zero_classes():
    # encode rule: tz > 1 -> (nanos / 10^tz) << 3 | (tz - 1)
    assert _parse_nanos(0) == 0
    assert _parse_nanos((5 << 3) | 7) == 500_000_000
    assert _parse_nanos(123_456_789 << 3) == 123_456_789
    assert _parse_nanos((1 << 3) | 2) == 1_000
    assert _parse_nanos((25 << 3) | 6) == 250_000_000


# ----------------------------------------------------- dec/ts fixture


@pytest.mark.parametrize("i", [1, 2, 3, 4, 5, 6, 7, 10, 23, 46])
def test_dec_ts_matches_formula(i):
    st = read_orc_dec_ts(_make_orc_dec(i))
    if i % 23 == 0:
        assert st is None
        return
    assert st is not None
    n = 1500 + (i % 4) * 400
    mants, secs, nanos = _dec_ts_rows(i, n)
    assert st["n_rows"] == n and st["scale"] == 2
    assert st["dec_sum_mant"] == sum(mants)
    assert st["dec_min_mant"] == min(mants)
    assert st["dec_max_mant"] == max(mants)
    ms = [(s * 10**9 + ns) // 10**6 for s, ns in zip(secs, nanos)]
    assert st["ts_min_ms"] == min(ms) and st["ts_max_ms"] == max(ms)
    assert st["ns_sum"] == sum(nanos)
    assert st["n_stripes"] >= 1


def test_dec_ts_multistripe_and_codecs():
    seen = set()
    for i in range(1, 11):
        st = read_orc_dec_ts(_make_orc_dec(i))
        if st is not None:
            seen.add(st["compression"])
            if st["compression"] == "none":
                # uncompressed ids cross the 4 KiB stripe threshold
                assert st["n_stripes"] > 1
    assert {"none", "zlib", "snappy", "zstd", "lz4"} <= seen


def test_dec_stats_lie_caught():
    """A cooked DecimalStatistics sum string must degrade — rewrite
    the footer's sum in place (same length) and re-read."""
    blob = bytearray(_make_orc_dec(5))  # uncompressed id
    st = read_orc_dec_ts(bytes(blob))
    assert st is not None
    from gmall_flink_210726_spark.operators.orc2 import _dec_str

    target = _dec_str(st["dec_sum_mant"], 2).encode()
    idx = bytes(blob).rindex(target)
    cooked = bytearray(target)
    cooked[0] = cooked[0] ^ 1 if cooked[0:1] != b"-" else cooked[0]
    if cooked == target:
        cooked[1] ^= 1
    blob[idx : idx + len(target)] = cooked
    assert read_orc_dec_ts(bytes(blob)) is None


def test_dec_truncation_refused():
    blob = _make_orc_dec(1)
    assert read_orc_dec_ts(blob[:-1]) is None
    assert read_orc_dec_ts(blob[1:]) is None


# -------------------------------------------------------- row index


@pytest.mark.parametrize(
    "i", [1, 2, 3, 4, 5, 7, 19, 29, 38, 58, 100, 251, 280]
)
def test_rowindex_matches_formula(i):
    n, lo, hi = _rowindex_params(i)
    st = read_orc_rowindex(_make_orc_rowindex(i), lo, hi)
    if i % 19 == 0 or i % 29 == 0:
        assert st is None
        return
    assert st is not None
    vals = [300 * (r // 1000) + (i + 7 * r) % 251 for r in range(n)]
    nst = -(-n // 1000)
    sel = [
        k
        for k in range(nst)
        if not (
            min(vals[k * 1000 : (k + 1) * 1000]) > hi
            or max(vals[k * 1000 : (k + 1) * 1000]) < lo
        )
    ]
    match = [
        v
        for k in sel
        for v in vals[k * 1000 : (k + 1) * 1000]
        if lo <= v <= hi
    ]
    assert st["n_strides"] == nst and st["n_sel"] == len(sel)
    assert st["n_skipped"] == nst - len(sel)
    assert st["n_match"] == len(match)
    assert st["match_sum"] == sum(match)


def test_rowindex_pure_skip_reads_nothing():
    """A window past every stride's band selects zero strides — the
    read that at 100 TB touches only index bytes."""
    found = False
    for i in range(1, 400):
        if i % 19 == 0 or i % 29 == 0:
            continue
        n, lo, hi = _rowindex_params(i)
        st = read_orc_rowindex(_make_orc_rowindex(i), lo, hi)
        assert st is not None
        if st["n_sel"] == 0:
            assert st["n_match"] == 0 and st["match_sum"] == 0
            found = True
    assert found


def test_rowindex_positions_proven_against_run_boundaries():
    """A pyarrow file with many runs: every entry's positions must
    land on a decode-derived run boundary (lie ids prove the check
    bites — covered by the 19/29 stripes above)."""
    n = 5000
    vals = [300 * (r // 1000) + (3 + 7 * r) % 251 for r in range(n)]
    buf = io.BytesIO()
    orc_mod.write_table(
        pa.table({"k": pa.array(vals, pa.int64())}),
        buf,
        compression="uncompressed",
        row_index_stride=1000,
    )
    st = read_orc_rowindex(buf.getvalue(), 0, 10**9)
    assert st is not None and st["n_strides"] == 5
    assert st["n_sel"] == 5 and st["n_match"] == n


def test_rowindex_truncation_refused():
    blob = _make_orc_rowindex(1)
    _n, lo, hi = _rowindex_params(1)
    assert read_orc_rowindex(blob[:-1], lo, hi) is None


# ------------------------------------------------------ bloom filters


def test_orc_long_hash_convention_pinned_against_writer():
    """Single-value files isolate each value's k probe positions;
    the signed-Wang + Kirsch-Mitzenmacher convention must reproduce
    the writer's bits exactly (including the 0 -> bit 0 edge)."""
    import pyarrow as pa

    from gmall_flink_210726_spark.operators.orc import (
        _pb_fields,
        _unframe,
    )
    from gmall_flink_210726_spark.operators.orc2 import (
        orc_bloom_positions,
    )

    def writer_bits(v):
        buf = io.BytesIO()
        orc_mod.write_table(
            pa.table({"k": pa.array([v] * 50, pa.int64())}),
            buf,
            compression="uncompressed",
            row_index_stride=1000,
            bloom_filter_columns=[1],
            bloom_filter_fpp=0.05,
        )
        data = buf.getvalue()
        ps_len = data[-1]
        ps = _pb_fields(data[-1 - ps_len : -1])
        flen = ps[1][0]
        foot = _pb_fields(
            _unframe(data[len(data) - 1 - ps_len - flen : -1 - ps_len], 0)
        )
        st = _pb_fields(foot[3][0])
        off, ilen, dlen, sflen = (st[k][0] for k in (1, 2, 3, 4))
        sf = _pb_fields(
            _unframe(
                data[off + ilen + dlen : off + ilen + dlen + sflen], 0
            )
        )
        pos = off
        for sb in sf.get(1, []):
            sd = _pb_fields(sb)
            kind, col, ln = (
                sd.get(1, [0])[0],
                sd.get(2, [0])[0],
                sd.get(3, [0])[0],
            )
            if kind == 8 and col == 1:
                bf = _pb_fields(_pb_fields(data[pos : pos + ln])[1][0])
                return bf[1][0], bf[3][0]
            pos += ln

    for v in (0, 1, 2, 37, -1, 251, 123456789):
        k, bits = writer_bits(v)
        got = sorted(
            i
            for i in range(len(bits) * 8)
            if (bits[i >> 3] >> (i & 7)) & 1
        )
        assert got == sorted(
            set(orc_bloom_positions(v, k, len(bits) * 8))
        ), v


@pytest.mark.parametrize("i", [1, 2, 3, 4, 5, 7, 19, 23, 38, 46, 100])
def test_bloom_fixture_matches_formula(i):
    from gmall_flink_210726_spark.operators.orc2 import (
        _make_orc_bloom,
        _orc_bloom_params,
        read_orc_bloom_lookup,
    )

    n, q, present = _orc_bloom_params(i)
    st = read_orc_bloom_lookup(_make_orc_bloom(i), q)
    if i % 19 == 0 or i % 23 == 0:
        assert st is None
        return
    assert st is not None
    nst = -(-n // 1000)
    s_target = i % nst
    qr = (i * 13) % 260
    exp = (
        sum(
            1
            for r in range(
                s_target * 1000, min(s_target * 1000 + 1000, n)
            )
            if (i + 7 * r) % 251 == qr
        )
        if present
        else 0
    )
    assert st["n_found"] == exp
    assert st["found_stride"] == (s_target if exp else -1)


def test_bloom_actually_skips_on_same_band_strides():
    """Every stride spans the same numeric band, so min/max could
    never skip — the bloom must. Pin a healthy measured skip rate."""
    from gmall_flink_210726_spark.operators.orc2 import (
        _make_orc_bloom,
        _orc_bloom_params,
        read_orc_bloom_lookup,
    )

    skipped = total = 0
    for i in range(1, 60):
        if i % 19 == 0 or i % 23 == 0:
            continue
        n, q, _present = _orc_bloom_params(i)
        st = read_orc_bloom_lookup(_make_orc_bloom(i), q)
        assert st is not None
        skipped += st["n_strides"] - st["n_maybe"]
        total += st["n_strides"]
    assert skipped / total > 0.5, (skipped, total)


class TestDoubleBinary:
    """FLOAT/DOUBLE/BINARY columns: IEEE LE streams, RLEv2 length
    tiling, DoubleStatistics bit-exact cross-checks."""

    def test_roundtrip_against_real_writer(self):
        from gmall_flink_210726_spark.operators.orc2 import (
            _bin_rows,
            _dbl_rows,
            _make_orc_double,
            read_orc_double_bin,
        )

        for i in (1, 2, 3, 4, 5, 9):
            st = read_orc_double_bin(_make_orc_double(i))
            assert st is not None, i
            n = 1200 + (i % 4) * 300
            mf, mx = _dbl_rows(i, n)
            assert st["n_rows"] == n
            assert st["f_sum"] == sum(mf) / 64  # bit-exact
            assert st["x_sum"] == sum(mx) / 64
            assert st["x_min"] == min(mx) / 64
            assert st["x_max"] == max(mx) / 64
            bs = _bin_rows(i, n)
            assert st["blen_sum"] == sum(len(b) for b in bs)
            assert st["bsum"] == sum(sum(b) for b in bs)
            # the 4 KiB stripe budget is checked against COMPRESSED
            # bytes, so only the uncompressed rotation reliably
            # splits into several stripes
            assert st["n_stripes"] >= (6 if i == 5 else 1), i

    def test_corrupt_stripe_degrades(self):
        from gmall_flink_210726_spark.operators.orc2 import (
            _make_orc_double,
            read_orc_double_bin,
        )

        for i in (0, 21, 42, 63):
            assert read_orc_double_bin(_make_orc_double(i)) is None, i

    def test_lying_double_stats_caught(self):
        """Flip one bit of the footer DoubleStatistics sum: the file
        stays structurally valid and only the books catch it."""
        import struct

        from gmall_flink_210726_spark.operators.orc2 import (
            _make_orc_double,
            _pb_fields,
            _unframe,
            read_orc_double_bin,
        )

        blob = bytearray(_make_orc_double(5))  # i%5==0 -> uncompressed
        assert read_orc_double_bin(bytes(blob)) is not None
        data = bytes(blob)
        ps_len = data[-1]
        ps = _pb_fields(data[-1 - ps_len : -1])
        flen = ps[1][0]
        foot_at = len(data) - 1 - ps_len - flen
        # uncompressed footer: find the fixed64 sum of column 2 (x)
        # by scanning for its exact little-endian image
        from gmall_flink_210726_spark.operators.orc2 import _dbl_rows

        n = 1200 + (5 % 4) * 300
        _, mx = _dbl_rows(5, n)
        want = struct.pack("<d", sum(mx) / 64)
        at = data.find(want, foot_at)
        assert at > 0
        blob[at] ^= 0x01
        assert read_orc_double_bin(bytes(blob)) is None

"""Parquet page-index scan: ColumnIndex/OffsetIndex walk, page-level
skipping, lying-index detection. Pure-python over real pyarrow
``write_page_index=True`` files — no Spark session needed."""

from __future__ import annotations

import struct

import pytest

from gmall_flink_210726_spark.operators.pageindex import (
    _make_parquet_pageindex,
    _predicate,
    read_parquet_page_index,
)
from gmall_flink_210726_spark.operators.parquetmeta import (
    _read_struct,
    _Reader,
)


def _expected(i: int) -> dict:
    n = 64 + 16 * (i % 5)
    lo, hi = _predicate(i)
    vals = [(i + 7 * j) % 997 for j in range(n)]
    pages = [vals[p * 16 : (p + 1) * 16] for p in range(n // 16)]
    sel = [p for p in pages if max(p) >= lo and min(p) <= hi]
    return {
        "n_row_groups": -(-n // 48),
        "n_pages": n // 16,
        "n_pages_read": len(sel),
        "rows_read": 16 * len(sel),
        "match_count": sum(1 for v in vals if lo <= v <= hi),
        "match_sum": sum(v for v in vals if lo <= v <= hi),
    }


@pytest.mark.parametrize("i", [1, 2, 3, 5, 7, 16, 29, 40, 58, 101])
def test_selective_scan_matches_formula(i):
    st = read_parquet_page_index(_make_parquet_pageindex(i), *_predicate(i))
    assert st == _expected(i)


def test_pages_actually_skipped():
    tot = read = 0
    for i in range(1, 120):
        if i % 13 == 0 or i % 11 == 0:
            continue
        st = read_parquet_page_index(
            _make_parquet_pageindex(i), *_predicate(i)
        )
        tot += st["n_pages"]
        read += st["n_pages_read"]
    assert read < tot * 0.7  # the index must be pruning, not decoration


def test_lying_index_caught_only_when_page_is_read():
    # the lie stripe (i % 11 == 0) inflates a raw value so the decoded
    # max exceeds the index claim; under the forced full-range
    # predicate the page is opened and the lie must degrade the file
    for i in (11, 22, 33):
        assert (
            read_parquet_page_index(
                _make_parquet_pageindex(i), *_predicate(i)
            )
            is None
        )
    # the same lying file under a predicate that SKIPS page 0 decodes
    # "fine" — a lie about an unread page is invisible by construction
    data = _make_parquet_pageindex(11)
    vals = [(11 + 7 * j) % 997 for j in range(64 + 16 * (11 % 5))]
    p0max = max(vals[:16])
    st = read_parquet_page_index(data, p0max + 1, p0max + 1)
    assert st is not None and st["n_pages_read"] < st["n_pages"]


def test_smashed_column_index_degrades():
    for i in (13, 26, 52):
        assert (
            read_parquet_page_index(
                _make_parquet_pageindex(i), *_predicate(i)
            )
            is None
        )


def test_list_bool_elements_decode_as_bytes():
    # compact-protocol containers carry bools as standalone 0x01/0x02
    # bytes; null_pages is the real-world shape that exercises it
    data = _make_parquet_pageindex(1)
    (flen,) = struct.unpack_from("<I", data, len(data) - 8)
    meta = _read_struct(_Reader(data, len(data) - 8 - flen, len(data) - 8))
    cc = meta[4][0][1][0]
    ci = _read_struct(_Reader(data, cc[6], cc[6] + cc[7]))
    assert ci[1] == [False, False, False]  # 48-row group, 16-row pages


def test_truncated_and_garbage_blobs_degrade():
    data = _make_parquet_pageindex(2)
    assert read_parquet_page_index(data[:40], 0, 996) is None
    assert read_parquet_page_index(b"PAR1" + b"\x00" * 20, 0, 996) is None

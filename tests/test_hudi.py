"""Hudi COW timeline replay (operators/hudi.py): completed-only
instants, latest-base-file-per-group, dirty-read and superseded-file
isolation, trust-chain refusals, timestamp-as-of."""

from __future__ import annotations

from gmall_flink_210726_spark.operators.hudi import (
    _T1,
    _hudi_rows,
    _make_hudi_table,
    read_hudi_snapshot,
)


class TestTimeline:
    def test_snapshot_totals(self):
        for i in (1, 2, 3, 4, 5):
            st = read_hudi_snapshot(_make_hudi_table(i))
            assert st is not None, i
            ng = 2 + i % 3
            has_t2 = i % 2 == 0
            rows = sum(
                len(_hudi_rows(i, g, 2 if has_t2 and g % 2 == 0 else 1))
                for g in range(ng)
            )
            assert st["total_rows"] == rows, i
            assert st["n_completed"] == 1 + int(has_t2)
            assert st["n_inflight"] == 1

    def test_inflight_and_superseded_never_read(self):
        blob = bytearray(_make_hudi_table(4))
        st0 = read_hudi_snapshot(bytes(blob))
        assert st0 is not None
        for name in (
            b"part/f0_0-0_20240103000000.parquet",  # inflight's file
            b"part/f0_0-0_20240101000000.parquet",  # superseded base
        ):
            b = bytes(blob)
            p = -1
            while True:
                p = b.find(name, p + 1)
                assert p >= 0, name
                if p % 512 == 0:  # the TAR header, not a JSON mention
                    break
            blob[p + 512 + 8 : p + 512 + 40] = b"\xde" * 32
        assert read_hudi_snapshot(bytes(blob)) == st0

    def test_trust_chain_refusals(self):
        # numWrites overstated (13th ids) / duplicate fileId (19th)
        for i in (13, 26, 19, 38):
            assert read_hudi_snapshot(_make_hudi_table(i)) is None, i

    def test_timestamp_as_of(self):
        st = read_hudi_snapshot(_make_hudi_table(2), asof=_T1)
        assert st is not None and st["n_completed"] == 1
        rows1 = sum(
            len(_hudi_rows(2, g, 1)) for g in range(2 + 2 % 3)
        )
        assert st["total_rows"] == rows1
        assert read_hudi_snapshot(
            _make_hudi_table(2), asof="20230101000000"
        ) is None


class TestBareInflightSpelling:
    def test_bare_inflight_counted(self):
        """Real Hudi names a commit-action inflight instant bare
        <ts>.inflight (no action infix) — counted too (ADVICE r13)."""
        import tarfile
        import io

        blob = _make_hudi_table(1)
        # append a bare-inflight member via the same tar helpers
        from gmall_flink_210726_spark.operators.tar import (
            _BLOCK,
            _make_header,
        )

        name = ".hoodie/20240104000000.inflight"
        payload = b"{}"
        pad = (-len(payload)) % _BLOCK
        extra = _make_header(name, len(payload)) + payload + b"\x00" * pad
        cooked = blob[: -2 * _BLOCK] + extra + b"\x00" * (2 * _BLOCK)
        st0 = read_hudi_snapshot(blob)
        st1 = read_hudi_snapshot(cooked)
        assert st0 is not None and st1 is not None
        assert st1["n_inflight"] == st0["n_inflight"] + 1
        assert st1["total_rows"] == st0["total_rows"]

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


class TestMorLogFormat:
    """HoodieLogFormat block replay (read_hudi_mor_snapshot)."""

    def _mk(self, i):
        from gmall_flink_210726_spark.operators.hudi import (
            _make_hudi_mor_table,
        )

        return _make_hudi_mor_table(i)

    def test_block_roundtrip(self):
        from gmall_flink_210726_spark.operators.hudi import (
            _BLK_AVRO,
            _mor_data_block,
            read_log_stream,
        )

        blk = _mor_data_block("20240102000000", [{"rk": 1, "k": 42}])
        got = read_log_stream(blk)
        assert got is not None
        blocks, nc = got
        assert nc == 0 and len(blocks) == 1
        assert blocks[0]["type"] == _BLK_AVRO

    def test_corrupt_frame_recovery(self):
        """A size-inconsistent frame is skipped to the next magic and
        counted — HoodieLogFileReader's recovery."""
        import struct

        from gmall_flink_210726_spark.operators.hudi import (
            _LOG_MAGIC,
            _mor_data_block,
            read_log_stream,
        )

        good = _mor_data_block("20240102000000", [{"rk": 0, "k": 7}])
        junk = _LOG_MAGIC + struct.pack(">Q", 5) + b"JUNK?"
        blocks, nc = read_log_stream(junk + good)
        assert nc == 1 and len(blocks) == 1
        # flipped total-length trailer -> corrupt too
        bad = bytearray(good)
        bad[-1] ^= 0x01
        blocks, nc = read_log_stream(bytes(bad) + good)
        assert nc == 1 and len(blocks) == 1

    def test_merge_model(self):
        """Merged totals equal the upsert/delete/rollback model for a
        spread of ids (the oracle's math)."""
        from gmall_flink_210726_spark.operators.hudi import (
            _mor_k,
            _mor_n,
            read_hudi_mor_snapshot,
        )

        for i in (1, 2, 3, 4, 7, 14, 19, 21, 38, 57):
            st = read_hudi_mor_snapshot(self._mk(i))
            assert st is not None, i
            ng = 2 + i % 3
            even = i % 2 == 0
            tr = ks = 0
            for g in range(ng):
                for r in range(_mor_n(i, g)):
                    if even and r % 4 == 1:
                        tr += 1
                        ks += _mor_k(i, g, r, 577)
                    elif r % 5 == 4:
                        continue
                    elif r % 3 == 0:
                        tr += 1
                        ks += _mor_k(i, g, r, 311)
                    else:
                        tr += 1
                        ks += _mor_k(i, g, r, 0)
            assert st["total_rows"] == tr, i
            assert st["k_sum"] == ks, i
            assert st["n_blocks"] == ng * (3 if even else 2), i
            assert st["n_corrupt"] == (1 if i % 7 == 0 else 0), i

    def test_rollback_neutralizes_orphan_blocks(self):
        """The T3 orphan data block (failed write, no timeline
        instant) must contribute nothing: its values differ from
        every applied value, so finding one would change k_sum."""
        from gmall_flink_210726_spark.operators.hudi import (
            read_hudi_mor_snapshot,
        )

        st = read_hudi_mor_snapshot(self._mk(2))
        assert st is not None
        # id 2 is even: T3 wrote salt-499 values for r%2==0; r=2 is
        # even, not r%4==1, not r%5==4 -> survives as base or T2
        # value, never the T3 one (proven via the totals model in
        # test_merge_model; here prove the block IS in the log)
        assert b"20240103000000" in self._mk(2)

    def test_future_instant_block_skipped(self):
        from gmall_flink_210726_spark.operators.hudi import (
            read_hudi_mor_snapshot,
        )

        # i=19: a data block stamped T9 (> latest completed) rides in
        # .log.1 and must not be applied or counted
        st = read_hudi_mor_snapshot(self._mk(19))
        assert st is not None
        assert st["n_blocks"] == (2 + 19 % 3) * 2

    def test_trust_refusals(self):
        from gmall_flink_210726_spark.operators.hudi import (
            read_hudi_mor_snapshot,
        )

        for i in (13, 26, 17, 34):  # size lie / count lie
            assert read_hudi_mor_snapshot(self._mk(i)) is None, i

    def test_asof_base_only(self):
        """As-of T1 sees the pure base files: no log block applied."""
        from gmall_flink_210726_spark.operators.hudi import (
            _T1,
            _mor_k,
            _mor_n,
            read_hudi_mor_snapshot,
        )

        st = read_hudi_mor_snapshot(self._mk(4), asof=_T1)
        assert st is not None
        ng = 2 + 4 % 3
        assert st["n_blocks"] == 0 and st["n_commits"] == 1
        want = sum(
            _mor_k(4, g, r, 0)
            for g in range(ng)
            for r in range(_mor_n(4, g))
        )
        assert st["k_sum"] == want


class TestMorRollbackAfterAsOf:
    def test_future_rollback_of_past_instant_is_skipped(self):
        """A T4 rollback TARGETING T2 (an instant <= asof) must not
        apply at asof=T2 — the rollback itself hadn't happened yet —
        while the full snapshot does apply it and drops T2's
        upserts. Pins the rollback pass honoring the as-of filter."""
        import json as _json

        from gmall_flink_210726_spark.operators.hudi import (
            _T1,
            _T2,
            _T4,
            _mor_base_parquet,
            _mor_data_block,
            _mor_k,
            _mor_n,
            _mor_rollback_block,
            read_hudi_mor_snapshot,
        )
        from gmall_flink_210726_spark.operators.tar import (
            _BLOCK,
            _make_header,
        )

        i, g = 1, 0
        n = _mor_n(i, g)
        base = _mor_base_parquet(i, g)
        bpath = f"part/f{g}_0-0_{_T1}.parquet"
        log1 = _mor_data_block(
            _T2,
            [{"rk": r, "k": _mor_k(i, g, r, 311)} for r in range(n)],
        )
        log2 = _mor_rollback_block(_T4, _T2)
        p1 = f"part/.f{g}_{_T1}.log.1_0-0"
        p2 = f"part/.f{g}_{_T1}.log.2_0-0"
        members = [
            (bpath, base),
            (p1, log1),
            (p2, log2),
            (
                f".hoodie/{_T1}.commit",
                _json.dumps(
                    {
                        "partitionToWriteStats": {
                            "part": [
                                {
                                    "fileId": f"f{g}",
                                    "path": bpath,
                                    "numWrites": n,
                                    "fileSizeInBytes": len(base),
                                }
                            ]
                        }
                    }
                ).encode(),
            ),
            (
                f".hoodie/{_T2}.deltacommit",
                _json.dumps(
                    {
                        "partitionToWriteStats": {
                            "part": [
                                {
                                    "fileId": f"f{g}",
                                    "path": p1,
                                    "fileSizeInBytes": len(log1),
                                }
                            ]
                        }
                    }
                ).encode(),
            ),
            (
                f".hoodie/{_T4}.deltacommit",
                _json.dumps(
                    {
                        "partitionToWriteStats": {
                            "part": [
                                {
                                    "fileId": f"f{g}",
                                    "path": p2,
                                    "fileSizeInBytes": len(log2),
                                }
                            ]
                        }
                    }
                ).encode(),
            ),
        ]
        parts = []
        for name, payload in members:
            pad = (-len(payload)) % _BLOCK
            parts.append(
                _make_header(name, len(payload))
                + payload
                + b"\x00" * pad
            )
        tar = b"".join(parts) + b"\x00" * (2 * _BLOCK)

        asof = read_hudi_mor_snapshot(tar, asof=_T2)
        assert asof is not None
        assert asof["k_sum"] == sum(
            _mor_k(i, g, r, 311) for r in range(n)
        )
        full = read_hudi_mor_snapshot(tar)
        assert full is not None
        assert full["k_sum"] == sum(
            _mor_k(i, g, r, 0) for r in range(n)
        )


class TestMorAsOfSkipRules:
    def test_asof_t2_drops_t3_and_t4(self):
        """At as-of T2 the T4 rollback is itself skipped, yet T3's
        orphan blocks stay dead via the max-instant rule — the two
        skip rules compose to the same merged state for even ids as
        the odd-id (no T3/T4) shape."""
        from gmall_flink_210726_spark.operators.hudi import (
            _T2,
            _make_hudi_mor_table,
            _mor_k,
            _mor_n,
            read_hudi_mor_snapshot,
        )

        for i in (2, 4, 3, 5):  # even ids have T3/T4, odd don't
            st = read_hudi_mor_snapshot(
                _make_hudi_mor_table(i), asof=_T2
            )
            assert st is not None, i
            ng = 2 + i % 3
            assert st["n_commits"] == 2 and st["n_blocks"] == ng * 2
            want = sum(
                (
                    _mor_k(i, g, r, 311)
                    if r % 3 == 0
                    else _mor_k(i, g, r, 0)
                )
                for g in range(ng)
                for r in range(_mor_n(i, g))
                if r % 5 != 4
            )
            assert st["k_sum"] == want, i

"""Delta-log replay: protocol rules, last-wins semantics, degrade
contract (operators/deltalog.py)."""

from __future__ import annotations

import json

from gmall_flink_210726_spark.operators.deltalog import (
    _make_delta_log,
    replay_delta_log,
)
from gmall_flink_210726_spark.operators.tar import _BLOCK, _make_header


def _log(*commits: list[dict]) -> bytes:
    parts = []
    for v, actions in enumerate(commits):
        payload = (
            b"\n".join(json.dumps(a).encode() for a in actions) + b"\n"
        )
        pad = (-len(payload)) % _BLOCK
        parts.append(
            _make_header(f"{v:020d}.json", len(payload))
            + payload
            + b"\x00" * pad
        )
    parts.append(b"\x00" * (2 * _BLOCK))
    return b"".join(parts)


_P = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
_M = {"metaData": {"id": "t", "partitionColumns": ["p"]}}


def _add(path: str, size: int = 100, rows: int = 5, p: str = "0"):
    return {
        "add": {
            "path": path,
            "partitionValues": {"p": p},
            "size": size,
            "modificationTime": 0,
            "dataChange": True,
            "stats": json.dumps({"numRecords": rows}),
        }
    }


def _rm(path: str):
    return {"remove": {"path": path, "deletionTimestamp": 1,
                       "dataChange": True}}


class TestReplay:
    def test_add_remove_readd_last_wins(self):
        got = replay_delta_log(
            _log(
                [_P, _M, _add("a", 100, 5)],
                [_rm("a")],
                [_add("a", 100, 5), _add("b", 7, 2, p="1")],
            )
        )
        assert got is not None
        assert got["live_files"] == 2
        assert got["live_rows"] == 7
        assert got["n_partitions"] == 2
        assert got["n_adds"] == 3 and got["n_removes"] == 1

    def test_future_reader_version_degrades(self):
        p2 = {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}}
        assert replay_delta_log(_log([p2, _M, _add("a")])) is None

    def test_commit0_must_establish_table(self):
        assert replay_delta_log(_log([_add("a")])) is None
        assert replay_delta_log(_log([_P, _add("a")])) is None

    def test_version_gap_degrades(self):
        blob = _log([_P, _M, _add("a")], [_add("b")])
        # rename commit 1 -> commit 2 (gap)
        blob = blob.replace(b"00000000000000000001.json",
                            b"00000000000000000002.json")
        assert replay_delta_log(blob) is None

    def test_remove_of_never_live_path_degrades(self):
        assert (
            replay_delta_log(_log([_P, _M, _add("a")], [_rm("zz")]))
            is None
        )

    def test_readd_with_different_size_degrades(self):
        assert (
            replay_delta_log(
                _log([_P, _M, _add("a", 100)], [_add("a", 999)])
            )
            is None
        )

    def test_missing_stats_degrades(self):
        a = _add("a")
        del a["add"]["stats"]
        assert replay_delta_log(_log([_P, _M, a])) is None

    def test_fixture_stripes(self):
        assert replay_delta_log(_make_delta_log(0)) is None
        assert replay_delta_log(_make_delta_log(12)) is None
        got = replay_delta_log(_make_delta_log(3))
        assert got is not None and got["n_commits"] == 2 + 3 % 4


class TestFullTableScan:
    """Round-11 composition: log replay + hand parquet reads."""

    def test_scan_matches_file_contents(self):
        from gmall_flink_210726_spark.operators.deltalog import (
            _make_delta_table,
            _scan_seed,
            scan_delta_table,
        )

        i = 3
        got = scan_delta_table(_make_delta_table(i))
        assert got is not None
        # C=2: files (0,0),(0,1),(1,0); (i+1)%2=0 removes (0,0)
        live = [(0, 1), (1, 0)]
        exp_rows = sum(
            10 + _scan_seed(i, v, k) % 90 for v, k in live
        )
        assert got["live_rows"] == exp_rows
        assert got["live_files"] == 2

    def test_numrecords_lie_degrades(self):
        from gmall_flink_210726_spark.operators.deltalog import (
            _make_delta_table,
            scan_delta_table,
        )

        for i in (0, 13, 26, 39):
            assert scan_delta_table(_make_delta_table(i)) is None, i

    def test_size_lie_degrades(self):
        """Truncate one live part file: the add's size disagrees."""
        from gmall_flink_210726_spark.operators.deltalog import (
            _make_delta_table,
            scan_delta_table,
        )
        from gmall_flink_210726_spark.operators.tar import (
            _BLOCK,
            _make_header,
        )
        from gmall_flink_210726_spark.operators.wds import (
            _iter_tar_members,
        )

        blob = _make_delta_table(3)
        members = _iter_tar_members(blob)
        rebuilt = []
        for name, payload in members:
            if name == "part-00001-0.parquet":
                payload = payload[:-8]  # truncate a live file
            pad = (-len(payload)) % _BLOCK
            rebuilt.append(
                _make_header(name, len(payload))
                + payload
                + b"\x00" * pad
            )
        assert (
            scan_delta_table(
                b"".join(rebuilt) + b"\x00" * (2 * _BLOCK)
            )
            is None
        )

    def test_missing_part_file_degrades(self):
        from gmall_flink_210726_spark.operators.deltalog import (
            _make_delta_table,
            scan_delta_table,
        )
        from gmall_flink_210726_spark.operators.tar import (
            _BLOCK,
            _make_header,
        )
        from gmall_flink_210726_spark.operators.wds import (
            _iter_tar_members,
        )

        blob = _make_delta_table(3)
        members = [
            (n, p)
            for n, p in _iter_tar_members(blob)
            if n != "part-00001-0.parquet"
        ]
        rebuilt = b"".join(
            _make_header(n, len(p)) + p + b"\x00" * ((-len(p)) % _BLOCK)
            for n, p in members
        ) + b"\x00" * (2 * _BLOCK)
        assert scan_delta_table(rebuilt) is None


class TestStatsSkip:
    """add.stats minValues/maxValues file skipping: pruned files are
    never opened, read files re-prove their claimed min/max, and the
    skip rate at the fixture predicate is pinned."""

    def test_skip_rate_and_lies(self):
        from gmall_flink_210726_spark.operators.deltalog import (
            _make_delta_table_stats,
            scan_delta_table_pruned,
        )

        skipped = files = degraded = 0
        for i in range(200):
            st = scan_delta_table_pruned(
                _make_delta_table_stats(i), 300, 499
            )
            if st is None:
                # only the in-window 14-stripe lie can degrade
                assert i % 14 == 0, i
                degraded += 1
                continue
            skipped += st["n_skipped"]
            files += st["live_files"]
            assert st["n_skipped"] + st["n_read"] == st["live_files"]
        assert degraded > 0
        rate = skipped / files
        assert 0.40 < rate < 0.60, rate  # pinned skip rate ~0.49

    def test_pruned_file_bytes_never_touched(self):
        """Corrupt a file the predicate prunes: the scan must still
        succeed — proof the pruned bytes are never fetched."""
        from gmall_flink_210726_spark.operators.deltalog import (
            _make_delta_table_stats,
            _scan_seed,
            scan_delta_table_pruned,
        )

        # find an id whose FIRST live file is skipped at [300, 499]
        for i in range(1, 100):
            if i % 14 == 0 or i % 23 == 0:
                continue
            blob = bytearray(_make_delta_table_stats(i))
            st = scan_delta_table_pruned(bytes(blob), 300, 499)
            if st is None or st["n_skipped"] == 0:
                continue
            # smash every parquet body of a file we KNOW is skipped:
            # locate it via its tar member name then corrupt payload
            s = _scan_seed(i, 0, 0)
            vals = [(s * 7 + 3 * r) % 1000 for r in range(10 + s % 90)]
            if not (max(vals) < 300 or min(vals) > 499):
                continue  # first file not the skipped one; next id
            name = b"part-00000-0.parquet"
            at = bytes(blob).find(name)
            assert at >= 0
            # tar payload starts 512 bytes after the header start
            payload_at = at + 512
            blob[payload_at + 8 : payload_at + 24] = b"\xde" * 16
            st2 = scan_delta_table_pruned(bytes(blob), 300, 499)
            assert st2 == st  # identical result, bytes never read
            return
        raise AssertionError("no candidate id found")

    def test_missing_stats_refused(self):
        """This scan NEEDS minValues/maxValues: the plain fixture
        (numRecords only) must degrade rather than read everything
        silently."""
        from gmall_flink_210726_spark.operators.deltalog import (
            _make_delta_table,
            scan_delta_table_pruned,
        )

        assert scan_delta_table_pruned(
            _make_delta_table(1), 300, 499
        ) is None


class TestTimeTravel:
    """VERSION AS OF replays commits 0..v only."""

    def test_later_corruption_invisible(self):
        from gmall_flink_210726_spark.operators.deltalog import (
            _make_delta_log,
            replay_delta_log_asof,
        )

        # i=12: the LAST commit (v=1, n=2) is truncated mid-line;
        # as-of 1 reads it and degrades, as-of 0 never opens it
        assert replay_delta_log_asof(_make_delta_log(12), 1) is None
        st = replay_delta_log_asof(_make_delta_log(12), 0)
        assert st is not None and st["version"] == 0
        # traveling past the log refuses
        assert replay_delta_log_asof(_make_delta_log(1), 99) is None
        assert replay_delta_log_asof(_make_delta_log(1), -1) is None

    def test_asof_state_matches_prefix_replay(self):
        from gmall_flink_210726_spark.operators.deltalog import (
            _make_delta_log,
            replay_delta_log,
            replay_delta_log_asof,
        )

        for i in (1, 2, 3, 5):
            n = 2 + i % 4
            full = replay_delta_log(_make_delta_log(i))
            top = replay_delta_log_asof(_make_delta_log(i), n - 1)
            assert top is not None
            for k in ("n_adds", "n_removes", "live_files",
                      "live_rows", "live_bytes", "n_partitions"):
                assert top[k] == full[k], (i, k)


class TestPartitionPrune:
    def test_pruned_bytes_never_touched_and_misroute_caught(self):
        from gmall_flink_210726_spark.operators.deltalog import (
            _make_delta_part_table,
            _part_kvals,
            scan_delta_table_partition_pruned,
        )

        # find an id whose file (0,0) is pruned at pk=2, corrupt it:
        # the scan result must be identical
        for i in range(1, 60):
            if i % 15 == 0:
                continue
            pk, _ = _part_kvals(i, 0, 0)
            if pk == 2:
                continue
            blob = bytearray(_make_delta_part_table(i))
            st = scan_delta_table_partition_pruned(
                bytes(blob), "pk", "2"
            )
            if st is None:
                continue
            name = f"pk={pk}/part-00000-0.parquet".encode()
            at = bytes(blob).find(name)
            assert at >= 0
            blob[at + 512 + 8 : at + 512 + 24] = b"\xde" * 16
            st2 = scan_delta_table_partition_pruned(
                bytes(blob), "pk", "2"
            )
            assert st2 == st
            break
        else:
            raise AssertionError("no candidate")
        # mis-routed file degrades exactly when its CLAIMED value is
        # selected
        for i in (15, 30, 45, 60, 75):
            from gmall_flink_210726_spark.operators.deltalog import (
                _part_kvals as pkv,
            )

            nc = 2 + i % 3
            true_pk, _ = pkv(i, nc - 1, 0)
            claimed = (true_pk + 1) % 4
            st = scan_delta_table_partition_pruned(
                _make_delta_part_table(i), "pk", str(claimed)
            )
            assert st is None, i
            # any OTHER predicate never opens the liar
            other = str((claimed + 1) % 4)
            assert scan_delta_table_partition_pruned(
                _make_delta_part_table(i), "pk", other
            ) is not None, i


class TestColumnMapping:
    def test_model_and_modes(self):
        from gmall_flink_210726_spark.operators.deltalog import (
            _cm_k,
            _cm_n,
            _cm_s,
            _make_delta_cm_table,
            scan_delta_column_mapped,
        )

        for i in (1, 2, 3, 4, 5, 6):
            st = scan_delta_column_mapped(_make_delta_cm_table(i))
            assert st is not None, i
            assert st["mode"] == ("id" if i % 2 == 0 else "name")
            lives = [1, 2] if i % 3 == 0 else [0, 1, 2]
            assert st["live_files"] == len(lives)
            assert st["k_sum"] == sum(
                _cm_k(i, f, r)
                for f in lives
                for r in range(_cm_n(i, f))
            )
            assert st["score_sum"] == sum(
                _cm_s(i, f, r)
                for f in lives
                for r in range(_cm_n(i, f))
            )

    def test_decoy_column_never_read(self):
        """The physical remnant named 'k' holds value+1; a
        logical-name read returns a different sum than the mapped
        read — proving resolution goes through the mapping."""
        from gmall_flink_210726_spark.operators.deltalog import (
            _iter_tar_members,
            _make_delta_cm_table,
        )
        from gmall_flink_210726_spark.operators.parquetmeta import (
            read_parquet_column_k,
        )

        m = dict(_iter_tar_members(_make_delta_cm_table(1)))
        blob = m["part-00000.parquet"]
        naive = read_parquet_column_k(blob, name=b"k")
        mapped = read_parquet_column_k(blob, name=b"col-k-1")
        assert naive is not None and mapped is not None
        assert naive["k_sum"] != mapped["k_sum"]

    def test_reader_version_gate(self):
        """A v2 (column-mapped) table refuses under every
        logical-name scan; only the mapping-aware scan reads it."""
        from gmall_flink_210726_spark.operators.deltalog import (
            _make_delta_cm_table,
            scan_delta_column_mapped,
            scan_delta_table,
        )

        blob = _make_delta_cm_table(1)
        assert scan_delta_table(blob) is None
        assert scan_delta_column_mapped(blob) is not None

    def test_trust_refusals(self):
        from gmall_flink_210726_spark.operators.deltalog import (
            _make_delta_cm_table,
            scan_delta_column_mapped,
        )

        for i in (13, 26, 17, 34):
            assert (
                scan_delta_column_mapped(_make_delta_cm_table(i))
                is None
            ), i


class TestVersionChecksums:
    def test_model_and_gap(self):
        from gmall_flink_210726_spark.operators.deltalog import (
            _make_delta_crc_table,
            scan_delta_table_checked,
        )

        for i in (1, 2, 3, 4, 5, 10):
            st = scan_delta_table_checked(_make_delta_crc_table(i))
            assert st is not None, i
            c = 2 + i % 3
            assert st["n_commits"] == c
            assert st["n_crc"] == c - (1 if i % 5 == 0 else 0)

    def test_crc_disagreement_refuses(self):
        from gmall_flink_210726_spark.operators.deltalog import (
            _make_delta_crc_table,
            scan_delta_table_checked,
        )

        # tableSizeBytes +1 / numFiles +1 on otherwise-clean tables
        for i in (13, 26, 17, 34):
            assert (
                scan_delta_table_checked(_make_delta_crc_table(i))
                is None
            ), i

    def test_crc_for_missing_version_refuses(self):
        """A checksum claiming a version the log never reached is a
        lie about the log's length."""
        from gmall_flink_210726_spark.operators.deltalog import (
            _iter_tar_members,
            _make_delta_crc_table,
            scan_delta_table_checked,
        )
        from gmall_flink_210726_spark.operators.tar import (
            _BLOCK,
            _make_header,
        )

        blob = _make_delta_crc_table(1)
        members = list(_iter_tar_members(blob))
        crc = next(p for n, p in members if n.endswith(".crc"))
        name = "_delta_log/" + "9" * 20 + ".crc"
        pad = (-len(crc)) % _BLOCK
        extra = _make_header(name, len(crc)) + crc + b"\x00" * pad
        cooked = blob[: -2 * _BLOCK] + extra + b"\x00" * (2 * _BLOCK)
        assert scan_delta_table_checked(cooked) is None


class TestChangeDataFeed:
    def test_model(self):
        from gmall_flink_210726_spark.operators.deltalog import (
            _cdf_k,
            _cdf_n0,
            _cdf_nd,
            _cdf_nu,
            _make_delta_cdf_table,
            read_delta_cdf,
        )

        for i in (1, 2, 3, 4, 5, 6):
            st = read_delta_cdf(_make_delta_cdf_table(i))
            assert st is not None, i
            n0, nu, nd = _cdf_n0(i), _cdf_nu(i), _cdf_nd(i)
            assert st["updates"] == nu
            assert st["deletes"] == nd
            assert st["del_k_sum"] == sum(
                _cdf_k(i, r) for r in range(n0 - nd, n0)
            )
            assert st["n_cdc_commits"] == 2

    def test_stripes_refuse(self):
        from gmall_flink_210726_spark.operators.deltalog import (
            _make_delta_cdf_table,
            read_delta_cdf,
        )

        # dropped postimage / cdc size lie / unknown change type
        for i in (13, 26, 17, 34, 19, 38):
            assert (
                read_delta_cdf(_make_delta_cdf_table(i)) is None
            ), i

    def test_cdf_flag_required(self):
        """The same log with delta.enableChangeDataFeed absent must
        refuse — the feed may only be read when enabled."""
        from gmall_flink_210726_spark.operators.deltalog import (
            _make_delta_cdf_table,
            read_delta_cdf,
        )

        blob = _make_delta_cdf_table(1)
        patched = blob.replace(
            b'"delta.enableChangeDataFeed": "true"',
            b'"delta.enableChangeDataFeed": "fals"',
        )
        assert len(patched) == len(blob)  # tar offsets preserved
        assert read_delta_cdf(patched) is None

    def test_vacuumed_remove_refuses(self):
        """A derived-delete commit whose removed file is gone from
        the tar must refuse (not report an empty delete)."""
        import tarfile
        import io

        from gmall_flink_210726_spark.operators.deltalog import (
            _make_delta_cdf_table,
            read_delta_cdf,
        )
        from gmall_flink_210726_spark.operators.tar import (
            _BLOCK,
            _make_header,
        )
        from gmall_flink_210726_spark.operators.wds import (
            _iter_tar_members,
        )

        # even id -> v3 is a derived-insert commit; rebuild the tar
        # turning v3 into a derived REMOVE of a file not in the tar
        import json as _json

        blob = _make_delta_cdf_table(2)
        members = dict(_iter_tar_members(blob))
        v3 = _json.loads(
            members["_delta_log/00000000000000000003.json"].decode()
        )
        members["_delta_log/00000000000000000003.json"] = (
            _json.dumps(v3).encode()
            + b"\n"
            + _json.dumps(
                {
                    "remove": {
                        "path": "part-ghost.parquet",
                        "dataChange": True,
                    }
                }
            ).encode()
        )
        parts = []
        for name, payload in members.items():
            pad = (-len(payload)) % _BLOCK
            parts.append(
                _make_header(name, len(payload))
                + payload
                + b"\x00" * pad
            )
        tar = b"".join(parts) + b"\x00" * (2 * _BLOCK)
        assert read_delta_cdf(tar) is None

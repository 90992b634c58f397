"""Delta checkpoint parquet: generic struct-leaf decode (incl.
bit-packed booleans and INT32), checkpoint-seeded replay, trust
chain. Pure-python over real pyarrow struct writes — no Spark."""

from __future__ import annotations

import json

import pytest

from gmall_flink_210726_spark.operators.deltacp import (
    _cp_k,
    _cp_rows,
    _make_delta_checkpoint_table,
    read_delta_checkpoint_table,
)
from gmall_flink_210726_spark.operators.wds import _iter_tar_members


@pytest.mark.parametrize("i", [1, 2, 3, 4, 5, 7, 8, 16, 29, 58, 101])
def test_checkpoint_scan_matches_formula(i):
    st = read_delta_checkpoint_table(_make_delta_checkpoint_table(i))
    m = 2 + i % 2
    live = [f for f in range(m + 1) if not (i % 2 == 1 and f == 0)]
    assert st == {
        "checkpoint_version": 2,
        "n_actions": 3 + m,
        "n_tombstones": 1,
        "n_tail_commits": 1,
        "live_files": len(live),
        "live_rows": sum(_cp_rows(i, f) for f in live),
        "k_sum": sum(
            _cp_k(i, f, j) for f in live for j in range(_cp_rows(i, f))
        ),
    }


def test_state_comes_from_the_checkpoint_not_commit_zero():
    # the fixture ships NO commits <= the checkpoint version — if the
    # reader tried to replay from 0 it could not see these files
    blob = _make_delta_checkpoint_table(2)
    names = [n for n, _ in _iter_tar_members(blob)]
    assert "_delta_log/00000000000000000002.checkpoint.parquet" in names
    assert not any(
        n.endswith(".json") and "00000000000000000003" not in n
        for n in names
        if n.startswith("_delta_log/") and n.endswith(".json")
    )
    assert read_delta_checkpoint_table(blob) is not None


def test_size_lie_and_bad_remove_degrade():
    for i in (9, 18, 27):  # _last_checkpoint.size off by one
        assert (
            read_delta_checkpoint_table(_make_delta_checkpoint_table(i))
            is None
        )
    for i in (13, 26, 0):  # tail remove of a never-added file
        assert (
            read_delta_checkpoint_table(_make_delta_checkpoint_table(i))
            is None
        )


def test_pre_checkpoint_commit_refused():
    # a leftover commit at or below the checkpoint version means the
    # compaction contract is broken; the reader must refuse
    blob = _make_delta_checkpoint_table(1)
    members = list(_iter_tar_members(blob))
    from gmall_flink_210726_spark.operators.tar import (
        _BLOCK,
        _make_header,
    )

    extra = json.dumps({"commitInfo": {}}).encode()
    members.append(("_delta_log/00000000000000000001.json", extra))
    parts = []
    for name, payload in members:
        pad = (-len(payload)) % _BLOCK
        parts.append(
            _make_header(name, len(payload)) + payload + b"\x00" * pad
        )
    patched = b"".join(parts) + b"\x00" * (2 * _BLOCK)
    assert read_delta_checkpoint_table(patched) is None


def test_boolean_and_int32_leaves_decode():
    # dataChange is bit-packed PLAIN BOOLEAN and minReaderVersion is
    # INT32 — both decode through the generic struct-leaf reader
    import struct as s

    from gmall_flink_210726_spark.operators.deltacp import (
        _LEAVES,
        _read_struct_leaf,
    )
    from gmall_flink_210726_spark.operators.parquetmeta import (
        _read_struct,
        _Reader,
    )

    blob = _make_delta_checkpoint_table(4)
    files = dict(_iter_tar_members(blob))
    ckpt = files["_delta_log/00000000000000000002.checkpoint.parquet"]
    (flen,) = s.unpack_from("<I", ckpt, len(ckpt) - 8)
    meta = _read_struct(
        _Reader(ckpt, len(ckpt) - 8 - flen, len(ckpt) - 8)
    )
    dc = _read_struct_leaf(ckpt, meta, *_LEAVES["add_dc"])
    mrv = _read_struct_leaf(ckpt, meta, *_LEAVES["proto_mrv"])
    assert [v for v in dc if isinstance(v, bool)] == [
        (4 + f) % 2 == 0 for f in range(2 + 4 % 2)
    ]
    assert [v for v in mrv if isinstance(v, int)] == [1]
    # even ids null modificationTime: the FIELD-null level (def=1)
    mt = _read_struct_leaf(ckpt, meta, *_LEAVES["add_mtime"])
    assert ("null",) in mt


# ------------------------------------------------------ v2 checkpoints


class TestV2Checkpoint:
    def test_fixture_matches_formula(self):
        from gmall_flink_210726_spark.operators.deltacp import (
            _cp_k,
            _cp_rows,
            _make_delta_v2_checkpoint_table,
            read_delta_v2_checkpoint_table,
        )

        for i in (1, 2, 3, 4, 5, 9, 13, 15, 30, 45):
            st = read_delta_v2_checkpoint_table(
                _make_delta_v2_checkpoint_table(i)
            )
            if i % 9 == 0 or i % 13 == 0 or i % 15 == 0:
                assert st is None, i
                continue
            assert st is not None, i
            m = 2 + i % 2
            alive = [
                f for f in range(m + 1) if not (i % 2 == 1 and f == 0)
            ]
            assert st["checkpoint_version"] == 2
            assert st["n_sidecars"] == 1 + i % 2
            assert st["n_sidecar_actions"] == m + 1
            assert st["n_tombstones"] == 1
            assert st["live_files"] == len(alive)
            assert st["live_rows"] == sum(
                _cp_rows(i, f) for f in alive
            )
            assert st["k_sum"] == sum(
                _cp_k(i, f, j)
                for f in alive
                for j in range(_cp_rows(i, f))
            )

    def test_protocol_below_v3_refused(self):
        """A v2-shaped checkpoint whose protocol says reader v1 must
        refuse — the feature requires minReaderVersion 3."""
        from gmall_flink_210726_spark.operators import deltacp as d

        blob = d._make_delta_v2_checkpoint_table(1)
        # the manifest stores minReaderVersion 3 as a PLAIN INT32;
        # rewrite it to 1 in place via the tar member
        members = dict(d._iter_tar_members(blob))
        name = next(
            n
            for n in members
            if ".checkpoint." in n and n.endswith(".parquet")
        )
        patched = members[name].replace(
            b"\x03\x00\x00\x00", b"\x01\x00\x00\x00", 1
        )
        assert patched != members[name]
        out = bytearray()
        for n, payload in members.items():
            p = patched if n == name else payload
            pad = (-len(p)) % d._BLOCK
            out += d._make_header(n, len(p)) + p + b"\x00" * pad
        out += b"\x00" * (2 * d._BLOCK)
        assert d.read_delta_v2_checkpoint_table(bytes(out)) is None

    def test_two_manifests_refused(self):
        from gmall_flink_210726_spark.operators import deltacp as d

        blob = d._make_delta_v2_checkpoint_table(1)
        members = list(d._iter_tar_members(blob))
        name, payload = next(
            (n, p) for n, p in members if ".checkpoint." in n
        )
        dup = name.replace(
            d._uuid_for(1, 99), d._uuid_for(1, 98)
        )
        members.append((dup, payload))
        out = bytearray()
        for n, p in members:
            pad = (-len(p)) % d._BLOCK
            out += d._make_header(n, len(p)) + p + b"\x00" * pad
        out += b"\x00" * (2 * d._BLOCK)
        assert d.read_delta_v2_checkpoint_table(bytes(out)) is None

    def test_truncation_refused(self):
        from gmall_flink_210726_spark.operators.deltacp import (
            _make_delta_v2_checkpoint_table,
            read_delta_v2_checkpoint_table,
        )

        blob = _make_delta_v2_checkpoint_table(2)
        assert read_delta_v2_checkpoint_table(blob[: len(blob) // 2]) is None

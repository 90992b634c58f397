"""WebDataset shard walk: sample grouping, two-layer degrade
contract, JPEG-decode agreement (operators/wds.py)."""

from __future__ import annotations

from gmall_flink_210726_spark.operators.tar import _BLOCK, _make_header
from gmall_flink_210726_spark.operators.wds import (
    _iter_tar_members,
    _make_wds_shard,
    _walk_wds,
)


def _member(name: str, payload: bytes) -> bytes:
    pad = (-len(payload)) % _BLOCK
    return _make_header(name, len(payload)) + payload + b"\x00" * pad


def _shard(*members: bytes) -> bytes:
    return b"".join(members) + b"\x00" * (2 * _BLOCK)


class TestMemberIter:
    def test_names_and_payloads(self):
        blob = _shard(_member("a.cls", b"7"), _member("b.cls", b"9"))
        got = _iter_tar_members(blob)
        assert got == [("a.cls", b"7"), ("b.cls", b"9")]

    def test_empty_and_corrupt(self):
        assert _iter_tar_members(b"\x00" * (2 * _BLOCK)) is None
        blob = bytearray(_shard(_member("a.cls", b"7")))
        blob[257] ^= 1  # magic
        assert _iter_tar_members(bytes(blob)) is None


class TestWdsWalk:
    def test_good_shard(self):
        from gmall_flink_210726_spark.operators.jpeg import _make_jpeg

        blob = _shard(
            _member("00000001.jpg", _make_jpeg(1)),
            _member("00000001.cls", b"3"),
        )
        got = _walk_wds(blob)
        assert got is not None
        assert got["n_samples"] == 1 and got["n_ok"] == 1
        assert got["cls_sum"] == 3 and got["pixel_sum"] > 0

    def test_bad_sample_is_skipped_not_fatal(self):
        from gmall_flink_210726_spark.operators.jpeg import _make_jpeg

        blob = _shard(
            _member("a.jpg", _make_jpeg(13)),  # _JPG_BAD stripe
            _member("a.cls", b"1"),
            _member("b.jpg", _make_jpeg(2)),
            _member("b.cls", b"5"),
        )
        got = _walk_wds(blob)
        assert got is not None
        assert got["n_samples"] == 2
        assert got["n_bad"] == 1 and got["n_ok"] == 1
        assert got["cls_sum"] == 5

    def test_non_integer_label_is_bad_sample(self):
        from gmall_flink_210726_spark.operators.jpeg import _make_jpeg

        blob = _shard(
            _member("a.jpg", _make_jpeg(2)),
            _member("a.cls", b"xyz"),
        )
        got = _walk_wds(blob)
        assert got is not None and got["n_bad"] == 1 and got["n_ok"] == 0

    def test_missing_field_is_shard_grammar_violation(self):
        from gmall_flink_210726_spark.operators.jpeg import _make_jpeg

        blob = _shard(_member("a.jpg", _make_jpeg(2)))
        assert _walk_wds(blob) is None
        # duplicate field in one sample too
        blob2 = _shard(
            _member("a.jpg", _make_jpeg(2)),
            _member("a.jpg", _make_jpeg(3)),
        )
        assert _walk_wds(blob2) is None

    def test_fixture_stripes(self):
        assert _walk_wds(_make_wds_shard(17)) is None  # shard stripe
        got = _walk_wds(_make_wds_shard(3))  # sid 13 inside: bad sample
        assert got is not None and got["n_bad"] == 1

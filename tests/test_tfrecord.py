"""TFRecord framing + tf.Example proto decode. Pure-python against
the module's own spec-faithful encoder (round-trip pinned) — no
TensorFlow in the container, no Spark here."""

from __future__ import annotations

import struct

import pytest

from gmall_flink_210726_spark.operators.tfrecord import (
    _make_tfrecord_blob,
    make_tf_example,
    make_tfrecord,
    masked_crc32c,
    parse_tf_example,
    read_tfrecord_examples,
    tfrecord_frames,
)


def test_mask_formula():
    # the TFRecord mask over the Castagnoli CRC; crc32c("123456789")
    # is the RFC 3720 check value 0xE3069283
    crc = 0xE3069283
    want = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert masked_crc32c(b"123456789") == want


def test_framing_roundtrip_and_flips():
    bodies = [b"alpha", b"", b"x" * 300]
    blob = make_tfrecord(bodies)
    assert tfrecord_frames(blob) == bodies
    for pos in range(len(blob)):
        bad = bytearray(blob)
        bad[pos] ^= 0xFF
        with pytest.raises(ValueError):
            tfrecord_frames(bytes(bad))


def test_example_roundtrip_with_negatives():
    body = make_tf_example(7, [-3, 12, -(1 << 62)], b"text", -1.25)
    feats = parse_tf_example(body)
    assert feats == {
        "id": ("int64", [7]),
        "tokens": ("int64", [-3, 12, -(1 << 62)]),
        "text": ("bytes", [b"text"]),
        "score": ("float", [-1.25]),
    }


def test_example_strictness():
    good = make_tf_example(1, [2], b"t", 0.5)
    with pytest.raises(ValueError):
        parse_tf_example(good + good)  # two Features fields
    # duplicate feature keys: splice the features payload twice
    with pytest.raises(ValueError):
        from gmall_flink_210726_spark.operators.tfrecord import (
            _pb_len,
        )

        inner = parse_tf_example  # noqa: F841  (readability anchor)
        feats = good[2:]  # strip the outer tag+len (len < 128)
        parse_tf_example(_pb_len(1, feats + feats))


def test_ragged_packed_floats_refuse():
    from gmall_flink_210726_spark.operators.tfrecord import _pb_len

    feat = _pb_len(2, _pb_len(1, struct.pack("<f", 1.0)[:3]))
    entry = _pb_len(1, _pb_len(1, b"f") + _pb_len(2, feat))
    with pytest.raises(ValueError):
        parse_tf_example(_pb_len(1, entry))


@pytest.mark.parametrize("i", [1, 2, 3, 5, 7, 16, 29, 58, 101])
def test_blob_walk_matches_formula(i):
    st = read_tfrecord_examples(_make_tfrecord_blob(i))
    nr = 2 + i % 4
    assert st == {
        "n_records": nr,
        "id_sum": sum(100 * i + j for j in range(nr)),
        "token_count": sum(3 + (i + j) % 5 for j in range(nr)),
        "token_sum": sum(
            sum((i + j + t) % 50 for t in range(3 + (i + j) % 5))
            for j in range(nr)
        ),
        "text_len_sum": sum(4 + (i + j) % 7 for j in range(nr)),
        "score_x4_sum": sum((i + j) % 9 - 4 for j in range(nr)),
    }


def test_degrade_stripes():
    for i in (13, 26, 0):  # proto-body flip -> data CRC catches
        assert read_tfrecord_examples(_make_tfrecord_blob(i)) is None
    for i in (9, 18, 27):  # stored-CRC flip -> only the check objects
        assert read_tfrecord_examples(_make_tfrecord_blob(i)) is None

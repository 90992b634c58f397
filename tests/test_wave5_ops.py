"""Wave-5 operator behavior: perceptual image dedup, audio window
energy, semantic dedup, temperature mixture."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from gmall_flink_210726_spark.operators.audio import audio_window_energy
from gmall_flink_210726_spark.operators.imagehash import (
    _make_group_bmp,
    dhash_images,
    dhash_near_pairs,
    synthesize_grouped_bmp,
)
from gmall_flink_210726_spark.operators.semdedup import semantic_dedup
from gmall_flink_210726_spark.operators.text2 import temperature_mixture
from gmall_flink_210726_spark.sources.batch import load_table
from tests.conftest import SF_SMALL

MEDIA_T = StructType(
    [StructField("media_id", LongType()), StructField("content", BinaryType())]
)


class TestImageDhash:
    def test_identical_images_hamming_zero(self, spark):
        blob = _make_group_bmp(8, 4)
        media = spark.createDataFrame([(1, blob), (2, blob)], MEDIA_T)
        pairs = dhash_near_pairs(dhash_images(media)).collect()
        assert len(pairs) == 1
        assert (pairs[0]["id_a"], pairs[0]["id_b"], pairs[0]["hamming"]) == (1, 2, 0)

    def test_corrupt_blob_degrades_not_throws(self, spark):
        media = spark.createDataFrame(
            [(1, b"not a bmp at all"), (2, None), (3, _make_group_bmp(0, 4))],
            MEDIA_T,
        )
        rows = {r["media_id"]: r for r in dhash_images(media).collect()}
        assert rows[1]["format"] == "unknown" and rows[1]["dhash"] == 0
        assert rows[2]["format"] == "unknown"
        assert rows[3]["format"] == "bmp" and rows[3]["width"] > 0

    def test_banded_pairs_equal_exhaustive(self, spark):
        """Pigeonhole contract: with max_hamming=3 and four 16-bit
        bands the banded join must equal the exhaustive O(n^2) pair
        set over the same hash table."""
        docs = load_table(spark, SF_SMALL, "documents")
        hashes = dhash_images(synthesize_grouped_bmp(docs)).cache()
        try:
            banded = {
                (r["id_a"], r["id_b"], r["hamming"])
                for r in dhash_near_pairs(hashes, max_hamming=3).collect()
            }
            h = [(r["media_id"], r["dhash"]) for r in hashes.collect()]
            exhaustive = set()
            for i in range(len(h)):
                for j in range(i + 1, len(h)):
                    a, b = sorted((h[i], h[j]))
                    d = bin((a[1] ^ b[1]) & (2**64 - 1)).count("1")
                    if d <= 3:
                        exhaustive.add((a[0], b[0], d))
            assert banded == exhaustive and len(exhaustive) > 0
        finally:
            hashes.unpersist()

    def test_group_members_pair_when_dims_large(self, spark):
        """For groups whose dims avoid grid-cell aliasing (w>=9, h>=8)
        the two perturbed bytes touch <=3 bits, so all six within-group
        pairs must appear."""
        # group seed s with w = 4 + s%29 >= 9 and h = 3 + s%13 >= 8: s=5
        ids = [(20 + k,) for k in range(4)]  # 20//4 == 5
        docs = spark.createDataFrame(ids, "doc_id long")
        pairs = dhash_near_pairs(
            dhash_images(synthesize_grouped_bmp(docs))
        ).collect()
        assert len(pairs) == 6
        assert all(r["hamming"] <= 3 for r in pairs)


def _wav(ch: int, samples: list[int], sr: int = 8000) -> bytes:
    import numpy as np

    n = len(samples) * 2
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + n, b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, ch, sr, sr * ch * 2, ch * 2, 16)
        + struct.pack("<4sI", b"data", n)
        + np.asarray(samples, dtype="<i2").tobytes()
    )


class TestAudioEnergy:
    def test_known_signal_exact_energy(self, spark):
        # mono, 35 samples of constant 100 -> 2 full windows of 16,
        # 3-sample tail dropped; one clipped sample inside the windows
        samples = [100] * 35
        samples[5] = 32767
        media = spark.createDataFrame([(1, _wav(1, samples))], MEDIA_T)
        r = audio_window_energy(media, win=16).collect()[0]
        w0 = 15 * 100 * 100 + 32767 * 32767
        w1 = 16 * 100 * 100
        assert r["n_windows"] == 2
        assert r["total_energy"] == w0 + w1
        assert r["max_energy"] == w0
        assert r["n_clipped"] == 1

    def test_stereo_interleave_counts_frames(self, spark):
        # stereo: 32 int16 values = 16 frames = exactly one window
        media = spark.createDataFrame([(1, _wav(2, [1000, -1000] * 16))], MEDIA_T)
        r = audio_window_energy(media, win=16).collect()[0]
        assert r["n_windows"] == 1
        assert r["total_energy"] == 32 * 1000 * 1000

    def test_corrupt_blob_degrades(self, spark):
        media = spark.createDataFrame([(1, b"RIFFgarbage"), (2, None)], MEDIA_T)
        rows = audio_window_energy(media).collect()
        assert all(r["format"] == "unknown" and r["total_energy"] == 0 for r in rows)


EMB_T = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


class TestSemanticDedup:
    def test_identical_vectors_drop_all_but_min_id(self, spark):
        v = [1.0] * 8
        w = [1.0, -1.0] * 4  # different sign bucket
        emb = spark.createDataFrame([(1, v), (2, v), (3, v), (9, w)], EMB_T)
        rows = {r["vec_id"]: r for r in semantic_dedup(emb, threshold=0.9).collect()}
        assert rows[1]["kept"] and not rows[2]["kept"] and not rows[3]["kept"]
        assert rows[9]["kept"]  # alone in its bucket
        assert rows[1]["bucket"] == rows[2]["bucket"] == rows[3]["bucket"]
        assert rows[9]["bucket"] != rows[1]["bucket"]

    def test_below_threshold_all_kept(self, spark):
        a = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]
        b = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 100.0]  # same bucket, low cos
        emb = spark.createDataFrame([(1, a), (2, b)], EMB_T)
        rows = semantic_dedup(emb, threshold=0.99).collect()
        assert len(rows) == 2 and all(r["kept"] for r in rows)


class TestTemperatureMixture:
    def test_alpha_one_is_uniform_rate(self, spark):
        docs = load_table(spark, SF_SMALL, "documents")
        rows = temperature_mixture(docs, alpha=1.0, target_frac=0.5).collect()
        assert len(rows) >= 2
        for r in rows:
            assert r["rate"] == pytest.approx(0.5, abs=1e-9)

    def test_temperature_boosts_minority(self, spark):
        docs = load_table(spark, SF_SMALL, "documents")
        rows = {
            r["lang"]: r
            for r in temperature_mixture(docs, alpha=0.5, target_frac=0.5).collect()
        }
        majority = max(rows.values(), key=lambda r: r["n_docs"])
        minority = min(rows.values(), key=lambda r: r["n_docs"])
        assert minority["rate"] > majority["rate"]
        # deterministic: rerun produces the identical kept counts
        rows2 = {
            r["lang"]: r["n_kept"]
            for r in temperature_mixture(docs, alpha=0.5, target_frac=0.5).collect()
        }
        assert rows2 == {k: r["n_kept"] for k, r in rows.items()}


class TestJpegCodec:
    def test_dc_only_roundtrip_exact(self, spark):
        from gmall_flink_210726_spark.operators.jpeg import (
            jpeg_pixel_stats,
            synthesize_jpeg_media,
        )

        docs = spark.createDataFrame([(i,) for i in range(1, 30)], "doc_id long")
        rows = {
            r["media_id"]: r
            for r in jpeg_pixel_stats(synthesize_jpeg_media(docs)).collect()
        }
        from gmall_flink_210726_spark.operators.jpeg import (
            _JPG_BAD,
            _JPG_BH,
            _JPG_BW,
            _JPG_HPAD,
            _JPG_V,
            _JPG_WPAD,
        )

        for i in range(1, 30):
            r = rows[i]
            if _JPG_BAD(i):
                assert r["format"] == "unknown" and r["pixel_sum"] == 0
                continue
            bw, bh = _JPG_BW(i), _JPG_BH(i)
            w, h = 8 * bw - _JPG_WPAD(i), 8 * bh - _JPG_HPAD(i)
            exp = sum(
                _JPG_V(i, by * bw + bx)
                * (min(8, w - bx * 8)) * (min(8, h - by * 8))
                for by in range(bh)
                for bx in range(bw)
            )
            assert (r["width"], r["height"], r["pixel_sum"]) == (w, h, exp), i

    def test_ac_coefficient_path(self):
        """A hand-assembled single-block JPEG with DC=0 and one AC
        coefficient at zigzag position 1 must decode to the IDCT of
        that coefficient, computed here from the raw cosine formula —
        exercises the AC Huffman branch, EXTEND, zigzag placement and
        dequantization."""
        import numpy as np

        from gmall_flink_210726_spark.operators.jpeg import (
            _AC_BITS,
            _AC_VALS,
            _BitWriter,
            _DC_BITS,
            _DC_VALS,
            _decode_jpeg,
            _dht,
        )
        import struct

        q = 2
        out = bytearray(b"\xff\xd8")
        out += struct.pack(">2sH", b"\xff\xdb", 67) + bytes([0]) + bytes([q] * 64)
        out += struct.pack(">2sHBHHB", b"\xff\xc0", 11, 8, 8, 8, 1) + bytes(
            [1, 0x11, 0]
        )
        out += _dht(0, 0, _DC_BITS, _DC_VALS)
        out += _dht(1, 0, _AC_BITS, _AC_VALS)
        out += struct.pack(">2sH", b"\xff\xda", 8) + bytes([1, 1, 0, 0, 63, 0])
        wtr = _BitWriter()
        wtr.write(0, 4)  # DC category 0 (diff 0)
        # AC: (run 0, size 3) -> canonical code == value index 3; mag 5
        wtr.write(3, 4)
        wtr.write(5, 3)
        wtr.write(0, 4)  # EOB
        out += wtr.flush() + b"\xff\xd9"
        w, h, px = _decode_jpeg(bytes(out))
        # zigzag position 1 = raster (0,1): F(u=1, v=0) horizontally
        # varying basis; dequantized coefficient = 5 * q
        xs = np.arange(8)
        basis_row = (1.0 / np.sqrt(2)) / 2 * np.ones(8)  # u=0 col factor
        cosx = np.cos((2 * xs + 1) * 1 * np.pi / 16) / 2
        expected = np.clip(
            np.round(5 * q * np.outer(basis_row, cosx) * 1.0) + 128, 0, 255
        )
        assert (w, h) == (8, 8)
        assert (px[:, :, 0] == expected.astype(np.int64)).all()

    def test_unsupported_modes_rejected(self):
        from gmall_flink_210726_spark.operators.jpeg import (
            _decode_jpeg,
            _make_jpeg,
        )

        with_progressive = bytearray(_make_jpeg(1))
        # flip SOF0 (FFC0) to SOF2 (FFC2, progressive)
        idx = bytes(with_progressive).find(b"\xff\xc0")
        with_progressive[idx + 1] = 0xC2
        import pytest as _pt

        with _pt.raises(ValueError):
            _decode_jpeg(bytes(with_progressive))
        with _pt.raises(ValueError):
            _decode_jpeg(b"\x89PNG not a jpeg")

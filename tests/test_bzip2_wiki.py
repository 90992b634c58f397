"""bzip2 from scratch + the Wikipedia multistream dump walk.
Pure-python against stdlib ``bz2``-written streams — no Spark."""

from __future__ import annotations

import bz2
import os
import random

import pytest

from gmall_flink_210726_spark.operators.bzip2 import (
    bz2_decompress_multistream,
    bz2_decompress_stream,
)
from gmall_flink_210726_spark.operators.wikidump import (
    _make_wiki_dump,
    read_wiki_dump,
    strip_wikitext,
)

# ----------------------------------------------------------------- bzip2


@pytest.mark.parametrize("level", [1, 5, 9])
def test_roundtrip_against_stdlib(level):
    rng = random.Random(level)
    for kind in range(6):
        n = rng.randrange(1, 20000)
        data = {
            0: bytes(rng.randrange(256) for _ in range(n)),
            1: bytes(rng.choice(b"ab") for _ in range(n)),
            2: b"x" * n,  # RLE1 + RUNA/RUNB heavy
            3: (b"the quick brown fox " * (n // 20 + 1))[:n],
            4: bytes(rng.choice(b"\x00\xff") for _ in range(n)) * 3,
            5: os.urandom(n),
        }[kind]
        comp = bz2.compress(data, level)
        plain, end = bz2_decompress_stream(comp)
        assert plain == data
        assert (end + 7) // 8 == len(comp)


def test_multistream_concatenation():
    parts = [b"alpha" * 100, b"beta" * 37, os.urandom(5000)]
    blob = b"".join(bz2.compress(p, 3) for p in parts)
    assert bz2_decompress_multistream(blob) == parts


def test_every_flip_detected_or_output_changed():
    orig = b"hello world, hello bzip2! " * 40
    comp = bz2.compress(orig, 1)
    silent = 0
    for pos in range(len(comp)):
        bad = bytearray(comp)
        bad[pos] ^= 0xFF
        try:
            got, _ = bz2_decompress_stream(bytes(bad))
            if got == orig:
                silent += 1
        except ValueError:
            continue
    # flips confined to a never-selected Huffman table are invisible
    # by construction (real bzip2 cannot see them either)
    assert silent <= 2


def test_stored_crc_flip_is_caught_by_crc_alone():
    comp = bytearray(bz2.compress(b"payload " * 50, 1))
    comp[12] ^= 0x5A  # inside the first block's stored CRC field
    with pytest.raises(ValueError, match="CRC"):
        bz2_decompress_stream(bytes(comp))


def test_garbage_and_truncation_raise():
    with pytest.raises(ValueError):
        bz2_decompress_stream(b"BZx" + b"\x00" * 20)
    comp = bz2.compress(b"data" * 100, 1)
    with pytest.raises(ValueError):
        bz2_decompress_stream(comp[: len(comp) // 2])


# ------------------------------------------------------------- wikitext


def test_strip_wikitext():
    assert strip_wikitext("a{{x{{y}}z}}b") == "ab"
    assert strip_wikitext("[[T|L]] and [[B]]") == "L and B"
    assert strip_wikitext("==H1== '''b''' ''i''") == "H1 b i"
    assert strip_wikitext("x<ref>junk</ref>y") == "xy"
    with pytest.raises(ValueError):
        strip_wikitext("{{never closed")
    with pytest.raises(ValueError):
        strip_wikitext("[[never closed")
    with pytest.raises(ValueError):
        strip_wikitext("<ref>never closed")


# ------------------------------------------------------------ dump walk


@pytest.mark.parametrize("i", [1, 2, 3, 5, 7, 16, 29, 58, 101])
def test_dump_walk_matches_formula(i):
    st = read_wiki_dump(_make_wiki_dump(i))
    np_ = 1 + i % 4
    assert st == {
        "n_streams": 2 + i % 2,
        "n_pages": np_,
        "id_sum": sum(10 * i + p for p in range(np_)),
        "title_len_sum": sum(
            1 + len(str((7 * i + p) % 100)) for p in range(np_)
        ),
        "plain_len_sum": sum(
            11 * (1 + (i + p) % 3) + 16 for p in range(np_)
        ),
        "link_count": 2 * np_,
        "template_count": np_,
        "ref_count": np_,
    }


def test_dump_degrade_stripes():
    for i in (13, 26, 9, 18, 0):
        assert read_wiki_dump(_make_wiki_dump(i)) is None


def test_dump_needs_siteinfo_and_pages():
    blob = bz2.compress(b"<siteinfo><sitename>W</sitename></siteinfo>", 1)
    assert read_wiki_dump(blob) is None  # no page batch stream
    two = blob + bz2.compress(b"<notapage/>", 1)
    assert read_wiki_dump(two) is None

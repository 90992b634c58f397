"""Unicode NFC normalization, hand-written over a BOUNDED in-code
table — the C4/CCNet text-front-door step between charset transcode
and tokenization (equivalent sequences must hash/shingle equally, so
normalization is a correctness dependency of every dedup operator).

Implements UAX #15 (Unicode Normalization Forms) for the ranges the
crawl fixtures exercise — Latin-1 Supplement + Latin Extended-A
(U+00C0..U+017F), whose full 161-entry canonical decomposition table
is embedded below (every entry is ``composed -> (ASCII base,
combining mark)``; the range has no composition exclusions and no
recursive decompositions, both verified by the fuzz test):

1. canonical DECOMPOSITION: composed points expand to base + mark;
2. canonical ORDERING: runs of nonzero-combining-class marks are
   stably sorted by ccc (the bounded ccc table covers the 13 marks
   the decompositions use: ccc 230 above, ccc 202 attached-below);
3. canonical COMPOSITION: the UAX #15 algorithm — last-starter
   tracking, blocking check (a mark composes with the starter only
   if adjacent or every intervening mark has LOWER ccc), recomposing
   through the inverted table.

DEGRADE CONTRACT (two-sided — the operator NEVER emits a wrong
normalization): any codepoint outside the covered set (not ASCII,
not in the table, not a known-ccc-0 letter of the covered ranges,
not a known mark) makes the string un-normalizable -> ``None``; and
any non-blocked (starter, mark) pair that full Unicode composes to
a target OUTSIDE the covered ranges (the exhaustive in-code
``_UNSAFE`` set, e.g. g+caron -> U+01E7) degrades too, instead of
leaving a sequence full NFC would have composed.

Fuzz-tested against ``unicodedata.normalize('NFC', ...)`` over the
covered alphabet, including multi-mark reordering and blocking
(tests/test_nfc.py). Arrow-batched ``mapInPandas``, zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# canonical decompositions, U+00C0..U+017F (UnicodeData.txt, field 5)
_DECOMP: dict[int, tuple[int, int]] = {
    0xC0: (0x41, 0x300), 0xC1: (0x41, 0x301), 0xC2: (0x41, 0x302),
    0xC3: (0x41, 0x303), 0xC4: (0x41, 0x308), 0xC5: (0x41, 0x30A),
    0xC7: (0x43, 0x327), 0xC8: (0x45, 0x300), 0xC9: (0x45, 0x301),
    0xCA: (0x45, 0x302), 0xCB: (0x45, 0x308), 0xCC: (0x49, 0x300),
    0xCD: (0x49, 0x301), 0xCE: (0x49, 0x302), 0xCF: (0x49, 0x308),
    0xD1: (0x4E, 0x303), 0xD2: (0x4F, 0x300), 0xD3: (0x4F, 0x301),
    0xD4: (0x4F, 0x302), 0xD5: (0x4F, 0x303), 0xD6: (0x4F, 0x308),
    0xD9: (0x55, 0x300), 0xDA: (0x55, 0x301), 0xDB: (0x55, 0x302),
    0xDC: (0x55, 0x308), 0xDD: (0x59, 0x301), 0xE0: (0x61, 0x300),
    0xE1: (0x61, 0x301), 0xE2: (0x61, 0x302), 0xE3: (0x61, 0x303),
    0xE4: (0x61, 0x308), 0xE5: (0x61, 0x30A), 0xE7: (0x63, 0x327),
    0xE8: (0x65, 0x300), 0xE9: (0x65, 0x301), 0xEA: (0x65, 0x302),
    0xEB: (0x65, 0x308), 0xEC: (0x69, 0x300), 0xED: (0x69, 0x301),
    0xEE: (0x69, 0x302), 0xEF: (0x69, 0x308), 0xF1: (0x6E, 0x303),
    0xF2: (0x6F, 0x300), 0xF3: (0x6F, 0x301), 0xF4: (0x6F, 0x302),
    0xF5: (0x6F, 0x303), 0xF6: (0x6F, 0x308), 0xF9: (0x75, 0x300),
    0xFA: (0x75, 0x301), 0xFB: (0x75, 0x302), 0xFC: (0x75, 0x308),
    0xFD: (0x79, 0x301), 0xFF: (0x79, 0x308),
    0x100: (0x41, 0x304), 0x101: (0x61, 0x304), 0x102: (0x41, 0x306),
    0x103: (0x61, 0x306), 0x104: (0x41, 0x328), 0x105: (0x61, 0x328),
    0x106: (0x43, 0x301), 0x107: (0x63, 0x301), 0x108: (0x43, 0x302),
    0x109: (0x63, 0x302), 0x10A: (0x43, 0x307), 0x10B: (0x63, 0x307),
    0x10C: (0x43, 0x30C), 0x10D: (0x63, 0x30C), 0x10E: (0x44, 0x30C),
    0x10F: (0x64, 0x30C), 0x112: (0x45, 0x304), 0x113: (0x65, 0x304),
    0x114: (0x45, 0x306), 0x115: (0x65, 0x306), 0x116: (0x45, 0x307),
    0x117: (0x65, 0x307), 0x118: (0x45, 0x328), 0x119: (0x65, 0x328),
    0x11A: (0x45, 0x30C), 0x11B: (0x65, 0x30C), 0x11C: (0x47, 0x302),
    0x11D: (0x67, 0x302), 0x11E: (0x47, 0x306), 0x11F: (0x67, 0x306),
    0x120: (0x47, 0x307), 0x121: (0x67, 0x307), 0x122: (0x47, 0x327),
    0x123: (0x67, 0x327), 0x124: (0x48, 0x302), 0x125: (0x68, 0x302),
    0x128: (0x49, 0x303), 0x129: (0x69, 0x303), 0x12A: (0x49, 0x304),
    0x12B: (0x69, 0x304), 0x12C: (0x49, 0x306), 0x12D: (0x69, 0x306),
    0x12E: (0x49, 0x328), 0x12F: (0x69, 0x328), 0x130: (0x49, 0x307),
    0x134: (0x4A, 0x302), 0x135: (0x6A, 0x302), 0x136: (0x4B, 0x327),
    0x137: (0x6B, 0x327), 0x139: (0x4C, 0x301), 0x13A: (0x6C, 0x301),
    0x13B: (0x4C, 0x327), 0x13C: (0x6C, 0x327), 0x13D: (0x4C, 0x30C),
    0x13E: (0x6C, 0x30C), 0x143: (0x4E, 0x301), 0x144: (0x6E, 0x301),
    0x145: (0x4E, 0x327), 0x146: (0x6E, 0x327), 0x147: (0x4E, 0x30C),
    0x148: (0x6E, 0x30C), 0x14C: (0x4F, 0x304), 0x14D: (0x6F, 0x304),
    0x14E: (0x4F, 0x306), 0x14F: (0x6F, 0x306), 0x150: (0x4F, 0x30B),
    0x151: (0x6F, 0x30B), 0x154: (0x52, 0x301), 0x155: (0x72, 0x301),
    0x156: (0x52, 0x327), 0x157: (0x72, 0x327), 0x158: (0x52, 0x30C),
    0x159: (0x72, 0x30C), 0x15A: (0x53, 0x301), 0x15B: (0x73, 0x301),
    0x15C: (0x53, 0x302), 0x15D: (0x73, 0x302), 0x15E: (0x53, 0x327),
    0x15F: (0x73, 0x327), 0x160: (0x53, 0x30C), 0x161: (0x73, 0x30C),
    0x162: (0x54, 0x327), 0x163: (0x74, 0x327), 0x164: (0x54, 0x30C),
    0x165: (0x74, 0x30C), 0x168: (0x55, 0x303), 0x169: (0x75, 0x303),
    0x16A: (0x55, 0x304), 0x16B: (0x75, 0x304), 0x16C: (0x55, 0x306),
    0x16D: (0x75, 0x306), 0x16E: (0x55, 0x30A), 0x16F: (0x75, 0x30A),
    0x170: (0x55, 0x30B), 0x171: (0x75, 0x30B), 0x172: (0x55, 0x328),
    0x173: (0x75, 0x328), 0x174: (0x57, 0x302), 0x175: (0x77, 0x302),
    0x176: (0x59, 0x302), 0x177: (0x79, 0x302), 0x178: (0x59, 0x308),
    0x179: (0x5A, 0x301), 0x17A: (0x7A, 0x301), 0x17B: (0x5A, 0x307),
    0x17C: (0x7A, 0x307), 0x17D: (0x5A, 0x30C), 0x17E: (0x7A, 0x30C),
}

# combining classes of the 13 marks the table uses (UnicodeData.txt
# field 3): 230 = above, 202 = attached below
_CCC: dict[int, int] = {
    0x300: 230, 0x301: 230, 0x302: 230, 0x303: 230, 0x304: 230,
    0x306: 230, 0x307: 230, 0x308: 230, 0x30A: 230, 0x30B: 230,
    0x30C: 230, 0x327: 202, 0x328: 202,
}

_COMP: dict[tuple[int, int], int] = {v: k for k, v in _DECOMP.items()}

# non-decomposable letters of the covered ranges (ccc 0 passthrough):
# every U+00C0..U+017F point without a canonical decomposition
_PASSTHRU = frozenset(
    cp
    for cp in range(0xC0, 0x180)
    if cp not in _DECOMP
)

# (starter, mark) pairs that full Unicode DOES compose, but to a
# target OUTSIDE the covered ranges (Latin Extended-B / Additional,
# e.g. g+caron -> U+01E7, a+circumflex+grave -> U+1EA7): if one of
# these would compose (non-blocked), this implementation must
# DEGRADE rather than emit a normalization full NFC disagrees with.
# Exhaustive over every starter this algorithm can ever hold
# (printable ASCII + the covered ranges, including table-composed
# intermediates) x the 13 marks; derived from UnicodeData.txt.
_UNSAFE: frozenset[tuple[int, int]] = frozenset(
    {
        (0x41, 0x307), (0x41, 0x30C), (0x42, 0x307), (0x44, 0x307),
        (0x44, 0x327), (0x45, 0x303), (0x45, 0x327), (0x46, 0x307),
        (0x47, 0x301), (0x47, 0x304), (0x47, 0x30C), (0x48, 0x307),
        (0x48, 0x308), (0x48, 0x30C), (0x48, 0x327), (0x49, 0x30C),
        (0x4B, 0x301), (0x4B, 0x30C), (0x4D, 0x301), (0x4D, 0x307),
        (0x4E, 0x300), (0x4E, 0x307), (0x4F, 0x307), (0x4F, 0x30C),
        (0x4F, 0x328), (0x50, 0x301), (0x50, 0x307), (0x52, 0x307),
        (0x53, 0x307), (0x54, 0x307), (0x55, 0x30C), (0x56, 0x303),
        (0x57, 0x300), (0x57, 0x301), (0x57, 0x307), (0x57, 0x308),
        (0x58, 0x307), (0x58, 0x308), (0x59, 0x300), (0x59, 0x303),
        (0x59, 0x304), (0x59, 0x307), (0x5A, 0x302), (0x61, 0x307),
        (0x61, 0x30C), (0x62, 0x307), (0x64, 0x307), (0x64, 0x327),
        (0x65, 0x303), (0x65, 0x327), (0x66, 0x307), (0x67, 0x301),
        (0x67, 0x304), (0x67, 0x30C), (0x68, 0x307), (0x68, 0x308),
        (0x68, 0x30C), (0x68, 0x327), (0x69, 0x30C), (0x6A, 0x30C),
        (0x6B, 0x301), (0x6B, 0x30C), (0x6D, 0x301), (0x6D, 0x307),
        (0x6E, 0x300), (0x6E, 0x307), (0x6F, 0x307), (0x6F, 0x30C),
        (0x6F, 0x328), (0x70, 0x301), (0x70, 0x307), (0x72, 0x307),
        (0x73, 0x307), (0x74, 0x307), (0x74, 0x308), (0x75, 0x30C),
        (0x76, 0x303), (0x77, 0x300), (0x77, 0x301), (0x77, 0x307),
        (0x77, 0x308), (0x77, 0x30A), (0x78, 0x307), (0x78, 0x308),
        (0x79, 0x300), (0x79, 0x303), (0x79, 0x304), (0x79, 0x307),
        (0x79, 0x30A), (0x7A, 0x302), (0xC2, 0x300), (0xC2, 0x301),
        (0xC2, 0x303), (0xC4, 0x304), (0xC5, 0x301), (0xC6, 0x301),
        (0xC6, 0x304), (0xC7, 0x301), (0xCA, 0x300), (0xCA, 0x301),
        (0xCA, 0x303), (0xCF, 0x301), (0xD4, 0x300), (0xD4, 0x301),
        (0xD4, 0x303), (0xD5, 0x301), (0xD5, 0x304), (0xD5, 0x308),
        (0xD6, 0x304), (0xD8, 0x301), (0xDC, 0x300), (0xDC, 0x301),
        (0xDC, 0x304), (0xDC, 0x30C), (0xE2, 0x300), (0xE2, 0x301),
        (0xE2, 0x303), (0xE4, 0x304), (0xE5, 0x301), (0xE6, 0x301),
        (0xE6, 0x304), (0xE7, 0x301), (0xEA, 0x300), (0xEA, 0x301),
        (0xEA, 0x303), (0xEF, 0x301), (0xF4, 0x300), (0xF4, 0x301),
        (0xF4, 0x303), (0xF5, 0x301), (0xF5, 0x304), (0xF5, 0x308),
        (0xF6, 0x304), (0xF8, 0x301), (0xFC, 0x300), (0xFC, 0x301),
        (0xFC, 0x304), (0xFC, 0x30C), (0x102, 0x300), (0x102, 0x301),
        (0x102, 0x303), (0x103, 0x300), (0x103, 0x301), (0x103, 0x303),
        (0x106, 0x327), (0x107, 0x327), (0x112, 0x300), (0x112, 0x301),
        (0x113, 0x300), (0x113, 0x301), (0x114, 0x327), (0x115, 0x327),
        (0x14C, 0x300), (0x14C, 0x301), (0x14C, 0x328), (0x14D, 0x300),
        (0x14D, 0x301), (0x14D, 0x328), (0x15A, 0x307), (0x15B, 0x307),
        (0x160, 0x307), (0x161, 0x307), (0x168, 0x301), (0x169, 0x301),
        (0x16A, 0x308), (0x16B, 0x308), (0x17F, 0x307),
    }
)


def _ccc(cp: int) -> int:
    return _CCC.get(cp, 0)


def nfc_normalize(s: str) -> tuple[str, int] | None:
    """UAX #15 NFC over the bounded table -> (normalized string,
    compositions performed); None when any codepoint falls outside
    the covered set (the degrade contract: never guess a ccc)."""
    cps: list[int] = []
    for ch in s:
        cp = ord(ch)
        d = _DECOMP.get(cp)
        if d is not None:
            cps.extend(d)
        elif cp < 0x80 or cp in _PASSTHRU or cp in _CCC:
            cps.append(cp)
        else:
            return None
    # canonical ordering: stable sort each nonzero-ccc run by ccc
    i, n = 0, len(cps)
    while i < n:
        if _ccc(cps[i]) == 0:
            i += 1
            continue
        j = i
        while j < n and _ccc(cps[j]) != 0:
            j += 1
        cps[i:j] = sorted(cps[i:j], key=_ccc)
        i = j
    # canonical composition (UAX #15 D117): last-starter + blocking
    out: list[int] = []
    starter = -1
    composed = 0
    for cp in cps:
        c = _ccc(cp)
        if starter >= 0 and c != 0:
            not_blocked = (
                len(out) - 1 == starter or _ccc(out[-1]) < c
            )
            if not_blocked:
                pair = _COMP.get((out[starter], cp))
                if pair is not None:
                    out[starter] = pair
                    composed += 1
                    continue
                if (out[starter], cp) in _UNSAFE:
                    # full Unicode composes this pair OUTSIDE the
                    # covered ranges: degrade, never emit a wrong NFC
                    return None
        out.append(cp)
        if c == 0:
            starter = len(out) - 1
    return "".join(map(chr, out)), composed


# --------------------------------------------------------------------------
# Spark surface + fixture
# --------------------------------------------------------------------------

# the 12 (base, mark) units the oracled fixture cycles through; the
# oracle carries its own independent pair -> composed mapping
_PAIRS: list[tuple[int, int]] = [
    (0x61, 0x300), (0x61, 0x301), (0x65, 0x301), (0x65, 0x300),
    (0x69, 0x301), (0x6F, 0x302), (0x75, 0x308), (0x6E, 0x303),
    (0x63, 0x327), (0x41, 0x301), (0x73, 0x30C), (0x7A, 0x307),
]


def _make_nfd_text(i: int) -> str:
    """Deterministic NFD test string: ``5 + i % 20`` units of ASCII
    filler + decomposed pair, one fixed multi-mark reorder unit
    (a + cedilla + grave -> a-grave + cedilla: ccc 202 does not
    block the ccc-230 mark), and — every 11th id — an out-of-table
    combining mark (U+0359) that must degrade."""
    k = 5 + i % 20
    parts = []
    for j in range(k):
        b, m = _PAIRS[(i + 3 * j) % 12]
        parts.append(chr(97 + (i + j) % 26) + chr(b) + chr(m))
    parts.append("a\u0327\u0300")
    if i % 11 == 0:
        parts.append("e\u0359")
    return "".join(parts)


NFC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("normalized", LongType()),
        StructField("n_composed", LongType()),
        StructField("out_len", LongType()),
        StructField("cp_sum", LongType()),
    ]
)


def nfc_normalize_stats(docs: DataFrame) -> DataFrame:
    """Per-doc NFC pass over the deterministic NFD fixture text:
    compositions performed, output length, output codepoint sum."""
    from gmall_flink_210726_spark.session import (
        ensure_parallelism,
        ship_package,
    )

    ship_package(docs.sparkSession)
    docs = ensure_parallelism(docs.select("doc_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"].astype("int64"):
                i = int(i)
                got = nfc_normalize(_make_nfd_text(i))
                if got is None:
                    rows.append(
                        {
                            "doc_id": i,
                            "normalized": 0,
                            "n_composed": 0,
                            "out_len": 0,
                            "cp_sum": 0,
                        }
                    )
                else:
                    text, composed = got
                    rows.append(
                        {
                            "doc_id": i,
                            "normalized": 1,
                            "n_composed": composed,
                            "out_len": len(text),
                            "cp_sum": sum(ord(c) for c in text),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in NFC_SCHEMA.fields]
            )

    return docs.select("doc_id").mapInPandas(gen, NFC_SCHEMA)


# --------------------------------------------------------------------------
# Composed front door: raw bytes -> charset chain -> NFC, one pass
# --------------------------------------------------------------------------


def _make_front_door_bytes(i: int) -> bytes:
    """Raw crawl-shaped bytes: even ids are UTF-8 of the NFD fixture
    text (decomposed marks, 2-byte sequences; every 22nd id carries
    the out-of-table mark); odd ids are cp1252/latin-1 single-byte
    text already COMPOSED (pairs 0-9 only — their composed points
    fit one byte), which the strict UTF-8 decode must reject."""
    if i % 2 == 0:
        return _make_nfd_text(i).encode("utf-8")
    parts = []
    for j in range(5 + i % 20):
        b, m = _PAIRS[(i + 3 * j) % 10]
        parts.append(chr(97 + (i + j) % 26) + chr(_COMP[(b, m)]))
    return "".join(parts).encode("latin-1")


def text_front_door_stats(docs: DataFrame) -> DataFrame:
    """The composed text FRONT DOOR as one operator: raw bytes ->
    strict-UTF-8 / cp1252 / latin-1 fallback chain (operators/
    charset.py) -> hand NFC (this module) -> per-doc proofs. The
    composition a crawl pipeline actually runs before tokenization;
    both layers keep their own degrade contracts (the chain never
    fails, NFC refuses out-of-table sequences)."""
    from gmall_flink_210726_spark.operators.charset import (
        cp1252_decode_strict,
        utf8_decode_strict,
    )
    from gmall_flink_210726_spark.session import (
        ensure_parallelism,
        ship_package,
    )

    ship_package(docs.sparkSession)
    docs = ensure_parallelism(docs.select("doc_id"))

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("encoding", StringType()),
            StructField("n_bytes", LongType()),
            StructField("n_cps", LongType()),
            StructField("normalized", LongType()),
            StructField("n_composed", LongType()),
            StructField("out_len", LongType()),
            StructField("out_cp_sum", LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"].astype("int64"):
                i = int(i)
                data = _make_front_door_bytes(i)
                cps = utf8_decode_strict(data)
                enc = "utf-8"
                if cps is None:
                    cps = cp1252_decode_strict(data)
                    enc = "cp1252"
                    if cps is None:
                        cps = list(data)
                        enc = "latin-1"
                got = nfc_normalize("".join(map(chr, cps)))
                row = {
                    "doc_id": i,
                    "encoding": enc,
                    "n_bytes": len(data),
                    "n_cps": len(cps),
                    "normalized": 0,
                    "n_composed": 0,
                    "out_len": 0,
                    "out_cp_sum": 0,
                }
                if got is not None:
                    text, composed = got
                    row.update(
                        normalized=1,
                        n_composed=composed,
                        out_len=len(text),
                        out_cp_sum=sum(ord(c) for c in text),
                    )
                rows.append(row)
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return docs.select("doc_id").mapInPandas(gen, schema)

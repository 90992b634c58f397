"""Hand NFC vs unicodedata: table integrity, reordering/blocking
semantics, the two-sided degrade contract, and a 50k-string fuzz
(operators/nfc.py)."""

from __future__ import annotations

import random
import unicodedata

from gmall_flink_210726_spark.operators.nfc import (
    _CCC,
    _COMP,
    _DECOMP,
    _UNSAFE,
    _make_nfd_text,
    nfc_normalize,
)

_COVERED = frozenset(range(0x80)) | frozenset(range(0xC0, 0x180))


class TestTableIntegrity:
    def test_decompositions_match_unicodedata(self):
        """Every in-code table entry equals UnicodeData.txt, and no
        canonical decomposition in the range is missing."""
        for cp in range(0xC0, 0x180):
            d = unicodedata.decomposition(chr(cp))
            if d and not d.startswith("<"):
                parts = tuple(int(x, 16) for x in d.split())
                assert _DECOMP.get(cp) == parts, hex(cp)
            else:
                assert cp not in _DECOMP, hex(cp)

    def test_ccc_match_unicodedata(self):
        for m, c in _CCC.items():
            assert unicodedata.combining(chr(m)) == c, hex(m)

    def test_unsafe_pairs_really_compose_outside(self):
        for b, m in _UNSAFE:
            s = unicodedata.normalize("NFC", chr(b) + chr(m))
            assert len(s) == 1 and ord(s) not in _COVERED, (hex(b), hex(m))
            assert (b, m) not in _COMP

    def test_unsafe_is_exhaustive(self):
        """No (coverable starter, mark) composition is missing from
        _COMP | _UNSAFE."""
        for b in list(range(0x20, 0x80)) + list(range(0xC0, 0x180)):
            for m in _CCC:
                s = unicodedata.normalize("NFC", chr(b) + chr(m))
                if len(s) == 1:
                    assert (b, m) in _COMP or (b, m) in _UNSAFE, (
                        hex(b),
                        hex(m),
                    )


class TestSemantics:
    def test_simple_composition(self):
        assert nfc_normalize("á") == ("á", 1)
        assert nfc_normalize("š") == ("š", 1)
        assert nfc_normalize("plain ascii") == ("plain ascii", 0)

    def test_already_composed_is_fixed_point(self):
        s = "éšž café"
        assert nfc_normalize(s) == (s, len([c for c in s if ord(c) > 0x7F]))

    def test_reorder_and_nonblocking(self):
        """cedilla (ccc 202) before grave (ccc 230): the grave still
        composes with the base across it (not blocked)."""
        got = nfc_normalize("à̧")
        assert got == ("à̧", 1)
        # and the reversed input order canonically reorders first
        assert nfc_normalize("à̧") == ("à̧", 1)

    def test_blocked_mark_does_not_compose(self):
        """Two ccc-230 marks: the second is blocked from the base by
        the first ONLY if the first was not absorbed; after a+0308
        composes to a-umlaut the acute is adjacent, but (a-umlaut,
        acute) has no covered or full-Unicode target, so it stays."""
        got = nfc_normalize("ä́")
        assert got is not None
        assert got[0] == unicodedata.normalize("NFC", "ä́")

    def test_degrade_out_of_table_codepoint(self):
        assert nfc_normalize("e͙") is None  # unknown ccc
        assert nfc_normalize("中") is None  # CJK: outside ranges

    def test_degrade_unsafe_composition(self):
        assert nfc_normalize("ǧ") is None  # -> U+01E7 (Ext-B)
        assert nfc_normalize("ầ") is None  # -> U+1EA7

    def test_fixture_stripes(self):
        assert nfc_normalize(_make_nfd_text(11)) is None
        got = nfc_normalize(_make_nfd_text(3))
        assert got is not None and got[1] == (5 + 3 % 20) + 1


class TestFuzzAgreement:
    def test_50k_covered_alphabet_strings(self):
        """Whenever the bounded NFC returns a result it must equal
        unicodedata.normalize('NFC'); whenever it degrades, full NFC
        must truly leave the covered set."""
        rng = random.Random(20260815)
        alpha = (
            [chr(c) for c in range(0x61, 0x7B)]
            + [
                chr(c)
                for c in (0xE0, 0xE9, 0xC7, 0x161, 0x17E, 0x101, 0x151)
            ]
            + [chr(m) for m in _CCC]
        )
        degrades = 0
        for _ in range(50000):
            s = "".join(
                rng.choice(alpha) for _ in range(rng.randint(1, 12))
            )
            got = nfc_normalize(s)
            ref = unicodedata.normalize("NFC", s)
            if got is None:
                degrades += 1
                assert any(ord(c) not in _COVERED for c in ref), repr(s)
            else:
                assert got[0] == ref, repr(s)
        # the degrade path must not swallow the test
        assert degrades < 10000


class TestFrontDoorComposition:
    def test_routes_and_layer_independence(self):
        from gmall_flink_210726_spark.operators.charset import (
            cp1252_decode_strict,
            utf8_decode_strict,
        )
        from gmall_flink_210726_spark.operators.nfc import (
            _make_front_door_bytes,
        )

        # even: valid UTF-8 of decomposed text
        data = _make_front_door_bytes(2)
        cps = utf8_decode_strict(data)
        assert cps is not None
        got = nfc_normalize("".join(map(chr, cps)))
        assert got is not None and got[1] == (5 + 2 % 20) + 1
        # odd: strict UTF-8 must reject, cp1252 must accept
        data = _make_front_door_bytes(3)
        assert utf8_decode_strict(data) is None
        cps = cp1252_decode_strict(data)
        assert cps is not None
        got = nfc_normalize("".join(map(chr, cps)))
        # already-composed: fixed point with k recompositions
        assert got is not None and got[1] == 5 + 3 % 20
        # every 22nd id: charset layer succeeds, NFC layer refuses
        data = _make_front_door_bytes(22)
        cps = utf8_decode_strict(data)
        assert cps is not None
        assert nfc_normalize("".join(map(chr, cps))) is None

"""Charset fallback transcode: the hand cp1252 table vs Python's
codec, strict-UTF-8 agreement, fallback-chain semantics
(operators/charset.py)."""

from __future__ import annotations

import random

from gmall_flink_210726_spark.operators.charset import (
    _CP1252_HIGH,
    charset_transcode,
    cp1252_decode_strict,
    utf8_decode_strict,
)

_UNDEFINED = {0x81, 0x8D, 0x8F, 0x90, 0x9D}


class TestCp1252Table:
    def test_all_256_bytes_vs_python_codec(self):
        for b in range(256):
            got = cp1252_decode_strict(bytes([b]))
            if b in _UNDEFINED:
                assert got is None
                try:
                    bytes([b]).decode("cp1252")
                    raise AssertionError("python codec accepted undefined")
                except UnicodeDecodeError:
                    pass
            else:
                want = bytes([b]).decode("cp1252")
                assert got == [ord(want)], hex(b)

    def test_high_table_has_27_printables_and_5_holes(self):
        assert len(_CP1252_HIGH) == 32
        assert sum(1 for c in _CP1252_HIGH if c is None) == 5


class TestUtf8StrictDecode:
    def test_fuzz_vs_python_strict(self):
        rng = random.Random(1252)
        for _ in range(2000):
            b = bytes(rng.randrange(256) for _ in range(rng.randrange(24)))
            got = utf8_decode_strict(b)
            try:
                want = [ord(c) for c in b.decode("utf-8", "strict")]
            except UnicodeDecodeError:
                want = None
            assert got == want, b.hex()

    def test_classic_bugs_rejected(self):
        assert utf8_decode_strict(b"\xc0\xaf") is None  # overlong /
        assert utf8_decode_strict(b"\xed\xa0\x80") is None  # surrogate
        assert utf8_decode_strict(b"\xf0\x9f") is None  # truncated
        assert utf8_decode_strict(b"\xf4\x90\x80\x80") is None  # >10FFFF

    def test_agrees_with_classifier(self):
        """utf8_classify and utf8_decode_strict are two walks over
        the same grammar — accept/reject must agree, and the class
        counts must be derivable from the decoded code points."""
        from gmall_flink_210726_spark.operators.utf8 import utf8_classify

        rng = random.Random(3629)
        for _ in range(1000):
            b = bytes(rng.randrange(256) for _ in range(rng.randrange(16)))
            cps = utf8_decode_strict(b)
            st = utf8_classify(b)
            assert (cps is None) == (st is None)
            if cps is not None:
                assert st["n_ascii"] == sum(1 for c in cps if c < 0x80)
                assert st["n_2byte"] == sum(
                    1 for c in cps if 0x80 <= c < 0x800
                )
                assert st["n_3byte"] == sum(
                    1 for c in cps if 0x800 <= c < 0x10000
                )
                assert st["n_4byte"] == sum(1 for c in cps if c >= 0x10000)


class TestFallbackChain:
    def test_chain_matches_python_chain_on_fuzz(self):
        rng = random.Random(4)
        for _ in range(2000):
            b = bytes(rng.randrange(256) for _ in range(rng.randrange(32)))
            got = charset_transcode(b)
            for enc in ("utf-8", "cp1252", "latin-1"):
                try:
                    s = b.decode(enc)
                    break
                except UnicodeDecodeError:
                    continue
            assert got["encoding"] == enc
            assert got["n_cps"] == len(s)
            assert got["cp_sum"] == sum(ord(c) for c in s)
            assert got["n_bytes"] == len(b)

    def test_undefined_byte_falls_to_latin1(self):
        r = charset_transcode(b"ab\x93cd\x9d")
        assert r["encoding"] == "latin-1"
        assert r["cp_sum"] == sum(b"ab\x93cd\x9d")
        assert r["n_c1_recovered"] == 2  # 0x93 and 0x9d both in C1 range

    def test_smart_quotes_recover_through_cp1252(self):
        r = charset_transcode(b"\x93hi\x94")
        assert r["encoding"] == "cp1252"
        assert r["cp_sum"] == 0x201C + ord("h") + ord("i") + 0x201D
        assert r["n_c1_recovered"] == 2

    def test_empty_and_ascii_are_utf8(self):
        assert charset_transcode(b"")["encoding"] == "utf-8"
        r = charset_transcode(b"plain")
        assert r["encoding"] == "utf-8"
        assert r["n_c1_recovered"] == 0


class TestUtf16:
    def test_fuzz_vs_python_codecs(self):
        from gmall_flink_210726_spark.operators.charset import (
            utf16_decode_strict,
        )

        rng = random.Random(2781)
        for _ in range(3000):
            b = bytes(rng.randrange(256) for _ in range(rng.randrange(24)))
            got = utf16_decode_strict(b)
            want = None
            if len(b) >= 2 and len(b) % 2 == 0:
                enc = {b"\xff\xfe": "utf-16-le", b"\xfe\xff": "utf-16-be"}.get(b[:2])
                if enc:
                    try:
                        want = (
                            [ord(c) for c in b[2:].decode(enc, "strict")],
                            enc.replace("-16-", "-16"),
                        )
                    except UnicodeDecodeError:
                        want = None
            assert got == want, b.hex()

    def test_surrogate_edges(self):
        from gmall_flink_210726_spark.operators.charset import (
            utf16_decode_strict,
        )

        # paired astral U+10437 little-endian
        ok = utf16_decode_strict(b"\xff\xfe\x01\xd8\x37\xdc")
        assert ok == ([0x10437], "utf-16le")
        # lone high surrogate at EOF
        assert utf16_decode_strict(b"\xff\xfe\x01\xd8") is None
        # high followed by non-low
        assert utf16_decode_strict(b"\xff\xfe\x01\xd8\x41\x00") is None
        # lone low surrogate
        assert utf16_decode_strict(b"\xff\xfe\x00\xdc") is None
        # no BOM -> not handled by the strict decoder
        assert utf16_decode_strict(b"\x41\x00\x42\x00") is None
        # odd byte count
        assert utf16_decode_strict(b"\xff\xfe\x41") is None

    def test_web_chain_order(self):
        from gmall_flink_210726_spark.operators.charset import (
            charset_transcode_web,
        )

        # BOM outranks: these bytes are ALSO cp1252-decodable
        r = charset_transcode_web(b"\xff\xfe\x41\x00")
        assert r["encoding"] == "utf-16le" and r["cp_sum"] == 0x41
        # plain ASCII stays utf-8
        assert charset_transcode_web(b"hi")["encoding"] == "utf-8"
        # BOM + odd length is not UTF-16; 0xFF/0xFE are defined in
        # cp1252 (y-umlaut / thorn), so the chain settles there
        r = charset_transcode_web(b"\xff\xfe\x41")
        assert r["encoding"] == "cp1252"
        assert r["cp_sum"] == 0xFF + 0xFE + 0x41
        # ... and an undefined byte after the BOM reaches the floor
        r = charset_transcode_web(b"\xff\xfe\x41\x90\x41")
        assert r["encoding"] == "latin-1"
        assert r["cp_sum"] == 0xFF + 0xFE + 0x41 + 0x90 + 0x41

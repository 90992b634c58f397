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


class TestDecodeWebBytes:
    """The front-door chain (decode_web_bytes): byte-for-byte
    agreement with Python's own codecs on every rung, plus the rung
    precedence contract (VERDICT r12 item 1)."""

    def _rand_text(self, rng, n, cp1252_only=False):
        pool = (
            "abcdefghijklmnop qrstuv 0123456789 éàüñ—“”‰€ŒžŸ"
            if cp1252_only
            else "abc def 0123 éàüñ—“”€ 中文字 𝄞🙂 λόγος"
        )
        return "".join(rng.choice(pool) for _ in range(n))

    def test_codec_agreement_fuzz(self):
        from gmall_flink_210726_spark.operators.charset import (
            decode_web_bytes,
        )

        rng = random.Random(1312)
        for trial in range(200):
            n = 1 + rng.randrange(120)
            # utf-8 rung
            t = self._rand_text(rng, n)
            text, enc, src = decode_web_bytes(t.encode("utf-8"))
            assert text == t and enc == "utf-8"
            # declared utf-8 honored
            text, enc, src = decode_web_bytes(
                t.encode("utf-8"), "UTF-8"
            )
            assert text == t and src == "http"
            # utf-16 BOM rung, both orders — agreement with codecs
            for codec in ("utf-16", "utf-16le", "utf-16be"):
                raw = t.encode(codec)
                if codec != "utf-16":
                    bom = (
                        b"\xff\xfe" if codec == "utf-16le" else b"\xfe\xff"
                    )
                    raw = bom + raw
                text, enc, src = decode_web_bytes(raw)
                assert src == "bom"
                assert text == raw[2:].decode(
                    "utf-16le" if raw[:2] == b"\xff\xfe" else "utf-16be"
                )
            # cp1252 rung (non-UTF-8 bytes): agreement with codec
            t2 = self._rand_text(rng, n, cp1252_only=True)
            raw = t2.encode("cp1252")
            text, enc, src = decode_web_bytes(raw)
            if enc == "cp1252":
                assert text == raw.decode("cp1252")
            else:  # pure-ASCII draws legitimately land utf-8
                assert raw.decode("utf-8") == text

    def test_rung_precedence(self):
        from gmall_flink_210726_spark.operators.charset import (
            decode_web_bytes,
        )

        body = "café — “quote”"
        cp = body.encode("cp1252")
        # honest declaration fires the http rung
        assert decode_web_bytes(cp, "windows-1252") == (
            body, "cp1252", "http"
        )
        # WHATWG legacy mapping: latin-1/iso-8859-1 label cp1252
        assert decode_web_bytes(cp, "iso-8859-1")[2] == "http"
        assert decode_web_bytes(cp, "latin-1")[0] == body
        # LYING utf-8 declaration over cp1252 bytes falls through to
        # the content sniff and still recovers the text
        text, enc, src = decode_web_bytes(cp, "utf-8")
        assert (text, enc, src) == (body, "cp1252", "content")
        # unknown label -> sniff
        assert decode_web_bytes(body.encode("utf-8"), "ebcdic") == (
            body, "utf-8", "content"
        )
        # BOM outranks meta: utf-16 bytes containing a meta tag
        page = '<meta charset="windows-1252">' + body
        raw = page.encode("utf-16")
        assert decode_web_bytes(raw) == (page, "utf-16le", "bom")
        # meta rung on header-less cp1252
        raw = page.encode("cp1252")
        assert decode_web_bytes(raw) == (page, "cp1252", "meta")
        # utf-8 BOM rung
        raw = b"\xef\xbb\xbf" + body.encode("utf-8")
        assert decode_web_bytes(raw) == (body, "utf-8", "bom")
        # floor: undefined cp1252 byte in otherwise-broken utf-8
        raw = b"\x90\xff"
        assert decode_web_bytes(raw) == (
            raw.decode("latin-1"), "latin-1", "floor"
        )

    def test_declared_utf16_without_bom(self):
        from gmall_flink_210726_spark.operators.charset import (
            decode_web_bytes,
        )

        t = "pair 𝄞 end"
        raw = t.encode("utf-16le")  # no BOM
        assert decode_web_bytes(raw, "utf-16") == (t, "utf-16le", "http")
        raw = t.encode("utf-16be")
        assert decode_web_bytes(raw, "utf-16be") == (
            t, "utf-16be", "http"
        )
        # declared utf-16 WITH a BOM: the BOM wins over the label
        raw = t.encode("utf-16")  # FF FE + LE
        assert decode_web_bytes(raw, "utf-16be")[0] == t


class TestMetaPrescanComments:
    def test_meta_in_comment_ignored(self):
        """WHATWG prescan: a <meta charset> inside an HTML comment is
        not a declaration (ADVICE r13)."""
        from gmall_flink_210726_spark.operators.charset import (
            sniff_meta_charset,
        )

        body = b"<!-- <meta charset=koi8-r> --><p>x</p>"
        assert sniff_meta_charset(body) is None
        # unclosed comment eats the rest of the window
        body2 = b"<!-- <meta charset=koi8-r> <p>x</p>"
        assert sniff_meta_charset(body2) is None
        # a real declaration after a comment still fires
        body3 = b"<!-- hi --><meta charset=windows-1252><p>x</p>"
        assert sniff_meta_charset(body3) == "windows-1252"

    def test_degenerate_complete_comments(self):
        """WHATWG's <!--> and <!---> close immediately (the opener's
        -- may overlap the closer) — they must not swallow a
        following real declaration."""
        from gmall_flink_210726_spark.operators.charset import (
            sniff_meta_charset,
        )

        assert (
            sniff_meta_charset(b"<!--><meta charset=windows-1252>")
            == "windows-1252"
        )
        assert (
            sniff_meta_charset(b"<!---><meta charset=utf-8>")
            == "utf-8"
        )
        # the 4-dash form is an ordinary empty comment
        assert (
            sniff_meta_charset(b"<!----><meta charset=big5>") == "big5"
        )
        # <!--> closes at once, so a later --> is plain text
        assert (
            sniff_meta_charset(b"<!--><meta charset=gbk>-->") == "gbk"
        )

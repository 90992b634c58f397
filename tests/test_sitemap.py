"""Sitemap XML subset parser: grammar strictness, entity decode,
protocol interpretation (operators/sitemap.py)."""

from __future__ import annotations

import pytest

from gmall_flink_210726_spark.operators.sitemap import (
    _decode_text,
    _make_sitemap,
    parse_sitemap,
    parse_xml,
)


class TestXmlSubset:
    def test_nested_tree(self):
        tag, body = parse_xml(
            '<?xml version="1.0"?><a><b>x</b><c><d>y</d></c></a>'
        )
        assert tag == "a"
        assert body[0] == ("b", "x")
        assert body[1] == ("c", [("d", "y")])

    def test_comments_and_self_closing(self):
        tag, body = parse_xml("<!-- hi --><a><b/><!-- mid --><c>t</c></a>")
        assert body == [("b", []), ("c", "t")]

    def test_mismatched_close_rejects(self):
        with pytest.raises(ValueError):
            parse_xml("<a><b>x</c></a>")

    def test_unclosed_rejects(self):
        with pytest.raises(ValueError):
            parse_xml("<a><b>x</b>")

    def test_trailing_content_rejects(self):
        with pytest.raises(ValueError):
            parse_xml("<a>x</a><b>y</b>")

    def test_mixed_content_rejects(self):
        with pytest.raises(ValueError):
            parse_xml("<a>text<b>x</b></a>")

    def test_entities(self):
        assert _decode_text("1 &lt; 2 &amp;&amp; 2 &gt; 1") == "1 < 2 && 2 > 1"
        assert _decode_text("&#65;&#x42;&quot;&apos;") == "AB\"'"
        for bad in ("&amp", "&nope;", "&#xzz;", "&#;", "raw<"):
            with pytest.raises(ValueError):
                _decode_text(bad)


class TestProtocol:
    def test_urlset_with_priorities(self):
        st = parse_sitemap(
            "<urlset>"
            "<url><loc>https://e.com/a?x=1&amp;y=2</loc>"
            "<priority>0.8</priority></url>"
            "<url><loc>https://e.com/b</loc></url>"
            "</urlset>"
        )
        assert st["kind"] == "urlset" and st["n_entries"] == 2
        assert st["loc_len_sum"] == len("https://e.com/a?x=1&y=2") + len(
            "https://e.com/b"
        )
        assert st["pri_x10_sum"] == 8

    def test_sitemapindex(self):
        st = parse_sitemap(
            "<sitemapindex><sitemap><loc>https://e.com/1.xml</loc>"
            "</sitemap></sitemapindex>"
        )
        assert st["kind"] == "sitemapindex" and st["n_entries"] == 1

    def test_rejections(self):
        assert parse_sitemap("<other><url/></other>") is None
        assert parse_sitemap("<urlset><url></url></urlset>") is None
        assert (
            parse_sitemap(
                "<urlset><url><loc>x</loc>"
                "<priority>1.5</priority></url></urlset>"
            )
            is None
        )

    def test_fixture_corrupt_stripe(self):
        assert parse_sitemap(_make_sitemap(7)) is None
        assert parse_sitemap(_make_sitemap(14)) is None
        assert parse_sitemap(_make_sitemap(2)) is not None

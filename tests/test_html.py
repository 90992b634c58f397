"""HTML->text extraction: grammar behavior, parser traps, malformed
degrade, fixture/oracle agreement (operators/html.py)."""

from __future__ import annotations

from gmall_flink_210726_spark.operators.html import (
    _make_html,
    extract_text,
)


class TestGrammar:
    def test_block_vs_inline(self):
        r = extract_text("<p>a <b>b</b> c</p><div>d</div>")
        assert r["blocks"] == ["a b c", "d"]

    def test_script_swallows_fake_markup(self):
        r = extract_text(
            '<script>var s = "<p>no</p>"; if (1<2) {}</script><p>yes</p>'
        )
        assert r["blocks"] == ["yes"]

    def test_style_swallows_gt_selector(self):
        r = extract_text("<style>.x > .y { color: red }</style><p>t</p>")
        assert r["blocks"] == ["t"]

    def test_comment_hides_markup(self):
        r = extract_text("<p>a</p><!-- <div>gone</div> --><p>b</p>")
        assert r["blocks"] == ["a", "b"]

    def test_quoted_gt_in_attribute(self):
        r = extract_text('<p><a title="a>b" href="u">x</a> y</p>')
        assert r["blocks"] == ["x y"]

    def test_entities_named_and_numeric(self):
        r = extract_text("<p>&amp;&lt;&gt;&quot;&apos;&#65;&#x42;</p>")
        assert r["blocks"] == ["&<>\"'AB"]

    def test_unknown_entity_passes_through(self):
        r = extract_text("<p>AT&T &bogus; &#xZZ; ok</p>")
        assert r["blocks"] == ["AT&T &bogus; &#xZZ; ok"]

    def test_title_captured_separately(self):
        r = extract_text("<title>T &amp; U</title><p>body</p>")
        assert r["title"] == "T & U"
        assert r["blocks"] == ["body"]

    def test_uppercase_and_selfclosing_tags(self):
        r = extract_text("<P>a</P><BR/><DIV CLASS='x'>b</DIV>")
        assert r["blocks"] == ["a", "b"]

    def test_br_splits_block(self):
        r = extract_text("<p>a<br>b</p>")
        assert r["blocks"] == ["a", "b"]

    def test_whitespace_collapses_inside_block(self):
        r = extract_text("<p>  a\n\t b   c </p>")
        assert r["blocks"] == ["a b c"]

    def test_doctype_ignored(self):
        r = extract_text("<!DOCTYPE html><p>x</p>")
        assert r["blocks"] == ["x"]


class TestMalformed:
    def test_unterminated_comment(self):
        assert extract_text("<p>a</p><!-- oops") is None

    def test_unterminated_script(self):
        assert extract_text("<script>var x = 1;") is None

    def test_unterminated_tag(self):
        assert extract_text("<p>a</p><div class=") is None

    def test_unterminated_title(self):
        assert extract_text("<title>half") is None

    def test_empty_input_ok(self):
        r = extract_text("")
        assert r == {"title": "", "blocks": []}


class TestFixtureContract:
    def test_roundtrip_matches_oracle_formula(self):
        text = " ".join(f"w{k}" for k in range(13))
        for i in (1, 2, 3, 7, 12):
            r = extract_text(_make_html(i, text))
            ws = text.split(" ")
            h = len(ws) // 2
            want = (
                [f"Heading {i}", " ".join(ws[:h]), " ".join(ws[h:])]
                + [f"item {i} {j}" for j in range(1 + i % 3)]
                + [f'amp & lt < gt > quote " num A hex B link {i} end']
            )
            assert r["blocks"] == want, i
            assert r["title"] == f"Doc {i}"

    def test_corrupt_stripe_degrades(self):
        assert extract_text(_make_html(0, "a b c d")) is None
        assert extract_text(_make_html(22, "a b c d")) is None


class TestRawTextCloserBoundary:
    def test_scripts_tag_does_not_close_script(self):
        """ADVICE r9 (low): '</scripts>' must NOT end a <script>
        raw-text swallow — the char after the name has to be '>',
        whitespace, or '/'."""
        r = extract_text(
            "<script>a = 1; // </scripts> not a closer\n"
            "b = 2;</script><p>ok</p>"
        )
        assert r["blocks"] == ["ok"]

    def test_closer_with_whitespace_before_gt(self):
        r = extract_text("<script>x<y</script ><p>t</p>")
        assert r["blocks"] == ["t"]

    def test_unterminated_script_still_degrades(self):
        assert extract_text("<script>never closed <p>x</p>") is None

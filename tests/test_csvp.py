"""RFC 4180 CSV state machine (operators/csvp.py)."""

from __future__ import annotations

import csv as stdcsv
import io

from gmall_flink_210726_spark.operators.csvp import (
    _csv_stats,
    _make_csv,
    parse_csv,
)


class TestGrammar:
    def test_embedded_comma_newline_and_escape(self):
        text = 'a,b\r\n"x, y","l1\r\nl2 ""q"""\r\n'
        assert parse_csv(text) == [
            ["a", "b"],
            ["x, y", 'l1\r\nl2 "q"'],
        ]

    def test_agrees_with_stdlib_on_fixtures(self):
        for i in (1, 4, 9, 12):
            text = _make_csv(i)
            assert parse_csv(text) == list(
                stdcsv.reader(io.StringIO(text))
            )

    def test_final_row_without_terminator(self):
        assert parse_csv("a,b\r\n1,2") == [["a", "b"], ["1", "2"]]

    def test_unterminated_quote_rejected(self):
        assert parse_csv('a\r\n"oops') is None

    def test_quote_in_unquoted_field_rejected(self):
        assert parse_csv('a\r\nval"ue') is None

    def test_junk_after_closing_quote_rejected(self):
        assert parse_csv('a\r\n"x"y') is None

    def test_bare_cr_rejected(self):
        assert parse_csv("a\rb") is None

    def test_ragged_rows_rejected(self):
        assert parse_csv("a,b\r\n1,2,3\r\n") is None


class TestStats:
    def test_corrupt_stripe(self):
        assert _csv_stats(_make_csv(13)) is None
        assert _csv_stats(_make_csv(0)) is None

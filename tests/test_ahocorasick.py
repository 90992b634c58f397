"""Aho-Corasick automaton: textbook example, overlap/output-link
semantics, naive-scan fuzz (operators/ahocorasick.py)."""

from __future__ import annotations

import random

from gmall_flink_210726_spark.operators.ahocorasick import (
    ac_build,
    ac_count,
)


def _naive(text: str, patterns: list[str]) -> list[int]:
    return [
        sum(
            1
            for i in range(len(text) - len(p) + 1)
            if text[i : i + len(p)] == p
        )
        for p in patterns
    ]


class TestTextbook:
    def test_aho_corasick_1975_example(self):
        """The original paper's pattern set {he, she, his, hers} on
        'ushers': she at 1, he at 2 (inside ushers), hers at 2."""
        pats = ["he", "she", "his", "hers"]
        ac = ac_build(pats)
        assert ac_count("ushers", ac, 4) == [1, 1, 0, 1]

    def test_nested_outputs_all_fire(self):
        pats = ["in", "ing", "n"]
        ac = ac_build(pats)
        # 'ing': n at 2, in at 0, ing at 0
        assert ac_count("ing", ac, 3) == [1, 1, 1]

    def test_overlapping_occurrences(self):
        pats = ["aa"]
        ac = ac_build(pats)
        assert ac_count("aaaa", ac, 1) == [3]  # overlaps count


class TestFuzz:
    def test_matches_naive_scan(self):
        rng = random.Random(1975)
        for _ in range(300):
            pats = sorted(
                {
                    "".join(
                        rng.choice("abc")
                        for _ in range(rng.randrange(1, 5))
                    )
                    for _ in range(rng.randrange(1, 9))
                }
            )
            text = "".join(
                rng.choice("abc") for _ in range(rng.randrange(0, 60))
            )
            ac = ac_build(pats)
            assert ac_count(text, ac, len(pats)) == _naive(text, pats), (
                pats,
                text,
            )

    def test_blocklist_set_matches_naive(self):
        from gmall_flink_210726_spark.operators.ahocorasick import (
            BLOCKLIST,
        )

        rng = random.Random(2)
        words = ["she", "ushers", "things", "nation", "rating",
                 "then", "and", "banter", "x"]
        for _ in range(100):
            text = " ".join(
                rng.choice(words) for _ in range(rng.randrange(0, 30))
            )
            ac = ac_build(list(BLOCKLIST))
            assert ac_count(text, ac, len(BLOCKLIST)) == _naive(
                text, list(BLOCKLIST)
            )

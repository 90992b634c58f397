"""Robots Exclusion Protocol (RFC 9309): pattern matcher canonical
examples, group selection, precedence (operators/robots.py)."""

from __future__ import annotations

from gmall_flink_210726_spark.operators.robots import (
    _make_robots,
    _pattern_matches,
    parse_robots,
    robots_allowed,
    select_group,
)


class TestPatternMatcher:
    def test_canonical_rep_examples(self):
        """The matcher table every REP implementation publishes
        (RFC 9309 §2.2.3 / the reference matcher's doc examples)."""
        yes = [
            ("/fish", "/fish.html"),
            ("/fish", "/fishheads/yummy.html"),
            ("/fish*", "/fishheads"),
            ("/fish/", "/fish/salmon.htm"),
            ("/*.php", "/index.php"),
            ("/*.php", "/folder/filename.php?params"),
            ("/*.php$", "/filename.php"),
            ("/fish*.php", "/fishheads/catfish.php?params"),
            ("/p$", "/p"),
            ("/a*b*c$", "/a-x-b-y-c"),
            ("/a*$", "/a/deep/anything"),
        ]
        no = [
            ("/fish", "/Fish.asp"),
            ("/fish/", "/fish.html"),
            ("/*.php", "/"),
            ("/*.php$", "/filename.php?params"),
            ("/*.php$", "/filename.php/"),
            ("/fish*.php", "/Fish.PHP"),
            ("/p$", "/pq"),
            ("/a*b*c$", "/a-x-b-y-c-d"),
        ]
        for pat, path in yes:
            assert _pattern_matches(pat, path), (pat, path)
        for pat, path in no:
            assert not _pattern_matches(pat, path), (pat, path)


class TestGroupsAndPrecedence:
    TEXT = (
        "# comment\n"
        "Disallow: /orphan-rule-ignored\n"
        "User-agent: alphabot\n"
        "User-agent: betabot\n"
        "Disallow: /shared/\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/open/\n"
        "Sitemap: https://example.com/map.xml\n"
        "Disallow: /*.bak$\n"
    )

    def test_consecutive_agent_lines_share_a_group(self):
        g = parse_robots(self.TEXT)
        assert select_group(g, "alphabot") == select_group(g, "betabot")
        assert not robots_allowed(g, "alphabot", "/shared/x")
        # the specific group is NOT merged with '*'
        assert robots_allowed(g, "alphabot", "/private/x")

    def test_longest_pattern_wins_and_allow_breaks_ties(self):
        g = parse_robots(self.TEXT)
        assert not robots_allowed(g, "somebot", "/private/x")
        assert robots_allowed(g, "somebot", "/private/open/x")
        assert not robots_allowed(g, "somebot", "/a/file.bak")
        # equal-length allow/disallow -> allow
        g2 = parse_robots(
            "User-agent: *\nAllow: /dir/\nDisallow: /dir/\n"
        )
        assert robots_allowed(g2, "x", "/dir/page")

    def test_no_group_means_allowed(self):
        g = parse_robots("User-agent: onlybot\nDisallow: /\n")
        assert robots_allowed(g, "someone-else", "/anything")
        assert not robots_allowed(g, "onlybot-2.0", "/anything")

    def test_empty_disallow_allows_everything(self):
        g = parse_robots("User-agent: *\nDisallow:\n")
        assert robots_allowed(g, "x", "/anything")

    def test_case_insensitive_fields_and_agents(self):
        g = parse_robots("USER-AGENT: MixedBot\nDISALLOW: /x/\n")
        assert not robots_allowed(g, "mixedbot", "/x/1")


class TestFixtureContract:
    def test_specific_group_replaces_star(self):
        g0 = parse_robots(_make_robots(0))  # has a gmallbot group
        assert robots_allowed(g0, "gmallbot", "/private/x1")
        assert robots_allowed(g0, "gmallbot", "/data/9.zip")
        assert not robots_allowed(g0, "gmallbot", "/tmp/7")
        assert not robots_allowed(g0, "otherbot", "/anything")
        g1 = parse_robots(_make_robots(1))  # '*' group applies
        assert not robots_allowed(g1, "gmallbot", "/private/x1")
        assert robots_allowed(g1, "gmallbot", "/private/pub1/y")
        assert not robots_allowed(g1, "gmallbot", "/data/9.zip")
        assert robots_allowed(g1, "gmallbot", "/tmp/7")


class TestRfc9309Advice:
    """Round-11 ADVICE fixes: §2.2.4 unknown fields don't affect
    parsing, and §2.2.1 same-agent groups merge their rules."""

    def test_unknown_field_does_not_break_agent_accumulation(self):
        g = parse_robots(
            "User-agent: a\n"
            "Crawl-delay: 5\n"
            "User-agent: b\n"
            "Disallow: /x/\n"
        )
        # both agents share ONE group (crawl-delay is transparent)
        assert len(g) == 1
        assert g[0][0] == ["a", "b"]
        assert not robots_allowed(g, "a", "/x/1")
        assert not robots_allowed(g, "b", "/x/1")

    def test_sitemap_between_groups_is_transparent(self):
        g = parse_robots(
            "User-agent: a\nDisallow: /p/\n"
            "Sitemap: https://e.test/s.xml\n"
            "User-agent: b\nDisallow: /q/\n"
        )
        assert len(g) == 2
        assert not robots_allowed(g, "b", "/q/1")
        assert robots_allowed(g, "b", "/p/1")

    def test_same_agent_groups_merge_rules(self):
        g = parse_robots(
            "User-agent: mybot\nDisallow: /a/\n"
            "User-agent: other\nDisallow: /\n"
            "User-agent: mybot\nDisallow: /b/\n"
        )
        rules = select_group(g, "mybot")
        assert rules == [(False, "/a/"), (False, "/b/")]
        assert not robots_allowed(g, "mybot", "/a/1")
        assert not robots_allowed(g, "mybot", "/b/1")
        assert robots_allowed(g, "mybot", "/c/1")

    def test_star_groups_merge_on_fallback(self):
        g = parse_robots(
            "User-agent: *\nDisallow: /a/\n"
            "User-agent: *\nDisallow: /b/\n"
        )
        assert not robots_allowed(g, "anybot", "/a/1")
        assert not robots_allowed(g, "anybot", "/b/1")
        assert robots_allowed(g, "anybot", "/c/1")

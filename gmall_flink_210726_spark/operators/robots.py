"""robots.txt parsing + allow/deny evaluation (RFC 9309, the Robots
Exclusion Protocol) — crawl governance, the step a compliant corpus
pipeline runs BEFORE fetching anything: every (host, path) candidate
is checked against the host's robots.txt, so the URL frontier join
is a first-class data-pipeline operator, not an afterthought.

Grammar and semantics implemented from the RFC:

- lines are ``field: value`` with ``#`` comments stripped; field
  names case-insensitive; unknown fields (crawl-delay, sitemap, ...)
  are ignored but do NOT break a group;
- consecutive ``User-agent`` lines open a GROUP; ``Allow`` /
  ``Disallow`` rules attach to the open group (rules before any
  user-agent line are ignored);
- group selection (§2.2.1): a crawler obeys the group whose
  user-agent token is the LONGEST case-insensitive prefix of its
  product token; ``*`` matches any crawler but only applies when no
  specific group matched — and the chosen group's rules are NOT
  merged with the ``*`` group's;
- rule matching (§2.2.2): the rule whose path pattern has the most
  octets (longest pattern) wins; an ``allow``/``disallow`` tie at
  equal length resolves to ALLOW; no matching rule means allowed;
  an empty Disallow value matches nothing (allow all);
- patterns support ``*`` (any substring) and a final ``$`` (end
  anchor), matched by a hand-written greedy segment scan.

Pure-Python parse + match, Arrow-batched over the URL table with
the per-host robots.txt side BROADCAST (hosts are few, URLs are the
100 TB side) — zero shuffle beyond the final per-host aggregation.
"""

from __future__ import annotations


def parse_robots(text: str) -> list[tuple[list[str], list[tuple[bool, str]]]]:
    """robots.txt -> list of groups ``(agent_tokens, rules)`` where
    rules are ``(is_allow, pattern)`` in file order."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    open_agents = False  # consecutive user-agent lines accumulate
    for raw in text.split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not open_agents:
                if agents:
                    groups.append((agents, rules))
                agents, rules = [], []
                open_agents = True
            agents.append(value.lower())
        elif field in ("allow", "disallow"):
            open_agents = False
            if agents:  # rules before any user-agent line are ignored
                rules.append((field == "allow", value))
        # crawl-delay / sitemap / unknown fields: RFC 9309 §2.2.4 — other
        # records MUST NOT change parsing; in particular a User-agent line
        # after one still accumulates into the open group.
    if agents:
        groups.append((agents, rules))
    return groups


def _pattern_matches(pattern: str, path: str) -> bool:
    """``*`` = any substring, trailing ``$`` = end anchor; patterns
    are otherwise PREFIXES. Leftmost-greedy segment scan: the first
    segment is pinned at the start, middle segments take their
    leftmost feasible occurrence (minimal-advance is optimal), and
    under ``$`` the final segment is pinned to the path's end."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    segs = pattern.split("*")
    if not path.startswith(segs[0]):
        return False
    pos = len(segs[0])
    if not anchored:
        for seg in segs[1:]:
            if not seg:
                continue
            k = path.find(seg, pos)
            if k < 0:
                return False
            pos = k + len(seg)
        return True
    if len(segs) == 1:
        return pos == len(path)  # no '*': exact match required
    last = segs[-1]
    if not path.endswith(last):
        return False
    limit = len(path) - len(last)  # middle segments must end by here
    for seg in segs[1:-1]:
        if not seg:
            continue
        k = path.find(seg, pos)
        if k < 0 or k + len(seg) > limit:
            return False
        pos = k + len(seg)
    return pos <= limit


def select_group(
    groups: list[tuple[list[str], list[tuple[bool, str]]]], agent: str
) -> list[tuple[bool, str]] | None:
    """Longest user-agent-token prefix match; '*' only as fallback.
    RFC 9309 §2.2.1: when more than one group matches the crawler at
    the winning specificity, their rules MUST be combined (in file
    order). Specific groups are never merged with the '*' group."""
    agent = agent.lower()
    best_len = -1
    for agents, _ in groups:
        for tok in agents:
            if tok != "*" and agent.startswith(tok) and len(tok) > best_len:
                best_len = len(tok)
    merged: list[tuple[bool, str]] = []
    found = False
    if best_len >= 0:
        for agents, rules in groups:
            if any(
                tok != "*" and len(tok) == best_len and agent.startswith(tok)
                for tok in agents
            ):
                merged.extend(rules)
                found = True
    else:
        for agents, rules in groups:
            if "*" in agents:
                merged.extend(rules)
                found = True
    return merged if found else None


def robots_allowed(
    groups: list[tuple[list[str], list[tuple[bool, str]]]],
    agent: str,
    path: str,
) -> bool:
    """RFC 9309 §2.2.2: longest-pattern rule wins; allow wins ties;
    no rule (or no applicable group) means allowed."""
    rules = select_group(groups, agent)
    if rules is None:
        return True
    best_len = -1
    best_allow = True
    for is_allow, pattern in rules:
        if not pattern:
            continue  # empty Disallow/Allow matches nothing
        if not _pattern_matches(pattern, path):
            continue
        plen = len(pattern)
        if plen > best_len or (plen == best_len and is_allow):
            best_len = plen
            best_allow = is_allow
    return best_allow if best_len >= 0 else True


# --------------------------------------------------------------------------
# Spark surface + fixtures
# --------------------------------------------------------------------------


def _make_robots(h: int) -> str:
    """Deterministic robots.txt for host ``h``: an otherbot total
    ban, a ``*`` group with a directory ban + a longer allow
    carve-out + a wildcard-suffix ban, and (every 3rd host) a
    gmallbot-specific group that REPLACES (not merges with) the
    ``*`` rules."""
    parts = [
        f"# synthetic robots for host {h}",
        "User-agent: otherbot",
        "Disallow: /",
        "",
        "User-agent: *",
        "Disallow: /private/",
        f"Allow: /private/pub{h}/",
        "Disallow: /*.zip$",
        "Crawl-delay: 5",
    ]
    if h % 3 == 0:
        parts += [
            "",
            "User-agent: gmallbot",
            "Disallow: /tmp/",
            "Allow: /",
        ]
    return "\n".join(parts) + "\n"


def _url_path(i: int, h: int) -> str:
    v = i % 6
    if v == 0:
        return f"/a/{i % 50}"
    if v == 1:
        return f"/private/x{i % 50}"
    if v == 2:
        return f"/private/pub{h}/y"
    if v == 3:
        return f"/data/{i % 50}.zip"
    if v == 4:
        return f"/tmp/{i % 50}"
    return "/"


def robots_frontier_stats(docs, agent: str = "gmallbot"):
    """URL-frontier governance: each doc contributes one candidate
    (host = doc_id % 10, path by doc_id % 6); the 10 per-host
    robots.txt files are parsed ONCE per Python worker (broadcast-
    sized side) and every candidate is evaluated. Output per host:
    candidate count, allowed count, and the allowed ids' sum."""
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    from gmall_flink_210726_spark.session import (
        ensure_parallelism,
        ship_package,
    )

    ship_package(docs.sparkSession)
    docs = ensure_parallelism(docs.select("doc_id"))

    schema = StructType(
        [
            StructField("host", LongType()),
            StructField("doc_id", LongType()),
            StructField("allowed", LongType()),
        ]
    )

    def gen(batches):
        cache = {h: parse_robots(_make_robots(h)) for h in range(10)}
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            hosts = [int(i) % 10 for i in ids]
            yield pd.DataFrame(
                {
                    "host": hosts,
                    "doc_id": ids,
                    "allowed": [
                        int(
                            robots_allowed(
                                cache[h], agent, _url_path(int(i), h)
                            )
                        )
                        for i, h in zip(ids, hosts)
                    ],
                }
            )

    per_url = docs.select("doc_id").mapInPandas(gen, schema)
    return (
        per_url.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.sum("allowed").cast("long").alias("n_allowed"),
            F.sum(
                F.col("allowed") * F.col("doc_id")
            ).cast("long").alias("allowed_id_sum"),
        )
        .orderBy("host")
    )

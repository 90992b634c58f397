"""Aho-Corasick multi-pattern matching (Aho & Corasick 1975) — the
blocklist scan every production corpus filter runs: screening each
document against THOUSANDS of phrases (bad-word lists, PII trigger
terms, benchmark-contamination strings) must cost one pass over the
text, not one pass per phrase. The automaton is the classic
construction:

- goto function: a trie over the pattern set;
- failure links: BFS — a node's fail target is the longest proper
  suffix of its path that is also a trie prefix;
- output links: a node reports its own pattern plus everything its
  fail chain reports, so OVERLAPPING and nested occurrences all
  count (finding 'hers' also reports 'he' and 'ers' — the textbook
  example set is part of the fixture list).

Per-document scan is a single pass: follow goto, fall back through
failure links on mismatch, emit every output at each position.
Counts are exact per pattern including overlaps, which is what the
DuckDB oracle recomputes position-by-position.

Scale shape: the pattern set is bounded (a broadcast-sized
constant), the automaton builds once per Python worker, and the
scan is an Arrow-batched ``mapInPandas`` map — zero shuffle until
the (doc, pattern, hits) output, whose cardinality is bounded by
docs x patterns.
"""

from __future__ import annotations

from collections import deque

# The fixture blocklist: the textbook he/she/his/hers family (fail
# links + output links exercise), nested ing/in/n and ion/on/n
# chains, and common English fragments the synthetic corpus hits.
BLOCKLIST: tuple[str, ...] = (
    "he", "she", "his", "hers",
    "in", "ing", "ion", "on",
    "er", "ers", "the", "then",
    "at", "ate", "rat",
    "an", "and",
)


def ac_build(patterns: list[str]) -> dict:
    """Goto trie + BFS failure links + merged output lists."""
    goto: list[dict[str, int]] = [{}]
    out: list[list[int]] = [[]]
    for idx, p in enumerate(patterns):
        if not p:
            raise ValueError("empty pattern")
        s = 0
        for ch in p:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        out[s].append(idx)
    fail = [0] * len(goto)
    q: deque[int] = deque()
    for s in goto[0].values():
        q.append(s)
    while q:
        r = q.popleft()
        for ch, s in goto[r].items():
            q.append(s)
            f = fail[r]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[s] = goto[f].get(ch, 0)
            if fail[s] == s:
                fail[s] = 0
            out[s] = out[s] + out[fail[s]]  # output link merge
    return {"goto": goto, "fail": fail, "out": out}


def ac_count(text: str, ac: dict, n_patterns: int) -> list[int]:
    """One pass; exact per-pattern occurrence counts incl. overlaps."""
    goto, fail, out = ac["goto"], ac["fail"], ac["out"]
    counts = [0] * n_patterns
    s = 0
    for ch in text:
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        for idx in out[s]:
            counts[idx] += 1
    return counts


def blocklist_scan(docs, patterns: tuple[str, ...] = BLOCKLIST,
                   text_col: str = "text", id_col: str = "doc_id"):
    """(doc, pattern, n_hits) rows for every pattern with >= 1 hit."""
    import pandas as pd

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from gmall_flink_210726_spark.session import (
        ensure_parallelism,
        ship_package,
    )

    ship_package(docs.sparkSession)
    pats = list(patterns)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("pattern", StringType()),
            StructField("n_hits", LongType()),
        ]
    )
    src = ensure_parallelism(docs.select(id_col, text_col))

    def gen(batches):
        ac = ac_build(pats)  # once per worker task
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                counts = ac_count(
                    (text or "").lower(), ac, len(pats)
                )
                for idx, c in enumerate(counts):
                    if c:
                        rows.append(
                            {
                                "doc_id": int(did),
                                "pattern": pats[idx],
                                "n_hits": c,
                            }
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return src.mapInPandas(gen, schema)

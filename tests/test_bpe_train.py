"""BPE merge-train loop: greedy-merge semantics, tie order, fold
equivalence with a direct Python scan (operators/text2.py bpe_train)."""

from __future__ import annotations

import collections

from tests.conftest import SF_SMALL


def _py_bpe(texts, k):
    vocab = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                vocab[w] += 1
    state = {w: tuple(w) for w in vocab}
    merges = []
    for r in range(k):
        pc = collections.Counter()
        for w, ct in vocab.items():
            s = state[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += ct
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r + 1, a, b, a + b, c))
        for w in state:
            s = state[w]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            state[w] = tuple(out)
    return merges


class TestBpeTrain:
    def test_matches_reference_scan(self, spark):
        from gmall_flink_210726_spark.operators.text2 import bpe_train
        from gmall_flink_210726_spark.sources.batch import load_table

        docs = load_table(spark, SF_SMALL, "documents")
        texts = [r["text"] for r in docs.select("text").collect()]
        want = _py_bpe(texts, 6)
        got = [
            tuple(r)
            for r in bpe_train(docs, n_merges=6)
            .orderBy("rnk")
            .collect()
        ]
        assert got == want

    def test_greedy_overlap_same_symbol(self, spark):
        """'aaaa' with pair (a,a) must merge positions 1-2 and 3-4 —
        greedy left-to-right, never the overlapping middle pair."""
        from gmall_flink_210726_spark.operators.text2 import bpe_train

        docs = spark.createDataFrame(
            [("aaaa",)] * 3 + [("aaa",)] * 2, "text string"
        )
        rows = bpe_train(docs, n_merges=2).orderBy("rnk").collect()
        # round 1: (a,a) appears 3*3 + 2*2 = 13 times
        assert tuple(rows[0]) == (1, "a", "a", "aa", 13)
        # after merging: 'aaaa'->[aa,aa] (3 docs), 'aaa'->[aa,a] (2)
        # round 2 pairs: (aa,aa) ct 3, (aa,a) ct 2 -> argmax (aa,aa)
        assert tuple(rows[1]) == (2, "aa", "aa", "aaaa", 3)

    def test_tie_breaks_lexicographically(self, spark):
        from gmall_flink_210726_spark.operators.text2 import bpe_train

        docs = spark.createDataFrame(
            [("zy",), ("ab",)], "text string"
        )
        rows = bpe_train(docs, n_merges=1).collect()
        assert tuple(rows[0]) == (1, "a", "b", "ab", 1)

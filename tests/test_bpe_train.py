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

    def test_oracle_greedy_equivalence_same_symbol_runs(self, spark):
        """ADVICE r9 (medium): a bulk non-overlapping replace oracle
        diverges from greedy on a==b runs ('aaaaa' -> [aa,a,aa] vs
        greedy [aa,aa,a]). The recursive leftmost-occurrence oracle
        must match both the engine and the direct Python scan on a
        corpus built to trigger exactly that case."""
        import duckdb

        from gmall_flink_210726_spark.operators.text2 import bpe_train
        from gmall_flink_210726_spark.queries.llm13 import (
            _bpe_train_oracle,
        )

        texts = ["aaaaa bb aaaaaa", "aaaaa aaaa ab", "banana bandana"]
        want = _py_bpe(texts, 4)
        docs = spark.createDataFrame([(t,) for t in texts], "text string")
        got = [
            tuple(r)
            for r in bpe_train(docs, n_merges=4).orderBy("rnk").collect()
        ]
        assert got == want
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT unnest(?) AS text", [texts]
        )
        oracle = sorted(
            tuple(r) for r in con.execute(_bpe_train_oracle(4)).fetchall()
        )
        assert oracle == want

    def test_backslash_symbol_survives_sql_interpolation(self, spark):
        """ADVICE r9 (low): a corpus token containing a backslash must
        not corrupt the generated merge CASE expression."""
        from gmall_flink_210726_spark.operators.text2 import bpe_train

        texts = [r"a\b a\b a\b", r"c'd c'd"]
        want = _py_bpe(texts, 3)
        docs = spark.createDataFrame([(t,) for t in texts], "text string")
        got = [
            tuple(r)
            for r in bpe_train(docs, n_merges=3).orderBy("rnk").collect()
        ]
        assert got == want


def _py_encode(texts, merges):
    """Direct greedy encode: replay merges in rank order per word."""
    out = []
    for did, t in enumerate(texts):
        n_words = n_tokens = n_merged = n_chars = 0
        for w in t.lower().split():
            if not w:
                continue
            s = list(w)
            for a, b in merges:
                o, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        o.append(a + b)
                        i += 2
                    else:
                        o.append(s[i])
                        i += 1
                s = o
            n_words += 1
            n_tokens += len(s)
            n_merged += sum(1 for x in s if len(x) > 1)
            n_chars += sum(len(x) for x in s)
        out.append((did, n_words, n_tokens, n_merged, n_chars))
    return out


class TestBpeEncode:
    def test_matches_python_scan_incl_same_symbol_runs(self, spark):
        from gmall_flink_210726_spark.operators.text2 import (
            bpe_encode,
            bpe_train,
        )

        texts = ["aaaaa bb aaaaaa banana", "aaaa ab bandana", r"a\b 'q"]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        mt = bpe_train(docs, n_merges=4).orderBy("rnk").collect()
        merges = [(r["left_sym"], r["right_sym"]) for r in mt]
        got = sorted(
            tuple(r) for r in bpe_encode(docs, merges).collect()
        )
        assert got == _py_encode(texts, merges)

    def test_losslessness_invariant(self, spark):
        """n_chars recomputed from SYMBOL lengths must equal the raw
        summed word lengths for every doc — the encode never drops or
        duplicates a character."""
        from gmall_flink_210726_spark.operators.text2 import (
            bpe_encode,
            bpe_train,
        )
        from gmall_flink_210726_spark.sources.batch import load_table

        docs = load_table(spark, SF_SMALL, "documents")
        mt = bpe_train(docs, n_merges=6).collect()
        merges = [(r["left_sym"], r["right_sym"]) for r in mt]
        enc = bpe_encode(docs, merges)
        raw = docs.selectExpr(
            "doc_id",
            "aggregate(filter(split(lower(text), '\\\\s+'), "
            "w -> w <> ''), 0L, (a, w) -> a + length(w)) AS want",
        )
        bad = (
            enc.join(raw, "doc_id")
            .where("n_chars <> want OR n_tokens > n_chars "
                   "OR n_tokens < n_words")
            .count()
        )
        assert bad == 0

    def test_encode_plan_shape(self, spark):
        """The expensive greedy fold (an interpreted higher-order
        expression) must run once per DISTINCT word — i.e. above a
        deduplicating aggregate — never per word occurrence, and
        nothing may drop to Python."""
        from gmall_flink_210726_spark.operators.text2 import bpe_encode

        docs = spark.createDataFrame(
            [(1, "hello world")], "doc_id long, text string"
        )
        plan = bpe_encode(
            docs, [("l", "l"), ("h", "e")]
        )._jdf.queryExecution().optimizedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
        # the fold expression appears exactly once, computed on the
        # distinct-word side (a node keyed by w0 alone) — never in a
        # node that still carries corpus rows (doc_id)
        assert plan.count("aggregate(transform(sequence(") == 1
        fold_line = next(
            ln for ln in plan.split("\n")
            if "aggregate(transform(sequence(" in ln
        )
        assert "doc_id" not in fold_line
        assert "Aggregate [w0#" in plan  # the dedup exists at all

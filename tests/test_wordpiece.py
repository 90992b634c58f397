"""WordPiece greedy longest-match tokenization + deterministic
vocab induction (operators/wordpiece.py)."""

from __future__ import annotations

from gmall_flink_210726_spark.operators.wordpiece import (
    induce_vocab,
    wordpiece_encode,
    wordpiece_segment,
)


class TestSegmenter:
    def test_greedy_longest_match_first(self):
        v = {"un", "##aff", "##able", "##a", "##f", "##b", "##l",
             "##e", "u", "##n", "unaff"}
        # the BERT docs' canonical example shape; 'unaff' (length 5)
        # exceeds MAX_PIECE=4 and is never probed
        assert wordpiece_segment("unaffable", v) == [
            "un", "##aff", "##able"
        ]

    def test_continuation_marker_required(self):
        # 'bc' exists only as a START piece: at pos>0 it cannot match
        v = {"a", "bc", "##b", "##c"}
        assert wordpiece_segment("abc", v) == ["a", "##b", "##c"]

    def test_unk_when_no_single_char(self):
        assert wordpiece_segment("ax", {"a"}) is None

    def test_longer_beats_shorter_at_same_pos(self):
        v = {"a", "ab", "abc", "##d", "abcd"}
        assert wordpiece_segment("abcd", v) == ["abcd"]
        v2 = {"a", "ab", "abc", "##d"}
        assert wordpiece_segment("abcd", v2) == ["abc", "##d"]


class TestVocabAndEncode:
    def test_induction_is_deterministic_and_covers_chars(self, spark):
        docs = spark.createDataFrame(
            [(1, "banana band bandana"), (2, "ban dana nab")],
            "doc_id long, text string",
        )
        v1 = induce_vocab(docs)
        v2 = induce_vocab(docs)
        assert v1 == v2
        # chars enter the vocab in the ROLES they appear in: b/d/n
        # start words, a/n/d/b all occur mid-word; 'a' never starts
        for c in "bdn":
            assert c in v1
        for c in "andb":
            assert "##" + c in v1
        assert "a" not in v1

    def test_encode_matches_python_replay(self, spark):
        texts = ["banana band bandana", "ban dana nab banana"]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        vocab = induce_vocab(docs)
        vset = set(vocab)
        got = {
            r["doc_id"]: (r["n_words"], r["n_pieces"],
                          r["n_cont_pieces"], r["n_unk"])
            for r in wordpiece_encode(docs, vocab).collect()
        }
        for i, t in enumerate(texts):
            nw = np_ = nc = 0
            for w in t.split():
                pieces = wordpiece_segment(w, vset)
                assert pieces is not None
                nw += 1
                np_ += len(pieces)
                nc += sum(1 for p in pieces if p.startswith("##"))
            assert got[i] == (nw, np_, nc, 0), i

    def test_piece_count_invariant(self, spark):
        """No UNK by construction, so n_cont = n_pieces - n_words."""
        from gmall_flink_210726_spark.sources.batch import load_table
        from tests.conftest import SF_SMALL

        docs = load_table(spark, SF_SMALL, "documents")
        res = wordpiece_encode(docs, induce_vocab(docs))
        bad = res.where(
            "n_unk <> 0 OR n_cont_pieces <> n_pieces - n_words "
            "OR n_pieces < n_words"
        ).count()
        assert bad == 0

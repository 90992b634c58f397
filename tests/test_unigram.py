"""Unigram-LM tokenizer training: the integer fixed-point log2, the
mask-enumeration Viterbi, and full train/encode agreement with an
independent pure-Python reference implementation."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from gmall_flink_210726_spark.operators.unigram import (
    log2fix,
    unigram_encode,
    unigram_train,
)

# ------------------------------------------------------------ log2fix


def test_log2fix_matches_float_log2():
    for c in [1, 2, 3, 37, 100, 65535, 65536, 10**6, 10**12]:
        exact = math.log2(c) * 65536
        # truncation in the mantissa loop costs <=2 ulp; the
        # requirement is determinism, not the last bit
        assert abs(log2fix(c) - exact) <= 2, c


def test_log2fix_monotone_and_integer():
    prev = -1
    for c in range(1, 2000):
        v = log2fix(c)
        assert isinstance(v, int) and v >= prev
        prev = v


def test_log2fix_rejects_nonpositive():
    with pytest.raises(ValueError):
        log2fix(0)


# ------------------------------------------------- python reference


def _py_ref(texts, vocab_top=96, piece_max=4, max_len=8, rounds=2):
    wf = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if w:
                wf[w[:max_len]] += 1
    seed = Counter()
    for w, ct in wf.items():
        for p in range(len(w)):
            for ln in range(1, min(piece_max, len(w) - p) + 1):
                seed[w[p : p + ln]] += ct
    top = sorted(seed.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab = dict(top[:vocab_top])
    chars = {p: u for p, u in seed.items() if len(p) == 1}
    for p, u in chars.items():
        vocab.setdefault(p, u)

    def best(w, costs):
        cands = []
        for mask in range(1 << (len(w) - 1)):
            cuts = (
                [0]
                + [j for j in range(1, len(w)) if (mask >> (j - 1)) & 1]
                + [len(w)]
            )
            pieces = [
                w[cuts[t] : cuts[t + 1]] for t in range(len(cuts) - 1)
            ]
            if all(p in costs for p in pieces):
                cands.append(
                    (
                        sum(costs[p] for p in pieces),
                        len(pieces),
                        mask,
                        pieces,
                    )
                )
        return min(cands)[3]

    for _ in range(rounds):
        total = sum(vocab.values())
        costs = {
            p: log2fix(total) - log2fix(u) for p, u in vocab.items()
        }
        usage = Counter()
        for w, ct in wf.items():
            for p in best(w, costs):
                usage[p] += ct
        vocab = {p: u for p, u in usage.items() if len(p) > 1}
        for p in chars:
            vocab[p] = usage.get(p, 1)
    total = sum(vocab.values())
    costs = {p: log2fix(total) - log2fix(u) for p, u in vocab.items()}
    return vocab, costs, best


_TEXTS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "internationalization considerations",
    "cats and dogs and cats",
    "tokenizer training needs frequent substrings everywhere",
    "the training tokenizer segments the frequent pieces",
]


def test_train_matches_python_reference(spark):
    vocab, costs, _best = _py_ref(_TEXTS)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS)],
        "doc_id long, text string",
    )
    got = {
        r.piece: (r.usage, r.cost) for r in unigram_train(docs).collect()
    }
    assert got == {p: (vocab[p], costs[p]) for p in vocab}
    # EM learned real multi-char pieces, not just the alphabet
    assert any(len(p) > 2 for p in got)


def test_encode_matches_python_reference_and_is_lossless(spark):
    vocab, costs, best = _py_ref(_TEXTS)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_words, r.n_tokens, r.n_multi, r.n_chars)
        for r in unigram_encode(docs).collect()
    }
    for i, t in enumerate(_TEXTS):
        ws = [w[:8] for w in re.split(r"\s+", t.lower()) if w]
        segs = [best(w, costs) for w in ws]
        exp = (
            len(ws),
            sum(len(s) for s in segs),
            sum(1 for s in segs for p in s if len(p) > 1),
            sum(len(p) for s in segs for p in s),
        )
        assert got[i] == exp
        # losslessness: piece lengths re-add to the word lengths
        assert exp[3] == sum(len(w) for w in ws)


def test_char_coverage_floor(spark):
    """A character squeezed out of every best segmentation stays in
    the vocabulary with the usage floor."""
    texts = ["zebra zebra zebra zebra"]
    docs = spark.createDataFrame(
        [(0, texts[0])], "doc_id long, text string"
    )
    rows = {r.piece: r.usage for r in unigram_train(docs).collect()}
    for ch in "zebra":
        assert ch in rows  # all chars covered

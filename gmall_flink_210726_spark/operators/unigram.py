"""SentencePiece-style unigram-LM tokenizer training (Kudo 2018,
"Subword Regularization") — the third tokenizer-training family
beside BPE (operators/text2.py bpe_train) and WordPiece
(operators/wordpiece.py), and the one real LLM pipelines (T5, LLaMA)
actually ship.

The repo's variant is EXACTLY replayable by a SQL oracle, so every
arithmetic step is integer-deterministic:

- **Seed vocabulary** (Kudo §3.2 seeds from frequent substrings):
  all substrings of length 1..4 of the frequency-weighted DISTINCT
  words (truncated to 8 chars), top ``vocab_top`` by (count desc,
  piece asc), UNION every single character (coverage guarantee).
- **Piece scores**: fixed-point base-2 surprisal. ``cost(x) =
  log2fix(T) - log2fix(u_x)`` where ``log2fix`` is floor(log2 · 2^16)
  computed by the classic integer square-and-compare mantissa loop —
  bit-identical in Python, Spark SQL (aggregate fold over
  sequence(1,16)) and DuckDB (list_reduce), so -log p never touches
  a float.
- **Viterbi by exhaustive masks**: words are capped at 8 chars, so a
  word has at most 2^7 = 128 segmentations; each mask's cut points
  build the piece list in-plan, invalid pieces (not in vocab) kill
  the mask, and the winner minimizes the total integer cost with
  (n_pieces, mask) tie-breaks — a total order, no float ties. This
  replaces the DP with a bounded enumeration that both engines
  evaluate identically. (Real SentencePiece caps candidate length
  the same way; the 8-char cap is this variant's documented
  trade-off.)
- **Hard-EM rounds** (Viterbi-EM): E-step re-segments every distinct
  word under the current costs and accumulates frequency-weighted
  piece usage; M-step recomputes costs from usage; pruning drops
  multi-char pieces with zero usage while single chars keep a usage
  floor of 1 (coverage smoothing).

Scale shape (the bpe_train loop discipline, text2.py:321): the
corpus collapses ONCE to the checkpointed distinct-word frequency
frame — the only corpus-sized shuffle; every EM round is one
vocabulary-sized aggregation (the mask blow-up is 128x on DISTINCT
words, not corpus rows) plus a bounded vocab-sized collect (~160
rows, the bpe 1-row-argmax exception scaled to the vocab). Encoding
segments the VOCABULARY and joins back to (doc, word) pairs —
tokenize the vocabulary, never re-tokenize the corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from gmall_flink_210726_spark.operators.text import _words

_SCALE = 65536  # 2^16 fractional bits


def log2fix(c: int) -> int:
    """floor(log2(c) * 2^16) by integer square-and-compare — the
    Python reference of the Spark/DuckDB folds."""
    if c <= 0:
        raise ValueError("log2fix: positive input required")
    n = c.bit_length() - 1
    m = (c * _SCALE) >> n  # mantissa in [2^16, 2^17)
    frac = 0
    for _ in range(16):
        m = (m * m) >> 16
        if m >= 2 * _SCALE:
            frac = frac * 2 + 1
            m >>= 1
        else:
            frac = frac * 2
    return n * _SCALE + frac


def _q(s: str) -> str:
    # backslash first (Spark SQL string-escape char), then quotes
    return s.replace("\\", "\\\\").replace("'", "''")


def _cost_map_literal(costs: dict[str, int]) -> str:
    items = ", ".join(
        f"'{_q(p)}', cast({c} as bigint)"
        for p, c in sorted(costs.items())
    )
    return f"map({items})"


_CUTS = (
    "concat(array(0), filter(sequence(1, length(w) - 1), "
    "j -> (shiftright(mask, j - 1) & 1) = 1), array(length(w)))"
)
_PIECES = (
    f"transform(sequence(1, size({_CUTS}) - 1), "
    f"t -> substring(w, element_at({_CUTS}, t) + 1, "
    f"element_at({_CUTS}, t + 1) - element_at({_CUTS}, t)))"
)


def _word_freq(docs: DataFrame, text_col: str, max_len: int) -> DataFrame:
    """The one corpus-sized pass: distinct truncated words with
    frequencies, checkpointed for the EM loop."""
    from gmall_flink_210726_spark.session import ensure_parallelism

    return (
        ensure_parallelism(docs.select(text_col))
        .select(F.explode(_words(text_col)).alias("w0"))
        .select(F.substring("w0", 1, max_len).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("ct"))
        .localCheckpoint(eager=True)
    )


def _seed_usage(wf: DataFrame, piece_max: int) -> DataFrame:
    """Frequency-weighted counts of every substring of length
    1..piece_max — one vocab-sized aggregation."""
    subs = F.expr(
        "flatten(transform(sequence(1, length(w)), p -> "
        f"transform(sequence(1, least({piece_max}, length(w) - p + 1)), "
        "l -> substring(w, p, l))))"
    )
    return (
        wf.select(F.explode(subs).alias("piece"), "ct")
        .groupBy("piece")
        .agg(F.sum("ct").cast("long").alias("u"))
    )


def _best_seg(wf: DataFrame, costs: dict[str, int]) -> DataFrame:
    """One E-step: per distinct word, the min-cost valid
    segmentation under ``costs`` via the 2^(len-1) mask enumeration;
    ties broken by (n_pieces, mask) — a total order."""
    m = _cost_map_literal(costs)
    masks = wf.select(
        "w",
        "ct",
        F.expr(
            "explode(sequence(0, shiftleft(cast(1 as bigint), "
            "length(w) - 1) - 1))"
        ).alias("mask"),
    )
    scored = masks.select(
        "w",
        "ct",
        "mask",
        F.expr(_PIECES).alias("pieces"),
    ).select(
        "w",
        "ct",
        F.expr(
            f"forall(pieces, p -> element_at({m}, p) is not null)"
        ).alias("valid"),
        F.expr(
            "aggregate(pieces, cast(0 as bigint), "
            f"(a, p) -> a + coalesce(element_at({m}, p), "
            "cast(0 as bigint)))"
        ).alias("score"),
        F.size("pieces").cast("long").alias("np"),
        "mask",
        "pieces",
    )
    return (
        scored.where("valid")
        .groupBy("w", "ct")
        .agg(F.min(F.struct("score", "np", "mask", "pieces")).alias("b"))
        .select("w", "ct", F.col("b.pieces").alias("pieces"))
    )


def _train_vocab(
    docs: DataFrame,
    text_col: str = "text",
    vocab_top: int = 96,
    piece_max: int = 4,
    max_len: int = 8,
    rounds: int = 2,
) -> tuple[dict[str, int], dict[str, int], DataFrame]:
    """Run seed + hard-EM; returns (final usage, final costs, the
    checkpointed word-frequency frame). Each round's collect is
    vocab-bounded (~vocab_top + alphabet rows)."""
    wf = _word_freq(docs, text_col, max_len)
    seed = _seed_usage(wf, piece_max)
    top = (
        seed.orderBy(F.col("u").desc(), "piece")
        .limit(vocab_top)
        .collect()
    )
    chars = {
        r["piece"]: int(r["u"])
        for r in seed.where(F.length("piece") == 1).collect()
    }
    vocab = {r["piece"]: int(r["u"]) for r in top}
    for p, u in chars.items():
        vocab.setdefault(p, u)
    for _ in range(rounds):
        total = sum(vocab.values())
        costs = {
            p: log2fix(total) - log2fix(u) for p, u in vocab.items()
        }
        usage_rows = (
            _best_seg(wf, costs)
            .select(F.explode("pieces").alias("piece"), "ct")
            .groupBy("piece")
            .agg(F.sum("ct").cast("long").alias("u"))
            .collect()
        )
        usage = {r["piece"]: int(r["u"]) for r in usage_rows}
        vocab = {p: u for p, u in usage.items() if len(p) > 1}
        for p in chars:
            vocab[p] = usage.get(p, 1)  # coverage floor
    total = sum(vocab.values())
    costs = {p: log2fix(total) - log2fix(u) for p, u in vocab.items()}
    return vocab, costs, wf


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    vocab_top: int = 96,
    piece_max: int = 4,
    max_len: int = 8,
    rounds: int = 2,
) -> DataFrame:
    """The learned unigram vocabulary: (piece, usage, cost)."""
    vocab, costs, _wf = _train_vocab(
        docs, text_col, vocab_top, piece_max, max_len, rounds
    )
    spark = docs.sparkSession
    return spark.createDataFrame(
        [(p, vocab[p], costs[p]) for p in sorted(vocab)],
        "piece string, usage long, cost long",
    )


def unigram_encode(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_top: int = 96,
    piece_max: int = 4,
    max_len: int = 8,
    rounds: int = 2,
) -> DataFrame:
    """Corpus-wide Viterbi encoding under the trained costs — the
    throughput step. Segments the DISTINCT-word frame once and joins
    back to (doc, word) pairs. Output per doc: n_words, n_tokens,
    n_multi (pieces longer than one char), n_chars (sum of piece
    lengths — the losslessness proof: must equal the summed
    truncated word lengths)."""
    _vocab, costs, wf = _train_vocab(
        docs, text_col, vocab_top, piece_max, max_len, rounds
    )
    per_word = _best_seg(wf, costs).select(
        "w",
        F.size("pieces").cast("long").alias("w_tokens"),
        F.expr("size(filter(pieces, p -> length(p) > 1))")
        .cast("long")
        .alias("w_multi"),
        F.expr(
            "aggregate(pieces, cast(0 as bigint), "
            "(a, p) -> a + length(p))"
        ).alias("w_chars"),
    )
    pairs = docs.select(
        F.col(id_col),
        F.explode(_words(text_col)).alias("w0"),
    ).select(id_col, F.substring("w0", 1, max_len).alias("w"))
    return (
        pairs.join(per_word, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("w_tokens").cast("long").alias("n_tokens"),
            F.sum("w_multi").cast("long").alias("n_multi"),
            F.sum("w_chars").cast("long").alias("n_chars"),
        )
    )

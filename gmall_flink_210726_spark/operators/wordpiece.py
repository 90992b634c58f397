"""WordPiece tokenization (Wu et al. 2016 §4.1; Devlin et al. 2018)
— the OTHER production subword tokenizer next to BPE: inference is
greedy LONGEST-match-first against a fixed vocabulary, with
continuation pieces marked ``##`` (a piece matched at position > 0
must carry the marker). This operator completes the tokenizer
family: bpe_train learns merges, bpe_encode applies them, and
wordpiece_encode covers the BERT-style vocab-driven path.

Vocabulary induction here is deliberately simple and DETERMINISTIC
(so a DuckDB oracle can replay it blind): every single character
seen at word start enters as a start piece and every character seen
later as a ``##`` continuation (this guarantees no [UNK] — real
pipelines add byte fallback for the same reason), plus the top-K
most corpus-frequent multi-character pieces per (kind, length) for
lengths 2..4, weighted by word frequency, ties broken by piece text
ascending.

Scale shape: vocab induction is one corpus-to-vocabulary shuffle
(word counts) plus a bounded top-K; the learned vocabulary (a few
hundred pieces) is CLOSED OVER by an Arrow-batched ``mapInPandas``
encode — the per-document tokenize is a pure map, and the only
other shuffle is the per-doc aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gmall_flink_210726_spark.operators.text import _words

MAX_PIECE = 4
TOP_K = 30


def induce_vocab(docs: DataFrame, text_col: str = "text") -> list[str]:
    """Deterministic WordPiece vocabulary from the corpus (module
    doc). Returns the piece list (bounded: all single chars seen in
    each role + TOP_K per (kind, length) for lengths 2..4)."""
    words = (
        docs.select(F.explode(_words(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    # every (position, length<=MAX_PIECE) substring occurrence,
    # tagged start (pos 0) or continuation
    cand = words.select(
        "ct",
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(1, length(w)),
                  p -> transform(
                    sequence(1, least({MAX_PIECE}, length(w) - p + 1)),
                    m -> struct(
                      CASE WHEN p = 1 THEN substring(w, p, m)
                           ELSE concat('##', substring(w, p, m)) END
                        AS piece,
                      m AS plen))))"""
            )
        ).alias("c"),
    ).select("ct", "c.piece", "c.plen")
    weighted = cand.groupBy("piece", "plen").agg(
        F.sum("ct").cast("long").alias("weight")
    )
    singles = [
        r["piece"]
        for r in weighted.where(F.col("plen") == 1).select("piece").collect()
    ]
    from pyspark.sql.window import Window

    kind = F.when(F.col("piece").startswith("##"), "cont").otherwise(
        "start"
    )
    ranked = (
        weighted.where(F.col("plen") > 1)
        .withColumn("kind", kind)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("kind", "plen").orderBy(
                    F.col("weight").desc(), F.col("piece")
                )
            ),
        )
        .where(F.col("rk") <= TOP_K)
    )
    multis = [r["piece"] for r in ranked.select("piece").collect()]
    return sorted(set(singles) | set(multis))


def wordpiece_segment(word: str, vocab: set[str]) -> list[str] | None:
    """Greedy longest-match-first; None = [UNK] (cannot happen with
    the induced vocab, kept for contract completeness)."""
    out: list[str] = []
    pos, n = 0, len(word)
    while pos < n:
        match = None
        for m in range(min(MAX_PIECE, n - pos), 0, -1):
            cand = word[pos : pos + m]
            if pos > 0:
                cand = "##" + cand
            if cand in vocab:
                match = cand
                break
        if match is None:
            return None
        out.append(match)
        pos += len(match) - 2 if match.startswith("##") else len(match)
    return out


def wordpiece_encode(
    docs: DataFrame, vocab: list[str], text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc WordPiece stats under ``vocab``: word count, piece
    count, continuation-piece count (= pieces - words when nothing
    is UNK), unk count.

    Same scale shape as ``bpe_encode``: the greedy segmenter runs
    once per DISTINCT word (an Arrow-batched map over the word
    vocabulary with the piece set closed over), per-word results
    join back to the exploded (doc, word) pairs, and only the
    per-doc aggregation shuffles corpus-sized data."""
    import pandas as pd

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from gmall_flink_210726_spark.session import (
        ensure_parallelism,
        ship_package,
    )

    ship_package(docs.sparkSession)
    vset = set(vocab)
    wschema = StructType(
        [
            StructField("w", StringType()),
            StructField("w_pieces", LongType()),
            StructField("w_cont", LongType()),
            StructField("w_unk", LongType()),
        ]
    )
    pairs = ensure_parallelism(
        docs.select(F.col(id_col), F.explode(_words(text_col)).alias("w"))
    )

    def gen(batches):
        for pdf in batches:
            out = []
            for w in pdf["w"]:
                pieces = wordpiece_segment(w, vset)
                if pieces is None:
                    out.append(
                        {"w": w, "w_pieces": 0, "w_cont": 0, "w_unk": 1}
                    )
                else:
                    out.append(
                        {
                            "w": w,
                            "w_pieces": len(pieces),
                            "w_cont": sum(
                                1 for p in pieces if p.startswith("##")
                            ),
                            "w_unk": 0,
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in wschema.fields]
            )

    per_word = pairs.select("w").distinct().mapInPandas(gen, wschema)
    agg = (
        pairs.join(per_word, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("w_pieces").cast("long").alias("n_pieces"),
            F.sum("w_cont").cast("long").alias("n_cont_pieces"),
            F.sum("w_unk").cast("long").alias("n_unk"),
        )
    )
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("n_pieces", F.lit(0)).alias("n_pieces"),
            F.coalesce("n_cont_pieces", F.lit(0)).alias("n_cont_pieces"),
            F.coalesce("n_unk", F.lit(0)).alias("n_unk"),
        )
    )

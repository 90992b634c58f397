"""Text-analysis operators for training-data pipelines.

Beyond-reference surface (BASELINE.json north star): token counting,
quality scoring, language ID, document fingerprinting. Everything is
pure Column expressions — deterministic, oracle-expressible in ANSI
SQL, and inside whole-stage codegen (zero Python on the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs, single digits, single punctuation
# (ASCII approximation of the GPT-2 pretokenizer split).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

STOPWORDS = ("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")


def _words(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), r"\s+"), lambda w: w != "")


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace word count + BPE-ish subword-piece count per doc."""
    from gmall_flink_210726_spark.session import ensure_parallelism

    docs = ensure_parallelism(docs)
    return docs.select(
        "*",
        F.size(_words(text_col)).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score in [0,1]:
    length, word stats, punctuation ratio, stopword ratio. The score
    formula is fixed-order double arithmetic (engine-reproducible)."""
    from gmall_flink_210726_spark.session import ensure_parallelism

    docs = ensure_parallelism(docs)
    n_chars = F.length(F.col(text_col)).cast("long")
    words = _words(text_col)
    n_words = F.size(words).cast("long")
    n_punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"[^A-Za-z0-9\s]"), 0)
    ).cast("long")
    n_stop = F.size(
        F.filter(words, lambda w: w.isin(*STOPWORDS))
    ).cast("long")
    avg_word_len = F.when(n_words > 0, n_chars.cast("double") / n_words).otherwise(
        F.lit(0.0)
    )
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(
        F.lit(0.0)
    )
    stop_ratio = F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(
        F.lit(0.0)
    )
    # well-formed prose: some stopwords, low punctuation, mid-length words
    score = F.round(
        F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(1.0),
                F.lit(0.5)
                + F.lit(0.5) * stop_ratio
                - F.lit(2.0) * punct_ratio
                - F.when((avg_word_len < 2) | (avg_word_len > 12), 0.25).otherwise(0.0),
            ),
        ),
        6,
    )
    return docs.select(
        "*",
        n_chars.alias("q_chars"),
        n_words.alias("q_words"),
        F.round(avg_word_len, 6).alias("q_avg_word_len"),
        F.round(punct_ratio, 6).alias("q_punct_ratio"),
        F.round(stop_ratio, 6).alias("q_stop_ratio"),
        score.alias("q_score"),
    )


# language marker words — tiny n-gram-free heuristic; the point is a
# deterministic, engine-reproducible classifier shape, not accuracy.
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "und", "das", "ist"),
    "es": ("el", "los", "que", "es"),
    "fr": ("le", "les", "des", "est"),
}


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: argmax over per-language marker counts,
    'und' when no markers hit. Ties resolve by the fixed language order
    (en, de, es, fr) — same CASE/GREATEST shape in the SQL oracle."""
    from gmall_flink_210726_spark.session import ensure_parallelism

    docs = ensure_parallelism(docs)
    words = _words(text_col)
    scores = {
        lang: F.size(F.filter(words, lambda w: w.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.when(best <= 0, "und")
    for lang in LANG_MARKERS:  # first max wins (insertion order)
        pred = pred.when(scores[lang] == best, lang)
    return docs.select(
        "*",
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in LANG_MARKERS],
        pred.alias("pred_lang"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Order-sensitive document fingerprint: position-weighted rolling
    sum over words — fp = Σ (pos+1)·(ascii(first)·31 + len(word)).
    Integer arithmetic end-to-end (exact in every engine); word order
    matters, so reordered near-dups get different prints while exact
    dups collide."""
    from gmall_flink_210726_spark.session import ensure_parallelism

    docs = ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
    words = _words(text_col)
    terms = F.transform(
        words,
        lambda w, i: (i + F.lit(1)).cast("long")
        * (F.ascii(F.substring(w, 1, 1)).cast("long") * 31 + F.length(w).cast("long")),
    )
    fp = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, v: acc + v)
    return docs.select(F.col(id_col), fp.alias("fingerprint"))

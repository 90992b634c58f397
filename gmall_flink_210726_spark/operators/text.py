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


def gopher_quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality filter (Rae et al. 2021, §A1.1
    'Quality filtering' — public heuristics; defaults are the paper's
    thresholds): per-doc rule flags plus the composite ``kept`` verdict.

    All rules are Column expressions over one projection — a 100 TB
    corpus filter is a single scan with every predicate fused into
    whole-stage codegen, and the flags make reject-reason analytics a
    groupBy away (the usual companion query in a data pipeline).

    Rules: word count in [min_words, max_words]; mean word length in
    [min, max]; '#'/'…' symbols per word ≤ ratio; lines ending in an
    ellipsis ≤ fraction; words containing an alphabetic char ≥
    fraction; at least ``min_stopword_hits`` stopword occurrences."""
    from gmall_flink_210726_spark.session import ensure_parallelism

    docs = ensure_parallelism(docs)
    c = F.col(text_col)
    words = _words(text_col)
    n_words = F.size(words).cast("long")
    sum_word_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = F.when(
        n_words > 0, sum_word_len.cast("double") / n_words
    ).otherwise(F.lit(0.0))
    n_symbols = F.size(F.regexp_extract_all(c, F.lit(r"#|\.\.\."), 0)).cast("long")
    symbol_ratio = F.when(n_words > 0, n_symbols.cast("double") / n_words).otherwise(
        F.lit(0.0)
    )
    lines = F.split(c, "\n")
    n_lines = F.size(lines).cast("long")
    n_ellipsis_lines = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"\.\.\.$"))
    ).cast("long")
    ellipsis_frac = F.when(
        n_lines > 0, n_ellipsis_lines.cast("double") / n_lines
    ).otherwise(F.lit(0.0))
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-z]"))).cast("long")
    alpha_frac = F.when(n_words > 0, n_alpha_words.cast("double") / n_words).otherwise(
        F.lit(0.0)
    )
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS))).cast("long")

    r_words = (n_words >= min_words) & (n_words <= max_words)
    r_word_len = (mean_word_len >= min_mean_word_len) & (
        mean_word_len <= max_mean_word_len
    )
    r_symbol = symbol_ratio <= max_symbol_word_ratio
    r_ellipsis = ellipsis_frac <= max_ellipsis_line_frac
    r_alpha = alpha_frac >= min_alpha_word_frac
    r_stop = n_stop >= min_stopword_hits
    return docs.select(
        "*",
        n_words.alias("g_words"),
        F.round(mean_word_len, 6).alias("g_mean_word_len"),
        F.round(symbol_ratio, 6).alias("g_symbol_ratio"),
        F.round(ellipsis_frac, 6).alias("g_ellipsis_line_frac"),
        F.round(alpha_frac, 6).alias("g_alpha_word_frac"),
        n_stop.alias("g_stopword_hits"),
        r_words.alias("r_word_count"),
        r_word_len.alias("r_mean_word_len"),
        r_symbol.alias("r_symbol_ratio"),
        r_ellipsis.alias("r_ellipsis_lines"),
        r_alpha.alias("r_alpha_words"),
        r_stop.alias("r_stopwords"),
        (r_words & r_word_len & r_symbol & r_ellipsis & r_alpha & r_stop).alias(
            "kept"
        ),
    )


def repetition_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_line_frac: float = 0.3,
    max_top_word_share: float = 0.2,
    max_top_bigram_share: float = 0.18,
) -> DataFrame:
    """Gopher-style repetition filter (Rae et al. 2021 §A1.1
    'Repetition removal' — public heuristics): duplicate-line fraction
    (map-side array op) plus top-unigram and top-bigram shares
    (explode → two-level aggregation: partial counts combine map-side,
    the per-doc max/sum reduce shuffles only (doc, term) counts — the
    standard scalable shape for per-doc term statistics).

    Output: per-doc features, per-rule flags, composite ``rep_kept``."""
    from gmall_flink_210726_spark.session import ensure_parallelism

    base = ensure_parallelism(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    )
    words = _words("_t")
    lines = F.split(F.col("_t"), "\n")
    head = base.select(
        "id",
        F.when(
            F.size(lines) > 0,
            F.lit(1.0)
            - F.size(F.array_distinct(lines)).cast("double") / F.size(lines),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_line_frac"),
    )

    def _top_share(term_col: Column, name: str) -> DataFrame:
        counts = (
            base.select("id", F.explode(term_col).alias("term"))
            .groupBy("id", "term")
            .agg(F.count(F.lit(1)).alias("ct"))
        )
        return counts.groupBy("id").agg(
            (F.max("ct").cast("double") / F.sum("ct")).alias(name)
        )

    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    uni = _top_share(words, "top_word_share")
    bi = _top_share(bigrams, "top_bigram_share")
    out = (
        head.join(uni, "id", "left")
        .join(bi, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.round("dup_line_frac", 6).alias("dup_line_frac"),
            F.round(F.coalesce("top_word_share", F.lit(0.0)), 6).alias(
                "top_word_share"
            ),
            F.round(F.coalesce("top_bigram_share", F.lit(0.0)), 6).alias(
                "top_bigram_share"
            ),
        )
    )
    r_lines = F.col("dup_line_frac") <= max_dup_line_frac
    r_word = F.col("top_word_share") <= max_top_word_share
    r_bigram = F.col("top_bigram_share") <= max_top_bigram_share
    return out.select(
        "*",
        r_lines.alias("r_dup_lines"),
        r_word.alias("r_top_word"),
        r_bigram.alias("r_top_bigram"),
        (r_lines & r_word & r_bigram).alias("rep_kept"),
    )


def hash_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment by content-free key hash:
    bucket = first 4 hex chars of md5(salt || id) mod 100. Pure
    projection — no shuffle, no sampling state, reproducible across
    engines and runs, and stable under corpus growth (a doc's split
    never changes when other docs arrive, unlike randomSplit). md5 is
    portable, so the oracle reproduces assignments bit-for-bit."""
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    return docs.select(
        "*",
        bucket.alias("split_bucket"),
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
        .alias("split"),
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


def vocab_df_idf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 100,
) -> DataFrame:
    """Corpus vocabulary by document frequency: one row per token —
    (token, df, idf) for the top_k most document-frequent tokens
    (ties broken by token, so the cut is deterministic).
    idf = ln((N+1)/(df+1)) + 1 (smoothed, sklearn convention).

    Scale shape: per-doc DISTINCT tokens come from a map-side
    array_distinct (no doc-level shuffle); the explode shuffles
    (token) keys once into a countable agg — partial counts combine
    map-side, so the shuffle carries one row per distinct (partition,
    token), not per occurrence. The N scalar joins in as a broadcast
    single-row agg of the same scan (no driver-side .count() action).
    Top-k is a TakeOrdered, not a global sort."""
    from gmall_flink_210726_spark.session import ensure_parallelism

    base = ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
    toks = base.select(
        F.explode(F.array_distinct(_words(text_col))).alias("token")
    )
    df = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = base.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        df.join(F.broadcast(n_docs))
        .select(
            "token",
            "df",
            F.round(
                F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                + F.lit(1.0),
                6,
            ).alias("idf"),
        )
        .orderBy(F.col("df").desc(), F.col("token"))
        .limit(top_k)
    )


def stratified_sample(
    docs: DataFrame,
    strata_col: str = "lang",
    n_per_stratum: int = 20,
    salt: str = "strat-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified downsample: at most ``n_per_stratum``
    rows per stratum, chosen by salted-md5 order of the row key — the
    corpus-rebalancing step (cap over-represented languages/sources)
    of a training-data pipeline.

    Unlike ``df.sampleBy``, the choice is reproducible across engines
    and stable under corpus growth: a document's sort key never
    changes, so adding new documents can only displace rows at the
    boundary, and re-runs pick identical samples. One shuffle on the
    stratum key; rank via row_number with the id as tiebreak (md5
    collisions notwithstanding, the order is total)."""
    from pyspark.sql import Window

    sort_key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(sort_key, F.col(id_col))
    return (
        docs.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing at least
    one word-n-gram with an evaluation set. Output: one row per
    training doc — (id_col, n_hit_shingles, contaminated).

    Scale shape: the eval side collapses to DISTINCT shingle hashes —
    benchmark suites are tiny relative to the corpus, so that set
    broadcasts; the corpus pays one scan + explode and an equi-join on
    8-byte xxhash64 keys (never shingle strings, same rationale as
    ngram_jaccard_pairs), then a per-doc count. No corpus self-join
    anywhere. Hash-collision note: a corpus↔eval collision adds a
    spurious hit (over-count), while a collision between two distinct
    HIT shingles merges them under count_distinct (under-count) — so
    ``n_hit_shingles`` can be perturbed in either direction; only the
    boolean ``contaminated`` flag errs strictly false-positive.
    Exact on collision-free fixtures."""
    from gmall_flink_210726_spark.operators.dedup import word_shingles
    from gmall_flink_210726_spark.session import ensure_parallelism

    eval_sh = (
        eval_docs.select(F.explode(word_shingles(text_col, n)).alias("sh_str"))
        .select(F.xxhash64("sh_str").alias("sh"))
        .distinct()
    )
    base = ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
    hits = (
        base.select(id_col, F.explode(word_shingles(text_col, n)).alias("sh_str"))
        .select(id_col, F.xxhash64("sh_str").alias("sh"))
        .join(F.broadcast(eval_sh), "sh", "left_semi")
        .groupBy(id_col)
        .agg(F.count_distinct("sh").alias("n_hit_shingles"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hit_shingles", F.lit(0)).cast("long").alias("n_hit_shingles"),
            (F.coalesce("n_hit_shingles", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def sequence_pack(
    docs: DataFrame,
    budget: int = 512,
    shard_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy stream packing of documents into fixed-token-budget
    training sequences: within each shard, documents are concatenated
    in id order and cut every ``budget`` tokens; a document's sequence
    is the one its FIRST token lands in. Output: (id_col, shard,
    n_tokens, seq_id, seq_offset) — deterministic, integer-exact.

    This is the streaming-packer shape (docs visit once, in order) —
    not bin-packing FFD, which needs global sorting by length and
    yields marginally less padding at far higher cost. Scale shape:
    one window cumsum per shard; real pipelines pack per OUTPUT SHARD
    with shard count >> executor count, so the per-shard sequential
    scan parallelizes across shards and no global ordering exists."""
    from pyspark.sql import Window

    n_tok = F.size(_words(text_col)).cast("long")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = cum - F.col("n_tokens")
    return (
        docs.select(F.col(id_col), F.col(shard_col), n_tok.alias("n_tokens"))
        .select(
            id_col,
            shard_col,
            "n_tokens",
            F.floor(start / budget).cast("long").alias("seq_id"),
            (start % budget).cast("long").alias("seq_offset"),
        )
    )


def c4_line_filter(
    docs: DataFrame,
    min_words: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2, public
    rules): keep only lines that END IN TERMINAL PUNCTUATION (. ! ? ")
    and have at least ``min_words`` words; drop the whole page when it
    contains a curly brace or 'lorem ipsum' (code/boilerplate marker).
    Output per doc: line counts, the cleaned text (kept lines joined
    by newline), and the page-level verdict.

    Everything is JVM higher-order array functions over one split — a
    single fused projection inside whole-stage codegen, no shuffle, no
    Python; at 100 TB this is a pure map stage."""
    text = F.col(text_col)
    lines = F.split(text, "\n")
    trimmed = lambda l: F.trim(l)  # noqa: E731
    line_words = lambda l: F.filter(F.split(F.trim(l), r"\s+"), lambda w: w != "")  # noqa: E731
    last_char = lambda l: F.substring(F.trim(l), F.length(F.trim(l)), 1)  # noqa: E731
    is_kept = lambda l: last_char(l).isin(".", "!", "?", '"') & (  # noqa: E731
        F.size(line_words(l)) >= min_words
    )
    kept = F.filter(lines, is_kept)
    page_bad = text.contains("{") | F.lower(text).contains("lorem ipsum")
    return docs.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        F.concat_ws("\n", kept).alias("clean_text"),
        (~page_bad & (F.size(kept) > 0)).alias("c4_kept"),
    )


# PII patterns — ASCII-only so Java regex (Spark) and RE2 (DuckDB)
# agree on every construct used (\b, \d, classes, bounded repeats,
# non-capturing groups, leftmost-first alternation).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# IPv4 with octet bounds (0-255): 999.999.999.999 is NOT an address and
# stays unmasked. \b on both ends keeps 1234.1.1.1 / 1.1.1.1234 whole.
_OCTET = r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
PII_IPV4 = rf"\b{_OCTET}(?:\.{_OCTET}){{3}}\b"
# Phone forms, longest alternative first (leftmost-first semantics are
# identical in Java and RE2): (NXX) NXX-XXXX, NXX-NXX-XXXX, bare
# NXX-XXXX fragment. 555-123-45678 matches nothing (trailing \b).
PII_PHONE = r"\(\d{3}\)\s?\d{3}-\d{4}|\b\d{3}-\d{3}-\d{4}\b|\b\d{3}-\d{4}\b"


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII redaction: count and mask emails, IPv4 addresses, and
    NXX-XXXX phone fragments. Output: (id, n_emails, n_ips, n_phones,
    scrubbed, n_scrubbed_chars). Pure JVM regex projection (one scan,
    no shuffle); masking replaces each match with a fixed tag so
    downstream token counts stay stable.

    Order matters and is fixed: emails are masked BEFORE IPv4 so a
    dotted-quad inside an email hostname counts once as email, not
    again as IP (the tag text contains no digits or '@')."""
    text = F.col(text_col)
    count = lambda c, p: F.size(F.regexp_extract_all(c, F.lit(p), 0)).cast("long")  # noqa: E731
    # each count runs against the PREVIOUS masking stage, so a count is
    # exactly the number of replacements that stage performs: emails on
    # the raw text, IPs on the email-masked text (a dotted quad inside
    # an email hostname counts once as email, never again as IP),
    # phones on the ip-masked text
    email_masked = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    ip_masked = F.regexp_replace(email_masked, PII_IPV4, "<IP>")
    scrubbed = F.regexp_replace(ip_masked, PII_PHONE, "<PHONE>")
    return docs.select(
        F.col(id_col),
        count(text, PII_EMAIL).alias("n_emails"),
        count(email_masked, PII_IPV4).alias("n_ips"),
        count(ip_masked, PII_PHONE).alias("n_phones"),
        scrubbed.alias("scrubbed"),
        F.length(scrubbed).cast("long").alias("n_scrubbed_chars"),
    )


def boilerplate_lines(
    docs: DataFrame,
    chunk_words: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document boilerplate detection (the C4 'remove any line
    seen in more than one page' rule, at chunk granularity): break each
    doc into non-overlapping ``chunk_words``-word chunks, count each
    chunk's DOCUMENT frequency corpus-wide, and report per doc how much
    of it is shared boilerplate. Output: (id, n_chunks, n_boiler_chunks,
    boiler_pct) with boiler_pct an integer percentage (exact — no
    float rounding hazard).

    Scale shape: one explode → one groupBy (map-side partial counts
    combine), then the per-doc rollup joins chunk df-counts back. The
    shuffle key is ``xxhash64(chunk)`` — 8 bytes instead of the chunk
    string, the same trick as the Jaccard shingle join
    (operators/dedup.py); output columns carry no chunk text, so the
    result is identical barring a 64-bit collision (~1e-8 at 1e6
    chunks, and at 1e11 chunks a collision merely nudges one doc's
    boiler_pct)."""
    ws = _words(text_col)
    n_chunks = F.ceil(F.size(ws) / F.lit(chunk_words)).cast("int")
    # sequence(0, -1) on a zero-word doc would generate a DESCENDING
    # [0, -1] and emit two bogus chunks — guard like word_shingles
    # (dedup.py); empty/whitespace-only docs have no chunks and are
    # absent from the output (explode of an empty array).
    chunks = F.when(
        F.size(ws) >= 1,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(
                " ", F.slice(ws, i * chunk_words + 1, chunk_words)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    from gmall_flink_210726_spark.session import ensure_parallelism

    base = (
        ensure_parallelism(docs.select(F.col(id_col).alias("id"), F.col(text_col)))
        .select("id", F.explode(chunks).alias("chunk"))
        .select("id", F.xxhash64("chunk").alias("ck"))
    )
    df_ct = base.groupBy("ck").agg(
        F.count_distinct("id").alias("chunk_df")
    )
    per_doc = (
        base.join(df_ct, "ck")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum((F.col("chunk_df") > 1).cast("long")).alias("n_boiler_chunks"),
        )
    )
    return per_doc.select(
        F.col("id").alias(id_col),
        "n_chunks",
        "n_boiler_chunks",
        (F.lit(100) * F.col("n_boiler_chunks") / F.col("n_chunks"))
        .cast("long")
        .alias("boiler_pct"),
    )


def unigram_logprob_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-derived unigram language-model score per document — the
    perplexity-proxy quality signal a data pipeline computes when a
    real LM (KenLM et al.) is not on the cluster: fit the unigram MLE
    on the corpus itself (one token-count aggregation), then score each
    doc by its mean token log-probability. Low scores flag gibberish /
    rare-token soup; high scores flag repetitive common-word text.
    Output: (id, n_tokens, sum_logprob, avg_logprob); empty docs have
    no tokens and are absent.

    Determinism contract: each token's ln(ct/N) is rounded to 6 dp and
    summed as DECIMAL (exact, order-free: per-(doc,token) the rounded
    decimal is multiplied by the integer occurrence count — an exact
    integer multiple, identical to summing the token stream row by
    row) then divided by the token count (same discipline as
    embedding_norm_stats). Scale shape: the 100 TB corpus is scanned
    and exploded exactly ONCE — the per-(doc, token) occurrence counts
    are aggregated and eagerly localCheckpoint'ed (the same lineage-
    truncation pattern as connected_components), so the vocabulary
    agg, the corpus-size scalar, and the score join-back all read the
    compact materialized (id, w, k) table, never the raw documents
    again. The vocabulary join stays a plain equi-join on the token
    key, never a broadcast of the corpus vocab."""
    from gmall_flink_210726_spark.session import ensure_parallelism

    base = ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
    tok = base.select(
        F.col(id_col).alias("id"), F.explode(_words(text_col)).alias("w")
    )
    # ONE physical corpus pass: everything downstream derives from this
    # materialized per-(doc, token) aggregate.
    doc_tok = (
        tok.groupBy("id", "w")
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint(eager=True)
    )
    counts = doc_tok.groupBy("w").agg(F.sum("k").alias("ct"))
    n_total = counts.agg(F.sum("ct")).collect()[0][0] or 0
    scored = doc_tok.join(counts, "w").select(
        "id",
        "k",
        F.round(F.log(F.col("ct").cast("double") / F.lit(float(n_total))), 6)
        .cast("decimal(18,6)")
        .alias("lp"),
    )
    return (
        scored.groupBy("id")
        .agg(
            F.sum("k").cast("long").alias("n_tokens"),
            F.sum(F.col("lp") * F.col("k").cast("decimal(12,0)")).alias("sum_lp"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.col("sum_lp").cast("double").alias("sum_logprob"),
            # divide as DOUBLES (both engines IEEE-identical) — decimal
            # division scale rules differ between engines
            (F.col("sum_lp").cast("double") / F.col("n_tokens"))
            .cast("double")
            .alias("avg_logprob"),
        )
    )


# URL patterns — Java+RE2-portable (literal classes, bounded
# constructs, scoped (?i:) case-insensitive scheme)
URL_RE = r"(?i:https?)://[A-Za-z0-9.-]+(?::[0-9]+)?(?:/[^\s]*)?"
URL_DOMAIN_RE = r"(?i:https?)://([A-Za-z0-9.-]+)"


def url_filter(
    docs: DataFrame,
    blocked_domains: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4/RefinedWeb-style URL screening (the public step-1 rule:
    drop pages citing blocklisted domains): extract every http(s) URL,
    take its lowercased domain, count blocklist hits. Output: (id,
    n_urls, n_blocked, url_kept). One fused JVM regex/array projection
    — no shuffle, a pure map stage at 100 TB; the blocklist is a plan
    literal (real deployments broadcast-join a list table instead once
    it outgrows a literal)."""
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), 0)
    domains = F.transform(
        urls, lambda u: F.lower(F.regexp_extract(u, URL_DOMAIN_RE, 1))
    )
    n_urls = F.size(urls).cast("long")
    n_blocked = F.size(
        F.filter(domains, lambda d: d.isin(*blocked_domains))
    ).cast("long")
    return docs.select(
        F.col(id_col),
        n_urls.alias("n_urls"),
        n_blocked.alias("n_blocked"),
        (n_blocked == 0).alias("url_kept"),
    )


def url_filter_table(
    docs: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "domain",
) -> DataFrame:
    """URL screening with the blocklist as a TABLE (the deployment
    shape once the list outgrows a plan literal — ``url_filter``'s own
    docstring promises this variant): extract every http(s) URL,
    explode its lowercased domain, left BROADCAST-join the blocklist,
    re-aggregate per doc. Same output contract as ``url_filter``:
    (id, n_urls, n_blocked, url_kept), exact-domain match, every
    occurrence counted.

    Scale shape: the corpus side is never shuffled for the join (the
    blocklist — small by definition — broadcasts); the only shuffle is
    the per-doc re-aggregation of bare (id, domain) rows, bytes-tiny
    next to the document bodies. ``explode_outer`` keeps zero-URL docs
    in the output (their domain row is NULL, so ``count(domain)``
    yields n_urls=0). The blocklist is deduped before broadcast so a
    repeated entry cannot double-count a hit."""
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), 0)
    domains = F.transform(
        urls, lambda u: F.lower(F.regexp_extract(u, URL_DOMAIN_RE, 1))
    )
    exploded = docs.select(
        F.col(id_col), F.explode_outer(domains).alias("_dom")
    )
    block = F.broadcast(
        blocklist.select(F.col(domain_col).alias("_blocked_dom")).dropDuplicates(
            ["_blocked_dom"]
        )
    )
    return (
        exploded.join(block, F.col("_dom") == F.col("_blocked_dom"), "left")
        .groupBy(id_col)
        .agg(
            F.count("_dom").alias("n_urls"),
            F.count("_blocked_dom").alias("n_blocked"),
        )
        .select(
            F.col(id_col),
            "n_urls",
            "n_blocked",
            (F.col("n_blocked") == 0).alias("url_kept"),
        )
    )


def canonicalize_url(url) -> "F.Column":
    """URL canonicalization — the normalization every crawl pipeline
    runs BEFORE URL-level exact dedup (the C4/RefinedWeb "only fetch a
    page once" rule needs 'HTTP://Example.COM:80/a?b=2&a=1#x' and
    'http://example.com/a?a=1&b=2' to collide):

    - scheme and host lowercase (path/query stay case-sensitive);
    - default ports stripped (:80 for http, :443 for https);
    - fragment dropped;
    - query split on '&', ``utm_*`` tracking params dropped, the rest
      SORTED (param order is transport noise) and rejoined;
    - one trailing path slash stripped (except the bare '/');
    - an EMPTY path normalized to '/' (RFC 3986 §6.2.3: for http the
      empty path is equivalent to '/', so 'http://example.com' and
      'http://example.com/' must collide).

    Pure Column expression — whole-stage-codegen JVM string ops, no
    UDF, a zero-shuffle map at any scale."""
    url = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(
        F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    rest = F.regexp_extract(url, r"^[^:]+://(.*)$", 1)
    defrag = F.substring_index(rest, "#", 1)
    authority = F.regexp_extract(defrag, r"^([^/?]+)", 1)
    pathquery = F.substring(
        defrag, F.length(authority) + 1, F.length(defrag)
    )
    host = F.lower(F.substring_index(authority, ":", 1))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = F.substring_index(pathquery, "?", 1)
    query = F.when(
        pathquery.contains("?"),
        F.substring(
            pathquery,
            F.instr(pathquery, "?") + 1,
            F.length(pathquery),
        ),
    ).otherwise(F.lit(""))
    qnorm = F.array_join(
        F.sort_array(
            F.filter(
                F.split(query, "&"),
                lambda x: (x != "") & ~x.startswith("utm_"),
            )
        ),
        "&",
    )
    pnorm = (
        F.when(path == "", F.lit("/"))
        .when(
            (F.length(path) > 1) & path.endswith("/"),
            F.substring(path, F.lit(1), F.length(path) - 1),
        )
        .otherwise(path)
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        pnorm,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(
            F.lit("")
        ),
    )

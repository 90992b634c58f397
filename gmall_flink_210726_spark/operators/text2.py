"""Text-pipeline operators, wave 4: paragraph-granularity dedup,
exact substring-span overlap, BPE pair statistics, and CCNet-style
perplexity bucketing.

Beyond-reference surface (BASELINE.json north star). Public-method
provenance: paragraph removal follows the RefinedWeb/CCNet "drop a
duplicated paragraph everywhere but its first occurrence" rule
(Penedo et al. 2023 §3.2; Wenzek et al. 2020 §2); span overlap is the
fixed-window approximation of suffix-array substring dedup (Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better");
pair counting is the first merge step of byte-pair encoding (Sennrich
et al. 2016); perplexity terciles are CCNet's head/middle/tail corpus
partition (Wenzek et al. 2020 §3).

Scale discipline (same as operators/text.py): every shuffle carries
8-byte xxhash64 keys or compact aggregates, never document bodies;
document text is re-read only via its original table join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gmall_flink_210726_spark.operators.text import _words


def paragraph_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-wide paragraph-level exact dedup (RefinedWeb rule): a
    paragraph (newline-delimited, keyed on its trimmed body) that
    occurs more than once in the corpus survives only at its first
    occurrence — (min doc id, min position) — and is dropped
    everywhere else. Blank paragraphs are formatting, not content:
    they are never dedup keys and are always kept.

    Output: (id, n_paras, n_dup_paras, dedup_text) where n_paras
    counts non-blank paragraphs and dedup_text is the doc with losing
    paragraphs removed, original order preserved.

    Scale shape: the explode ships (id, pos, xxhash64(para)) — 8-byte
    keys, no paragraph strings. One groupBy finds each hash's winning
    (id, pos); one equi-join back flags keepers; one groupBy collects
    the per-doc kept-position array; one final join against the
    original docs table re-splits the text JVM-side and filters by
    position index. Bodies never shuffle — they stay in the docs scan
    and the single join on the table's own id key."""
    from gmall_flink_210726_spark.session import ensure_parallelism

    paras = F.split(F.col(text_col), "\n")
    keys = (
        ensure_parallelism(docs.select(F.col(id_col).alias("id"), text_col))
        .select("id", F.posexplode(paras).alias("pos", "p"))
        .where(F.trim("p") != "")
        .select("id", "pos", F.xxhash64(F.trim("p")).alias("ph"))
    )
    winners = keys.groupBy("ph").agg(
        F.min(F.struct("id", "pos")).alias("win"),
    )
    flagged = keys.join(winners, "ph").select(
        "id",
        "pos",
        ((F.col("win.id") == F.col("id")) & (F.col("win.pos") == F.col("pos"))).alias(
            "keep"
        ),
    )
    per_doc = flagged.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.sum((~F.col("keep")).cast("long")).alias("n_dup_paras"),
        F.sort_array(
            F.collect_list(F.when(F.col("keep"), F.col("pos")))
        ).alias("kept_pos"),
    )
    return (
        docs.join(per_doc, docs[id_col] == per_doc["id"], "left")
        .select(
            F.col(id_col),
            F.coalesce("n_paras", F.lit(0)).alias("n_paras"),
            F.coalesce("n_dup_paras", F.lit(0)).alias("n_dup_paras"),
            F.concat_ws(
                "\n",
                F.filter(
                    paras,
                    lambda p, i: (F.trim(p) == "")
                    | F.array_contains(
                        F.coalesce(
                            F.col("kept_pos"), F.array().cast("array<int>")
                        ),
                        i,
                    ),
                ),
            ).alias("dedup_text"),
        )
    )


def span_overlap_pairs(
    docs: DataFrame,
    window_words: int = 6,
    max_df: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document exact substring-span overlap: the fixed-window
    approximation of suffix-array substring dedup (Lee et al. 2022).
    Every sliding ``window_words``-word window is a candidate span; a
    pair of documents sharing >= 1 distinct span is emitted with the
    count of distinct shared spans. Output: (doc_a, doc_b,
    n_shared_spans) with doc_a < doc_b.

    Scale shape: the same single-shuffle co-occurrence equi-join as
    n-gram Jaccard (operators/dedup.py): per-doc DISTINCT span hashes
    (8-byte xxhash64, strings never shuffle) joined through a
    df-capped span table — spans appearing in > ``max_df`` documents
    are template/boilerplate noise and are excluded before the join,
    bounding per-key fan-out at max_df^2 (the L2/L35 hub-cap
    discipline)."""
    from gmall_flink_210726_spark.session import ensure_parallelism

    ws = _words(text_col)
    n_spans = F.size(ws) - F.lit(window_words - 1)
    spans = F.when(
        n_spans >= 1,
        F.transform(
            F.sequence(F.lit(0), n_spans - 1),
            lambda i: F.concat_ws(" ", F.slice(ws, i + 1, window_words)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = (
        ensure_parallelism(docs.select(F.col(id_col).alias("id"), text_col))
        .select("id", F.explode(spans).alias("span"))
        .select("id", F.xxhash64("span").alias("gh"))
        .distinct()
    )
    eligible = (
        base.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("span_df"))
        .where((F.col("span_df") > 1) & (F.col("span_df") <= max_df))
        .select("gh")
    )
    pruned = base.join(eligible, "gh")
    left = pruned.select(F.col("gh"), F.col("id").alias("doc_a"))
    right = pruned.select(F.col("gh"), F.col("id").alias("doc_b"))
    return (
        left.join(right, "gh")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_spans"))
    )


def bpe_pair_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Adjacent-symbol pair frequencies over the corpus — the statistic
    behind the first merge decision of byte-pair-encoding tokenizer
    training (Sennrich et al. 2016 §3.2): for every corpus word
    occurrence, count each adjacent character pair inside the word.
    Output: (pair, pair_count).

    Scale shape: two-level aggregation — the corpus collapses to the
    word-frequency vocabulary first (one token shuffle with map-side
    combine; output is vocabulary-sized, not corpus-sized), then char
    pairs explode off the DISTINCT words only, weighted by the word
    count. The expensive explode runs over ~|V| rows instead of ~|corpus
    tokens|."""
    from gmall_flink_210726_spark.session import ensure_parallelism

    vocab = (
        ensure_parallelism(docs.select(text_col))
        .select(F.explode(_words(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    pairs = vocab.where(F.length("w") >= 2).select(
        "ct",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.substring(F.col("w"), i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return pairs.groupBy("pair").agg(
        F.sum("ct").cast("long").alias("pair_count")
    )


def _tercile_boundaries(scored: DataFrame) -> DataFrame:
    """One-row frame with the rounded 1/3 and 2/3 order statistics of
    `avg_logprob`, computed with bounded state: the corpus collapses to
    a distinct-score count table first (scores are 6-dp-rounded, so its
    cardinality is value-range-bounded, not corpus-bounded), then
    Spark's frequency-weighted exact `percentile(value, p, freq)` runs
    over that compact frame. Factored out so tests can pin the plan
    shape (percentile must take the `ct` frequency arg, never the raw
    per-doc column)."""
    counts = scored.groupBy("avg_logprob").agg(F.count("*").alias("ct"))
    return counts.agg(
        F.round(F.expr("percentile(avg_logprob, 2.0/3.0, ct)"), 6),
        F.round(F.expr("percentile(avg_logprob, 1.0/3.0, ct)"), 6),
    )


def ccnet_buckets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style perplexity-tercile corpus partition (Wenzek et al.
    2020 §3): score each document with the corpus-fit unigram LM
    (operators/text.py unigram_logprob_score — the KenLM stand-in),
    then label the best-scoring third 'head', the middle 'middle', the
    worst 'tail'. Output: (id, avg_logprob, ppl_bucket).

    Scale shape: tercile boundaries are two exact order statistics
    computed over the DISTINCT-SCORE count frame, not the per-doc
    frame: scores are 6-dp-rounded, so groupBy(score)+count collapses
    the corpus to a bounded-cardinality (value, frequency) table and
    `percentile(value, p, frequency)` — Spark's frequency-weighted
    exact percentile, bit-identical to the unweighted form DuckDB
    matches as quantile_cont — keeps aggregation state at
    distinct-score size instead of corpus size (the round-5 verdict's
    one executor-OOM shape at 10^10+ docs). The boundaries are
    collected as bounded driver scalars and applied as plan literals —
    a map-side comparison per doc, NOT a global ntile window, which
    would funnel every row through a single window task at 100 TB.
    The per-doc score frame is checkpointed so the boundary agg and
    the labeling projection share one materialization. Boundary
    comparison happens on 6-dp-rounded doubles on both engines, so
    tie behavior is identical."""
    from gmall_flink_210726_spark.operators.text import unigram_logprob_score

    scored = (
        unigram_logprob_score(docs, id_col=id_col, text_col=text_col)
        .select(F.col(id_col), F.round("avg_logprob", 6).alias("avg_logprob"))
        .localCheckpoint(eager=True)
    )
    t_head, t_mid = _tercile_boundaries(scored).collect()[0]
    return scored.select(
        F.col(id_col),
        "avg_logprob",
        F.when(F.col("avg_logprob") >= F.lit(t_head), F.lit("head"))
        .when(F.col("avg_logprob") >= F.lit(t_mid), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
    )


def temperature_mixture(
    docs: DataFrame,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Temperature-weighted dataset mixing (the multilingual-pretraining
    sampling rule, Conneau & Lample 2019 §3.1 / Raffel et al. 2020
    §3.4.3): resample a corpus so group g's share follows
    p_g ∝ n_g^alpha instead of n_g — boosting tail languages/sources,
    damping the head — at an overall kept fraction ≈ target_frac.

    Per-group keep rate: r_g = min(1, target_frac · N · p_g / n_g)
    with p_g = n_g^alpha / Σ n^alpha. Membership is DETERMINISTIC, not
    random: doc d is kept iff u(d) < r_g where u(d) = the first 6 hex
    chars of md5(salt ‖ id) / 16^6 — the ``hash_split`` uniform
    (operators/text.py:285), so the sample is stable under reruns and
    appends, and a SQL oracle reproduces the exact membership.

    Output (one row per group): group, n_docs, n_kept, rate (6 dp).

    Scale shape: TWO passes, by design — pass 1 aggregates group
    counts and is column-pruned to the single group column (a
    several-hundred-row result at any corpus size); pass 2 broadcasts
    the rate table back onto the corpus for a map-side filter. No
    full-width shuffle anywhere; the corpus rows never move."""
    counts = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    # the counts frame is tiny (one row per group) — a single-partition
    # window computing the normalizer is a driver-sized operation
    from pyspark.sql.window import Window

    wall = Window.partitionBy()
    pow_a = F.pow(F.col("n_docs").cast("double"), F.lit(alpha))
    rates = counts.select(
        "grp",
        "n_docs",
        F.least(
            F.lit(1.0),
            F.lit(target_frac)
            * F.sum("n_docs").over(wall).cast("double")
            * pow_a
            / F.sum(pow_a).over(wall)
            / F.col("n_docs").cast("double"),
        ).alias("rate"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 6
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**6))
    )
    kept = (
        docs.select(F.col(group_col).alias("grp"), u.alias("u"))
        .join(F.broadcast(rates), "grp")
        .groupBy("grp", "n_docs", "rate")
        .agg(F.sum(F.when(F.col("u") < F.col("rate"), 1).otherwise(0)).alias("n_kept"))
    )
    return kept.select(
        F.col("grp").alias(group_col),
        F.col("n_docs"),
        F.col("n_kept").cast("long").alias("n_kept"),
        F.round("rate", 6).alias("rate"),
    )


def bpe_train(
    docs: DataFrame, n_merges: int = 10, text_col: str = "text"
) -> DataFrame:
    """FULL BPE merge-train loop (Sennrich et al. 2016 §3.1) — the
    iterative continuation of ``bpe_pair_counts``, which stops at the
    first merge decision: K rounds of (count adjacent symbol pairs,
    weighted by word frequency) -> (take the most frequent pair, ties
    broken lexicographically) -> (greedily merge that pair left-to-
    right in every vocabulary word). Output: the learned merge table
    ``(rnk, left_sym, right_sym, merged, pair_count)``.

    Scale shape: the corpus collapses to the word-frequency vocabulary
    ONCE (the only corpus-sized shuffle), checkpointed; each of the K
    rounds then runs one vocabulary-sized aggregation (map-side
    combinable pair counts) plus a 1-row argmax collect — the bounded-
    scalar exception — and a map-only merge rewrite re-checkpointed to
    keep lineage flat. No end-of-word marker (documented deviation:
    fixture words are whitespace tokens, so within-word merges are the
    whole signal)."""
    from gmall_flink_210726_spark.session import ensure_parallelism

    spark = docs.sparkSession
    vocab = (
        ensure_parallelism(docs.select(text_col))
        .select(F.explode(_words(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("ct"))
        .select(
            "ct",
            F.expr(
                "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
            ).alias("syms"),
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple] = []
    for rnk in range(1, n_merges + 1):
        top = (
            vocab.where(F.size("syms") >= 2)
            .select(
                "ct",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(syms[i - 1] AS a, syms[i] AS b))"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("ct").cast("long").alias("pc"))
            .orderBy(F.col("pc").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, pc = top[0]["a"], top[0]["b"], int(top[0]["pc"])
        merges.append((rnk, a, b, a + b, pc))
        # escape backslash FIRST (Spark SQL string-literal escape
        # char), then single quotes — a corpus token containing \
        # must not corrupt the generated CASE expression
        qa = a.replace("\\", "\\\\").replace("'", "''")
        qb = b.replace("\\", "\\\\").replace("'", "''")
        # greedy left-to-right non-overlapping merge: a fresh merge's
        # concatenated symbol can never equal the pair's left symbol,
        # so the simple last-element fold IS the greedy scan
        vocab = vocab.select(
            "ct",
            F.expr(
                "aggregate(syms, cast(array() as array<string>), "
                "(acc, s) -> CASE WHEN size(acc) > 0 "
                f"AND element_at(acc, -1) = '{qa}' AND s = '{qb}' "
                f"THEN concat(slice(acc, 1, size(acc) - 1), "
                f"array('{qa}{qb}')) "
                "ELSE concat(acc, array(s)) END)"
            ).alias("syms"),
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges,
        "rnk long, left_sym string, right_sym string, "
        "merged string, pair_count long",
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned BPE merge table corpus-wide (Sennrich et al.
    2016 §3.1, the *encode* direction) — the tokenizer's THROUGHPUT
    step: after ``bpe_train`` learns K merges once, a training-data
    pipeline spends its cycles running exactly this over the whole
    corpus. Each word is split to characters, then the K merges are
    replayed in learned rank order, each as the same greedy
    left-to-right non-overlapping scan used during training (the
    last-element fold is exact because a merged symbol is strictly
    longer than the pair's left symbol, so it can never re-match).

    Scale shape — encode the VOCABULARY, not the corpus: the K
    nested greedy folds are higher-order functions (Catalyst
    evaluates them interpreted, never codegen), so running them per
    word OCCURRENCE pays the expensive scan once per token; a
    zipfian corpus repeats the same words endlessly. Instead the
    corpus collapses to distinct words (the same move bpe_train
    opens with), the fold expression runs once per DISTINCT word,
    and per-word results join back to the exploded (doc, word)
    pairs before the per-doc aggregation. At sf0.1 this is ~10x
    less fold work; at 100 TB it is the difference between
    tokenizing the vocabulary and re-tokenizing the corpus.

    Output per doc: ``n_words`` (whitespace tokens), ``n_tokens``
    (BPE symbols after all K merges), ``n_merged_tokens`` (symbols
    longer than one char, i.e. produced by at least one merge), and
    ``n_chars`` — recomputed from the SYMBOL lengths, so it doubles
    as a losslessness proof: it must equal the plain summed word
    lengths, which is how the oracle derives it."""

    def _q(s: str) -> str:
        # backslash first (Spark SQL string-escape char), then quotes
        return s.replace("\\", "\\\\").replace("'", "''")

    enc = "transform(sequence(1, length(w0)), i0 -> substring(w0, i0, 1))"
    for r, (a, b) in enumerate(merges, 1):
        qa, qb = _q(a), _q(b)
        enc = (
            f"aggregate({enc}, cast(array() as array<string>), "
            f"(acc{r}, s{r}) -> CASE WHEN size(acc{r}) > 0 "
            f"AND element_at(acc{r}, -1) = '{qa}' AND s{r} = '{qb}' "
            f"THEN concat(slice(acc{r}, 1, size(acc{r}) - 1), "
            f"array('{qa}{qb}')) "
            f"ELSE concat(acc{r}, array(s{r})) END)"
        )
    pairs = docs.select(
        F.col(id_col), F.explode(_words(text_col)).alias("w0")
    )
    per_word = (
        pairs.select("w0")
        .distinct()
        .select(
            "w0",
            F.expr(enc).alias("tk"),
        )
        .select(
            "w0",
            F.size("tk").cast("long").alias("w_tokens"),
            F.expr("size(filter(tk, sy -> length(sy) > 1))")
            .cast("long")
            .alias("w_merged"),
            F.length("w0").cast("long").alias("w_chars_raw"),
            F.expr("aggregate(tk, 0L, (accS, sy) -> accS + length(sy))")
            .alias("w_chars"),
        )
    )
    agg = (
        pairs.join(per_word, "w0")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("w_tokens").cast("long").alias("n_tokens"),
            F.sum("w_merged").cast("long").alias("n_merged_tokens"),
            F.sum("w_chars").cast("long").alias("n_chars"),
        )
    )
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_merged_tokens", F.lit(0)).alias(
                "n_merged_tokens"
            ),
            F.coalesce("n_chars", F.lit(0)).alias("n_chars"),
        )
    )

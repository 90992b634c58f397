r"""Text-quality wave 3: corpus bigram LM scoring and linear-model
(logistic) quality classification — the two remaining score-every-doc
signals a pretraining pipeline runs (Brown et al. 2020 used an LR
quality classifier; CCNet/Gopher use n-gram LM perplexity).

Determinism contract (repo-wide): per-token/feature doubles are
computed in a FIXED operation order identical to the oracle SQL,
transcendentals (ln/exp) feed a round(_, 6) — cross-engine libm
divergence is <=1 ulp, ~1e-16 relative, far below the rounding
boundary — and any cross-row sum of rounded values runs in DECIMAL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gmall_flink_210726_spark.operators.text import _words


def bigram_logprob_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-derived bigram LM score per document (the KenLM-proxy one
    order up from unigram_logprob_score): P(w2|w1) = C(w1,w2)/C(w1·),
    doc score = mean ln P over its bigrams. Docs with <2 tokens have no
    bigrams and are absent.

    Scale shape mirrors the unigram operator's one-scan discipline: the
    corpus is exploded ONCE into per-(doc, bigram) occurrence counts
    (bigrams built JVM-side by zipping the token array with its shift —
    no window over token positions), eagerly checkpointed; both the
    global bigram table and the head-word marginal derive from that
    compact aggregate, and the probability join is a plain equi-join on
    the bigram key.
    """
    from gmall_flink_210726_spark.session import ensure_parallelism

    base = ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
    ws = _words(text_col)
    n = F.size(ws)
    pairs = F.arrays_zip(
        F.slice(ws, 1, n - 1).alias("w1"), F.slice(ws, 2, n - 1).alias("w2")
    )
    bi = (
        base.where(n >= 2)
        .select(F.col(id_col).alias("id"), F.explode(pairs).alias("p"))
        .select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    # ONE physical corpus pass; everything derives from this aggregate
    doc_bi = (
        bi.groupBy("id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint(eager=True)
    )
    c12 = doc_bi.groupBy("w1", "w2").agg(F.sum("k").alias("ct12"))
    c1 = c12.groupBy("w1").agg(F.sum("ct12").alias("ct1"))
    scored = doc_bi.join(c12, ["w1", "w2"]).join(c1, "w1").select(
        "id",
        "k",
        F.round(
            F.log(F.col("ct12").cast("double") / F.col("ct1").cast("double")), 6
        )
        .cast("decimal(18,6)")
        .alias("lp"),
    )
    return (
        scored.groupBy("id")
        .agg(
            F.sum("k").cast("long").alias("n_bigrams"),
            F.sum(F.col("lp") * F.col("k").cast("decimal(12,0)")).alias("_slp"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_bigrams",
            F.col("_slp").cast("double").alias("sum_logprob"),
            (F.col("_slp").cast("double") / F.col("n_bigrams"))
            .cast("double")
            .alias("avg_logprob"),
        )
    )


# A small fixed stopword inventory — the classifier feature, not a
# linguistic resource (the lang_id op owns language heuristics).
LOGIT_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as",
)

# Fixed published-style weights: reward stopword density (real prose),
# penalize very long average tokens (code/IDs), penalize symbol soup.
LOGIT_W0 = -2.0
LOGIT_W_STOP = 9.0
LOGIT_W_WLEN = -0.15
LOGIT_W_SYM = -4.0


def quality_logit_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Logistic-regression quality classifier inference (the GPT-3-style
    LR filter, Brown et al. 2020 App. A): three JVM-computed features ->
    fixed-weight linear score -> sigmoid -> keep flag at 0.5.

    Pure map-side Column arithmetic — no shuffle, no UDF; at 100 TB
    this fuses into the scan's WholeStageCodegen. Empty docs (no
    tokens) are absent.
    """
    ws = _words(text_col)
    n_words = F.size(ws)
    # f_stop: stopword token share
    stops = F.array(*[F.lit(s) for s in LOGIT_STOPWORDS])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(stops, w)))
    f_stop = n_stop.cast("double") / n_words.cast("double")
    # f_wlen: mean token length
    chars = F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w))
    f_wlen = chars.cast("double") / n_words.cast("double")
    # f_sym: non-alphanumeric, non-space share of raw characters
    n_sym = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^A-Za-z0-9\s]"), 0))
    f_sym = n_sym.cast("double") / F.length(text_col).cast("double")

    z = (
        F.lit(LOGIT_W0)
        + F.lit(LOGIT_W_STOP) * f_stop
        + F.lit(LOGIT_W_WLEN) * f_wlen
        + F.lit(LOGIT_W_SYM) * f_sym
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return docs.where(n_words > 0).select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(f_stop, 6).alias("f_stop"),
        F.round(f_wlen, 6).alias("f_wlen"),
        F.round(f_sym, 6).alias("f_sym"),
        score.alias("quality_score"),
        (score >= 0.5).alias("keep"),
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 100,
    threshold: float = 0.3,
) -> DataFrame:
    """Sparse TF-IDF cosine similarity pairs — the bag-of-words sibling
    of the dense embedding ops (operators/similarity.py) and the
    weighted upgrade of n-gram Jaccard: candidate pairs come from a
    token co-occurrence equi-join (never a cross product), weights are
    tf * ln(N/df), cosine = <w1,w2> / (|w1||w2|).

    Determinism: weights are rounded to 6 dp and become DECIMAL, so
    dot products and squared norms are exact order-free sums; only the
    final sqrt/divide runs in IEEE doubles (fixed operation order) and
    is rounded to 6 dp.

    Scale: tokens with df > max_df are pruned from the vectors
    entirely (stopword-by-df, the standard IR practice) — that both
    bounds the join fan-out at max_df^2 per token (the
    ngram_jaccard_pairs skew guard) and removes the near-useless
    high-df dimensions. The only driver scalar is the corpus size N.
    """
    from gmall_flink_210726_spark.session import ensure_parallelism

    base = ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
    n_docs = base.count()
    tok = base.select(
        F.col(id_col).alias("id"), F.explode(_words(text_col)).alias("w")
    )
    tf = tok.groupBy("id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df")).where(
        F.col("df") <= max_df
    )
    wgt = tf.join(dfreq, "w").select(
        "id",
        "w",
        F.round(
            F.col("tf").cast("double")
            * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
            6,
        )
        .cast("decimal(18,6)")
        .alias("wt"),
    )
    norms = wgt.groupBy("id").agg(
        F.sum(F.col("wt") * F.col("wt")).alias("n2")
    )
    a = wgt.select(
        F.col("id").alias("id_a"), "w", F.col("wt").alias("wa")
    )
    b = wgt.select(
        F.col("id").alias("id_b"), "w", F.col("wt").alias("wb")
    )
    dots = (
        a.join(b, "w")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("s12"))
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("n2").alias("nb2"))
    cos = F.round(
        F.col("s12").cast("double")
        / (
            F.sqrt(F.col("na2").cast("double"))
            * F.sqrt(F.col("nb2").cast("double"))
        ),
        6,
    )
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def lang_id_trigram(docs: DataFrame) -> DataFrame:
    """Character-trigram MLE language ID (the public fastText/
    TextCat-style approach: Cavnar & Trenkle 1994 profiles, add-one-
    smoothed per-language trigram likelihoods) — the n-gram upgrade of
    ``operators/text.py lang_id``, whose four marker words misclassify
    short documents that happen to miss them. Supervised on the
    corpus's own ``lang`` labels:

    1. explode char trigrams of the lowercased text once;
    2. per-(lang, trigram) counts -> DENSE (every observed trigram x
       every language, zeros materialized) profile with add-one
       smoothing ``ln((cnt+1) / (tot_lang + V))`` where V is the
       corpus-wide distinct-trigram count — the dense frame is what
       makes the per-doc score join exact for unseen trigrams;
    3. per-term log-probs round to DECIMAL(18,6) THEN sum (order-free
       exact, the repo determinism rule), argmax per doc with
       deterministic lang-ascending tie order.

    Returns per-language agreement rows against both the label and the
    marker-word classifier: ``(lang, n_docs, n_tri_correct,
    n_marker_correct, n_agree)``.

    Scale shape: one corpus-sized trigram shuffle (map-side combined);
    the profile is |V| x |langs| (alphabet-bounded, broadcast); doc
    scoring is one broadcast join + one doc-keyed agg; the report is a
    |langs|-row frame."""
    from gmall_flink_210726_spark.operators.text import lang_id
    from gmall_flink_210726_spark.session import ensure_parallelism

    base = ensure_parallelism(docs.select("doc_id", "lang", "text"))
    tris = base.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, length(lower(text)) - 2), "
                "i -> substring(lower(text), i, 3))"
            )
        ).alias("tri"),
    )
    doc_tri = (
        tris.groupBy("doc_id", "lang", "tri")
        .agg(F.count(F.lit(1)).alias("ct"))
        .localCheckpoint(eager=True)
    )
    lang_tri = doc_tri.groupBy("lang", "tri").agg(
        F.sum("ct").alias("cnt")
    )
    lang_tot = lang_tri.groupBy("lang").agg(
        F.sum("cnt").alias("tot")
    )
    distinct_tri = doc_tri.select("tri").distinct()
    v = distinct_tri.agg(F.count(F.lit(1)).alias("v"))
    langs = lang_tot.select("lang")
    dense = (
        distinct_tri.crossJoin(langs.withColumnRenamed("lang", "plang"))
        .join(
            lang_tri.select(
                F.col("lang").alias("plang"), "tri", "cnt"
            ),
            ["plang", "tri"],
            "left",
        )
        .join(F.broadcast(lang_tot.withColumnRenamed("lang", "plang")),
              "plang")
        .crossJoin(F.broadcast(v))
        .select(
            "tri",
            "plang",
            F.round(
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1))
                    .cast("double")
                    / (F.col("tot") + F.col("v")).cast("double")
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("logp"),
        )
    )
    scores = (
        doc_tri.join(F.broadcast(dense), "tri")
        .groupBy("doc_id", "plang")
        .agg(
            F.sum(F.col("ct") * F.col("logp"))
            .cast("decimal(38,6)")
            .alias("score")
        )
    )
    from pyspark.sql.window import Window

    pred = (
        scores.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("score").desc(), F.col("plang")
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("plang").alias("pred_tri"))
    )
    marker = lang_id(docs.select("doc_id", "lang", "text")).select(
        "doc_id", "lang", F.col("pred_lang").alias("pred_marker")
    )
    return (
        marker.join(pred, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("pred_tri") == F.col("lang"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_tri_correct"),
            F.sum(
                F.when(F.col("pred_marker") == F.col("lang"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_marker_correct"),
            F.sum(
                F.when(F.col("pred_tri") == F.col("pred_marker"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_agree"),
        )
    )

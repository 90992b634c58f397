"""Training-data selection scoring: DSIR hashed-n-gram importance
weights (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling" — public method). Each document is scored by
how much more likely its hashed-unigram bag is under a TARGET slice's
token distribution than under the RAW (everything-else) distribution;
resampling by these weights steers a 100 TB crawl toward the target
domain without training a classifier.

log w(doc) = sum over tokens of [ln p_target(bucket) - ln p_raw(bucket)]

with hashed-feature buckets (md5 -> B buckets, the engine-portable
hash convention from operators/sketch.py) and add-1 smoothing on both
distributions.

Scale shape: the bucket language models are ONE fixed-size frame
(B rows however large the corpus), built by a single conditional
groupBy over the token stream; the per-doc score joins the B-row
frame broadcast onto per-doc bucket counts — token bodies never
shuffle (only (doc_id, bucket) int pairs), and no stage's state
exceeds B rows beyond the per-doc count frame.

Determinism: the per-bucket log-ratio is rounded to 6 dp and cast to
DECIMAL(18,6) BEFORE the per-doc weighted sum (exact, order-free),
the repo-wide oracle convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = 1024  # hashed-feature buckets


def _tokens(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, source, bucket) one row per token occurrence."""
    w = F.explode(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
        )
    ).alias("w")
    return docs.select("doc_id", "source", w).select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long")
            % F.lit(_B)
        ).alias("b"),
    )


def dsir_importance(
    docs: DataFrame,
    target_source: str = "src1",
    text_col: str = "text",
) -> DataFrame:
    """Per-document DSIR log importance weight against the
    `target_source` slice. Output: (doc_id, n_tokens, log_weight)."""
    tb = _tokens(docs, text_col)
    is_t = F.col("source") == F.lit(target_source)
    bs = tb.groupBy("b").agg(
        F.sum(F.when(is_t, 1).otherwise(0)).alias("ct_t"),
        F.sum(F.when(is_t, 0).otherwise(1)).alias("ct_r"),
    )
    totals = bs.agg(
        F.sum("ct_t").alias("nt"), F.sum("ct_r").alias("nr")
    )
    # B-row frame x 1-row totals: both bounded, broadcast the scalar
    lr = bs.crossJoin(F.broadcast(totals)).select(
        "b",
        F.round(
            F.log((F.col("ct_t") + 1) / (F.col("nt") + F.lit(_B)).cast("double"))
            - F.log((F.col("ct_r") + 1) / (F.col("nr") + F.lit(_B)).cast("double")),
            6,
        )
        .cast("decimal(18,6)")
        .alias("lr"),
    )
    per_doc = tb.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("ct"))
    return (
        per_doc.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("ct").cast("long").alias("n_tokens"),
            F.sum(F.col("ct") * F.col("lr")).cast("double").alias("log_weight"),
        )
    )


def slice_kl_divergence(
    docs: DataFrame, slice_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """KL(p_slice || p_corpus) over the unigram distribution, per slice
    — the mixture diagnostic that tells a pretraining-mix owner which
    sources' token distributions deviate most from the blend (Xie et
    al. 2023 DoReMi-style domain analysis runs on exactly this frame).

    No smoothing is needed: every slice token exists in the corpus
    distribution by construction. The per-(slice, word) log-ratio is
    computed in double (identical libm on both engines), rounded to
    6 dp, DECIMAL-weighted by the slice count and summed exactly, then
    normalized by the slice token count — the repo determinism
    contract.

    Scale shape: ONE corpus tokenization feeding a (slice, word)
    count frame (vocab x |slices| rows, localCheckpointed because
    three plan legs read it); word totals and slice totals are
    re-aggregations OF that frame, never second corpus scans; the
    joins are vocab-sized at most, and the output is |slices| rows.
    """
    tok = docs.select(
        F.col(slice_col).alias("slc"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
            )
        ).alias("w"),
    )
    sw = (
        tok.groupBy("slc", "w")
        .agg(F.count(F.lit(1)).alias("ct_sw"))
        .localCheckpoint(eager=False)
    )
    wtot = sw.groupBy("w").agg(F.sum("ct_sw").alias("ct_w"))
    stot = sw.groupBy("slc").agg(
        F.sum("ct_sw").alias("n_s"),
        F.count(F.lit(1)).alias("n_vocab"),
    )
    n1 = sw.agg(F.sum("ct_sw").alias("n"))
    term = (
        F.round(
            F.log(
                (F.col("ct_sw").cast("double") / F.col("n_s"))
                / (F.col("ct_w").cast("double") / F.col("n"))
            ),
            6,
        ).cast("decimal(18,6)")
        * F.col("ct_sw")
    )
    return (
        sw.join(wtot, "w")
        .join(F.broadcast(stot), "slc")
        .crossJoin(F.broadcast(n1))
        .groupBy(F.col("slc").alias("slice_key"))
        .agg(
            F.first("n_s").cast("long").alias("n_tokens"),
            F.first("n_vocab").cast("long").alias("n_vocab"),
            F.round(
                F.sum(term).cast("double") / F.first("n_s"), 6
            ).alias("kl_vs_corpus"),
        )
    )

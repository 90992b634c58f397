#!/usr/bin/env python
"""Heavy-scale scaling probe (round 15, VERDICT item 7).

sf0.1 sits below the measurement floor: per-query plan+schedule fixed
cost (~0.4-0.8 s) dominates, so the driver's 8-core vs 32-core ratio
reads ~1.0 for everything and cannot certify scale-out. This probe
amplifies the sf inputs K times (default 8) into a temp dir AT BENCH
TIME — derived from the parquet inputs on every invocation, nothing
persisted across runs — and times the ~20 heaviest non-streaming
queries against the amplified copy, where compute >> the floor.

Contract mirrors bench.py: reads $SPARK_GRAFT_SF_DIR and
$SPARK_GRAFT_CPUS (master local[$SPARK_GRAFT_CPUS]), noop-sink timing,
prints ONE JSON line:
  {"metric": "heavy_query_wall_seconds", "value": N, "unit": "sec",
   "queries": {...}, "sf": <sf>, "amplify": K}
Opt-in only (never invoked by bench.py); $SPARK_GRAFT_HEAVY_K
overrides K.

Amplification semantics: each copy k shifts ids by k * 10_000_000 and
appends a per-copy token to document text, so near-dup/self-join
queries scale linearly in K (identical texts across copies would make
every cross-copy pair a duplicate and scale the pair miners
quadratically — a different workload, not a bigger one). Events and
embeddings are id-shifted verbatim copies.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gmall_flink_210726_spark.registry import load_all
from gmall_flink_210726_spark.session import default_cpus, get_spark, ship_package

HEAVY_QUERIES = [
    # heaviest non-streaming entries of BENCH_r14.json, all reading
    # only documents / embeddings / events
    "ann_pq_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_cc_clusters",
    "dedup_cc_star_simhash",
    "dedup_containment",
    "dedup_levenshtein_pairs",
    "dedup_minhash_lsh",
    "dedup_near_corpus",
    "dedup_ngram_jaccard",
    "dedup_prefix_filter_pairs",
    "dedup_triangle_motifs",
    "sketch_minhash_calibration",
    "sketch_histogram_quantiles",
    "text_bpe_encode",
    "text_lang_id_trigram",
    "text_paragraph_dedup",
    "text_unigram_encode",
    "text_wordpiece_encode",
    "multimodal_flac_frames",
    "multimodal_orc_bloom",
    "emb_pca_project",
]

_SHIFT = 10_000_000


def amplify(spark, sf_dir: str, out_dir: str, k: int) -> None:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    parts = []
    for c in range(k):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(c * _SHIFT)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" copyid{c}")).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    parts = [
        emb.select(
            (F.col("vec_id") + F.lit(c * _SHIFT)).alias("vec_id"),
            "embedding",
            "label",
        )
        for c in range(k)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))
    parts = [
        ev.select(
            (F.col("event_id") + F.lit(c * _SHIFT)).alias("event_id"),
            "ts",
            "user_id",
            "event_type",
            "value",
            "props",
        )
        for c in range(k)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))
    # small side tables some loaders expect: plain copies
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        src = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(out_dir, f"{t}.parquet"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    k = int(os.environ.get("SPARK_GRAFT_HEAVY_K", "8"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0
    spark = get_spark("gmall-bench-heavy", cpus=default_cpus())
    ship_package(spark)
    specs = load_all()
    big_dir = tempfile.mkdtemp(prefix="bench_heavy_")
    try:
        amplify(spark, sf_dir, big_dir, k)
        # python-worker warm-up as in bench.py
        spark.range(0, 64, 1, default_cpus()).mapInPandas(
            lambda it: it, "id long"
        ).write.format("noop").mode("overwrite").save()
        timings: dict[str, float] = {}
        for name in HEAVY_QUERIES:
            spec = specs[name]
            spark.sparkContext.setJobDescription(f"heavy: {name}")
            try:
                t0 = time.perf_counter()
                spec.fn(spark, big_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                timings[name] = round(time.perf_counter() - t0, 3)
            except Exception as exc:
                print(f"bench_heavy: {name} FAILED: {exc}", file=sys.stderr)
                timings[name] = -1.0
        spark.sparkContext.setJobDescription(None)
    finally:
        shutil.rmtree(big_dir, ignore_errors=True)
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    line = json.dumps(
        {
            "metric": "heavy_query_wall_seconds",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "amplify": k,
        }
    )
    print(line, file=sys.stderr, flush=True)
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

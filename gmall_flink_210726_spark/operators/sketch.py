"""Distributed sketches and layout planning for 100 TB pipelines.

hll_distinct: a deterministic HyperLogLog (Flajolet et al. 2007) built
entirely from JVM Column expressions over md5 — unlike Spark's
approx_count_distinct (whose HLL++ register layout is
implementation-internal), every intermediate here is reproducible in
ANSI SQL, so the DuckDB oracle recomputes the SAME estimate bit-for-bit
and the correctness gate can hash-compare an *approximate* algorithm
exactly. At scale the register table is m rows per group — a
fixed-size, shuffle-once reduction no matter how many input rows.

shard_binpack: deterministic greedy packing of documents into
fixed-token-budget output shards. The global order is (bucket, md5,
id); the only full-order structure materialized is the 256-row bucket
prefix-sum table — per-doc cumulative sums are computed with a window
partitioned BY BUCKET plus the broadcast bucket offset, so no stage
ever sorts the whole corpus in one partition (the classic scalable
prefix-sum decomposition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# alpha_64 from Flajolet et al. 2007 Fig. 3 (m = 64)
HLL_ALPHA_64 = 0.709
HLL_M = 64


def _h60(key: Column) -> Column:
    """First 60 bits of md5(key) as a non-negative bigint.

    conv(hex, 16, 10) on 15 hex chars — 60 bits, safely inside int64.
    """
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("long")


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
) -> DataFrame:
    """Deterministic HLL(m=64) distinct-count per group, with the exact
    count alongside for calibration.

    Register index = low 6 hash bits; rho = leading-zero rank of the
    remaining 54 bits + 1. Small-range (linear counting) correction
    applied exactly as published. Both aggregations run off ONE
    distinct (group, key) reduction — HLL is duplicate-insensitive, so
    deduping first changes nothing and lets the exact count share the
    shuffle.
    """
    deduped = df.select(*group_cols, key_col).distinct()
    regs = hll_registers(deduped, group_cols, key_col)
    per_group = hll_estimate_from_registers(regs, group_cols)
    exact = deduped.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    return per_group.join(exact, group_cols).select(
        *group_cols,
        "hll_estimate",
        "exact_distinct",
    )


def hll_registers(
    keyed: DataFrame, group_cols: list[str], key_col: str
) -> DataFrame:
    """(group..., reg, m) register table — m = max leading-zero rank
    per register. Registers MERGE BY MAX: register tables built from
    any overlapping slices of the key stream max-merge into exactly the
    full-stream table (HLL's merge algebra; the streaming st10 query
    relies on it the way st9 relies on CMS's sum-merge)."""
    h = _h60(F.col(key_col))
    # h >> 6 in exact integer arithmetic (h is 60-bit, above double's
    # 53-bit exact range — float division would corrupt low bits)
    w = F.shiftrightunsigned(h, 6)
    rho = F.when(w == 0, F.lit(55)).otherwise(F.lit(55) - F.length(F.bin(w)))
    return (
        keyed.select(*group_cols, (h % HLL_M).alias("reg"), rho.alias("_rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("_rho").alias("m"))
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Register table -> per-group estimate (raw harmonic mean with the
    published linear-counting small-range correction)."""
    per_group = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("_s_obs"),
        F.count(F.lit(1)).alias("_n_regs"),
    )
    m = F.lit(float(HLL_M))
    s = F.col("_s_obs") + (m - F.col("_n_regs"))  # absent registers: 2^-0
    v = m - F.col("_n_regs")  # zero-valued registers
    e_raw = F.lit(HLL_ALPHA_64) * m * m / s
    est = F.when((e_raw <= 2.5 * HLL_M) & (v > 0), m * F.log(m / v)).otherwise(e_raw)
    return per_group.select(
        *group_cols, F.round(est, 4).alias("hll_estimate")
    )


def _order_preserving_bucket(hk: Column, n_buckets: int) -> Column:
    """Bucket index from the first md5 hex byte such that bucket order
    EQUALS md5 lexicographic order for any n_buckets: floor(hexval *
    n / 256) is monotone in hexval (identity at the default 256),
    whereas `hexval % n` scrambles the order for any n < 256 and would
    silently diverge the (bucket, hk, id) global order from the
    documented ORDER BY md5 cumulative line."""
    hexval = F.conv(F.substring(hk, 1, 2), 16, 10).cast("int")
    # product <= 255 * n fits a long; / 256 is a power-of-two double
    # division, exact, so floor == integer div
    return F.floor((hexval * F.lit(int(n_buckets))) / F.lit(256)).cast("int")


def shard_binpack(
    docs: DataFrame,
    id_col: str,
    size_col: Column,
    target_per_shard: int,
    n_buckets: int = 256,
) -> DataFrame:
    """Assign each doc to an output shard of ~target size units.

    shard_id = floor(exclusive_prefix_sum(size) / target) under the
    deterministic global order (bucket, md5(id), id). Equivalent to a
    single ORDER BY md5 window cumsum (what the oracle runs), but the
    physical plan decomposes it: per-bucket window + 256-row bucket
    prefix table joined back — the standard distributed prefix sum.
    """
    hk = F.md5(F.col(id_col).cast("string"))
    base = docs.select(
        F.col(id_col).alias("_id"),
        size_col.cast("long").alias("_sz"),
        hk.alias("_hk"),
        _order_preserving_bucket(hk, n_buckets).alias("_bkt"),
    )

    # 256-row bucket totals -> exclusive prefix offsets (tiny global window)
    totals = base.groupBy("_bkt").agg(F.sum("_sz").alias("_tot"))
    w_b = (
        Window.orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_bkt", F.coalesce(F.sum("_tot").over(w_b), F.lit(0)).alias("_off")
    )

    w_in = (
        Window.partitionBy("_bkt")
        .orderBy("_hk", "_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_cum = base.join(F.broadcast(offsets), "_bkt").select(
        "_id",
        "_sz",
        (
            F.col("_off") + F.coalesce(F.sum("_sz").over(w_in), F.lit(0))
        ).alias("_excl"),
    )
    return with_cum.select(
        F.col("_id").alias(id_col),
        F.col("_sz").alias("n_units"),
        # exact integer division (SQL `div`), not float floor-divide
        F.expr(f"_excl div {int(target_per_shard)}").alias("shard_id"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_h(j: int, key: Column) -> Column:
    """Row-j counter index: low 8 bits of the 60-bit md5 of 'j:key'."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), key.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % CMS_WIDTH
    )


def _cms_keyed(counts: DataFrame, key_col: str, count_col: str) -> DataFrame:
    """(key, count) -> one row per (key, sketch row j) with the counter
    index — the shared keying step of build and probe. All JVM
    expressions (a when-chain over the literal j values), no UDF."""
    keyed = counts.select(
        F.col(key_col).alias("_k"),
        F.col(count_col).cast("long").alias("_ct"),
        F.explode(F.array(*[F.lit(j) for j in range(CMS_DEPTH)])).alias("_j"),
    )
    expr = None
    for j in range(CMS_DEPTH):
        h = _cms_h(j, F.col("_k"))
        expr = h if expr is None else F.when(F.col("_j") == j, h).otherwise(expr)
    return keyed.withColumn("_ctr", expr)


def cms_cells(counts: DataFrame, key_col: str, count_col: str) -> DataFrame:
    """Build the d x w sketch cell table (j, ctr, cell) from per-key
    counts. Cells are ADDITIVE: sketches built from disjoint slices of
    a stream merge by summing cells — the property the streaming
    maintenance query (st9) relies on for replay-safe epoch merges."""
    return (
        _cms_keyed(counts, key_col, count_col)
        .groupBy("_j", "_ctr")
        .agg(F.sum("_ct").alias("_cell"))
        .select(
            F.col("_j").alias("j"),
            F.col("_ctr").alias("ctr"),
            F.col("_cell").alias("cell"),
        )
    )


def cms_probe(
    cells: DataFrame, counts: DataFrame, key_col: str, count_col: str
) -> DataFrame:
    """Probe a sketch cell table for every key in ``counts``:
    estimate(key) = min_j cells[j][h_j(key)]. The cells side broadcasts
    (<= d*w = 1024 rows); keys never shuffle for the probe."""
    keyed = _cms_keyed(counts, key_col, count_col)
    probe = keyed.join(
        F.broadcast(
            cells.select(
                F.col("j").alias("_j"),
                F.col("ctr").alias("_ctr"),
                F.col("cell").alias("_cell"),
            )
        ),
        ["_j", "_ctr"],
    )
    return (
        probe.groupBy("_k")
        .agg(F.min("_cell").alias("cms_est"), F.max("_ct").alias("exact_ct"))
        .select(F.col("_k").alias(key_col), "exact_ct", "cms_est")
    )


def cms_estimate(
    counts: DataFrame,
    key_col: str,
    count_col: str,
) -> DataFrame:
    """Count-min frequency estimates for every key in ``counts``.

    Builds the d x w sketch (a FIXED 1024-row table no matter the key
    cardinality — the whole point at 100 TB: the sketch is the only
    state that must fit anywhere) from per-key counts, then probes it:
    estimate(key) = min_j sketch[j][h_j(key)]. The sketch side of the
    probe join is broadcast (1024 rows). CMS guarantees
    estimate >= true count (one-sided error).
    """
    return cms_probe(
        cms_cells(counts, key_col, count_col), counts, key_col, count_col
    )


# Mersenne prime modulus for the affine permutation family
MINHASH_P = 2147483647


def portable_minhash_signatures(
    docs: DataFrame,
    id_col: str,
    shingle_col,
    k: int = 16,
) -> DataFrame:
    """k-slot MinHash signature built from ONE md5 per shingle — every
    slot value is reproducible in ANSI SQL (unlike the crc32 production
    path in operators/dedup.py:minhash_signatures). Base hash = first
    32 md5 bits; slot i applies the affine universal-hash permutation
    ((2i+1)*h + 7919*(i+1)) mod 2^31-1 (Broder's permutation family
    approximated by universal hashing — the published construction)
    and takes the min per doc. One md5 per shingle instead of k: the
    k=16 naive form was a measured 5x cost at sf0.1.
    """
    harr = F.transform(
        shingle_col,
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
    )
    init = F.array(*[F.lit(MINHASH_P).cast("long") for _ in range(k)])
    fold = lambda acc, h: F.array(  # noqa: E731
        *[
            F.least(
                acc[i],
                (F.lit(2 * i + 1) * h + F.lit(7919 * (i + 1))) % F.lit(MINHASH_P),
            )
            for i in range(k)
        ]
    )
    # one md5 per shingle, folded into all k slot minima in a single
    # array aggregate — the signature is a pure per-row PROJECTION:
    # no explode, no shuffle, no aggregation exchange at all
    return docs.select(
        F.col(id_col).alias("id"), F.aggregate(harr, init, fold).alias("sig")
    )


def minhash_jaccard_calibration(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
) -> DataFrame:
    """MinHash-estimate vs exact Jaccard for given candidate pairs —
    the sketch-accuracy calibration query (the HLL/CMS contract,
    completed for the third classic sketch): estimate = fraction of
    agreeing signature slots, E[estimate] = J exactly (Broder 1997).

    The signature table is joined twice (both pair sides) — at scale
    the pairs side is the small one (near-dup pairs are sparse) and
    broadcasts; signatures never shuffle.
    """
    from gmall_flink_210726_spark.operators.dedup import word_shingles

    # ``pairs`` feeds BOTH the membership filter below and the final
    # broadcast join — without a cut, the whole upstream pair-mining
    # plan (the exact-Jaccard shingle self-join) is executed twice.
    # Near-dup pairs are sparse at any scale, so materializing them
    # once is a few MB of state for a full mining pass saved
    # (optimization round 15, guide §2.4 / §5 localCheckpoint).
    pairs = pairs.localCheckpoint(eager=True)
    # signatures only for docs that appear in a candidate pair — slot
    # values are per-doc (corpus-independent), so restricting the
    # signature scan to the sparse pair membership changes nothing and
    # removes the full-corpus shingle+md5 pass (a measured 2x at sf0.1)
    pair_ids = (
        pairs.select(F.explode(F.array("id_a", "id_b")).alias("_pid"))
        .distinct()
    )
    cand = docs.join(
        F.broadcast(pair_ids), F.col(id_col) == F.col("_pid")
    ).drop("_pid")
    sig = portable_minhash_signatures(
        cand, id_col, word_shingles(text_col, 3), k
    )
    a = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sa"))
    b = sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sb"))
    agree = F.size(
        F.filter(F.zip_with("sa", "sb", lambda x, y: x == y), lambda eq: eq)
    )
    return (
        a.join(F.broadcast(pairs), "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round("jaccard", 6).alias("jaccard_exact"),
            (agree.cast("double") / F.lit(float(k))).alias("minhash_est"),
        )
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    percentiles: tuple = (0.5, 0.9, 0.99),
    n_buckets: int = 256,
) -> DataFrame:
    """Histogram-sketch quantile estimation with the exact quantile
    alongside — the fourth sketch-calibration query (distinct: HLL,
    frequency: CMS, similarity: MinHash, now rank/quantile).

    A fixed equi-width histogram is the bounded-state structure a
    100 TB profiler keeps per column: n_buckets cells regardless of
    rows. Estimate = linear interpolation inside the bucket containing
    rank p*n. Two passes (min/max+count scalars, then bucket counts) —
    the only global structure is the n_buckets-row cumulative window.
    Exact side: Spark percentile() == DuckDB quantile_cont (linear
    rank interpolation), the w6 contract. BOUND: exact percentile()
    buffers every value of the aggregated column in one aggregation
    buffer — fine here because the exact column exists only to
    calibrate the sketch and is what you DROP at 100 TB (the
    histogram estimate is the production path); never reuse this
    exact side over a corpus-cardinality frame (see
    text2.ccnet_buckets for the bounded-state alternative).
    """
    c = F.col(value_col)
    mn, mx, n = df.agg(F.min(c), F.max(c), F.count(c)).collect()[0]
    width = (F.lit(mx) - F.lit(mn)) / float(n_buckets)
    b = F.least(
        F.floor((c - F.lit(mn)) / width).cast("int"), F.lit(n_buckets - 1)
    )
    hist = df.groupBy(b.alias("b")).agg(F.count(F.lit(1)).alias("ct"))
    w_cum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cw = hist.select("b", "ct", F.sum("ct").over(w_cum).alias("cum"))

    spark = df.sparkSession
    q = spark.createDataFrame([(float(p),) for p in percentiles], "pct double")
    # round the rank to 6 dp: pct*n in double can exceed the exact
    # product by ~1e-12 (0.9 is an inexact double) while the DuckDB
    # oracle computes pct*n in exact DECIMAL — at an exact bucket
    # boundary the two engines would pick adjacent buckets. Both sides
    # round identically, so the boundary test is engine-identical.
    rank = F.round(F.col("pct") * F.lit(n), 6)
    sel = (
        q.crossJoin(F.broadcast(cw))
        .where(((F.col("cum") - F.col("ct")) < rank) & (rank <= F.col("cum")))
        .select(
            "pct",
            F.round(
                F.lit(mn)
                + F.col("b") * width
                + (rank - (F.col("cum") - F.col("ct"))) / F.col("ct") * width,
                6,
            ).alias("est_quantile"),
        )
    )
    exacts = df.agg(
        *[
            F.round(F.expr(f"percentile({value_col}, {p!r})"), 6).alias(f"e{i}")
            for i, p in enumerate(percentiles)
        ]
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(p)).alias("pct"),
                        F.col(f"e{i}").alias("exact_quantile"),
                    )
                    for i, p in enumerate(percentiles)
                ]
            )
        ).alias("x")
    ).select("x.pct", "x.exact_quantile")
    return sel.join(exacts, "pct")


def systematic_weighted_sample(
    docs: DataFrame,
    id_col: str,
    weight_col: Column,
    step: int,
    n_buckets: int = 256,
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling: lay every
    item's weight on the cumulative line (the shard_binpack order and
    distributed prefix sum) and select the items whose weight interval
    [excl, excl+w) crosses a multiple of ``step`` — inclusion
    probability ~ w/step, EXACT integer arithmetic end-to-end (unlike
    Efraimidis-Spirakis priorities, whose float pow/ln ordering is not
    engine-portable). Deterministic, input-order invariant, and
    growth-stable under the md5 order. One bucket-partitioned window +
    the 256-row broadcast offset table — no global sort.
    """
    hk = F.md5(F.col(id_col).cast("string"))
    base = docs.select(
        F.col(id_col).alias("_id"),
        weight_col.cast("long").alias("_w"),
        hk.alias("_hk"),
        _order_preserving_bucket(hk, n_buckets).alias("_bkt"),
    )
    totals = base.groupBy("_bkt").agg(F.sum("_w").alias("_tot"))
    w_b = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_bkt", F.coalesce(F.sum("_tot").over(w_b), F.lit(0)).alias("_off")
    )
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy("_hk", "_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_cum = base.join(F.broadcast(offsets), "_bkt").select(
        "_id",
        "_w",
        (F.col("_off") + F.coalesce(F.sum("_w").over(w_in), F.lit(0))).alias(
            "_excl"
        ),
    )
    crosses = F.expr(f"(_excl + _w) div {int(step)}") - F.expr(
        f"_excl div {int(step)}"
    )
    return (
        with_cum.where(crosses > 0)
        .select(
            F.col("_id").alias(id_col),
            F.col("_w").alias("weight"),
            crosses.cast("long").alias("n_hits"),
        )
    )


def bloom_filter_calibration(
    members: DataFrame,
    probes: DataFrame,
    key_col: str = "key",
    m_bits: int = 8192,
    k_hashes: int = 4,
) -> DataFrame:
    """Bloom-filter membership calibration — the fourth sketch-vs-exact
    calibration (after HLL, CMS, MinHash): build an m-bit Bloom filter
    over the member keys with k md5-derived hash functions (the
    engine-portable _h60 convention, salted per hash index), probe
    every probe key, and report the observed false-positive count next
    to the exact membership truth.

    Scale shape: the filter is the DISTINCT set-bit frame — at most
    m_bits rows regardless of member cardinality — built by one
    explode(k) + distinct over member keys and BROADCAST to the probe
    side; probes shuffle only (key, bit) int pairs, and the output is
    one scalar row. At 100 TB the bitmap is still <= m_bits rows.

    Determinism: bit positions are pure md5 arithmetic, identical in
    DuckDB; a probe passes iff all k of its bits are set (exact
    integer logic, no floats anywhere).
    """
    ks = F.explode(F.sequence(F.lit(0), F.lit(k_hashes - 1))).alias("j")
    bit = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("j"), F.col("k").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(m_bits)
    ).alias("bit")
    mem = members.select(F.col(key_col).alias("k")).distinct()
    mem = mem.localCheckpoint(eager=False)  # bit-build + exact-truth legs
    bits = mem.select("k", ks).select(bit).distinct()
    pr = probes.select(F.col(key_col).alias("k")).distinct()
    probe_bits = pr.select("k", ks).select("k", bit)
    hits = (
        probe_bits.join(
            F.broadcast(bits.select("bit", F.lit(1).alias("_set"))),
            "bit",
            "left",
        )
        .groupBy("k")
        .agg((F.count("_set") == F.lit(k_hashes)).alias("bloom_pass"))
    )
    truth = hits.join(
        mem.select(F.col("k"), F.lit(1).alias("_m")), "k", "left"
    ).select(
        "k", "bloom_pass", F.col("_m").isNotNull().alias("is_member")
    )
    return truth.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.col("is_member").cast("long")).cast("long").alias("n_members"),
        F.sum(F.col("bloom_pass").cast("long")).cast("long").alias("n_pass"),
        F.sum(
            (F.col("bloom_pass") & ~F.col("is_member")).cast("long")
        ).cast("long").alias("n_false_pos"),
        F.sum(
            (~F.col("bloom_pass") & F.col("is_member")).cast("long")
        ).cast("long").alias("n_false_neg"),
    )


def kmv_distinct(
    tagged: DataFrame,
    group_col: str = "col_name",
    value_col: str = "v",
    k: int = 256,
    safety: int = 8,
) -> DataFrame:
    """KMV / bottom-k ("K Minimum Values", Bar-Yossef et al. 2002; the
    theta-sketch base) distinct-count estimate per group, calibrated
    against the exact count: hash every value to a uniform point on
    [0,1), keep the k smallest DISTINCT hashes, and estimate
    D ≈ (k-1)/h_(k), the classic unbiased bottom-k estimator. md5 is
    the hash so a DuckDB oracle recomputes the IDENTICAL estimate —
    fixed-width lowercase hex compares lexicographically exactly as it
    compares numerically, so "k smallest hashes" is engine-portable
    with no numeric conversion until the single k-th value.

    Scale shape (the part worth copying at 100 TB): a naive
    row_number-over-sort ranks EVERY distinct hash — a full sort of
    10⁹+ rows per group just to read row k. Instead a first pass takes
    approx_count_distinct per group (a constant-size HLL++ reduction),
    and only hashes below ``safety*k/n_approx`` — a few·k survivors in
    expectation — reach the rank window. The cutoff frame is
    group-cardinality (a bounded scalar collect is avoided entirely:
    it joins back by group). HLL++'s ±2-3% error is absorbed by the
    8× safety factor; groups with fewer than k distinct values fall
    back to their exact count (the standard KMV small-set rule).

    Output: (group, exact_distinct, kmv_estimate) — exact vs sketch in
    one frame, the calibration artifact.
    """
    hashed = tagged.select(
        F.col(group_col), F.md5(F.col(value_col).cast("string")).alias("h")
    ).where(F.col(value_col).isNotNull())
    # distinct (group, hash): 16-byte rows, map-side partial combine
    d = hashed.distinct()
    exact = d.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("exact_distinct")
    )
    approx = d.groupBy(group_col).agg(
        F.approx_count_distinct("h").alias("n_approx")
    )
    # survivors: h as a fraction of hash space must be under
    # safety*k/n_approx; compare in the 48-bit integer domain to stay
    # exact (h48 < cutoff48). n_approx <= safety*k keeps everything.
    h48 = F.conv(F.substring("h", 1, 12), 16, 10).cast("long")
    cutoff = F.when(
        F.col("n_approx") <= F.lit(safety * k), F.lit(1 << 48)
    ).otherwise(
        (F.lit(float(safety * k) * (1 << 48)) / F.col("n_approx")).cast("long")
    )
    surv = (
        d.join(approx, group_col)
        .where(h48 < cutoff)
        .select(group_col, "h")
    )
    w = Window.partitionBy(group_col).orderBy("h")
    kth = (
        surv.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == k)
        .select(
            group_col,
            (
                F.conv(F.substring("h", 1, 12), 16, 10).cast("long")
                / F.lit(float(1 << 48))
            ).alias("_frac"),
        )
    )
    est = F.round(F.lit(float(k - 1)) / F.col("_frac"), 4)
    return (
        exact.join(kth, group_col, "left")
        .select(
            group_col,
            "exact_distinct",
            F.coalesce(est, F.col("exact_distinct").cast("double")).alias(
                "kmv_estimate"
            ),
        )
    )


def kmv_overlap(
    tagged: DataFrame,
    group_col: str = "grp",
    value_col: str = "v",
    k: int = 256,
    safety: int = 8,
) -> DataFrame:
    """KMV set-INTERSECTION estimation between every group pair (Beyer
    et al., SIGMOD 2007 — the theta-sketch set-operation base),
    calibrated against the exact intersection: for groups A, B the
    bottom-k of A∪B is a uniform sample of the union, so
    |A∩B| ≈ (|U_k ∩ A ∩ B| / K) · D̂(A∪B), with D̂ the standard
    (K-1)/h_(K) bottom-k estimator (exact when the union is smaller
    than k).

    The identity that makes this SCALE-cheap: bottomk(A∪B) ⊆
    bottomk(A) ∪ bottomk(B), and for every hash in it, membership in
    the FULL set equals membership in that group's bottom-k (h_(K) of
    the union never exceeds either group's k-th minimum). So after the
    per-group bottom-k pass (cutoff-gated exactly like kmv_distinct —
    nothing corpus-sized is ever ranked), every pairwise estimate runs
    on ≤2k-row frames per pair: group count × k rows total, however
    many input rows flowed in. The exact side (calibration only) is
    one hash equi-join.

    Output: (g_a, g_b, exact_inter, union_k, kmv_inter_est).
    """
    hashed = tagged.select(
        F.col(group_col).alias("g"), F.md5(F.col(value_col).cast("string")).alias("h")
    ).where(F.col(value_col).isNotNull())
    d = hashed.distinct()
    # --- per-group bottom-k with the approx cutoff gate (kmv_distinct) ---
    approx = d.groupBy("g").agg(F.approx_count_distinct("h").alias("n_approx"))
    h48 = F.conv(F.substring("h", 1, 12), 16, 10).cast("long")
    cutoff = F.when(
        F.col("n_approx") <= F.lit(safety * k), F.lit(1 << 48)
    ).otherwise(
        (F.lit(float(safety * k) * (1 << 48)) / F.col("n_approx")).cast("long")
    )
    surv = d.join(approx, "g").where(h48 < cutoff).select("g", "h")
    wg = Window.partitionBy("g").orderBy("h")
    bk = (
        surv.withColumn("_r", F.row_number().over(wg))
        .where(F.col("_r") <= k)
        .select("g", "h")
    )
    bk = bk.localCheckpoint(eager=False)  # feeds 4 plan legs
    # --- group pairs (bounded: #groups is a dim) ---
    gs = d.select("g").distinct()
    pairs = (
        gs.alias("x")
        .join(gs.alias("y"), F.col("x.g") < F.col("y.g"))
        .select(F.col("x.g").alias("g_a"), F.col("y.g").alias("g_b"))
    )
    # --- union bottom-k per pair over the merged per-group bottom-ks ---
    ua = pairs.join(bk.withColumnRenamed("g", "g_a"), "g_a")
    ub = pairs.join(bk.withColumnRenamed("g", "g_b"), "g_b")
    u = ua.select("g_a", "g_b", "h").unionAll(
        ub.select("g_a", "g_b", "h")
    ).distinct()
    wp = Window.partitionBy("g_a", "g_b").orderBy("h")
    uk = u.withColumn("_r", F.row_number().over(wp)).where(F.col("_r") <= k)
    # membership of each union-bottom-k hash in A and in B via the
    # per-group bottom-k sets (valid by the subset identity above)
    in_a = bk.select(F.col("g").alias("g_a"), "h", F.lit(1).alias("_ia"))
    in_b = bk.select(F.col("g").alias("g_b"), "h", F.lit(1).alias("_ib"))
    marked = (
        uk.join(in_a, ["g_a", "h"], "left")
        .join(in_b, ["g_b", "h"], "left")
    )
    stats = marked.groupBy("g_a", "g_b").agg(
        F.max("_r").cast("long").alias("union_k"),
        F.max(F.when(F.col("_r") == k, F.col("h"))).alias("_kth"),
        F.sum(
            F.when(F.col("_ia").isNotNull() & F.col("_ib").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("_cnt_ab"),
    )
    frac = F.conv(F.substring("_kth", 1, 12), 16, 10).cast("long") / F.lit(
        float(1 << 48)
    )
    est_union = F.when(
        F.col("union_k") < k, F.col("union_k").cast("double")
    ).otherwise(F.lit(float(k - 1)) / frac)
    inter_est = F.round(
        (F.col("_cnt_ab").cast("double") / F.col("union_k")) * est_union, 4
    )
    # --- exact intersection (calibration side): one hash equi-join ---
    da = d.select(F.col("g").alias("g_a"), "h")
    db = d.select(F.col("g").alias("g_b"), "h")
    exact = (
        da.join(db, "h")
        .where(F.col("g_a") < F.col("g_b"))
        .groupBy("g_a", "g_b")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_inter"))
    )
    return (
        stats.join(exact, ["g_a", "g_b"], "left")
        .select(
            "g_a",
            "g_b",
            F.coalesce("exact_inter", F.lit(0)).cast("long").alias("exact_inter"),
            "union_k",
            inter_est.alias("kmv_inter_est"),
        )
    )


def kmv_anotb(
    tagged: DataFrame,
    group_col: str = "grp",
    value_col: str = "v",
    k: int = 256,
    safety: int = 8,
) -> DataFrame:
    """KMV set-DIFFERENCE estimation |A \\ B| for every ORDERED group
    pair (the theta-sketch a-not-b operation, Dasgupta et al. 2016
    "Theta-Sketch Framework"): within bottomk(A∪B) — a uniform sample
    of the union — count hashes present in A's bottom-k but absent
    from B's, then scale by the union-cardinality estimate:
    |A\\B| ≈ (|U_k ∩ A ∩ ¬B| / K) · D̂(A∪B).

    Same scale identity as :func:`kmv_overlap` (bottomk(A∪B) ⊆
    bottomk(A) ∪ bottomk(B); full-set membership within it equals
    bottom-k membership — and NON-membership in B is decidable too,
    because any union hash below h_(K) that belongs to B would appear
    in B's bottom-k). After the cutoff-gated per-group bottom-k pass,
    every directed pair runs on ≤2k rows.

    Output: (g_a, g_b, exact_anotb, union_k, kmv_anotb_est) over all
    ordered pairs g_a != g_b.
    """
    hashed = tagged.select(
        F.col(group_col).alias("g"),
        F.md5(F.col(value_col).cast("string")).alias("h"),
    ).where(F.col(value_col).isNotNull())
    d = hashed.distinct()
    approx = d.groupBy("g").agg(F.approx_count_distinct("h").alias("n_approx"))
    h48 = F.conv(F.substring("h", 1, 12), 16, 10).cast("long")
    cutoff = F.when(
        F.col("n_approx") <= F.lit(safety * k), F.lit(1 << 48)
    ).otherwise(
        (F.lit(float(safety * k) * (1 << 48)) / F.col("n_approx")).cast("long")
    )
    surv = d.join(approx, "g").where(h48 < cutoff).select("g", "h")
    wg = Window.partitionBy("g").orderBy("h")
    bk = (
        surv.withColumn("_r", F.row_number().over(wg))
        .where(F.col("_r") <= k)
        .select("g", "h")
    )
    bk = bk.localCheckpoint(eager=False)  # feeds 4 plan legs
    gs = d.select("g").distinct()
    pairs = (
        gs.alias("x")
        .join(gs.alias("y"), F.col("x.g") != F.col("y.g"))
        .select(F.col("x.g").alias("g_a"), F.col("y.g").alias("g_b"))
    )
    ua = pairs.join(bk.withColumnRenamed("g", "g_a"), "g_a")
    ub = pairs.join(bk.withColumnRenamed("g", "g_b"), "g_b")
    u = ua.select("g_a", "g_b", "h").unionAll(
        ub.select("g_a", "g_b", "h")
    ).distinct()
    wp = Window.partitionBy("g_a", "g_b").orderBy("h")
    uk = u.withColumn("_r", F.row_number().over(wp)).where(F.col("_r") <= k)
    in_a = bk.select(F.col("g").alias("g_a"), "h", F.lit(1).alias("_ia"))
    in_b = bk.select(F.col("g").alias("g_b"), "h", F.lit(1).alias("_ib"))
    marked = uk.join(in_a, ["g_a", "h"], "left").join(
        in_b, ["g_b", "h"], "left"
    )
    stats = marked.groupBy("g_a", "g_b").agg(
        F.max("_r").cast("long").alias("union_k"),
        F.max(F.when(F.col("_r") == k, F.col("h"))).alias("_kth"),
        F.sum(
            F.when(
                F.col("_ia").isNotNull() & F.col("_ib").isNull(), 1
            ).otherwise(0)
        ).cast("long").alias("_cnt_aonly"),
    )
    frac = F.conv(F.substring("_kth", 1, 12), 16, 10).cast("long") / F.lit(
        float(1 << 48)
    )
    est_union = F.when(
        F.col("union_k") < k, F.col("union_k").cast("double")
    ).otherwise(F.lit(float(k - 1)) / frac)
    est = F.round(
        (F.col("_cnt_aonly").cast("double") / F.col("union_k")) * est_union, 4
    )
    # exact |A\B| = |A| - |A∩B| (calibration side)
    sizes = d.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    da = d.select(F.col("g").alias("g_a"), "h")
    db = d.select(F.col("g").alias("g_b"), "h")
    inter = (
        da.join(db, "h")
        .where(F.col("g_a") != F.col("g_b"))
        .groupBy("g_a", "g_b")
        .agg(F.count(F.lit(1)).cast("long").alias("_ei"))
    )
    return (
        stats.join(inter, ["g_a", "g_b"], "left")
        .join(sizes.withColumnRenamed("g", "g_a"), "g_a")
        .select(
            "g_a",
            "g_b",
            (F.col("n_a") - F.coalesce("_ei", F.lit(0)))
            .cast("long")
            .alias("exact_anotb"),
            "union_k",
            est.alias("kmv_anotb_est"),
        )
    )

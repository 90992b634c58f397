"""Property-based tests (hypothesis): operator semantics vs independent
pure-Python models on randomized inputs. Example counts are small —
every example pays a Spark job."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from gmall_flink_210726_spark.functions.tokenizer import _tokenize_py, tokenize_col
from gmall_flink_210726_spark.operators.joins import interval_join
from gmall_flink_210726_spark.operators.stateful import first_per_key

SETTLE = dict(max_examples=8, deadline=None)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from gmall_flink_210726_spark.session import get_spark

        _spark = get_spark("props", cpus=4, shuffle_partitions=4)
    return _spark


rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # key
        st.integers(min_value=0, max_value=40),     # ts (seconds)
        st.integers(min_value=0, max_value=10_000), # unique-ish id source
    ),
    min_size=0,
    max_size=25,
)


@settings(**SETTLE)
@given(left=rows_strategy, right=rows_strategy, lo=st.integers(-10, 0), hi=st.integers(0, 10))
def test_interval_join_matches_bruteforce(left, right, lo, hi):
    spark = _get_spark()
    l = spark.createDataFrame(
        [(k, t * 1000000, i) for i, (k, t, _) in enumerate(left)] or [(None, None, None)],
        "k long, us long, idx long",
    ).filter(F.col("k").isNotNull()).withColumn("ts", F.timestamp_micros("us"))
    r = spark.createDataFrame(
        [(k, t * 1000000, i) for i, (k, t, _) in enumerate(right)] or [(None, None, None)],
        "k long, us long, idx long",
    ).filter(F.col("k").isNotNull()).withColumn("ts", F.timestamp_micros("us"))
    got = {
        (row["l.idx"], row["r.idx"])
        for row in interval_join(l, r, "k", "k", "ts", "ts", lo, hi)
        .select(F.col("l.idx").alias("l.idx"), F.col("r.idx").alias("r.idx"))
        .collect()
    }
    expected = {
        (i, j)
        for i, (lk, lt, _) in enumerate(left)
        for j, (rk, rt, _) in enumerate(right)
        if lk == rk and lo <= rt - lt <= hi
    }
    assert got == expected


@settings(**SETTLE)
@given(
    texts=st.lists(
        st.text(alphabet="abc XYZ09.,-!", min_size=0, max_size=40), min_size=1, max_size=10
    )
)
def test_tokenizer_col_equals_python_fallback(texts):
    spark = _get_spark()
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    got = [r.toks for r in df.select(tokenize_col("t").alias("toks")).collect()]
    expected = [_tokenize_py(t) for t in texts]
    assert got == expected


@settings(**SETTLE)
@given(rows=rows_strategy)
def test_first_per_key_deterministic_minimum(rows):
    spark = _get_spark()
    data = [(k, t, i) for i, (k, t, _) in enumerate(rows)]
    if not data:
        return
    df = spark.createDataFrame(data, "k long, t long, idx long")
    got = {(r.k, r.t, r.idx) for r in first_per_key(df, ["k"], ["t", "idx"]).collect()}
    expected = set()
    by_key: dict[int, list] = {}
    for k, t, i in data:
        by_key.setdefault(k, []).append((t, i, k))
    for k, lst in by_key.items():
        t, i, _ = min(lst)
        expected.add((k, t, i))
    assert got == expected


class TestCJKTokenizer:
    """Pin the CJK segmentation contract (the reference's IK-analyzer
    surface, func/SplitFunction.java:12-27): without a segmenter a
    contiguous [0-9a-z一-鿿] run is ONE keyword, and a tokenizer error
    degrades to emitting the raw keyword (the reference's catch branch
    at :22-24)."""

    def test_contiguous_cjk_run_is_one_token(self):
        spark = _get_spark()
        rows = [
            ("小米手机",),
            ("华为手机 价格",),
            ("2021款 小米手机",),
            ("图书 《三体》",),
            ("pixel 手机壳",),
        ]
        df = spark.createDataFrame(rows, ["t"])
        got = [r.toks for r in df.select(tokenize_col("t").alias("toks")).collect()]
        assert got[0] == ["小米手机"]  # one run, one keyword
        assert got[1] == ["华为手机", "价格"]  # split at the space only
        assert got[2] == ["2021款", "小米手机"]  # digits glue to CJK
        assert got[3] == ["图书", "三体"]  # fullwidth brackets are separators
        assert got[4] == ["pixel", "手机壳"]  # latin/CJK split at the space
        # JVM column path and Python fallback agree on CJK too
        assert got == [_tokenize_py(t) for (t,) in rows]

    def test_error_degrades_to_raw_keyword(self, monkeypatch):
        import gmall_flink_210726_spark.functions.tokenizer as tok

        class Boom:
            def split(self, *_):
                raise RuntimeError("segmenter exploded")

            def fullmatch(self, *_):
                raise RuntimeError("segmenter exploded")

        monkeypatch.setattr(tok, "_FALLBACK_RE", Boom())
        assert tok._tokenize_py("小米手机 价格") == ["小米手机 价格"]
        monkeypatch.undo()
        assert tok._tokenize_py("小米手机 价格") == ["小米手机", "价格"]


# ---------------------------------------------------------------- wave 6+

@settings(**SETTLE)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**9),
                  min_size=1, max_size=60),
)
def test_cms_never_underestimates(keys):
    """CMS one-sided error on arbitrary key multisets: the estimate is
    >= the true count for EVERY key (Cormode & Muthukrishnan Thm 1)."""
    from collections import Counter

    from gmall_flink_210726_spark.operators.sketch import cms_estimate

    spark = _get_spark()
    counts = Counter(keys)
    wc = spark.createDataFrame(
        [(str(k), c) for k, c in counts.items()], "k string, ct long"
    )
    for r in cms_estimate(wc, "k", "ct").collect():
        assert r.cms_est >= r.exact_ct
        assert r.exact_ct == counts[int(r.k)]


@settings(**SETTLE)
@given(
    weights=st.lists(st.integers(min_value=0, max_value=500),
                     min_size=1, max_size=50),
    step=st.integers(min_value=1, max_value=300),
)
def test_systematic_sample_hits_model(weights, step):
    """PPS sampling vs a pure-Python model of the same cumulative
    line: identical selected set and hit counts, and total hits ==
    floor(total/step) crossings."""
    import hashlib

    from gmall_flink_210726_spark.operators.sketch import (
        systematic_weighted_sample,
    )

    spark = _get_spark()
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "id long, w long"
    )
    got = {
        (r.id, r.n_hits)
        for r in systematic_weighted_sample(
            df, "id", F.col("w"), step=step
        ).collect()
    }
    order = sorted(
        range(len(weights)),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )
    cum, want = 0, set()
    for i in order:
        w = weights[i]
        hits = (cum + w) // step - cum // step
        if hits > 0:
            want.add((i, hits))
        cum += w
    assert got == want


@settings(**SETTLE)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3), st.integers(0, 100)),
        min_size=1, max_size=40,
    ),
    split=st.integers(0, 100),
)
def test_incremental_refresh_any_split(rows, split):
    """MV merge == full recompute for EVERY split point of the data —
    the algebraic-merge identity quantified over arbitrary partitions."""
    from gmall_flink_210726_spark.operators.analytics import (
        incremental_agg_refresh,
    )

    spark = _get_spark()
    df = spark.createDataFrame(rows, "g long, sub long, v long")
    partials = [F.count(F.lit(1)).alias("ct"), F.sum("v").alias("vs")]
    merges = [F.sum("ct").cast("long").alias("ct"),
              F.sum("vs").cast("long").alias("vs")]
    base = df.where(F.col("v") < split).groupBy("g").agg(*partials)
    delta = df.where(F.col("v") >= split)
    merged = incremental_agg_refresh(base, delta, ["g"], partials, merges)
    full = df.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("ct"),
        F.sum("v").cast("long").alias("vs"),
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


ranges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),  # lo
        st.integers(min_value=0, max_value=60),   # width (0 -> empty)
    ),
    min_size=0,
    max_size=12,
)
points_strategy = st.lists(
    st.integers(min_value=-10, max_value=260), min_size=0, max_size=25
)


@settings(**SETTLE)
@given(ranges=ranges_strategy, points=points_strategy,
       gran=st.sampled_from([1, 7, 16, 64]))
def test_range_join_matches_bruteforce(ranges, points, gran):
    """range_join == the O(P*R) brute-force BETWEEN model for any
    ranges (overlapping, empty, adjacent), points (incl. out-of-space),
    and chunk granularity."""
    from gmall_flink_210726_spark.operators.joins import range_join

    spark = _get_spark()
    rdf = spark.createDataFrame(
        [(i, lo, lo + w) for i, (lo, w) in enumerate(ranges)],
        "rid long, lo long, hi long",
    )
    pdf = spark.createDataFrame([(p,) for p in points], "addr long")
    got = sorted(
        (r["addr"], r["rid"])
        for r in range_join(pdf, rdf, "addr", "lo", "hi", gran).collect()
    )
    want = sorted(
        (p, i)
        for p in points
        for i, (lo, w) in enumerate(ranges)
        if lo <= p < lo + w
    )
    assert got == want

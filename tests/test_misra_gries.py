"""Misra-Gries kernel + distributed frequent-tokens operator."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from parallel_count_min_sketch_spark.operators.heavy_hitters import mg_frequent_tokens
from parallel_count_min_sketch_spark.sketches.misra_gries import MisraGries


def _exact(data):
    vals, cnts = np.unique(data, return_counts=True)
    return dict(zip(vals.tolist(), cnts.tolist()))


def test_underestimate_invariant_and_bound():
    rng = np.random.default_rng(42)
    data = rng.zipf(1.4, 100_000)
    data = data[data < 1 << 40]
    mg = MisraGries(128)
    for lo in range(0, len(data), 3000):
        mg.update_batch(data[lo:lo + 3000])
    exact = _exact(data)
    assert mg.n_total == len(data)
    assert mg.offset_total <= mg.n_total // (128 + 1)
    est = dict(zip(mg.items.tolist(), mg.counts.tolist()))
    for v, e in est.items():
        assert e <= exact[v]  # never overestimates
        assert exact[v] - e <= mg.offset_total
    # capacity guarantee: every item above n/(k+1) is retained
    for v, c in exact.items():
        if c > mg.n_total // (128 + 1):
            assert v in est


def test_weighted_equals_repeated():
    vals = np.array([5, 9, 5, 7], dtype=np.int64)
    w = np.array([3, 1, 2, 4], dtype=np.int64)
    a = MisraGries(16)
    a.update_batch(vals, w)
    b = MisraGries(16)
    b.update_batch(np.repeat(vals, w))
    assert np.array_equal(a.items, b.items)
    assert np.array_equal(a.counts, b.counts)
    assert a.n_total == b.n_total == 10


def test_merge_preserves_invariants():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 500, 60_000)
    exact = _exact(data)
    parts = np.array_split(data, 7)
    sks = []
    for p in parts:
        sk = MisraGries(64)
        sk.update_batch(p)
        sks.append(sk)
    merged = sks[0]
    for sk in sks[1:]:
        merged = merged.merge(sk)
    assert merged.n_total == len(data)
    est = dict(zip(merged.items.tolist(), merged.counts.tolist()))
    for v, e in est.items():
        assert e <= exact[v] <= e + merged.offset_total
    for v, c in exact.items():
        if c > merged.offset_total:
            assert v in est


def test_roundtrip_and_estimate():
    mg = MisraGries(8)
    mg.update_batch(np.array([1, 1, 1, 2, 2, 3], dtype=np.int64))
    back = MisraGries.from_bytes(mg.to_bytes())
    assert back.k == 8 and back.n_total == 6 and back.offset_total == 0
    assert back.estimate(np.array([1, 2, 3, 99])).tolist() == [3, 2, 1, 0]


def test_k_too_small_raises(spark, sf_dir):
    from parallel_count_min_sketch_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="too small"):
        mg_frequent_tokens(docs, "text", 10, 0.02)


def test_mg_frequent_tokens_matches_exact(spark, sf_dir):
    from parallel_count_min_sketch_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    got = mg_frequent_tokens(docs, "text", 512, 0.02).collect()
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok")) \
        .filter(F.col("tok") != "")
    n = toks.count()
    want = {
        r["tok"]: r["cnt"]
        for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= int(0.02 * n)).collect()
    }
    assert {r["token"]: r["exact_count"] for r in got} == want
    assert all(r["mg_bound_ok"] for r in got)


def test_mg_partition_invariance(spark, sf_dir):
    from parallel_count_min_sketch_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    a = mg_frequent_tokens(docs.repartition(1), "text", 512, 0.02).collect()
    b = mg_frequent_tokens(docs.repartition(7), "text", 512, 0.02).collect()
    assert [(r["token"], r["exact_count"]) for r in a] == \
        [(r["token"], r["exact_count"]) for r in b]


def test_mg_grouped_matches_exact(spark, sf_dir):
    from parallel_count_min_sketch_spark.operators.heavy_hitters import (
        mg_grouped_frequent_tokens,
    )
    from parallel_count_min_sketch_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    got = mg_grouped_frequent_tokens(docs, "lang", "text", 512, 0.02).collect()
    toks = docs.select("lang", F.explode(F.split("text", " ")).alias("tok")) \
        .filter(F.col("tok") != "")
    n_g = {r["lang"]: r["n"] for r in
           toks.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    counts = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c")).collect()
    want = {(r["lang"], r["tok"]): r["c"] for r in counts
            if r["c"] >= int(0.02 * n_g[r["lang"]])}
    assert {(r["lang"], r["token"]): r["exact_count"] for r in got} == want
    assert all(r["mg_bound_ok"] for r in got)


def test_uncertifiable_threshold_raises(spark):
    # k=2, phi=0.334 passes the static k+1 > 1/phi guard (3 > 2.994), but
    # on this stream the summary ends EMPTY with decrement bound 3 ==
    # floor(phi*10): items a/b/c (count 3) are absent yet meet the
    # threshold. The runtime certification must raise, never return a
    # silently incomplete frequent set.
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a a a b b b c c c d")],
                               "doc_id LONG, text STRING")
    with _pytest.raises(ValueError, match="certify"):
        mg_frequent_tokens(df, "text", 2, 0.334)

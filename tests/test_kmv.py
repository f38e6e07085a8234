"""KMV (bottom-k) distinct sketch: estimator accuracy, merge algebra,
serialization, set-operation estimates, and the distributed grouped
pair-combine operator."""

from __future__ import annotations

import numpy as np
import pytest

from parallel_count_min_sketch_spark.sketches.kmv import KMV_HASH_SPACE, KMVSketch


def test_exact_regime_below_k():
    sk = KMVSketch(512, seed=7)
    sk.update_batch(np.arange(300))
    n, theta, est = sk.estimate_portable()
    assert (n, theta, est) == (300, KMV_HASH_SPACE, 300.0)


def test_estimate_within_error():
    rng = np.random.default_rng(0)
    items = rng.integers(0, 10**12, size=200_000)
    sk = KMVSketch(512, seed=7)
    sk.update_batch(items)
    # 62-bit hash space: distinct ITEMS are the ground truth (no ~2^31
    # collision ceiling to account for anymore)
    true = len(np.unique(items))
    _, _, est = sk.estimate_portable()
    # KMV rel std err ~ 1/sqrt(k-2) ~ 4.4%; 3 sigma
    assert abs(est - true) / true < 0.14


def test_merge_is_partition_invariant_and_idempotent():
    rng = np.random.default_rng(1)
    items = rng.integers(0, 10**9, size=50_000)
    bulk = KMVSketch(256, seed=9)
    bulk.update_batch(items)
    for n_parts in (2, 7, 32):
        merged = KMVSketch(256, seed=9)
        for part in np.array_split(items, n_parts):
            s = KMVSketch(256, seed=9)
            s.update_batch(part)
            merged.merge(s)
        assert np.array_equal(merged.values, bulk.values)
    # idempotent: merging a sketch with itself changes nothing
    again = bulk.copy_with_values().merge(bulk.copy_with_values())
    assert np.array_equal(again.values, bulk.values)


def test_duplicates_do_not_change_state():
    items = np.arange(1000)
    a = KMVSketch(128, seed=3)
    a.update_batch(items)
    b = KMVSketch(128, seed=3)
    b.update_batch(np.repeat(items, 5))
    assert np.array_equal(a.values, b.values)


def test_roundtrip_and_incompatible():
    sk = KMVSketch(64, seed=11)
    sk.update_strings(["alpha", "beta", "gamma"])
    rt = KMVSketch.from_bytes(sk.to_bytes())
    assert rt.config_key() == sk.config_key()
    assert np.array_equal(rt.values, sk.values)
    with pytest.raises(ValueError):
        sk.merge(KMVSketch(64, seed=12))
    with pytest.raises(ValueError):
        sk.merge(KMVSketch(128, seed=11))


def test_pair_stats_estimates_overlap():
    rng = np.random.default_rng(2)
    a_items = rng.integers(0, 50_000, size=100_000)
    b_items = rng.integers(25_000, 75_000, size=100_000)
    sa = KMVSketch(512, seed=7)
    sa.update_batch(a_items)
    sb = KMVSketch(512, seed=7)
    sb.update_batch(b_items)
    st = KMVSketch.pair_stats(sa, sb)
    true_i = len(np.intersect1d(a_items, b_items))
    true_u = len(np.union1d(a_items, b_items))
    assert abs(st["inter_est"] - true_i) / true_i < 0.25
    assert abs(st["union_est"] - true_u) / true_u < 0.15
    assert abs(st["jaccard_est"] - true_i / true_u) < 0.05


def test_pair_stats_exact_when_both_below_k():
    sa = KMVSketch(512, seed=5)
    sa.update_batch(np.arange(0, 200))
    sb = KMVSketch(512, seed=5)
    sb.update_batch(np.arange(100, 300))
    st = KMVSketch.pair_stats(sa, sb)
    # both sketches exact -> theta = p and every count is exact
    # (assuming no affine-hash collisions among 300 small ints)
    assert st["theta"] == KMV_HASH_SPACE
    assert st["n_common"] == 100
    assert st["n_union_below_theta"] == 300
    assert st["union_est"] == 300.0


def test_grouped_pair_estimates_spark(spark):
    """Distributed grouped KMV build + executor-side pair combine equals
    the kernel computed directly on the same data."""
    from parallel_count_min_sketch_spark.operators.setops import kmv_pair_estimates
    from parallel_count_min_sketch_spark.operators.sketch_agg import sketch_grouped

    rng = np.random.default_rng(4)
    rows = [
        ("a", int(v)) for v in rng.integers(0, 4000, size=6000)
    ] + [
        ("b", int(v)) for v in rng.integers(2000, 6000, size=6000)
    ] + [
        ("c", int(v)) for v in rng.integers(0, 500, size=1000)
    ]
    df = spark.createDataFrame(rows, "g STRING, item LONG").repartition(8)

    # partial over the package class pickles by reference — executors
    # re-import the package instead of the (non-importable) test module
    from functools import partial

    from parallel_count_min_sketch_spark.plans.sketch_queries import _kmv_from_bytes

    mk = partial(KMVSketch, 256, 21)
    grouped = sketch_grouped(df, "g", "item", mk, _kmv_from_bytes)
    got = {
        (r["group_a"], r["group_b"]): r
        for r in kmv_pair_estimates(grouped).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}

    by_g: dict[str, KMVSketch] = {}
    for g, v in rows:
        by_g.setdefault(g, mk()).update_batch(np.array([v]))
    p = KMV_HASH_SPACE
    for ga, gb in got:
        st = KMVSketch.pair_stats(by_g[ga], by_g[gb])
        r = got[(ga, gb)]
        assert r["theta"] == st["theta"]
        assert r["n_common"] == st["n_common"]
        assert r["n_union_below_theta"] == st["n_union_below_theta"]
        assert r["inter_floor"] == (st["n_common"] * p) // st["theta"]


def test_hash_space_is_genuinely_wider_than_one_prime():
    """Regression for the two-affines-of-one-residue trap: x and x + p1
    share x mod p1, so any hash built ONLY from that residue collides —
    the CRT construction must separate them via x mod p2 (and
    symmetrically for x + p2 via x mod p1). Also pins the packed range
    and the exact-regime count on a residue-colliding input set."""
    from parallel_count_min_sketch_spark.sketches.hashing import MERSENNE_PRIME
    from parallel_count_min_sketch_spark.sketches.kmv import (
        KMV_HASH_SPACE,
        KMV_SECOND_PRIME,
    )

    sk = KMVSketch(2048, seed=7)   # k > 600 keeps the sketch exact
    base = np.arange(0, 200, dtype=np.int64) * 1_000_003
    shifted_p1 = base + MERSENNE_PRIME      # collide mod p1 with base
    shifted_p2 = base + KMV_SECOND_PRIME    # collide mod p2 with base
    all_items = np.concatenate([base, shifted_p1, shifted_p2])
    h = sk._hash(all_items)
    assert len(np.unique(h)) == len(all_items)   # no cross-collisions
    assert h.min() >= 0 and h.max() < KMV_HASH_SPACE
    # the exact regime counts them as 600 distinct items
    sk.update_batch(all_items)
    n, theta, est = sk.estimate_portable()
    assert (n, theta, est) == (600, KMV_HASH_SPACE, 600.0)
    # and the documented residual ceiling: congruence mod p1*p2 DOES
    # collide (the only remaining preimage class in int64)
    pair = np.array([123, 123 + KMV_HASH_SPACE], dtype=np.int64)
    assert len(np.unique(sk._hash(pair))) == 1

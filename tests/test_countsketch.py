"""Count-Sketch kernel: estimator accuracy, exact-integer median,
merge algebra, weighted builds, F2 moment, serialization."""

from __future__ import annotations

import numpy as np
import pytest

from parallel_count_min_sketch_spark.sketches.countsketch import CountSketch


def _zipf_stream(n=200_000, seed=0):
    rng = np.random.default_rng(seed)
    return rng.zipf(1.3, size=n) % 50_000


def test_heavy_hitters_accurate_and_two_sided():
    items = _zipf_stream()
    sk = CountSketch(5, 4096, seed=17)
    sk.update_batch(items)
    vals, counts = np.unique(items, return_counts=True)
    top = np.argsort(counts)[-20:]
    est = sk.point_query(vals[top])
    assert (np.abs(est - counts[top]) / counts[top]).max() < 0.05
    # UNBIASED (two-sided): unlike CMS, under-estimates must occur
    est_all = sk.point_query(vals)
    assert (est_all < counts).any() and (est_all > counts).any()
    assert abs(float((est_all - counts).mean())) < 5.0


def test_merge_partition_invariant_and_weighted_equals_exploded():
    items = _zipf_stream(seed=1)
    bulk = CountSketch(5, 2048, seed=9)
    bulk.update_batch(items)
    merged = CountSketch(5, 2048, seed=9)
    for part in np.array_split(items, 9):
        s = CountSketch(5, 2048, seed=9)
        s.update_batch(part)
        merged.merge(s)
    assert np.array_equal(merged.table, bulk.table)
    vals, counts = np.unique(items, return_counts=True)
    weighted = CountSketch(5, 2048, seed=9)
    weighted.update_batch(vals, counts)
    assert np.array_equal(weighted.table, bulk.table)


def test_f2_estimate():
    items = _zipf_stream(seed=2)
    sk = CountSketch(5, 4096, seed=3)
    sk.update_batch(items)
    _, counts = np.unique(items, return_counts=True)
    true_f2 = int((counts.astype(np.int64) ** 2).sum())
    est = sk.f2_estimate()
    assert abs(est - true_f2) / true_f2 < 0.1


def test_median_is_exact_middle_order_statistic():
    sk = CountSketch(5, 64, seed=4)
    sk.update_batch(np.array([42] * 100))
    per_row = sk.estimates_per_row(np.array([42]))[:, 0]
    assert sk.point_query(np.array([42]))[0] == int(np.sort(per_row)[2])


def test_roundtrip_strings_and_guards():
    sk = CountSketch(3, 128, seed=5)
    sk.update_strings(["a", "b", "a", "ünïcode"])
    rt = CountSketch.from_bytes(sk.to_bytes())
    assert np.array_equal(rt.table, sk.table)
    assert rt.config_key() == sk.config_key()
    assert sk.point_query_strings(["a"])[0] >= 1
    with pytest.raises(ValueError):
        CountSketch(4, 128)  # even depth
    with pytest.raises(ValueError):
        sk.merge(CountSketch(3, 128, seed=6))

"""Conservative-update CMS kernel invariants (sketches/cms_cu.py).

The distributed contract query gates the sandwich exact <= CU <= CMS over
real token streams; these tests pin the kernel-level guarantees the proof
relies on: the classic CU invariant under sequential folding, cell-wise
domination by plain CMS, preservation of both under element-wise sum
merges, weight semantics, and serialization.
"""

import numpy as np
import pytest

from parallel_count_min_sketch_spark.sketches.cms import CountMinSketch
from parallel_count_min_sketch_spark.sketches.cms_cu import ConservativeCMS

EPS, DELTA, SEED = 0.01, 0.1, 42


def _zipf_stream(rng, n=20_000, vocab=400):
    # heavy-tailed stream: where CU's overestimate reduction shows up
    return (rng.zipf(1.3, size=n) % vocab).astype(np.int64)


def _freqs(items):
    vals, cnts = np.unique(items, return_counts=True)
    return vals, cnts.astype(np.int64)


def test_cu_one_sided_and_dominated_by_cms():
    rng = np.random.default_rng(7)
    items = _zipf_stream(rng)
    cu = ConservativeCMS(EPS, DELTA, SEED)
    cms = CountMinSketch(EPS, DELTA, SEED)
    for lo in range(0, items.size, 1000):  # multiple batches
        cu.update_batch(items[lo:lo + 1000])
        cms.update_batch(items[lo:lo + 1000])
    vals, cnts = _freqs(items)
    cu_est = cu.point_query(vals)
    cms_est = cms.point_query(vals)
    assert (cu_est >= cnts).all(), "CU invariant broken"
    assert (cu_est <= cms_est).all(), "CU must never exceed plain CMS"
    assert (cu.table <= cms.table).all(), "cell-wise domination broken"
    assert cu.total == items.size
    # the point of CU: strictly less total overestimate on a skewed stream
    assert int((cu_est - cnts).sum()) < int((cms_est - cnts).sum())


def test_cu_merge_keeps_sandwich():
    """Split the stream across 4 'partitions', CU-fold each, sum-merge —
    estimates must stay in [exact, plain-CMS] (the module docstring proof)."""
    rng = np.random.default_rng(11)
    items = _zipf_stream(rng, n=40_000)
    parts = np.array_split(items, 4)
    merged = ConservativeCMS(EPS, DELTA, SEED)
    for p in parts:
        part_sk = ConservativeCMS(EPS, DELTA, SEED)
        part_sk.update_batch(p)
        merged.merge(part_sk)
    cms = CountMinSketch(EPS, DELTA, SEED)
    cms.update_batch(items)
    vals, cnts = _freqs(items)
    cu_est = merged.point_query(vals)
    assert (cu_est >= cnts).all()
    assert (cu_est <= cms.point_query(vals)).all()
    assert merged.total == items.size


def test_cu_weighted_matches_repeated():
    """update_batch(items, counts) == the same multiset fed unweighted,
    batch by batch (both pre-aggregate per batch, so the folds align)."""
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 500, size=200).astype(np.int64)
    cnts = rng.integers(0, 5, size=200).astype(np.int64)  # includes zeros
    a = ConservativeCMS(EPS, DELTA, SEED)
    a.update_batch(vals, cnts)
    b = ConservativeCMS(EPS, DELTA, SEED)
    b.update_batch(np.repeat(vals, cnts))
    assert np.array_equal(a.table, b.table)
    assert a.total == b.total == int(cnts.sum())


def test_cu_batch_is_order_invariant_within_batch():
    rng = np.random.default_rng(5)
    items = rng.integers(0, 100, size=5000).astype(np.int64)
    a = ConservativeCMS(EPS, DELTA, SEED)
    a.update_batch(items)
    b = ConservativeCMS(EPS, DELTA, SEED)
    b.update_batch(items[::-1].copy())
    assert np.array_equal(a.table, b.table)


def test_cu_strings_negative_weights_and_bytes():
    sk = ConservativeCMS(EPS, DELTA, SEED)
    sk.update_strings(["a", "b", "a", "c"])
    assert int(sk.point_query_strings(["a"])[0]) >= 2
    with pytest.raises(ValueError):
        sk.update_batch(np.array([1, 2]), np.array([1, -1]))
    blob = sk.to_bytes()
    back = ConservativeCMS.from_bytes(blob, EPS, DELTA)
    assert np.array_equal(back.table, sk.table)
    assert back.total == sk.total and back.seed == sk.seed
    with pytest.raises(ValueError):
        ConservativeCMS.from_bytes(b"XXXX" + blob[4:], EPS, DELTA)
    with pytest.raises(ValueError):
        ConservativeCMS(0.5, 0.5, 1).merge(ConservativeCMS(EPS, DELTA, SEED))

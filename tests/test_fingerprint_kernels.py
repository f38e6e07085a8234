"""Doc-local Arrow fingerprint kernels (MinHash mins, SimHash) must be
value-identical to their Catalyst table forms on every edge: unicode
bytes, empty docs, NULL text, duplicate ids (token-set union), double
spaces (empty tokens filtered), string and integer ids."""

from __future__ import annotations

import pytest

EDGE_ROWS = [
    (1, "alpha beta gamma"),
    (2, "beta  beta gamma"),
    (3, ""),
    (4, "ünïcode tökens 漢字"),
    (5, "alpha"),
    (5, "delta"),
    (6, None),
    (7, "alpha beta gamma"),
]


def test_minhash_arrow_equals_table(spark):
    from parallel_count_min_sketch_spark.operators.dedup import (
        _minhash_mins_arrow,
        _minhash_mins_table,
    )

    df = spark.createDataFrame(EDGE_ROWS, "doc_id LONG, text STRING").repartition(5)
    a = _minhash_mins_arrow(df, "doc_id").orderBy("_id").collect()
    t = _minhash_mins_table(df, "doc_id").orderBy("_id").collect()
    assert a == t and len(a) == 7

    df2 = spark.createDataFrame(
        [("u1", "a b"), ("u2", "b c")], "doc_id STRING, text STRING")
    assert (_minhash_mins_arrow(df2, "doc_id").orderBy("_id").collect()
            == _minhash_mins_table(df2, "doc_id").orderBy("_id").collect())


def test_simhash_arrow_equals_table_incl_dup_ids(spark):
    """repartition(5) splits id 5's two rows across partitions, forcing the
    exactness-guard recompute branch (partial count > 1)."""
    from parallel_count_min_sketch_spark.operators.dedup import (
        _simhash_arrow,
        _simhash_table_catalyst,
    )

    df = spark.createDataFrame(EDGE_ROWS, "doc_id LONG, text STRING").repartition(5)
    a = _simhash_arrow(df, "doc_id").orderBy("_id").collect()
    t = _simhash_table_catalyst(df, "doc_id").orderBy("_id").collect()
    assert a == t and len(a) == 7

    df2 = spark.createDataFrame(
        [("u1", "a b"), ("u2", "b c"), ("u3", "")], "doc_id STRING, text STRING")
    assert (_simhash_arrow(df2, "doc_id").orderBy("_id").collect()
            == _simhash_table_catalyst(df2, "doc_id").orderBy("_id").collect())


def test_fingerprints_heavy_repetition_dictionary_path(spark):
    """r6: both Arrow kernels hash each batch-distinct token once
    (dictionary-encode + gather) instead of per occurrence. A corpus of
    many docs drawn from a tiny vocabulary maximizes the dictionary
    reuse; the per-doc mins/fingerprints must stay bit-identical to the
    per-distinct Catalyst forms."""
    from parallel_count_min_sketch_spark.operators.dedup import (
        _minhash_mins_arrow,
        _minhash_mins_table,
        _simhash_arrow,
        _simhash_table_catalyst,
    )

    vocab = ["the", "quick", "brown", "fox", "über", "fox"]
    rows = [
        (i, " ".join(vocab[(i + k) % len(vocab)] for k in range(1 + i % 9)))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING").repartition(3)
    assert (_minhash_mins_arrow(df, "doc_id").orderBy("_id").collect()
            == _minhash_mins_table(df, "doc_id").orderBy("_id").collect())
    assert (_simhash_arrow(df, "doc_id").orderBy("_id").collect()
            == _simhash_table_catalyst(df, "doc_id").orderBy("_id").collect())


def test_kernels_reject_null_ids(spark):
    from parallel_count_min_sketch_spark.operators.dedup import (
        _minhash_mins_arrow,
        _simhash_arrow,
    )

    df = spark.createDataFrame([(None, "a b")], "doc_id LONG, text STRING")
    for op in (_minhash_mins_arrow, _simhash_arrow):
        with pytest.raises(Exception, match="non-null"):
            op(df, "doc_id").collect()

"""Stratified deterministic sampling (operators/sampling.py)."""

from pyspark.sql import Window, functions as F

from parallel_count_min_sketch_spark.config import affine_sql
from parallel_count_min_sketch_spark.operators.sampling import stratified_hash_sample
from parallel_count_min_sketch_spark.sketches.hashing import affine_params


def _window_answer(df, group_col, key_col, k, seed):
    a, b = affine_params(seed, 1)
    h = F.expr(affine_sql(int(a[0]), int(b[0]), f"CAST({key_col} AS BIGINT)"))
    w = Window.partitionBy(group_col).orderBy("sample_h", key_col)
    return (
        df.select(group_col, key_col).withColumn("sample_h", h)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k).drop("rn")
    )


def _key_set(rows):
    return sorted((r[0], r[1]) for r in rows)


def test_equals_plain_window(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 7}") for i in range(5000)], "doc_id LONG, grp STRING"
    ).repartition(8)
    got = stratified_hash_sample(df, "grp", "doc_id", 10, seed=5)
    want = _window_answer(df, "grp", "doc_id", 10, seed=5)
    assert _key_set(got.select("grp", "doc_id").collect()) == \
        _key_set(want.select("grp", "doc_id").collect())
    assert got.count() == 70


def test_partition_invariant(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(2000)], "doc_id LONG, grp STRING")
    a = _key_set(stratified_hash_sample(df.repartition(1), "grp", "doc_id", 5, 9)
                 .select("grp", "doc_id").collect())
    b = _key_set(stratified_hash_sample(df.repartition(13), "grp", "doc_id", 5, 9)
                 .select("grp", "doc_id").collect())
    assert a == b and len(a) == 15


def test_small_groups_return_all_rows(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id LONG, grp STRING")
    got = stratified_hash_sample(df, "grp", "doc_id", 10, seed=1)
    assert got.count() == 3  # groups smaller than k come back whole


def test_payload_columns_survive(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 2}", i * 11) for i in range(100)],
        "doc_id LONG, grp STRING, size LONG")
    got = stratified_hash_sample(df, "grp", "doc_id", 4, seed=2,
                                 payload_cols=["size"])
    rows = got.collect()
    assert len(rows) == 8
    assert all(r["size"] == r["doc_id"] * 11 for r in rows)
    assert set(got.columns) == {"grp", "doc_id", "size", "sample_h"}


def test_null_group_is_kept(spark):
    df = spark.createDataFrame(
        [(i, "g" if i % 2 else None) for i in range(200)],
        "doc_id LONG, grp STRING")
    got = stratified_hash_sample(df, "grp", "doc_id", 7, seed=3)
    by_grp = {}
    for r in got.collect():
        by_grp.setdefault(r["grp"], []).append(r["doc_id"])
    # NULL is a group: both partitions return exactly k rows
    assert len(by_grp.get(None, [])) == 7
    assert len(by_grp.get("g", [])) == 7


# --- weighted priority sampling ---------------------------------------


def _weighted_df(spark, n=4000, parts=8):
    # weight 1 for most keys, 1000 for every 100th — heavy keys should
    # dominate the sample
    return spark.createDataFrame(
        [(i, 1000 if i % 100 == 0 else 1) for i in range(n)],
        "doc_id LONG, w LONG").repartition(parts)


def test_weighted_sample_python_replay(spark):
    from parallel_count_min_sketch_spark.operators.sampling import (
        _PRIORITY_SCALE, weighted_priority_sample)

    df = _weighted_df(spark)
    got = weighted_priority_sample(df, "doc_id", "w", 50, seed=21).collect()
    a, b = affine_params(21, 1)
    p = (1 << 31) - 1

    def pri(i, w):
        h = (int(a[0]) * (i % p) + int(b[0])) % p
        return (w * _PRIORITY_SCALE) // (h + 1)

    want = sorted(((pri(i, 1000 if i % 100 == 0 else 1), -i)
                   for i in range(4000)), reverse=True)[:50]
    assert [(r["priority"], -r["doc_id"]) for r in got] == want


def test_weighted_sample_partition_invariant_and_biased(spark):
    from parallel_count_min_sketch_spark.operators.sampling import (
        weighted_priority_sample)

    df = _weighted_df(spark)
    one = weighted_priority_sample(df.repartition(1), "doc_id", "w", 40, 7)
    many = weighted_priority_sample(df.repartition(17), "doc_id", "w", 40, 7)
    ids_one = [r["doc_id"] for r in one.collect()]
    assert ids_one == [r["doc_id"] for r in many.collect()]
    # 40 heavy keys of 4000 (1%) carry 1000x weight -> they should own
    # most of the sample (each heavy key outranks a light one unless the
    # light key's hash is ~1000x smaller)
    heavy = sum(1 for i in ids_one if i % 100 == 0)
    assert heavy >= 30


def test_weighted_sample_excludes_null_and_nonpositive(spark):
    from parallel_count_min_sketch_spark.operators.sampling import (
        weighted_priority_sample)

    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -4), (None, 9), (4, None), (5, 2)],
        "doc_id LONG, w LONG")
    rows = weighted_priority_sample(df, "doc_id", "w", 10, 3).collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 5]


def test_weighted_sample_plan_is_take_ordered(spark):
    from parallel_count_min_sketch_spark.operators.sampling import (
        weighted_priority_sample)

    df = _weighted_df(spark)
    plan = weighted_priority_sample(df, "doc_id", "w", 10, 3)._jdf \
        .queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

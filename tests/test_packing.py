"""Concat-and-split sequence packing: hand-computed offsets, partition
invariance, and the no-single-task-window plan gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_count_min_sketch_spark.operators.packing import (
    concat_split_packing,
)


def test_packing_hand_computed(spark):
    # budget 10; docs in id order with 4,5,3,7,0,12 tokens
    rows = [(1, 4), (2, 5), (3, 3), (4, 7), (5, 0), (6, 12)]
    df = spark.createDataFrame(rows, "doc_id LONG, n INT")
    got = {r["doc_id"]: r for r in
           concat_split_packing(df, "doc_id", "n", 10).collect()}
    # starts: 0,4,9,12,19,19  packs: 0,0,0,1,1,1
    want = {
        1: (0, 0, False),   # 0..3
        2: (4, 0, False),   # 4..8
        3: (9, 0, True),    # 9..11 crosses 10
        4: (12, 1, True),   # 12..18 crosses? ends 18 < 20 -> no! recompute
        5: (19, 1, False),  # empty
        6: (19, 1, True),   # 19..30 crosses 20 and 30
    }
    # doc 4: start 12, end 18, both pack 1 -> does NOT cross
    want[4] = (12, 1, False)
    for did, (s, p, x) in want.items():
        r = got[did]
        assert (r["start_offset"], r["pack_id"]) == (s, p), (did, r)
        assert r["crosses_boundary"] is x, (did, r)


def test_packing_partition_invariance(spark):
    rows = [(i, (i * 7) % 13) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id LONG, n INT")
    a = {r["doc_id"]: (r["start_offset"], r["pack_id"])
         for r in concat_split_packing(df.repartition(17), "doc_id", "n", 50)
         .collect()}
    b = {r["doc_id"]: (r["start_offset"], r["pack_id"])
         for r in concat_split_packing(df.coalesce(1), "doc_id", "n", 50,
                                       num_partitions=3).collect()}
    assert a == b
    # offsets are a prefix sum: last doc's start + n == total tokens
    total = sum(n for _, n in rows)
    assert a[499][0] + rows[499][1] == total


def test_packing_plan_has_no_single_partition_window(spark):
    df = spark.createDataFrame([(i, i % 5) for i in range(200)],
                               "doc_id LONG, n INT")
    q = concat_split_packing(df, "doc_id", "n", 100)
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan
    assert "Window" in plan  # the per-partition running sum is a window


def test_packing_unpinned_matches_pinned_on_deterministic_input(spark):
    rows = [(i, (i * 3) % 9) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id LONG, n INT")
    a = {r["doc_id"]: r["start_offset"]
         for r in concat_split_packing(df, "doc_id", "n", 40).collect()}
    b = {r["doc_id"]: r["start_offset"]
         for r in concat_split_packing(df, "doc_id", "n", 40,
                                       pin_partitions=False).collect()}
    assert a == b

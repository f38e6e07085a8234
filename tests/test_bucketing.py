"""Bucketed-table co-located join: same-key joins over bucketed tables
must execute with ZERO exchanges, produce identical results to the plain
join, and the bare-parquet read must (documentedly) lose the layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_count_min_sketch_spark.operators.bucketing import (
    read_bucketed,
    write_bucketed,
)


@pytest.fixture()
def no_broadcast(spark):
    """Pin joins to SortMergeJoin so the gate inspects exchanges, not
    broadcast shortcuts; restore the session threshold afterwards."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    left = spark.range(2000).select(
        F.pmod("id", 500).alias("user_id"), F.col("id").alias("event_id"))
    right = spark.range(500).select(
        F.col("id").alias("user_id"), (F.col("id") * 3).alias("score"))

    write_bucketed(left, "b_events", str(tmp_path / "ev"), "user_id", 8)
    write_bucketed(right, "b_users", str(tmp_path / "us"), "user_id", 8)
    try:
        bl, br = read_bucketed(spark, "b_events"), read_bucketed(spark, "b_users")
        joined = bl.join(br, "user_id")
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        assert "SelectedBucketsCount" in plan, plan

        # identical results to the plain (exchange-paying) join
        plain = left.join(right, "user_id")
        assert "Exchange" in _executed_plan(plain)
        assert sorted(map(tuple, joined.collect())) == \
            sorted(map(tuple, plain.collect()))

        # bare-parquet read of the SAME files loses the layout (the
        # documented reason read_bucketed goes through the catalog)
        raw = spark.read.parquet(str(tmp_path / "ev")) \
            .join(spark.read.parquet(str(tmp_path / "us")), "user_id")
        assert "Exchange" in _executed_plan(raw)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_events")
        spark.sql("DROP TABLE IF EXISTS b_users")


def test_bucketed_groupby_has_no_exchange(spark, tmp_path, no_broadcast):
    df = spark.range(4000).select(
        F.pmod("id", 100).alias("user_id"), F.col("id").alias("v"))
    write_bucketed(df, "b_agg", str(tmp_path / "agg"), "user_id", 4)
    try:
        agg = read_bucketed(spark, "b_agg").groupBy("user_id") \
            .agg(F.sum("v").alias("s"))
        plan = _executed_plan(agg)
        assert "Exchange" not in plan, plan  # agg rides the bucket layout
        want = {(r["user_id"], r["s"]) for r in
                df.groupBy("user_id").agg(F.sum("v").alias("s")).collect()}
        got = {(r["user_id"], r["s"]) for r in agg.collect()}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS b_agg")


def test_write_bucketed_validates(spark, tmp_path):
    df = spark.range(5).select(F.col("id").alias("user_id"))
    with pytest.raises(ValueError, match="n_buckets"):
        write_bucketed(df, "b_bad", str(tmp_path / "bad"), "user_id", 0)

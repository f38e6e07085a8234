"""As-of join (operators/asof.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from parallel_count_min_sketch_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_basic_semantics(spark):
    trades = spark.createDataFrame(
        [(1, "A", _ts("2026-01-01T10:00:05")),
         (2, "A", _ts("2026-01-01T10:00:00")),  # equal ts -> matches
         (3, "A", _ts("2026-01-01T09:59:59")),  # before any quote -> NULL
         (4, "B", _ts("2026-01-01T10:00:10"))],
        "trade_id LONG, sym STRING, ts TIMESTAMP")
    quotes = spark.createDataFrame(
        [("A", _ts("2026-01-01T10:00:00"), 100.0),
         ("A", _ts("2026-01-01T10:00:04"), 101.0),
         ("B", _ts("2026-01-01T10:00:07"), 55.0)],
        "sym STRING, ts TIMESTAMP, px DOUBLE")
    out = {r["trade_id"]: r["asof_px"]
           for r in asof_join(trades, quotes, "sym", "ts", ["px"]).collect()}
    assert out == {1: 101.0, 2: 100.0, 3: None, 4: 55.0}


def test_tiebreak_on_duplicate_right_ts(spark):
    left = spark.createDataFrame(
        [(1, "A", _ts("2026-01-01T10:00:01"))], "id LONG, k STRING, ts TIMESTAMP")
    right = spark.createDataFrame(
        [("A", _ts("2026-01-01T10:00:00"), 7, 1.0),
         ("A", _ts("2026-01-01T10:00:00"), 9, 2.0),
         ("A", _ts("2026-01-01T10:00:00"), 8, 3.0)],
        "k STRING, ts TIMESTAMP, seq LONG, v DOUBLE")
    out = asof_join(left, right, "k", "ts", ["v"], tiebreak_col="seq").collect()
    assert out[0]["asof_v"] == 2.0  # greatest seq (9) wins, deterministically


def test_multiple_value_columns_and_null_keys(spark):
    left = spark.createDataFrame(
        [(1, "A", _ts("2026-01-01T12:00:00")), (2, None, _ts("2026-01-01T12:00:00"))],
        "id LONG, k STRING, ts TIMESTAMP")
    right = spark.createDataFrame(
        [("A", _ts("2026-01-01T11:00:00"), 5, "x")],
        "k STRING, ts TIMESTAMP, a LONG, b STRING")
    rows = {r["id"]: r for r in
            asof_join(left, right, "k", "ts", ["a", "b"]).collect()}
    assert rows[1]["asof_a"] == 5 and rows[1]["asof_b"] == "x"
    assert rows[2]["asof_a"] is None and rows[2]["asof_b"] is None


def test_no_nested_loop_join_in_plan(spark):
    left = spark.range(1000).select(
        F.col("id").alias("lid"), (F.col("id") % 10).alias("k"),
        F.col("id").cast("timestamp").alias("ts"))
    right = spark.range(100).select(
        (F.col("id") % 10).alias("k"),
        (F.col("id") * 7).cast("timestamp").alias("ts"),
        F.col("id").alias("v"))
    out = asof_join(left, right, "k", "ts", ["v"])
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_null_right_values_not_stale_carried(spark):
    # the as-of match has NULL values -> output must be NULL, never an
    # older row's value; multi-column carries must stay row-atomic
    right = spark.createDataFrame(
        [("A", _ts("2026-01-01T10:00:01"), 5.0, 50.0),
         ("A", _ts("2026-01-01T10:00:02"), None, 70.0)],
        "k STRING, ts TIMESTAMP, px DOUBLE, qty DOUBLE")
    left = spark.createDataFrame(
        [(1, "A", _ts("2026-01-01T10:00:03"))], "id LONG, k STRING, ts TIMESTAMP")
    row = asof_join(left, right, "k", "ts", ["px", "qty"]).collect()[0]
    assert row["asof_px"] is None       # NOT 5.0 from the older row
    assert row["asof_qty"] == 70.0      # same right row as px

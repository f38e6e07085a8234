"""Streaming content dedup must keep exactly one doc per distinct text
across micro-batches, agree with the batch digest family, and bound its
state via the watermark variant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_count_min_sketch_spark.streaming.stream_dedup import (
    stream_dedup_by_content,
    stream_dedup_exact,
)


def _drain(out_stream, tmp_path, name):
    rows = []

    def sink(df, _bid):
        rows.extend(df.collect())

    q = (out_stream.writeStream.outputMode("append")
         .foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(180), "stream did not drain"
    return rows


def test_stream_content_dedup_across_batches(spark, tmp_path):
    """Duplicate texts land in DIFFERENT micro-batches (maxFilesPerTrigger=1)
    — the keyed state, not per-batch dropDuplicates, must catch them."""
    src = str(tmp_path / "incoming")
    a = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "unique one"), (3, "shared text")],
        "doc_id BIGINT, text STRING")
    b = spark.createDataFrame(
        [(4, "shared text"), (5, "the quick brown fox"), (6, "unique two")],
        "doc_id BIGINT, text STRING")
    a.coalesce(1).write.mode("append").parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    rows = _drain(stream_dedup_by_content(stream, "text"), tmp_path, "c")

    texts = [r["text"] for r in rows]
    assert sorted(texts) == sorted(
        {"the quick brown fox", "unique one", "shared text", "unique two"})
    # agrees with the batch digest family: one doc per md5(text)
    batch = spark.read.parquet(src)
    n_digests = batch.select(F.md5("text")).distinct().count()
    assert len(rows) == n_digests == 4


def test_stream_dedup_watermark_variant_bounds_state(spark, tmp_path):
    """The watermark variant must still dedup within the horizon and
    produce a streaming plan with dropDuplicatesWithinWatermark state."""
    import datetime as dt

    src = str(tmp_path / "incoming_wm")
    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows_in = [(1, "aaa", t0), (2, "aaa", t0 + dt.timedelta(seconds=30)),
               (3, "bbb", t0 + dt.timedelta(seconds=60))]
    spark.createDataFrame(
        rows_in, "doc_id BIGINT, text STRING, ts TIMESTAMP"
    ).coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_dedup_by_content(stream, "text",
                                  event_time_col="ts",
                                  watermark="10 minutes")
    rows = _drain(out, tmp_path, "wm")
    assert sorted(r["text"] for r in rows) == ["aaa", "bbb"]


def test_mismatched_watermark_args_raise(spark, tmp_path):
    df = spark.readStream.schema("doc_id BIGINT, text STRING") \
        .parquet(str(tmp_path))
    with pytest.raises(ValueError, match="go together"):
        stream_dedup_exact(df, ["doc_id"], event_time_col="ts")

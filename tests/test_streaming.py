"""Structured Streaming: the stream-accumulated CMS must equal the batch
build over the same data, survive a restart from its state blob, and the
windowed aggregation must match the batch expression."""

import os

import pytest
from pyspark.sql import functions as F

from parallel_count_min_sketch_spark.config import CMSConfig
from parallel_count_min_sketch_spark.operators.agg import build_cms_from_text
from parallel_count_min_sketch_spark.sources.web_pages import web_pages
from parallel_count_min_sketch_spark.streaming.stream_cms import (
    StreamingCMS,
    windowed_token_counts,
)

CFG = CMSConfig(epsilon=0.01, delta=0.1, seed=8)


@pytest.fixture()
def staged_pages(spark, tmp_path):
    """Two parquet files in a dir, acting as a file-stream source."""
    src = str(tmp_path / "incoming")
    a = web_pages(spark, 200, seed=11, partitions=1)
    b = web_pages(spark, 150, seed=12, partitions=1)
    a.write.mode("append").parquet(src)
    b.write.mode("append").parquet(src)
    both = a.unionByName(b)
    return src, both, a, b


def test_stream_build_equals_batch_build(spark, tmp_path, staged_pages):
    src, both, _, _ = staged_pages
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # force multiple micro-batches
        .parquet(src)
    )
    acc = StreamingCMS(CFG, "text", state_path=str(tmp_path / "cms.bin"))
    q = acc.start(stream, str(tmp_path / "ckpt"), trigger_once=True)
    assert q.awaitTermination(180), "stream did not drain"
    expected = build_cms_from_text(both, "text", CFG)
    assert acc.batches_seen >= 2
    assert acc.sketch.to_bytes() == expected.to_bytes()


def test_stream_resume_from_state(spark, tmp_path):
    src = str(tmp_path / "incoming")
    a = web_pages(spark, 120, seed=21, partitions=1)
    a.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    state = str(tmp_path / "cms.bin")
    ckpt = str(tmp_path / "ckpt")

    acc1 = StreamingCMS(CFG, "text", state_path=state)
    q = acc1.start(spark.readStream.schema(schema).parquet(src), ckpt, trigger_once=True)
    assert q.awaitTermination(180), "stream did not drain"
    assert os.path.exists(state)

    # new data arrives; a NEW accumulator (simulated driver restart) picks up
    # the state blob and Spark's source checkpoint skips processed files
    b = web_pages(spark, 80, seed=22, partitions=1)
    b.write.mode("append").parquet(src)
    acc2 = StreamingCMS(CFG, "text", state_path=state)
    q2 = acc2.start(spark.readStream.schema(schema).parquet(src), ckpt, trigger_once=True)
    assert q2.awaitTermination(180), "stream did not drain"

    expected = build_cms_from_text(a.unionByName(b), "text", CFG)
    assert acc2.sketch.to_bytes() == expected.to_bytes()


def test_replayed_batch_is_not_double_counted(spark, tmp_path):
    """foreachBatch is at-least-once: a crash between our state write and
    Spark's offset commit replays the micro-batch. The batch_id watermark
    in the state blob must make the replay a no-op (ADVICE r1)."""
    df = web_pages(spark, 60, seed=31, partitions=1)
    state = str(tmp_path / "cms.bin")
    acc = StreamingCMS(CFG, "text", state_path=state)
    acc.process_batch(df, 0)
    once = acc.sketch.to_bytes()
    acc.process_batch(df, 0)  # replay on the live accumulator
    assert acc.sketch.to_bytes() == once
    # replay after a restart (state reloaded from disk) is also a no-op
    acc2 = StreamingCMS(CFG, "text", state_path=state)
    assert acc2.last_batch_id == 0
    acc2.process_batch(df, 0)
    assert acc2.sketch.to_bytes() == once
    acc2.process_batch(df, 1)  # a genuinely new batch still merges
    assert acc2.sketch.to_bytes() != once


def test_state_refuses_foreign_checkpoint_dir(spark, tmp_path):
    """Batch ids restart at 0 under a new streaming checkpoint dir; reusing
    an accumulated state blob there would silently skip real data."""
    src = str(tmp_path / "incoming")
    web_pages(spark, 50, seed=41, partitions=1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    state = str(tmp_path / "cms.bin")
    acc1 = StreamingCMS(CFG, "text", state_path=state)
    q = acc1.start(spark.readStream.schema(schema).parquet(src),
                   str(tmp_path / "ckptA"), trigger_once=True)
    assert q.awaitTermination(180), "stream did not drain"

    acc2 = StreamingCMS(CFG, "text", state_path=state)
    with pytest.raises(ValueError, match="batch ids restart"):
        acc2.start(spark.readStream.schema(schema).parquet(src),
                   str(tmp_path / "ckptB"), trigger_once=True)


def test_windowed_token_counts_matches_batch(spark, tmp_path, staged_pages):
    src, both, _, _ = staged_pages
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    windowed = windowed_token_counts(stream, ts_col="warc_ts", window="1 minute",
                                     watermark="5 minutes")
    q = (
        windowed.writeStream.format("memory").queryName("win_counts")
        .outputMode("complete").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2")).start()
    )
    assert q.awaitTermination(180), "stream did not drain"
    got = {
        (r["window"]["start"], r["tok"]): r["count"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    exp_rows = (
        both.select(F.window("warc_ts", "1 minute").alias("window"),
                    F.explode(F.split("text", " ")).alias("tok"))
        .filter("tok != ''")
        .groupBy("window", "tok").count().collect()
    )
    expected = {(r["window"]["start"], r["tok"]): r["count"] for r in exp_rows}
    assert got == expected

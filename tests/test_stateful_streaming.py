"""applyInPandasWithState per-group CMS: the final state after draining a
file stream must equal the batch grouped build."""

import pytest
from pyspark.sql import functions as F

from parallel_count_min_sketch_spark.config import CMSConfig
from parallel_count_min_sketch_spark.operators.agg import cms_grouped
from parallel_count_min_sketch_spark.sketches.cms import CountMinSketch
from parallel_count_min_sketch_spark.sources.web_pages import web_pages
from parallel_count_min_sketch_spark.streaming.stateful import stateful_grouped_cms

CFG = CMSConfig(epsilon=0.01, delta=0.1, seed=13)


def test_stateful_grouped_cms_equals_batch(spark, tmp_path):
    src = str(tmp_path / "incoming")
    a = web_pages(spark, 150, seed=31, partitions=1)
    b = web_pages(spark, 100, seed=32, partitions=1)
    a.write.mode("append").parquet(src)
    b.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .select("lang", "text")
    )
    out = stateful_grouped_cms(stream, "lang", "text", CFG)
    q = (
        out.writeStream.format("memory").queryName("grouped_state")
        .outputMode("update").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt")).start()
    )
    q.awaitTermination(240)

    # last emitted row per group = final state
    rows = spark.sql(
        "SELECT * FROM grouped_state"
    ).collect()
    latest: dict[str, bytes] = {}
    totals: dict[str, int] = {}
    for r in rows:  # memory sink appends in trigger order; later wins
        latest[r["group"]] = bytes(r["sketch"])
        totals[r["group"]] = r["total_mass"]

    both = a.unionByName(b)
    toks = both.select("lang", F.explode(F.split("text", " ")).alias("tok")).filter("tok != ''")
    expected = {r["group"]: r for r in cms_grouped(toks, "lang", "tok", CFG,
                                                   string_items=True).collect()}
    assert set(latest) == set(expected)
    for g, exp in expected.items():
        got = CountMinSketch.from_bytes(latest[g], CFG.epsilon, CFG.delta)
        want = CountMinSketch.from_bytes(bytes(exp["sketch"]), CFG.epsilon, CFG.delta)
        assert got.total == totals[g] == want.total, g
        assert got.to_bytes() == want.to_bytes(), f"group {g} sketch mismatch"

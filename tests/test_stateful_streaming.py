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
    assert q.awaitTermination(240), "stream did not drain"

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


def test_stateful_grouped_sketch_mg_exact_when_k_large(spark, tmp_path):
    """Kernel-generic stateful streaming (Misra-Gries per group): with
    k >= the group's distinct-token count the summary never decrements,
    so the drained final state must carry EXACT per-token counts and an
    n_total equal to the group's exact token count."""
    from functools import partial

    import numpy as np

    from parallel_count_min_sketch_spark.operators.heavy_hitters import _mg_from_bytes
    from parallel_count_min_sketch_spark.sketches.hashing import djb2_batch
    from parallel_count_min_sketch_spark.sketches.misra_gries import MisraGries
    from parallel_count_min_sketch_spark.streaming.stateful import stateful_grouped_sketch

    src = str(tmp_path / "incoming_mg")
    a = web_pages(spark, 120, seed=41, partitions=1)
    b = web_pages(spark, 80, seed=42, partitions=1)
    a.write.mode("append").parquet(src)
    b.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .select("lang", "text")
    )
    out = stateful_grouped_sketch(stream, "lang", "text",
                                  partial(MisraGries, 1 << 16), _mg_from_bytes)
    q = (
        out.writeStream.format("memory").queryName("grouped_mg_state")
        .outputMode("update").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_mg")).start()
    )
    assert q.awaitTermination(240), "stream did not drain"

    latest: dict[str, bytes] = {}
    totals: dict[str, int] = {}
    for r in spark.sql("SELECT * FROM grouped_mg_state").collect():
        latest[r["group"]] = bytes(r["sketch"])
        totals[r["group"]] = r["total_mass"]

    both = a.unionByName(b)
    exact = (
        both.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .filter("tok != ''")
        .groupBy("lang", "tok").count()
        .toPandas()
    )
    assert set(latest) == set(exact["lang"].unique())
    for g, grp in exact.groupby("lang"):
        mg = MisraGries.from_bytes(latest[g])
        assert mg.offset_total == 0, f"group {g}: unexpected decrements"
        assert mg.n_total == totals[g] == int(grp["count"].sum()), g
        est = mg.estimate(djb2_batch(grp["tok"].to_numpy()))
        np.testing.assert_array_equal(est, grp["count"].to_numpy(np.int64),
                                      err_msg=f"group {g} counts differ")

"""Skew handling (salted repartition) and cross-checks of our sketch
estimates against Spark's built-in approximate aggregates (the public
oracles named in SURVEY §7: approx_count_distinct, percentile_approx)."""

import numpy as np
from pyspark.sql import functions as F

from parallel_count_min_sketch_spark.config import CMSConfig
from parallel_count_min_sketch_spark.operators.agg import build_cms
from parallel_count_min_sketch_spark.operators.sketch_agg import build_sketch
from parallel_count_min_sketch_spark.operators.skew import (
    host_of_url,
    salted_repartition,
    skew_stats,
)
from parallel_count_min_sketch_spark.plans.sketch_queries import (
    _hll_from_bytes,
    _kll_from_bytes,
    _mk_kll,
    _mk_td,
    _td_from_bytes,
)
from parallel_count_min_sketch_spark.sketches import HyperLogLog
from parallel_count_min_sketch_spark.sources.web_pages import web_pages


def test_salted_repartition_balances_skewed_key(spark):
    # 90% of rows share one key — a plain hash partition would hotspot
    rows = [(0, "hot") for _ in range(9000)] + [(i, f"k{i}") for i in range(1000)]
    df = spark.createDataFrame(rows, "id LONG, key STRING")
    out = salted_repartition(df, 8, key_col="key", seed=1)
    sizes = out.rdd.glom().map(len).collect()
    assert len(sizes) == 8
    assert max(sizes) < 2 * (10000 / 8), f"unbalanced: {sizes}"
    # multiset preserved
    assert out.count() == 10000
    assert out.filter("key = 'hot'").count() == 9000


def test_salted_repartition_keeps_sketch_identical(spark):
    df = spark.createDataFrame([(int(x),) for x in np.random.default_rng(0).integers(0, 999, 5000)],
                               "item BIGINT")
    cfg = CMSConfig(0.01, 0.1, seed=4)
    plain = build_cms(df, "item", cfg)
    salted = build_cms(salted_repartition(df, 16, seed=9), "item", cfg)
    assert plain.to_bytes() == salted.to_bytes()


def test_host_extraction_and_skew_stats(spark):
    pages = web_pages(spark, 500, seed=12345, partitions=4)
    hosts = pages.select(host_of_url("url").alias("host"))
    top = skew_stats(hosts, "host", top=3).collect()
    assert all(r["host"].startswith("host") and r["host"].endswith(".example") for r in top)
    # FIXTURES F1 plants dominant hosts: top host should hold >5% of pages
    assert top[0]["share_bp"] > 500


def test_hll_vs_builtin_approx_count_distinct(spark, sf_dir):
    from parallel_count_min_sketch_spark.plans.sketch_queries import _mk_hll

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = li.select("l_partkey").distinct().count()
    ours = build_sketch(li, "l_partkey", _mk_hll, _hll_from_bytes).estimate()
    builtin = li.agg(F.approx_count_distinct("l_partkey", 0.02).alias("d")).collect()[0]["d"]
    assert abs(ours - exact) / exact < 0.1
    assert abs(builtin - exact) / exact < 0.1


def test_quantiles_vs_builtin_percentile_approx(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    qs = [0.1, 0.5, 0.9]
    builtin = li.agg(F.percentile_approx("l_extendedprice", qs, 10000).alias("p")) \
        .collect()[0]["p"]
    kll = build_sketch(li, "l_extendedprice", _mk_kll,
                       _kll_from_bytes, as_float=True).quantile(np.array(qs))
    td = build_sketch(li, "l_extendedprice", _mk_td,
                      _td_from_bytes, as_float=True).quantile(np.array(qs))
    vals = np.sort(np.array([r["l_extendedprice"] for r in li.select("l_extendedprice").collect()]))
    for i, q in enumerate(qs):
        for est in (builtin[i], float(kll[i]), float(td[i])):
            rank = np.searchsorted(vals, est) / len(vals)
            assert abs(rank - q) < 0.05, f"q={q} est={est} rank={rank}"

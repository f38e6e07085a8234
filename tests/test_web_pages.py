"""Synthetic web-page corpus: determinism, the byte-identical
extract_text(html) == text invariant (input_hint), and the full
accuracy harness (test_cms_accuracy port, src/core/count_min_sketch.c:205-242)
run end-to-end over the corpus."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from parallel_count_min_sketch_spark.config import CMSConfig
from parallel_count_min_sketch_spark.operators.agg import build_cms_from_text
from parallel_count_min_sketch_spark.sources.web_pages import extract_text, web_pages


@pytest.fixture(scope="module")
def pages(spark):
    return web_pages(spark, 800, seed=12345, partitions=4).cache()


def test_schema_matches_input_hint(pages):
    assert [(f.name, f.dataType.simpleString()) for f in pages.schema.fields] == [
        ("url", "string"),
        ("warc_ts", "timestamp"),
        ("html", "binary"),
        ("text", "string"),
        ("lang", "string"),
    ]


def test_extract_text_invariant(pages):
    """byte-identical extracted text per url vs the reference extractor."""
    mismatches = pages.select(
        (extract_text(F.col("html")) == F.col("text")).alias("ok")
    ).filter("NOT ok").count()
    assert mismatches == 0


def test_deterministic_across_parallelism(spark):
    a = web_pages(spark, 300, seed=1, partitions=2).orderBy("url").collect()
    b = web_pages(spark, 300, seed=1, partitions=7).orderBy("url").collect()
    assert a == b
    c = web_pages(spark, 300, seed=2, partitions=2).orderBy("url").collect()
    assert a != c


def test_token_mixture_plants_heavy_hitters(spark, pages):
    toks = pages.select(F.explode(F.split("text", " ")).alias("tok"))
    counts = dict(toks.groupBy("tok").count().collect())
    n = sum(counts.values())
    # ~10% each for the planted heavy tokens, ~10% spread over the range cluster
    assert counts["tok123"] / n == pytest.approx(0.1, rel=0.15)
    assert counts["tok456"] / n == pytest.approx(0.1, rel=0.15)
    range_mass = sum(counts.get(f"tokr{v}", 0) for v in range(100, 111)) / n
    assert range_mass == pytest.approx(0.1, rel=0.2)


def test_pareto_variant_is_skewed(spark):
    """FIXTURES F4: Pareto tokens (head-heavy) + 3 dominant hosts."""
    from pyspark.sql import functions as F

    from parallel_count_min_sketch_spark.operators.skew import host_of_url

    pg = web_pages(spark, 400, seed=9, partitions=3, token_dist="pareto")
    toks = pg.select(F.explode(F.split("text", " ")).alias("tok"))
    counts = dict(toks.groupBy("tok").count().collect())
    n = sum(counts.values())
    # Pareto(2) head: id 0 alone carries a large share
    assert counts.get("tok0", 0) / n > 0.3
    hosts = pg.select(host_of_url("url").alias("h")).groupBy("h").count().collect()
    top3 = sum(c for c in sorted((r["count"] for r in hosts), reverse=True)[:3])
    assert top3 / 400 > 0.7
    # deterministic too
    again = web_pages(spark, 400, seed=9, partitions=5, token_dist="pareto")
    assert pg.orderBy("url").collect() == again.orderBy("url").collect()


def test_accuracy_harness_end_to_end(spark, pages):
    """The acceptance test the north_rule names: distributed CMS build over
    the corpus, then for every distinct token assert estimate >= true
    (one-sided, hard) and P(err <= eps*N) >= 1-delta."""
    eps, delta = 0.001, 0.1
    cfg = CMSConfig(epsilon=eps, delta=delta, seed=77)
    sk = build_cms_from_text(pages, "text", cfg)
    truth = (
        pages.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok").count().collect()
    )
    toks = [r["tok"] for r in truth]
    true_counts = np.array([r["count"] for r in truth], dtype=np.int64)
    est = sk.point_query_strings(toks)
    assert int(true_counts.sum()) == sk.total
    assert (est >= true_counts).all(), "one-sided guarantee violated"
    within = (est - true_counts) <= np.ceil(eps * sk.total)
    assert within.mean() >= 1 - delta

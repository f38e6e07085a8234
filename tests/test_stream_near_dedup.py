"""Streaming incremental near-dedup: micro-batches deduped against the
base LSH index AND each other's keepers, with idempotent replay."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from parallel_count_min_sketch_spark.operators import dedup as dd
from parallel_count_min_sketch_spark.streaming.stream_near_dedup import (
    near_dedup_sink,
    start_near_dedup_stream,
)


def _mk_docs(rng, vocab, n, start=0):
    out = []
    for i in range(n):
        toks = rng.choice(vocab, size=50, replace=False)
        out.append((start + i, " ".join(toks)))
    return out


def test_stream_near_dedup_end_to_end(spark, tmp_path):
    rng = np.random.default_rng(29)
    vocab = [f"v{i}" for i in range(5000)]
    corpus = _mk_docs(rng, vocab, 20)
    cdf = spark.createDataFrame(corpus, "doc_id LONG, text STRING")
    idx = str(tmp_path / "idx")
    dd.write_lsh_index(cdf, "doc_id", idx, max_bucket=50)

    # two staged files; copies straddle them so at least one planted
    # pair lands across micro-batches regardless of file order
    novel1 = _mk_docs(rng, vocab, 3, start=100)
    novel2 = _mk_docs(rng, vocab, 3, start=200)
    file_a = novel1 + [(150, corpus[0][1]),            # dup of base corpus
                       (151, novel2[0][1])]            # pairs with 200
    file_b = novel2 + [(250, corpus[1][1]),            # dup of base corpus
                       (251, novel1[0][1])]            # pairs with 100
    src = str(tmp_path / "incoming")
    spark.createDataFrame(file_a, "doc_id LONG, text STRING") \
        .coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(file_b, "doc_id LONG, text STRING") \
        .coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    kept_path = str(tmp_path / "kept")
    q = start_near_dedup_stream(stream, "doc_id", "text", idx, kept_path,
                                str(tmp_path / "ckpt"), max_bucket=50)
    assert q.awaitTermination(180), "stream did not drain"

    kept = spark.read.parquet(kept_path)
    assert kept.select("batch_id").distinct().count() >= 2  # really split
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}

    # base-corpus copies never survive, whatever their batch
    assert not kept_ids & {150, 250}
    # cross-batch planted pairs: exactly ONE member of each survives
    for pair in ({151, 200}, {251, 100}):
        assert len(kept_ids & pair) == 1, (pair, kept_ids)
    # every other novel doc survives
    assert {101, 102, 201, 202}.issubset(kept_ids)

    # replay guard: re-running a batch's callback with its own batch_id
    # must reproduce the identical kept partition (self-matches excluded)
    some_bid = int(kept.agg(F.max("batch_id")).collect()[0][0])
    # identify which staged file batch `some_bid` actually was, by ids
    bid_ids = {r["doc_id"] for r in kept.filter(F.col("batch_id") == some_bid)
               .select("doc_id").collect()}
    replay_rows = file_a if bid_ids <= {d for d, _ in file_a} else file_b
    replay_df = spark.createDataFrame(replay_rows, "doc_id LONG, text STRING")
    near_dedup_sink("doc_id", "text", idx, kept_path,
                    max_bucket=50)(replay_df, some_bid)
    kept2_ids = {r["doc_id"] for r in spark.read.parquet(kept_path)
                 .select("doc_id").collect()}
    assert kept2_ids == kept_ids

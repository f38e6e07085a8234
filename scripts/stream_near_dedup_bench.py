"""Streaming incremental near-dedup throughput -> BENCH/stream_near_dedup.json.

Measures the continuous-ingest loop end to end: a base corpus is indexed
once, then a backlog of micro-batch files drains through
``streaming/stream_near_dedup.start_near_dedup_stream`` (availableNow,
maxFilesPerTrigger=1 so every file is its own micro-batch, exactly the
nightly-loop shape). Reported: drain wall, docs/s through the sink, kept
counts, and the per-batch decomposition the 100-TB reader needs (each
micro-batch pays one broadcast probe of the base+streamed index plus a
batch-local self-join — nothing corpus-sized shuffles).

Usage: python scripts/stream_near_dedup_bench.py [--corpus 200000] [--batches 5] [--batch-docs 20000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def typical_docs(spark, n_docs: int, id_start: int = 0):
    from pyspark.sql import functions as F

    df = spark.range(n_docs).repartition(32)
    eff = F.col("id") + id_start
    uniq = F.concat_ws(
        " ", *[F.concat(F.lit("u"), (eff * 52 + i).cast("string"))
               for i in range(52)])
    shared = F.concat_ws(
        " ", *[F.concat(F.lit("s"), ((eff * 31 + i * 17) % 1000).cast("string"))
               for i in range(8)])
    return df.select(eff.alias("doc_id"),
                     F.concat_ws(" ", uniq, shared).alias("text"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", type=int, default=200_000)
    ap.add_argument("--batches", type=int, default=5)
    ap.add_argument("--batch-docs", type=int, default=20_000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from parallel_count_min_sketch_spark.operators import dedup as dd
    from parallel_count_min_sketch_spark.streaming.stream_near_dedup import (
        start_near_dedup_stream,
    )

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    tmp = tempfile.mkdtemp(prefix="pcms_snd_bench_")
    try:
        corpus = typical_docs(spark, args.corpus)
        idx = os.path.join(tmp, "idx")
        t0 = time.perf_counter()
        dd.write_lsh_index(corpus, "doc_id", idx, max_bucket=64)
        index_sec = round(time.perf_counter() - t0, 3)

        # stage the backlog: each batch = half novel docs, a quarter
        # copies of corpus docs, a quarter copies of the PREVIOUS batch's
        # novel docs (so cross-batch dedup really fires)
        src = os.path.join(tmp, "incoming")
        q = args.batch_docs // 4
        for b in range(args.batches):
            novel = typical_docs(spark, args.batch_docs - 2 * q,
                                 id_start=10_000_000 + b * args.batch_docs)
            corp_dup = (corpus.filter(F.col("doc_id") % (args.corpus // q) == 0)
                        .limit(q)
                        .select((F.col("doc_id") + 30_000_000
                                 + b * args.batch_docs).alias("doc_id"),
                                "text"))
            prev_start = 10_000_000 + (b - 1) * args.batch_docs
            prev_dup = (typical_docs(spark, q, id_start=prev_start)
                        .select((F.col("doc_id") + 40_000_000).alias("doc_id"),
                                "text")
                        if b > 0 else
                        typical_docs(spark, q,
                                     id_start=20_000_000)
                        .select((F.col("doc_id")).alias("doc_id"), "text"))
            novel.unionByName(corp_dup).unionByName(prev_dup) \
                .coalesce(1).write.mode("append").parquet(src)

        schema = spark.read.parquet(src).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        kept_path = os.path.join(tmp, "kept")
        t0 = time.perf_counter()
        query = start_near_dedup_stream(
            stream, "doc_id", "text", idx, kept_path,
            os.path.join(tmp, "ckpt"), max_bucket=64)
        if not query.awaitTermination(1800):
            raise TimeoutError("stream did not drain")
        drain_sec = round(time.perf_counter() - t0, 3)

        kept = spark.read.parquet(kept_path)
        n_batches = kept.select("batch_id").distinct().count()
        n_kept = kept.count()
        total = args.batches * args.batch_docs
        out = {
            "corpus_docs": args.corpus,
            "index_build_sec": index_sec,
            "batches": args.batches,
            "batch_docs": args.batch_docs,
            "streamed_docs": total,
            "drain_sec": drain_sec,
            "docs_per_sec": round(total / drain_sec, 1),
            "sec_per_batch": round(drain_sec / args.batches, 2),
            "n_micro_batches": n_batches,
            "kept_docs": n_kept,
            "dropped_docs": total - n_kept,
            "cpus": 32,
        }
        dest = os.path.join(REPO, "BENCH", "stream_near_dedup.json")
        with open(dest, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

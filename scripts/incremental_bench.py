"""Incremental-dedup scale evidence -> BENCH/incremental_scale.json.

The operator's 100-TB claim is that a nightly batch's dedup cost is
O(index read) + O(batch compute) — NOT O(corpus text). This script
measures that directly:

  - two corpus sizes (default 250k and 2M docs, the typical low-overlap
    web profile from dedup_bench) with a FIXED 20k-doc probe batch
    (half copies of corpus docs, half novel);
  - per size: index build wall (one-time), index bytes vs corpus text
    bytes, probe wall (warm best-of-N);
  - the naive alternative at the large size: a full
    lsh_candidate_pairs re-run over corpus ∪ batch — what you pay per
    batch WITHOUT the index.

Expected shape: probe wall grows far slower than 8x across the 8x corpus
step (the only corpus-sized cost is the map-only scan of a 3-column
parquet index ~1000x smaller than the text), and the naive re-run costs
a corpus-scale minhash every night.

Usage: python scripts/incremental_bench.py [--small 250000] [--large 2000000] [--reps 3]
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


def timed(fn, reps: int) -> tuple[float, list[float]]:
    fn()  # warmup
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        walls.append(round(time.perf_counter() - t0, 3))
    return min(walls), walls


def typical_docs(spark, n_docs: int, id_start: int = 0):
    """Low-overlap web-like docs with LONG ids (see dedup_bench)."""
    from pyspark.sql import functions as F

    df = spark.range(n_docs).repartition(64)
    eff = F.col("id") + id_start
    uniq = F.concat_ws(
        " ", *[F.concat(F.lit("u"), (eff * 52 + i).cast("string"))
               for i in range(52)])
    shared = F.concat_ws(
        " ", *[F.concat(F.lit("s"), ((eff * 31 + i * 17) % 1000).cast("string"))
               for i in range(8)])
    return df.select(
        eff.alias("doc_id"),
        F.concat_ws(" ", uniq, shared).alias("text"),
    )


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=250_000)
    ap.add_argument("--large", type=int, default=2_000_000)
    ap.add_argument("--batch", type=int, default=20_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from parallel_count_min_sketch_spark.operators import dedup as dd

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())

    tmp = tempfile.mkdtemp(prefix="pcms_inc_bench_")
    out: dict = {"batch_docs": args.batch, "cpus": 32, "reps": args.reps,
                 "sizes": {}}
    try:
        for n in (args.small, args.large):
            corpus_path = os.path.join(tmp, f"corpus_{n}")
            typical_docs(spark, n).write.mode("overwrite").parquet(corpus_path)
            corpus = spark.read.parquet(corpus_path)
            # fixed probe batch: half copies of corpus docs, half novel
            half = args.batch // 2
            copies = (corpus.filter(F.col("doc_id") % (n // half) == 0)
                      .limit(half)
                      .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                              "text"))
            novel = typical_docs(spark, half, id_start=20_000_000)
            batch_path = os.path.join(tmp, f"batch_{n}")
            copies.unionByName(novel).write.mode("overwrite").parquet(batch_path)
            batch = spark.read.parquet(batch_path)

            idx = os.path.join(tmp, f"idx_{n}")
            t0 = time.perf_counter()
            dd.write_lsh_index(corpus, "doc_id", idx, max_bucket=64)
            build_sec = round(time.perf_counter() - t0, 3)

            def probe():
                return dd.incremental_dedup_report(
                    spark, batch, "doc_id", idx, max_bucket=64) \
                    .agg(F.sum(F.col("corpus_dup").cast("long")),
                         F.sum(F.col("keep").cast("long"))).collect()[0]

            probe_sec, probe_runs = timed(probe, args.reps)
            hits, keeps = probe()
            out["sizes"][str(n)] = {
                "index_build_sec": build_sec,
                "index_bytes": dir_bytes(idx),
                "corpus_text_bytes": dir_bytes(corpus_path),
                "probe_sec": probe_sec,
                "probe_runs": probe_runs,
                "corpus_hits": int(hits),
                "kept": int(keeps),
            }
            print(f"n={n}: build {build_sec}s, probe {probe_sec}s "
                  f"(runs {probe_runs}), hits={hits}", flush=True)

        # naive alternative at the large size: full LSH re-run every night
        corpus = spark.read.parquet(os.path.join(tmp, f"corpus_{args.large}"))
        batch = spark.read.parquet(os.path.join(tmp, f"batch_{args.large}"))
        both = corpus.unionByName(batch)

        def naive():
            return dd.lsh_candidate_pairs(both, "doc_id", max_bucket=64) \
                .count()

        naive_sec, naive_runs = timed(naive, max(1, args.reps - 1))
        out["naive_full_rerun_large"] = {
            "sec": naive_sec, "runs": naive_runs}

        small, large = out["sizes"][str(args.small)], out["sizes"][str(args.large)]
        out["corpus_ratio"] = round(args.large / args.small, 2)
        out["probe_ratio"] = round(large["probe_sec"] / small["probe_sec"], 3)
        out["probe_vs_naive_speedup"] = round(naive_sec / large["probe_sec"], 1)
        out["index_compression_vs_text"] = round(
            large["corpus_text_bytes"] / large["index_bytes"], 1)
        dest = os.path.join(REPO, "BENCH", "incremental_scale.json")
        with open(dest, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps({k: v for k, v in out.items() if k != "sizes"}))
        print("wrote", dest)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

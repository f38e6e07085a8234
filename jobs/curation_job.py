"""spark-submit entry point: the full training-data CURATION pipeline
over a documents table — the production face of the round-5 operator
family, one job from raw docs to a packed, deduped, quality-filtered
corpus plus an audit trail.

    spark-submit --master local[32] \
        --py-files pcms_spark.zip \
        jobs/curation_job.py \
        --input /path/documents.parquet --output /path/out \
        [--min-quality-bp 5000] [--max-bucket 64] [--sample-pct 100] \
        [--pack-budget 2048] [--lsh-index /path/existing_index]

Stages (each writes its row counts into stats.json so a dropped doc is
always accounted for):

  1. quality gate  — codegen textstats filter (quality_score_bp, length)
  2. exact dedup   — md5 digest groupBy, keep the min-id doc per digest
  3. near dedup    — MinHash/LSH: against an EXISTING index when
                     --lsh-index is given (incremental, corpus never
                     rescanned), else a self-contained pairs->components
                     ->keep-canonical pass
  4. sampling      — deterministic hash sample (--sample-pct)
  5. packing       — concat-and-split offsets at --pack-budget

Outputs under --output:
  corpus/   kept documents (doc_id, text, n_tokens)
  packing/  (doc_id, start_offset, pack_id, crosses_boundary)
  stats.json  one JSON object: per-stage in/out counts + token totals

Prints the stats JSON line to stdout as the job's metrics contract.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-quality-bp", type=int, default=5000)
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--max-bucket", type=int, default=64)
    ap.add_argument("--sample-pct", type=int, default=100)
    ap.add_argument("--pack-budget", type=int, default=2048)
    ap.add_argument("--lsh-index", default=None,
                    help="existing LSH index dir: near-dedup runs in the "
                         "incremental regime (batch vs index) instead of "
                         "the self-contained pairs->components pass")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from parallel_count_min_sketch_spark.functions import textstats as ts
    from parallel_count_min_sketch_spark.operators import dedup as dd
    from parallel_count_min_sketch_spark.operators.components import (
        connected_components,
    )
    from parallel_count_min_sketch_spark.operators.packing import (
        concat_split_packing,
    )

    spark = (SparkSession.builder.appName("pcms-curation").getOrCreate())
    os.makedirs(args.output, exist_ok=True)
    t0 = time.perf_counter()
    stats: dict = {"input": args.input}

    docs = spark.read.parquet(args.input).select("doc_id", "text")
    stats["n_input"] = docs.count()

    # 1. quality gate (pure codegen — one map pass)
    docs = docs.withColumn("n_tokens", ts.n_tokens("text")).filter(
        (F.col("n_tokens") >= args.min_tokens)
        & (ts.quality_score_bp("text") >= args.min_quality_bp))
    stats["n_after_quality"] = docs.count()

    # 2. exact dedup (one digest shuffle)
    docs = dd.dedup_keep_canonical(docs.select("doc_id", "text"), "doc_id") \
        .withColumn("n_tokens", ts.n_tokens("text"))
    stats["n_after_exact_dedup"] = docs.count()

    # 3. near dedup
    if args.lsh_index:
        report = dd.incremental_dedup_report(
            spark, docs, "doc_id", args.lsh_index,
            max_bucket=args.max_bucket)
        docs = docs.join(report.filter("keep").select("doc_id"), "doc_id")
    else:
        pairs = dd.lsh_candidate_pairs(docs, "doc_id",
                                       max_bucket=args.max_bucket)
        comp = connected_components(pairs, "id_a", "id_b")
        drop = comp.filter(F.col("node") != F.col("component")) \
            .select(F.col("node").alias("doc_id"))
        # no broadcast hint: the non-canonical set scales with the
        # duplicate count (unbounded at 100 TB on a dup-heavy crawl) —
        # let AQE pick the anti-join strategy from the measured size
        docs = docs.join(drop, "doc_id", "left_anti")
    # pin the post-near-dedup relation: the count below, the corpus
    # write, and the packing totals all consume it, and the near-dedup
    # pass is the most expensive stage in the job — without this the
    # uncached lineage re-executes it for each action (~4x the work)
    docs = docs.persist()
    stats["n_after_near_dedup"] = docs.count()

    # 4. deterministic hash sample
    if args.sample_pct < 100:
        docs = docs.filter(
            F.abs(F.xxhash64("doc_id")) % 100 < args.sample_pct)
        stats["n_after_sample"] = docs.count()
    else:
        stats["n_after_sample"] = stats["n_after_near_dedup"]

    # 5. packing metadata
    packed = concat_split_packing(docs, "doc_id", "n_tokens",
                                  args.pack_budget)
    out_corpus = os.path.join(args.output, "corpus")
    out_pack = os.path.join(args.output, "packing")
    docs.select("doc_id", "text", "n_tokens") \
        .write.mode("overwrite").parquet(out_corpus)
    packed.select("doc_id", "start_offset", "pack_id", "crosses_boundary") \
        .write.mode("overwrite").parquet(out_pack)

    total_tokens, n_packs = (
        spark.read.parquet(out_pack)
        .join(spark.read.parquet(out_corpus).select("doc_id", "n_tokens"),
              "doc_id")
        .agg(F.coalesce(F.sum("n_tokens"), F.lit(0)),
             F.countDistinct("pack_id")).collect()[0]
    )
    stats["total_tokens"] = int(total_tokens)
    stats["n_packs"] = int(n_packs)
    docs.unpersist()
    stats["wall_sec"] = round(time.perf_counter() - t0, 2)
    with open(os.path.join(args.output, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()

"""Text-operator throughput at corpus scale -> BENCH/text_ops_scale.json.

The round-4 text queries (tfidf_top_terms, doc_repetition,
benchmark_contamination) are argued scale-right from plan shape
(doc-local codegen, map-side combine, WindowGroupLimit, broadcast
benchmark set); this script puts measured docs/s next to the argument
on a 2M-doc web-like corpus (60 tokens/doc — 52 doc-unique + 8 from a
1k shared vocabulary, the dedup_bench 'typical' profile).

Usage: python scripts/text_ops_bench.py [--docs 2000000] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, reps: int) -> tuple[float, list[float]]:
    fn()  # warmup
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        walls.append(round(time.perf_counter() - t0, 3))
    return min(walls), walls


def typical_docs(spark, n_docs: int):
    """Deterministic low-overlap corpus, BIGINT doc ids (the contract
    queries' documents-table shape)."""
    from pyspark.sql import functions as F

    df = spark.range(n_docs).repartition(64)
    uniq = F.concat_ws(
        " ", *[F.concat(F.lit("u"), (F.col("id") * 52 + i).cast("string"))
               for i in range(52)])
    shared = F.concat_ws(
        " ", *[F.concat(F.lit("s"),
                        ((F.col("id") * 31 + i * 17) % 1000).cast("string"))
               for i in range(8)])
    return df.select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", uniq, shared).alias("text"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=os.cpu_count(),
                    help="local[N] parallelism (north-rule two-level runs)")
    ap.add_argument("--out", default="BENCH/text_ops_scale.json")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from parallel_count_min_sketch_spark.operators.dedup import (
        duplicate_span_stats,
    )
    from parallel_count_min_sketch_spark.plans.textdata_queries import (
        benchmark_contamination_df,
        doc_repetition_df,
        tfidf_top_terms_df,
    )

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("text-ops-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = typical_docs(spark, args.docs)
    docs.write.mode("overwrite").parquet("/tmp/text_ops_bench_docs")
    docs = spark.read.parquet("/tmp/text_ops_bench_docs")

    from pyspark.sql import functions as F

    def force(df):
        """Aggregate over EVERY output column — a bare count() lets
        Catalyst eliminate the final left join (unique right keys) and
        skip the whole joined subtree, timing nothing."""
        return df.agg(*[F.expr(f"bit_xor(xxhash64({c}))").alias(c)
                        for c in df.columns]).collect()

    out: dict = {"docs": args.docs, "tokens_per_doc": 60,
                 "cpus": args.cpus, "reps": args.reps, "ops": {}}
    for name, fn in (
        ("doc_repetition", lambda: force(doc_repetition_df(docs))),
        ("tfidf_top_terms", lambda: force(tfidf_top_terms_df(docs))),
        ("benchmark_contamination",
         lambda: force(benchmark_contamination_df(docs))),
        # dup_spans: ~1000 genuinely duplicated 8-token spans planted by
        # the shared-suffix construction; the distinct-(span,doc) pass
        # shuffles ~106M pairs — the operator's real cost at scale
        ("dup_spans", lambda: force(duplicate_span_stats(docs))),
    ):
        best, walls = timed(fn, args.reps)
        out["ops"][name] = {
            "best_sec": best, "runs": walls,
            "docs_per_sec": int(args.docs / best),
        }
        print(name, out["ops"][name])

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

"""Dedup-operator throughput at corpus scale -> BENCH/dedup_scale.json.

The dedup family's 100-TB suitability is argued from plan shape (bounded
band-key shuffles, capped buckets); this script puts measured numbers next
to the argument: exact dedup, MinHash signatures, LSH candidate pairs and
SimHash fingerprints over a deterministic synthetic web corpus (FIXTURES
F1, same generator as bench.py), warm best-of-N.

Usage: python scripts/dedup_bench.py [--pages 200000] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def timed(fn, reps: int) -> tuple[float, list[float], object]:
    fn()  # warmup: worker import + JIT + page cache (matches sketch_family_bench)
    walls, out = [], None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        walls.append(round(time.perf_counter() - t0, 3))
    return min(walls), walls, out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=200_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import bench
    from parallel_count_min_sketch_spark.operators import dedup as dd
    from parallel_count_min_sketch_spark.operators.dedup import (
        exact_dup_groups,
    )

    spark = bench.get_spark(bench.CPUS)
    corpus = bench.ensure_corpus(spark, args.pages)
    docs = spark.read.parquet(corpus).selectExpr("url AS doc_id", "text")
    docs.count()  # warm scan / page cache

    res: dict = {
        "n_docs": args.pages, "cpus": bench.CPUS, "reps": args.reps,
        "corpus_note": "FIXTURES F1 mixture plants 30% of token mass on 13 "
                       "tokens, so docs are mutually similar — LSH candidate "
                       "volume here is a near-worst case, not a typical web "
                       "corpus",
    }

    sec, runs, n = timed(lambda: exact_dup_groups(docs, "doc_id").count(), args.reps)
    res["exact_dedup"] = {"sec": sec, "runs": runs, "dup_groups": n,
                          "docs_per_sec": round(args.pages / sec, 1)}

    sec, runs, n = timed(
        lambda: dd.minhash_table(docs, "doc_id").count(), args.reps)
    res["minhash_signatures"] = {"sec": sec, "runs": runs, "rows": n,
                                 "docs_per_sec": round(args.pages / sec, 1)}

    sec, runs, n = timed(
        lambda: dd.simhash_table(docs, "doc_id").count(), args.reps)
    res["simhash"] = {"sec": sec, "runs": runs, "rows": n,
                      "docs_per_sec": round(args.pages / sec, 1)}

    sec, runs, n = timed(
        lambda: dd.lsh_candidate_pairs(docs, "doc_id", max_bucket=64).count(),
        args.reps)
    res["lsh_pairs_capped64"] = {"sec": sec, "runs": runs, "pairs": n,
                                 "docs_per_sec": round(args.pages / sec, 1)}

    out = os.path.join(REPO, "BENCH", "dedup_scale.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()

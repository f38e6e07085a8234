"""Dedup-operator throughput at corpus scale -> BENCH/dedup_scale.json.

The dedup family's 100-TB suitability is argued from plan shape (bounded
band-key shuffles, capped buckets); this script puts measured numbers next
to the argument across TWO corpus profiles:

  mixture: the FIXTURES F1 generator (same as bench.py) — 30% of token
           mass on 13 tokens, so docs are mutually similar and LSH
           candidate volume is a near-worst case;
  typical: low-overlap web-like docs — 52 doc-unique tokens + 8 picks
           from a 1000-token shared vocabulary per doc, with 1% planted
           exact duplicates (doc ids ending in 99 copy their
           predecessor) — the similarity profile of a real crawl, where
           LSH buckets stay tiny.

Per family: warm best-of-N wall + docs/s.

Usage: python scripts/dedup_bench.py [--pages 2000000] [--reps 2]
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


def typical_docs(spark, n_docs: int):
    """Deterministic low-overlap corpus: mostly doc-unique tokens, a small
    shared vocabulary, 1% exact duplicates (id%100==99 copies id-1)."""
    from pyspark.sql import functions as F

    df = spark.range(n_docs).repartition(64)
    eff = F.when(F.col("id") % 100 == 99, F.col("id") - 1).otherwise(F.col("id"))
    df = df.select(F.col("id"), eff.alias("eff"))
    uniq = F.concat_ws(
        " ", *[F.concat(F.lit("u"), (F.col("eff") * 52 + i).cast("string"))
               for i in range(52)])
    shared = F.concat_ws(
        " ", *[F.concat(F.lit("s"), ((F.col("eff") * 31 + i * 17) % 1000).cast("string"))
               for i in range(8)])
    return df.select(
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("doc_id"),
        F.concat_ws(" ", uniq, shared).alias("text"),
    )


def profile_metrics(docs, n_docs: int, reps: int) -> dict:
    from parallel_count_min_sketch_spark.operators import dedup as dd
    from parallel_count_min_sketch_spark.operators.dedup import exact_dup_groups

    res: dict = {}
    sec, runs, n = timed(lambda: exact_dup_groups(docs, "doc_id").count(), reps)
    res["exact_dedup"] = {"sec": sec, "runs": runs, "dup_groups": n,
                          "docs_per_sec": round(n_docs / sec, 1)}

    from pyspark.sql import functions as F

    # force FULL materialization of every signature element: a bare
    # .count() lets Catalyst eliminate the left join (aggregated right
    # side is provably unique) and prune every signature column, timing
    # only a distinct-ids count (the r4 pre-fix numbers measured that)
    def _mh():
        df = dd.minhash_table(docs, "doc_id")
        r = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("aggregate(_sig, 0L, (a, x) -> a + coalesce(x, 0L))")),
        ).collect()[0]
        return int(r["n"])

    sec, runs, n = timed(_mh, reps)
    res["minhash_signatures"] = {"sec": sec, "runs": runs, "rows": n,
                                 "docs_per_sec": round(n_docs / sec, 1)}

    def _sh():
        df = dd.simhash_table(docs, "doc_id")
        r = df.select(F.count(F.lit(1)).alias("n"), F.sum("_sh")).collect()[0]
        return int(r["n"])

    sec, runs, n = timed(_sh, reps)
    res["simhash"] = {"sec": sec, "runs": runs, "rows": n,
                      "docs_per_sec": round(n_docs / sec, 1)}

    sec, runs, n = timed(
        lambda: dd.lsh_candidate_pairs(docs, "doc_id", max_bucket=64).count(),
        reps)
    res["lsh_pairs_capped64"] = {"sec": sec, "runs": runs, "pairs": n,
                                 "docs_per_sec": round(n_docs / sec, 1)}
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2_000_000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import bench

    spark = bench.get_spark(bench.CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    corpus = bench.ensure_corpus(spark, args.pages)
    mixture = spark.read.parquet(corpus).selectExpr("url AS doc_id", "text")
    mixture.count()  # warm scan / page cache

    typ_path = os.path.join(REPO, ".bench_cache", f"typical_docs_{args.pages}.parquet")
    if not os.path.exists(os.path.join(typ_path, "_SUCCESS")):
        typical_docs(spark, args.pages).write.mode("overwrite").parquet(typ_path)
    typical = spark.read.parquet(typ_path)
    typical.count()

    res = {
        "n_docs": args.pages, "cpus": bench.CPUS, "reps": args.reps,
        "profiles": {
            "mixture": {
                "corpus_note": "FIXTURES F1 mixture plants 30% of token mass "
                               "on 13 tokens — docs mutually similar, LSH "
                               "candidate volume near-worst case",
                **profile_metrics(mixture, args.pages, args.reps),
            },
            "typical": {
                "corpus_note": "low-overlap crawl-like docs (52 unique + 8 "
                               "shared tokens, 1% planted exact dups) — the "
                               "typical-similarity datapoint",
                **profile_metrics(typical, args.pages, args.reps),
            },
        },
    }

    out = os.path.join(REPO, "BENCH", "dedup_scale.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()

"""Grouped Misra-Gries doc-local build at corpus scale -> BENCH/mg_grouped.json.

One MG summary per host-prefix group (1000 groups) over the 4M-doc corpus
via sketch_grouped_from_text — evidence that the grouped text rails hold
at high group counts: the scan moves (group, document) rows, partials
stay O(partitions * groups * k), and the merge shuffles only those.

Usage: python scripts/mg_grouped_bench.py [--pages 4000000] [--k 256] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=4_000_000)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import bench
    from parallel_count_min_sketch_spark.operators.heavy_hitters import _mg_from_bytes
    from parallel_count_min_sketch_spark.operators.sketch_agg import (
        sketch_grouped_from_text,
    )
    from parallel_count_min_sketch_spark.sketches.misra_gries import MisraGries

    spark = bench.get_spark(bench.CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(bench.ensure_corpus(spark, args.pages))
    spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
    grp = pages.select(F.substring("url", 9, 12).alias("group"), "text")

    def build():
        return sketch_grouped_from_text(
            grp, "group", "text", partial(MisraGries, args.k), _mg_from_bytes
        ).collect()

    rows = build()  # warm
    runs = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        rows = build()
        runs.append(round(time.perf_counter() - t0, 3))
    sec = bench._clean_median(runs)
    tot = sum(r["rows_seen"] for r in rows)
    res = {
        "n_docs": args.pages, "k": args.k, "n_groups": len(rows),
        "n_tokens": int(tot), "sec": round(sec, 3), "runs": runs,
        "n_stalled": len(runs) - len(bench._stall_free(runs)),
        "tokens_per_sec": round(tot / sec, 1),
    }
    with open(os.path.join(REPO, "BENCH", "mg_grouped.json"), "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()

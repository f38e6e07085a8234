"""Run the reference-parity benchmark standalone and persist the JSON.

Writes BENCH/parity.json (100M items) or BENCH/parity_1000m.json (1000M),
the files scaling_bench.py folds into BENCH/BASELINE.md.

Usage: python scripts/parity_run.py [--items 1000000000] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1_000_000_000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_BENCH_RUNS"] = str(args.runs)
    import bench

    bench.BUILD_RUNS = args.runs
    spark = bench.get_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    res = bench.bench_reference_parity(spark, args.items)
    spark.stop()
    res["config"] = (
        f"local[{args.cpus}], JVM Catalyst path (best of per-occurrence vs "
        f"distinct-first plans), items cached in memory, median of {args.runs} warm runs"
    )
    name = "parity_1000m.json" if args.items >= 1_000_000_000 else "parity.json"
    out = os.path.join(REPO, "BENCH", name)
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

"""Sequence-packing scale evidence -> BENCH/packing_scale.json.

concat_split_packing's claim is that the global prefix sum never funnels
the corpus through one task: cost = one range shuffle + a P-row driver
prefix + per-partition windows. This script measures it at 100M rows and
at two parallelism levels (the north-rule two-cluster-size criterion:
same input, local[8] vs local[32], throughput + scaling efficiency).

Forcing full evaluation via sum/max aggregates (no driver collect of row
results); the checksum also cross-checks the prefix-sum total at both
levels — identical offsets regardless of parallelism.

Usage: python scripts/packing_bench.py [--rows 100000000] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, n_rows: int, reps: int) -> dict:
    from pyspark.sql import SparkSession, functions as F

    from parallel_count_min_sketch_spark.operators.packing import (
        concat_split_packing,
    )

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(cpus * 2))
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false")
             .appName(f"packing-bench-{cpus}")
             .getOrCreate())
    df = spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 13).cast("int").alias("n"))
    walls, check = [], None
    for _ in range(reps + 1):  # first run = warmup
        t0 = time.perf_counter()
        out = concat_split_packing(df, "doc_id", "n", 2048)
        row = out.agg(F.sum("start_offset").alias("s"),
                      F.max("pack_id").alias("p"),
                      F.sum(F.col("crosses_boundary").cast("long")).alias("x")
                      ).collect()[0]
        walls.append(round(time.perf_counter() - t0, 3))
        check = (int(row["s"]), int(row["p"]), int(row["x"]))
    spark.stop()
    best = min(walls[1:])
    return {"cpus": cpus, "wall_sec": best, "runs": walls[1:],
            "warmup": walls[0], "rows_per_sec": round(n_rows / best),
            "checksum": check}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    levels = [run_level(8, args.rows, args.reps),
              run_level(32, args.rows, args.reps)]
    assert levels[0]["checksum"] == levels[1]["checksum"], \
        "offsets differ across parallelism levels"
    eff = (levels[1]["rows_per_sec"] / levels[0]["rows_per_sec"]) / (32 / 8)
    out = {"n_rows": args.rows, "levels": levels,
           "scaling_efficiency_8_to_32": round(eff, 3),
           "offsets_parallelism_invariant": True}
    dest = os.path.join(REPO, "BENCH", "packing_scale.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Pre-aggregation crossover for the GENERIC rollup rail -> BENCH/generic_rollup_preagg.json.

sketch_time_buckets(pre_aggregate=True) collapses to (day, DISTINCT item,
count) JVM-side before the Arrow channel. This times the per-day HLL
rollup build both ways at 100M events x 365 days in the clustered
(log-ingest) arrival order, sweeping the user-id universe size to locate
the crossover: at a near-unique (day,user) pair count the distinct
shuffle is pure overhead (pre-agg LOSES), while at heavy repeats the
collapse pays. Bucket-level byte equality between the two plans is
asserted in-run for every configuration.

Usage: python scripts/generic_rollup_preagg_bench.py [--rows N] [--reps R]
       [--universes U1 U2 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--days", type=int, default=365)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--universes", type=int, nargs="+",
                    default=[1_000_000, 10_000],
                    help="user-id universe sizes to sweep: large = "
                         "near-unique (day,user) pairs (collapse buys "
                         "nothing, the shuffle is pure overhead); small = "
                         "heavy repeats (collapse pays)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import bench
    from parallel_count_min_sketch_spark.operators.rollup import (
        sketch_time_buckets,
    )
    from parallel_count_min_sketch_spark.plans.sketch_queries import (
        _hll_from_bytes,
    )
    from parallel_count_min_sketch_spark.sketches.hashing import MERSENNE_PRIME
    from parallel_count_min_sketch_spark.sketches.hll import HyperLogLog
    from parallel_count_min_sketch_spark.sources.items import _u

    spark = bench.get_spark(bench.CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    mk = partial(HyperLogLog, 12, 7)

    day = f"(CAST(id * {args.days} / {args.rows} AS BIGINT))"  # clustered
    r = f"(CAST({_u('id', 12, 99)} AS DOUBLE) / {MERSENNE_PRIME}.0)"

    sweep = {}
    for universe in args.universes:
        uid = (f"CASE WHEN {r} < 0.1 "
               f"THEN CAST({_u('id', 13, 99)} % 1000 AS BIGINT) "
               f"ELSE CAST({_u('id', 14, 99)} % {universe} AS BIGINT) END")
        ev = spark.range(0, args.rows, 1, bench.CPUS * 4).select(
            F.expr(uid).alias("user_id"),
            F.expr(
                f"timestampadd(DAY, {day}, TIMESTAMP '2024-01-01 00:00:00')"
            ).alias("ts"),
        )
        ev.select(F.count("*")).collect()  # page-fault warmup
        pairs = ev.select("ts", "user_id").distinct().count()

        results = {}
        blobs = {}
        for name, kw in (("per_occurrence", {}),
                         ("pre_aggregate", {"pre_aggregate": True})):
            runs, rows = [], None
            for _ in range(args.reps):
                t0 = time.perf_counter()
                rows = sketch_time_buckets(ev, "ts", "user_id", mk,
                                           _hll_from_bytes, **kw).collect()
                runs.append(round(time.perf_counter() - t0, 3))
            blobs[name] = {r["bucket"]: bytes(r["sketch"]) for r in rows}
            results[name] = {
                "runs_sec": runs,
                "median_sec": sorted(runs)[len(runs) // 2],
                "rows_per_sec": int(args.rows / sorted(runs)[len(runs) // 2]),
            }
        assert blobs["per_occurrence"] == blobs["pre_aggregate"], \
            "pre-aggregated HLL rollup must be byte-identical"
        sweep[str(universe)] = {
            "distinct_day_user_pairs": pairs,
            "repeat_factor": round(args.rows / pairs, 1),
            "plans": results,
            "preagg_speedup": round(
                results["per_occurrence"]["median_sec"]
                / results["pre_aggregate"]["median_sec"], 2),
        }
        print(f"universe={universe}: pairs={pairs} "
              f"speedup={sweep[str(universe)]['preagg_speedup']}",
              flush=True)

    out = {
        "bench": "generic_rollup_preagg",
        "kernel": "hll(p=12)",
        "rows": args.rows,
        "days": args.days,
        "arrival": "clustered (log-ingest)",
        "cpus": bench.CPUS,
        "universes": sweep,
        "note": ("day-buckets byte-identical between plans (asserted "
                 "in-run) at every universe size; pre_aggregate moves one "
                 "weighted Arrow row per distinct (day,user) instead of "
                 "one per occurrence — it pays only when repeat_factor is "
                 "large, matching the measured 'pre-aggregate iff distinct "
                 "pairs << rows' choice rule from BENCH/rollup_scale*.json"),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/generic_rollup_preagg.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()

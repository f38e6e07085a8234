"""Per-query DataFrame CONSTRUCTION cost (no action executed).

Times ``fn(spark, sf_dir)`` alone for every declared query — the
driver-side py4j/analysis work bench.py pays inside each timed rep
before any job runs. Queries that execute jobs during construction
(driver-fold queries like hll_sliding_window) are reported too, but
their number includes those jobs; the point of this profile is to rank
the pure-construction stragglers after the r6 parsed-SQL emitter work.

Usage: python scripts/construction_profile.py [--sf DIR] [--reps N] [names...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench_extra import get_spark

    import __spark_entry__ as entrymod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = args.names or list(qs)

    results = {}
    for name in names:
        fn = qs[name]
        runs = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(spark, args.sf)
            runs.append(round(time.perf_counter() - t0, 4))
        results[name] = min(runs)
        print(f"{name:34s} {min(runs):8.4f}  {runs}", flush=True)
    spark.stop()
    top = sorted(results.items(), key=lambda kv: -kv[1])
    print(json.dumps({"construction_min_sec": dict(top)}, indent=1))


if __name__ == "__main__":
    main()

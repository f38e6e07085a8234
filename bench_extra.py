"""Round-6 optimization profiler (guide §1: measure first).

Times individual declared queries with EXACTLY the session config the
frozen ``bench.py`` uses (local[$SPARK_GRAFT_CPUS], shuffle.partitions =
cpus, AQE on, Arrow on, maxPartitionBytes=64m) so numbers here are
comparable with the driver's BENCH_r*.json per-query map. Optionally
captures ``.explain("formatted")`` to plans/r06/.

Usage:
  python bench_extra.py time  [--sf DIR] [--reps N] [name ...]
  python bench_extra.py plan  [--sf DIR] [--tag before|after] [name ...]
  python bench_extra.py noop  [--sf DIR] [--reps N] [name ...]   # noop sink

``time`` mirrors bench.py's methodology (collect(), stall-excluded
median); ``noop`` times the computation alone via the noop sink
(guide §1.4).  Results land in BENCH/r06_profile.json (merged per run).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _clean_median(xs):
    lo = min(x for x in xs if x >= 0.005)
    return _median([x for x in xs if x <= 3.0 * lo])


def get_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"pcms-bench-extra-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .getOrCreate()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["time", "plan", "noop"])
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "r06_profile.json"))
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = args.names or list(qs)

    if args.mode == "plan":
        import contextlib
        import io

        os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
        for name in names:
            df = qs[name](spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(REPO, "plans", "r06", f"{name}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}")
        spark.stop()
        return

    results = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"r06-profile:{name}")
        runs = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            if args.mode == "noop":
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            else:
                fn(spark, args.sf).collect()
            runs.append(round(time.perf_counter() - t0, 3))
        results[name] = {"median": round(_clean_median(runs), 3), "runs": runs}
        print(f"{name}: {results[name]}", flush=True)
    spark.stop()

    merged = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            merged = json.load(f)
    key = f"{args.mode}@{os.path.basename(args.sf.rstrip('/'))}"
    merged.setdefault(key, {}).update(results)
    with open(args.out, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"merged into {args.out}")


if __name__ == "__main__":
    main()

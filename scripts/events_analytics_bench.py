"""Events-analytics operators at 100M rows -> BENCH/events_analytics_scale.json.

The round-5 analytics family (funnel, cohort retention, debounce, paths)
is built from map-side-combinable aggregates and doc-local per-group
lists. This script measures all four at 100M synthetic events with a
ZIPF-ish user distribution (user = 10^6 / rank shape via modular
squares), i.e. hot users exist but stay human-scale — and, for the two
collect_list-based ops, ALSO times the windowed LAG alternative so the
doc-local-vs-window trade the docstrings describe is a measured number,
not a claim.

Usage: python scripts/events_analytics_bench.py [--rows 100000000] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def synth_events(spark, n_rows: int):
    from pyspark.sql import functions as F

    df = spark.range(n_rows).repartition(64)
    # skewed users: quadratic residues concentrate mass on small ids
    user = (F.col("id") * F.col("id") % 1_000_003) % 100_000
    etype = F.element_at(
        F.array(*[F.lit(t) for t in
                  ("view", "click", "signup", "purchase", "error")]),
        (F.col("id") % 5 + 1).cast("int"))
    ts = F.expr("timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, id % 2592000)")
    return df.select(F.col("id").alias("event_id"), user.alias("user_id"),
                     etype.alias("event_type"), ts.alias("ts"))


def timed(fn, reps):
    fn()
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        walls.append(round(time.perf_counter() - t0, 3))
    return min(walls), walls


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, Window, functions as F

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false").getOrCreate())
    ev = synth_events(spark, args.rows)
    ev.write.mode("overwrite").parquet("/tmp/pcms_events_bench.parquet")
    ev = spark.read.parquet("/tmp/pcms_events_bench.parquet")
    out = {"n_rows": args.rows, "cpus": 32, "ops": {}}

    def funnel():
        g = ev.groupBy("user_id").agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("v"),
            F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("c"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p"))
        return g.agg(F.count("*"),
                     F.sum(F.when(F.col("v") < F.col("c"), 1).otherwise(0)),
                     F.sum(F.when((F.col("v") < F.col("c"))
                                  & (F.col("c") < F.col("p")), 1)
                           .otherwise(0))).collect()

    def cohort():
        day = F.col("ts").cast("date")
        cohorts = (ev.filter(F.col("event_type") == "signup")
                   .groupBy("user_id").agg(F.min(day).alias("cd")))
        acts = ev.select("user_id", day.alias("ad")).distinct()
        return (acts.join(cohorts, "user_id")
                .groupBy(F.datediff("ad", "cd").alias("off"))
                .agg(F.countDistinct("user_id"))
                .filter("off BETWEEN 0 AND 14").count())

    def debounce_doclocal():
        seqs = (ev.groupBy("user_id", "event_type")
                .agg(F.array_sort(F.collect_list(F.struct("ts", "event_id")))
                     .alias("s")))
        kept = F.expr(
            "transform(sequence(1, size(s)), i -> CASE WHEN i = 1 OR "
            "timestampdiff(MICROSECOND, s[i-2].ts, s[i-1].ts) > 5000000 "
            "THEN s[i-1].event_id END)")
        return (seqs.select(F.explode_outer(kept).alias("e"))
                .filter("e IS NOT NULL")
                .agg(F.count("*"), F.bit_xor(F.xxhash64("e"))).collect())

    def debounce_window():
        w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        lagged = ev.withColumn("prev", F.lag("ts").over(w))
        return (lagged.filter(
            "prev IS NULL OR timestampdiff(MICROSECOND, prev, ts) > 5000000")
            .agg(F.count("*"), F.bit_xor(F.xxhash64("event_id"))).collect())

    for name, fn in [("funnel", funnel), ("cohort", cohort),
                     ("debounce_doclocal", debounce_doclocal),
                     ("debounce_window", debounce_window)]:
        sec, runs = timed(fn, args.reps)
        out["ops"][name] = {"sec": sec, "runs": runs,
                            "rows_per_sec": round(args.rows / sec)}
        print(name, sec, flush=True)

    dest = os.path.join(REPO, "BENCH", "events_analytics_scale.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Two-regime evidence for the bucketized interval join.

Regime A (skewed key, moderate size): the naive range join
(`l.k = r.k AND |rt - lt| <= w`) has only `k` as its equi-part, so the
hot key's entire left x right block lands in ONE sort-merge task that
evaluates the range predicate over the full cross product of the
equal-key run — the quadratic blowup the bucketized form exists to
avoid. Both forms must return the SAME pair count (parity check).

Regime B (uniform, larger): bucketized-only absolute throughput — the
naive form's hot-block cost does not exist here, but the bucketized
join is the shape that survives when it does.

Inputs are built JVM-side from spark.range (deterministic, no Python
data shipping). Writes BENCH/interval_join.json.

Usage: python scripts/interval_join_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from parallel_count_min_sketch_spark.operators.interval_join import interval_join

H_US = 3_600_000_000
SPAN_US = 30 * 24 * H_US  # 30 days
EPOCH0 = 1_700_000_000_000_000  # fixed 2023-11 epoch µs


def make_events(spark, n: int, n_keys: int, hot_frac_pct: int, tag: str):
    """n rows, ts uniform-ish over 30 days via a multiplicative hash;
    `hot_frac_pct`% of rows hit key 0, the rest spread over n_keys."""
    df = spark.range(n).select(
        F.col("id").alias(f"{tag}id"),
        F.when(F.pmod("id", 100) < hot_frac_pct, F.lit(0))
        .otherwise(F.pmod(F.col("id") * 2654435761, n_keys))
        .alias("k"),
        F.timestamp_micros(
            # ~44-min step wraps the 30-day span every ~1k ids (good
            # spread); id*step stays far below 2^63 (ANSI mode would
            # reject an overflowing multiply)
            (F.lit(EPOCH0) + F.pmod(F.col("id") * 2_654_435_761, SPAN_US))
        ).alias(f"{tag}ts"),
    )
    return df


def wall(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = df.count()
    return time.perf_counter() - t0, n


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("interval-join-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"window_us": H_US, "span_days": 30}

    # --- Regime A: skewed (hot key = 5% of both sides) ----------------------
    NL, NR = 200_000, 1_000_000
    left = make_events(spark, NL, 1000, 5, "l").cache()
    right = make_events(spark, NR, 1000, 5, "r").cache()
    left.count(), right.count()

    naive = left.join(
        right,
        (left["k"] == right["k"])
        & (F.abs(F.expr(
            "timestampdiff(MICROSECOND, lts, rts)")) <= F.lit(H_US)),
    )
    bucketed = interval_join(left, right, "k", "lts", "rts", window_us=H_US)
    # warm + parity
    w_naive, n_naive = wall(naive)
    w_buck, n_buck = wall(bucketed)
    assert n_naive == n_buck, (n_naive, n_buck)
    # second (warm) runs
    w_naive2, _ = wall(naive)
    w_buck2, _ = wall(bucketed)
    out["regime_a_skewed"] = {
        "left_rows": NL, "right_rows": NR, "hot_key_pct": 5,
        "pairs": n_buck,
        "naive_sec": round(min(w_naive, w_naive2), 3),
        "bucketized_sec": round(min(w_buck, w_buck2), 3),
        "speedup": round(min(w_naive, w_naive2) / min(w_buck, w_buck2), 2),
        "note": ("naive = SortMergeJoin on k alone; the hot key's "
                 "left x right block (10k x 50k = 5e8 candidate pairs) "
                 "is one task's cross product. bucketized spreads it "
                 "over (k, time-bucket)."),
    }
    left.unpersist(), right.unpersist()

    # --- Regime B: uniform, larger ----------------------------------------
    NL2, NR2 = 2_000_000, 20_000_000
    left2 = make_events(spark, NL2, 100_000, 0, "l")
    right2 = make_events(spark, NR2, 100_000, 0, "r")
    big = interval_join(left2, right2, "k", "lts", "rts", window_us=H_US)
    w1, n1 = wall(big)
    w2, _ = wall(big)
    out["regime_b_uniform"] = {
        "left_rows": NL2, "right_rows": NR2, "n_keys": 100_000,
        "pairs": n1, "bucketized_sec": round(min(w1, w2), 3),
        "left_rows_per_sec": int(NL2 / min(w1, w2)),
    }

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/interval_join.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

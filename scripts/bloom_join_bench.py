"""Bloom semi-join pushdown: shuffle-reduction evidence.

The operator's 100-TB claim is "shuffle s*N rows instead of N" when the
small side is NOT broadcastable. This bench constructs that regime
explicitly: auto-broadcast is disabled so the exact semi-join is a
shuffle join on both paths, and the only difference is the Bloom
prefilter in front of the big side's scan.

  plain  : big --shuffle(N rows)--------> SortMerge/ShuffledHash semi-join
  bloomed: big --bloom--shuffle(~sN)----> same join

Reports wall (stall-free median, same rule as bench.py) and the rows
entering the shuffle on each path, plus result equality. Writes
BENCH/bloom_join.json.

Usage: python scripts/bloom_join_bench.py [--rows 50000000] [--sel 0.01] [--reps 5]
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

from bench import _clean_median, _stall_free  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=50_000_000)
    ap.add_argument("--key-domain", type=int, default=1_000_000)
    ap.add_argument("--sel", type=float, default=0.01,
                    help="fraction of the key domain on the small side")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from parallel_count_min_sketch_spark.operators.joins import (
        bloom_prefilter, bloom_prefilter_jvm, build_key_bloom)
    from parallel_count_min_sketch_spark.sketches.bloom import BloomFilter

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("bloom-join-bench")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        # the regime under test: small side NOT broadcastable
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic uniform keys (Knuth multiplicative hash of the row id)
    base = spark.range(args.rows).select(
        F.col("id").alias("row_id"),
        ((F.col("id") * 2654435761) % args.key_domain).alias("key"),
    )
    n_small = int(args.key_domain * args.sel)
    small = spark.range(n_small).select(
        ((F.col("id") * 40503) % args.key_domain).alias("key")).distinct()
    small = small.persist()
    n_small_keys = small.count()

    mk = partial(BloomFilter, max(n_small_keys, 1000), 0.01, seed=17)
    bf = build_key_bloom(small, "key", mk)
    rows_bloomed = bloom_prefilter_jvm(base, "key", bf).count()

    def measure(big, need_payload: bool) -> dict:
        """Time the three paths over one big-side shape. With a payload,
        the post-join aggregate consumes it so the semi-join shuffle
        carries the full row — the 100-TB document-table regime."""
        agg = ((lambda d: d.agg(F.sum(F.length("payload"))).collect())
               if need_payload else (lambda d: d.count()))

        def plain():
            return agg(big.join(small, "key", "leftsemi"))

        def bloomed():
            return agg(bloom_prefilter(big, "key", bf)
                       .join(small, "key", "leftsemi"))

        def bloomed_jvm():
            return agg(bloom_prefilter_jvm(big, "key", bf)
                       .join(small, "key", "leftsemi"))

        r: dict = {}
        a, b, c = plain(), bloomed(), bloomed_jvm()  # warm + equality
        assert a == b == c, (a, b, c)
        for name, fn in (("plain", plain), ("bloomed_arrow", bloomed),
                         ("bloomed_jvm", bloomed_jvm)):
            runs = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                fn()
                runs.append(round(time.perf_counter() - t0, 3))
            r[f"{name}_sec"] = round(_clean_median(runs), 3)
            r[f"{name}_runs"] = runs
            r[f"{name}_n_stalled"] = len(runs) - len(_stall_free(runs))
        r["speedup_arrow"] = round(r["plain_sec"] / r["bloomed_arrow_sec"], 2)
        r["speedup_jvm"] = round(r["plain_sec"] / r["bloomed_jvm_sec"], 2)
        return r

    res = {"n_big": args.rows, "key_domain": args.key_domain,
           "n_small_keys": n_small_keys,
           "rows_into_shuffle_plain": args.rows,
           "rows_into_shuffle_bloomed": rows_bloomed,
           "shuffle_reduction": round(args.rows / max(rows_bloomed, 1), 1),
           "bloom_bits": bf.m, "bloom_k": bf.k,
           "bloom_fill_ratio": round(bf.fill_ratio(), 4)}

    # regime 1: bare 8-byte keys — the shuffle is nearly free on one VM,
    # so the probe CPU dominates and the prefilter does NOT pay off
    # locally (kept as an honest negative result; on a network shuffle
    # the bytes-moved ratio below is what matters)
    res["bare_keys"] = measure(base, need_payload=False)
    # regime 2: ~128 B incompressible payload per row (a document table's
    # shape) — the semi-join must move the payload, so the 50x row
    # reduction becomes a 50x shuffle-byte reduction
    payload = base.withColumn(
        "payload", F.concat(F.sha2(F.col("row_id").cast("string"), 256),
                            F.sha2((F.col("row_id") + 1).cast("string"), 256)))
    res["payload_128b"] = measure(payload, need_payload=True)

    out = os.path.join(REPO, "BENCH", "bloom_join.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()

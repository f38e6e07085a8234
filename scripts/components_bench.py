"""Connected-components scale evidence -> BENCH/components_scale.json.

Two adversarial graphs, generated JVM-side from spark.range:

  rings:  10M nodes in 100k rings of 100 (10M edges, diameter 50 each) —
          the realistic dedup-cluster shape at volume;
  chain:  one 1M-node path (diameter 10^6) — the worst case for plain
          min-label propagation (10^6 rounds); pointer jumping must
          close it in ~log2(10^6) ≈ 20 rounds.

Both runs verify the result structurally (component count + sizes),
and report rounds + wall.

Usage: python scripts/components_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from parallel_count_min_sketch_spark.operators.components import (
    connected_components,
)


def run(edges, n_expected_components, expected_size, label, max_iter=40):
    stats: dict = {}
    t0 = time.perf_counter()
    comp = connected_components(edges, "s", "t", max_iter=max_iter,
                                stats=stats)
    sizes = comp.groupBy("component").count()
    chk = sizes.agg(
        F.count(F.lit(1)).alias("n_components"),
        F.min("count").alias("min_size"),
        F.max("count").alias("max_size"),
    ).first()
    wall = time.perf_counter() - t0
    assert chk["n_components"] == n_expected_components, chk
    assert chk["min_size"] == chk["max_size"] == expected_size, chk
    print(label, "rounds:", stats["rounds"], "wall:", round(wall, 1))
    return {"rounds": stats["rounds"], "wall_sec": round(wall, 2),
            "n_components": chk["n_components"],
            "component_size": expected_size}


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("components-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"cpus": os.cpu_count()}

    # rings of 100: edge (id, next-in-ring)
    N, L = 10_000_000, 100
    rings = spark.range(N).select(
        F.col("id").alias("s"),
        (F.col("id") - F.pmod("id", L)
         + F.pmod(F.col("id") + 1, L)).alias("t"),
    )
    out["rings_10m"] = {"nodes": N, "edges": N, "ring_len": L,
                        **run(rings, N // L, L, "rings")}

    # one million-node chain: diameter 10^6
    M = 1_000_000
    chain = spark.range(M - 1).select(
        F.col("id").alias("s"), (F.col("id") + 1).alias("t"))
    out["chain_1m"] = {"nodes": M, "edges": M - 1,
                       **run(chain, 1, M, "chain")}

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/components_scale.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

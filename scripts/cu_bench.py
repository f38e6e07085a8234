"""Measure the conservative-update CMS overestimate reduction vs plain CMS.

Two regimes, both with the reference geometry (eps=0.001, delta=0.1 ->
3 x 2719) where hash collisions actually bite:

  * the gen_datasets mixture (seed 12345) at --items items — the
    reference's own workload;
  * a Zipf(1.2) stream over a 200k-id domain — the webtext token shape.

For each: fold per-"partition" CU partials and sum-merge (exactly what the
distributed build does), then report total/mean/p99 overestimate for CU vs
plain CMS over all distinct items, plus the single-pass (unmerged) CU for
reference. Writes BENCH/cu_improvement.json.

Usage: python scripts/cu_bench.py [--items 10000000] [--parts 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from parallel_count_min_sketch_spark.sketches.cms import CountMinSketch  # noqa: E402
from parallel_count_min_sketch_spark.sketches.cms_cu import ConservativeCMS  # noqa: E402

EPS, DELTA, SEED = 0.001, 0.1, 12345


def _mixture(n: int, rng: np.random.Generator) -> np.ndarray:
    # the reference generator's shape (10% planted 123, rest ~uniform small domain)
    planted = np.full(n // 10, 123, dtype=np.int64)
    rest = rng.integers(0, 10_000, size=n - planted.size).astype(np.int64)
    out = np.concatenate([planted, rest])
    rng.shuffle(out)
    return out


def _zipf(n: int, rng: np.random.Generator) -> np.ndarray:
    return (rng.zipf(1.2, size=n) % 200_000).astype(np.int64)


def _err_stats(est: np.ndarray, cnts: np.ndarray) -> dict:
    err = est - cnts
    return {
        "total_overestimate": int(err.sum()),
        "mean_overestimate": round(float(err.mean()), 3),
        "p99_overestimate": int(np.percentile(err, 99)),
        "max_overestimate": int(err.max()),
        "n_exact": int((err == 0).sum()),
    }


def run(stream: np.ndarray, parts: int) -> dict:
    vals, cnts = np.unique(stream, return_counts=True)
    cnts = cnts.astype(np.int64)

    cms = CountMinSketch(EPS, DELTA, SEED)
    t0 = time.perf_counter()
    cms.update_batch(stream)
    cms_sec = time.perf_counter() - t0

    merged = ConservativeCMS(EPS, DELTA, SEED)
    t0 = time.perf_counter()
    for p in np.array_split(stream, parts):
        part = ConservativeCMS(EPS, DELTA, SEED)
        part.update_batch(p)
        merged.merge(part)
    cu_sec = time.perf_counter() - t0

    single = ConservativeCMS(EPS, DELTA, SEED)
    single.update_batch(stream)

    cms_est = cms.point_query(vals)
    cu_est = merged.point_query(vals)
    single_est = single.point_query(vals)
    # the sandwich is guaranteed for BOTH the merged and the single-pass
    # sketch; merged-vs-single has no domination theorem (CU is
    # order-sensitive), so that pair is only reported, not asserted
    assert (cu_est >= cnts).all() and (cu_est <= cms_est).all()
    assert (single_est >= cnts).all() and (single_est <= cms_est).all()
    cms_stats = _err_stats(cms_est, cnts)
    cu_stats = _err_stats(cu_est, cnts)
    tot_cms = max(cms_stats["total_overestimate"], 1)
    return {
        "n_items": int(stream.size),
        "n_distinct": int(vals.size),
        "partitions": parts,
        "plain_cms": cms_stats,
        "cu_merged": cu_stats,
        "cu_single_pass": _err_stats(single_est, cnts),
        "overestimate_reduction_merged":
            round(1.0 - cu_stats["total_overestimate"] / tot_cms, 4),
        "build_sec_plain": round(cms_sec, 3),
        "build_sec_cu": round(cu_sec, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=10_000_000)
    ap.add_argument("--parts", type=int, default=32)
    args = ap.parse_args()
    rng = np.random.default_rng(12345)
    out = {
        "config": f"eps={EPS} delta={DELTA} seed={SEED} (3x2719), "
                  f"{args.parts} partition partials sum-merged",
        "mixture": run(_mixture(args.items, rng), args.parts),
        "zipf_webtext": run(_zipf(args.items, rng), args.parts),
    }
    path = os.path.join(REPO, "BENCH", "cu_improvement.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

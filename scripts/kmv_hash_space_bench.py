"""Evidence for the KMV two-prime (CRT) hash fix -> BENCH/kmv_hash_space.json.

The round-5 self-review caught that the first '62-bit' construction fed
two affines the SAME x mod p residue — each affine is a bijection of that
residue, so the pair collides exactly when the residues collide and the
hash space stays ~2^31. At n distinct items the expected distinct
residues are p*(1 - exp(-n/p)): a systematic LOW bias of ~n/(2p) (~2.3%
at n=1e8) that k-based sampling error cannot explain away once k is
large. This script builds BOTH constructions over the same 1e8 distinct
items with k = 2^16 (rel std err ~ 1/sqrt(k-2) ~ 0.4%) and records the
relative estimate errors: the correlated hash must sit near the
predicted -2.3%, the CRT hash within a few sigma of zero.

numpy-only (no Spark): the hash and bottom-k are the kernel itself.
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_count_min_sketch_spark.sketches.hashing import MERSENNE_PRIME
from parallel_count_min_sketch_spark.sketches.kmv import (
    KMV_HASH_SPACE,
    KMV_SECOND_PRIME,
    KMVSketch,
)

N = int(os.environ.get("KMV_BENCH_N", str(100_000_000)))
K = 1 << 16
SEED = 7


def bottom_k_estimate(h: np.ndarray, space: int, k: int) -> float:
    vals = np.unique(h)
    if len(vals) <= k:
        return float(len(vals))
    theta = float(np.partition(vals, k - 1)[k - 1])
    return (k - 1) * space / theta


def main() -> None:
    rng = np.random.default_rng(3)
    # DISTINCT int64 items across the full positive domain
    items = rng.choice(np.int64(2**62), size=N, replace=False)
    sk = KMVSketch(4, seed=SEED)  # just for the seeded (a, b) draws

    # fixed (CRT) construction — the shipped kernel
    h_crt = sk._hash(items)
    est_crt = bottom_k_estimate(h_crt, KMV_HASH_SPACE, K)

    # broken construction (pre-fix): both affines of x mod p1
    x = items % MERSENNE_PRIME
    h1 = (sk.a * x + sk.b) % MERSENNE_PRIME
    h2 = (sk.a2 * x + sk.b2) % MERSENNE_PRIME
    h_old = h1 * MERSENNE_PRIME + h2
    est_old = bottom_k_estimate(h_old, MERSENNE_PRIME * MERSENNE_PRIME, K)

    p = float(MERSENNE_PRIME)
    predicted_residues = p * (1.0 - math.exp(-N / p))
    rel_sigma = 1.0 / math.sqrt(K - 2)
    out = {
        "bench": "kmv_hash_space",
        "n_distinct_items": N,
        "k": K,
        "rel_std_err": round(rel_sigma, 5),
        "crt_hash": {
            "estimate": round(est_crt, 1),
            "rel_error": round((est_crt - N) / N, 5),
        },
        "correlated_hash_pre_fix": {
            "estimate": round(est_old, 1),
            "rel_error": round((est_old - N) / N, 5),
            "predicted_rel_error": round((predicted_residues - N) / N, 5),
        },
        "second_prime": KMV_SECOND_PRIME,
        "note": ("same 1e8 distinct items, same seeded affine params, "
                 "k=2^16 bottom-k estimator. The pre-fix hash collapses "
                 "to distinct residues mod p ~ p(1-exp(-n/p)) — a "
                 "systematic low bias no k can fix; the CRT hash has no "
                 "such term (collision space p1*p2 ~ 4.6e18)."),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/kmv_hash_space.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

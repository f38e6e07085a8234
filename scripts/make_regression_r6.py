"""Round-5 -> round-6 regression floor (optimization round).

Compares the driver's own r5 bonus-start re-bench per-query map
(BENCH_r05.json "parsed"."queries", sf1.0, local[32]) against this
round's final frozen-bench.py run at the same sf
(BENCH/r06_final_sf1.0.json), and the r5 sf0.1 rebench against
BENCH/r06_final_sf0.1.json. Emits BENCH/regression_r5_to_r6.json with
per-query ratios; ratios > 1.1 carry a root-cause note.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOTES = {
    # query -> root-cause note for any >1.1x ratio, filled after review
}


def block(r5_queries: dict, r6_queries: dict) -> dict:
    rows = {}
    t5 = t6 = 0.0
    for k, v5 in r5_queries.items():
        if k.endswith("_runs"):
            continue
        v6 = r6_queries.get(k)
        if v6 is None:
            continue
        t5 += v5
        t6 += v6
        ratio = round(v6 / v5, 3) if v5 else None
        rows[k] = {"r5_sec": v5, "r6_sec": v6, "ratio": ratio}
        if ratio and ratio > 1.1:
            rows[k]["note"] = NOTES.get(k, "REVIEW")
    return {
        "queries": rows,
        "total_r5_sec": round(t5, 1),
        "total_r6_sec": round(t6, 1),
        "total_ratio": round(t6 / t5, 3),
    }


def main() -> None:
    r5 = json.load(open("BENCH_r05.json"))
    r6_sf1 = json.load(open("BENCH/r06_final_sf1.0.json"))
    r6_sf01 = json.load(open("BENCH/r06_final_sf0.1.json"))
    out = {
        "method": ("driver r5 bonus-start re-bench (BENCH_r05.json, "
                   "stall-excluded medians, local[32]) vs final r6 "
                   "frozen-bench.py runs at the same sf; same session "
                   "config, same query set"),
        "sf1.0": block(r5["parsed"]["queries"], r6_sf1["queries"]),
        "sf0.1_vs_r5_median": block(
            r5["rebench_at_default_sf"]["parsed"]["queries"],
            r6_sf01["queries"]),
        "headline": {
            "r5_value_sec": r5["parsed"]["value"],
            "r6_value_sec": r6_sf1["value"],
            "r5_docs_per_sec": r5["parsed"]["docs_per_sec"],
            "r6_docs_per_sec": r6_sf1["docs_per_sec"],
        },
    }
    with open("BENCH/regression_r5_to_r6.json", "w") as f:
        json.dump(out, f, indent=1)
    for sf in ("sf1.0", "sf0.1_vs_r5_median"):
        b = out[sf]
        print(sf, "total ratio", b["total_ratio"])
        for k, r in sorted(b["queries"].items(),
                           key=lambda kv: -(kv[1]["ratio"] or 0)):
            if r["ratio"] and r["ratio"] > 1.1:
                print("  >1.1x:", k, r["r5_sec"], "->", r["r6_sec"],
                      r["ratio"])


if __name__ == "__main__":
    main()

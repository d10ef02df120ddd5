#!/usr/bin/env python3
"""Re-anchor BASELINE.json from the round-12 protocol runs.

Reads /tmp/protocol_run_{1..N}.json (tools/protocol_median.sh output: each a
full-registry sf0.1 bench run immediately after a full sf0.01 Verify),
anchors bench_total_s on the MEDIAN of totals and bench_queries on the
PER-QUERY median across runs (the spread between those two views is the
storm signature, recorded in the meta).

Round-12 context the anchor must carry: the 20-query streaming replay
family now executes as ONE concurrent wave memoized per dataset dir — the
first family member in catalog order (stream_tumbling_agg) absorbs the
whole wave's wall and every other member reads its memoized result in
milliseconds. Per-query streaming numbers are therefore ACCOUNTING
artifacts of the wave, not per-operator costs; compare the family as a
unit (its sum) across rounds, never stream_tumbling_agg alone.

Usage: reanchor_r12.py [N]   (default 3)
"""
import json
import statistics
import sys

n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
runs = []
for i in range(1, n + 1):
    with open(f"/tmp/protocol_run_{i}.json") as f:
        d = json.load(f)
    if d.get("errors"):
        sys.exit(f"run {i} has errors: {d['errors']}")
    runs.append(d)

totals = sorted(round(sum(r["queries"].values()), 1) for r in runs)
median_total = totals[len(totals) // 2]
med = {k: round(statistics.median([r["queries"][k] for r in runs]), 3)
       for k in runs[0]["queries"]}
stream = [k for k in med if k.startswith("stream_")]

with open("/root/repo/BASELINE.json") as f:
    base = json.load(f)

prev_note = base.get("bench_note", "")
base["bench_total_s"] = median_total
base["bench_queries"] = med
base["bench_anchor_meta"] = {
    "date": "2026-08-16",
    "round": 12,
    "sf_dir": "/root/testdata/sf0.1",
    "master": "local[32]",
    "protocol": "full sf0.01 Verify then full sf0.1 Bench, fresh JVM each, "
                f"catalog order, x{n}; anchor = median of totals; "
                "bench_queries = per-query medians across the runs.",
    "totals_s": totals,
    "median_total_s": median_total,
    "sum_of_per_query_medians_s": round(sum(med.values()), 1),
    "n_queries": len(med),
    "streaming_family_median_sum_s": round(sum(med[k] for k in stream), 1),
    "note": "Round-12 restructure: the 20-query streaming replay family "
            "runs as ONE concurrent wave memoized per dataset dir — "
            "stream_tumbling_agg (first in catalog order) absorbs the wave "
            "wall; the other 19 entries are memo reads. Compare the family "
            "by its SUM, never by stream_tumbling_agg alone; "
            "tools/bench_compare.py and Bench's storm_windows both read "
            "these medians.",
}
base["bench_note"] = (
    f"round-12 anchor: median {median_total}s over {n} protocol runs "
    f"(totals {', '.join(str(t) for t in totals)}), {len(med)}-query "
    f"registry, streaming family re-accounted as one wave (family median "
    f"sum {round(sum(med[k] for k in stream), 1)}s, absorbed by "
    "stream_tumbling_agg). Prior: " + prev_note
)

with open("/root/repo/BASELINE.json", "w") as f:
    json.dump(base, f, indent=1)
    f.write("\n")

print(f"anchored: median={median_total}s totals={totals} "
      f"sum-of-medians={round(sum(med.values()),1)}s "
      f"streaming-family={round(sum(med[k] for k in stream),1)}s")

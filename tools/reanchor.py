#!/usr/bin/env python3
"""Re-anchor BASELINE.json from the 3x driver-condition bench runs.

Reads /tmp/bench_r6_run{1,2,3}.json (+ .load files) produced by
tools/anchor_bench.sh, picks the MEDIAN-total run, and rewrites
bench_total_s / bench_queries / bench_anchor_meta so the anchor states the
observed spread under driver-like conditions (immediately after a full
sf0.01 verify workload) instead of a quiet-load best case.
"""
import json
import statistics
import sys

runs = []
for i in (1, 2, 3):
    with open(f"/tmp/bench_r6_run{i}.json") as f:
        d = json.load(f)
    with open(f"/tmp/bench_r6_run{i}.load") as f:
        load = float(f.read().strip())
    if d.get("errors"):
        sys.exit(f"run {i} has errors: {d['errors']}")
    runs.append({"i": i, "total": d["value"], "load": load, "json": d})

totals = sorted(r["total"] for r in runs)
median_total = totals[1]
median_run = next(r for r in runs if r["total"] == median_total)
spread_pct = round(100.0 * (totals[2] - totals[0]) / median_total, 1)

with open("/root/repo/BASELINE.json") as f:
    base = json.load(f)

base["bench_total_s"] = round(median_total, 1)
base["bench_queries"] = {k: round(v, 3) for k, v in median_run["json"]["queries"].items()}
base["bench_anchor_meta"] = {
    "date": "2026-08-13",
    "round": 6,
    "sf_dir": "/root/testdata/sf0.1",
    "master": "local[32]",
    "protocol": "3x back-to-back full-registry runs immediately after a "
                "full sf0.01 Verify workload (the driver's own sequence); "
                "anchor = MEDIAN total of the three.",
    "runs": [{"total_s": round(r["total"], 1), "load_1min_at_start": r["load"]}
             for r in runs],
    "median_total_s": round(median_total, 1),
    "spread_pct_max_minus_min": spread_pct,
    "n_queries": len(median_run["json"]["queries"]),
    "note": "Driver-condition anchor per VERDICT r5 item 2: the 2x gate "
            "compares future BENCH totals against bench_total_s at the same "
            "SF. Round-6 mining-family rework (rep-level dedup mining, "
            "exploded-token verify, band-aggregate LSH candidates) moved the "
            "family from ~277s (driver r5) to the totals recorded here; all "
            "three runs and their start loads are listed so a future run is "
            "judged against the observed spread, not a lucky best case.",
}
prev = base.get("bench_note", "")
base["bench_note"] = (
    f"round-6 anchor: median {round(median_total,1)}s over 3 driver-condition "
    f"runs (totals {', '.join(str(round(t,1)) for t in totals)}; spread "
    f"{spread_pct}%), full {len(median_run['json']['queries'])}-query registry, "
    "catalog order, local[32] 24g heap, sf0.1. Prior: " + prev
)

with open("/root/repo/BASELINE.json", "w") as f:
    json.dump(base, f, indent=1)
    f.write("\n")

print(f"anchored: median={round(median_total,1)}s totals={totals} spread={spread_pct}%")

#!/usr/bin/env python3
"""Round-13 partial re-anchor: the 13 verdict-frame graduations.

Round 13 re-specified the 13 formerly rows-only queries to emit
deterministic verdict frames (approx + exact twin both run in-engine;
output = exact values + boolean floors). That changes their per-query
cost profile — mostly small additions (the exact twin), and two
REDUCTIONS (the LSH pair miners no longer sort/emit tens of thousands of
pair rows). This script re-anchors ONLY those 13 queries to their
medians over the round-13 protocol runs (/tmp/bench_r13_{1..3}.json,
full-registry sf0.1 benches on final code), adjusts bench_total_s by the
net delta, and records the adjudication in bench_anchor_meta. All other
anchors stand — a wholesale re-anchor would launder box noise into
unchanged queries' baselines.

Usage: reanchor_r13.py
"""
import json
import statistics

GRADUATED = [
    "agg_approx_distinct", "agg_approx_percentile", "agg_cms_freq",
    "agg_hll_merge", "dedup_embedding_lsh", "dedup_minhash_lsh",
    "similarity_ivf_batch_topk", "similarity_ivf_topk",
    "similarity_lsh_topk", "similarity_lsh_topk_banded",
    "similarity_pq_batch_topk", "similarity_pq_topk",
    "text_compression_ratio",
]

runs = []
for i in (1, 2, 3):
    with open(f"/tmp/bench_r13_{i}.json") as f:
        d = json.load(f)
    if d.get("errors"):
        raise SystemExit(f"run {i} has errors: {d['errors']}")
    runs.append(d)

with open("/root/repo/BASELINE.json") as f:
    base = json.load(f)

old = {k: base["bench_queries"][k] for k in GRADUATED}
new = {k: round(statistics.median([r["queries"][k] for r in runs]), 3)
       for k in GRADUATED}
delta = round(sum(new.values()) - sum(old.values()), 1)

for k, v in new.items():
    base["bench_queries"][k] = v
base["bench_total_s"] = round(base["bench_total_s"] + delta, 1)
base.setdefault("bench_anchor_meta", {})["r13_verdict_reanchor"] = {
    "date": "2026-08-16",
    "queries": {k: {"old": old[k], "new": new[k]} for k in GRADUATED},
    "net_delta_s": delta,
    "protocol": "medians over 3 full-registry sf0.1 protocol runs on "
                "final round-13 code (totals "
                + ", ".join(f"{r['value']:.1f}" for r in runs)
                + "; zero errors, zero storm windows)",
    "note": "Adjudicated cost of the verdict-frame graduation: each "
            "query now also runs its exact twin in-engine (the boolean "
            "floors depend on it). Two queries got CHEAPER — the LSH "
            "pair miners now aggregate to a one-row verdict instead of "
            "sorting/emitting the full pair list.",
}
base["bench_note"] = (
    f"round-13 partial re-anchor: the 13 verdict-frame graduations moved "
    f"to their protocol medians (net {delta:+.1f}s; minhash-LSH "
    f"{old['dedup_minhash_lsh']}->{new['dedup_minhash_lsh']}s, approx "
    f"percentile {old['agg_approx_percentile']}->"
    f"{new['agg_approx_percentile']}s). Prior: " + base.get("bench_note", "")
)

with open("/root/repo/BASELINE.json", "w") as f:
    json.dump(base, f, indent=1)
    f.write("\n")

print(f"re-anchored 13 queries, net delta {delta:+.1f}s, "
      f"bench_total_s -> {base['bench_total_s']}")
for k in GRADUATED:
    print(f"  {k:30s} {old[k]:6.2f} -> {new[k]:6.2f}")

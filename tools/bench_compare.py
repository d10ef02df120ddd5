#!/usr/bin/env python3
"""Diff two Bench JSON lines (files containing {"metric":...}).

Usage: bench_compare.py OLD NEW [top_n]

Prints (1) per-query delta sorted by regression size and (2) a catalog-
position view of the excess: this box suffers transient multi-ten-second
CPU-theft windows, and a stall shows up as a TIGHT RUN OF CONSECUTIVE
catalog positions all inflated while everything outside sits at baseline
speed (see BASELINE.md "stall-window evidence"). A genuine code
regression inflates the same queries in EVERY run regardless of
position. Check the window view before reading any single inflated
total as a regression.
"""
import json, re, sys

def load(p):
    txt = open(p).read()
    return json.loads(re.search(r'\{"metric".*\}', txt).group(0))

old, new = load(sys.argv[1]), load(sys.argv[2])
top = int(sys.argv[3]) if len(sys.argv) > 3 else 15
print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
      f"({len(old['queries'])} -> {len(new['queries'])} queries)")
keys = sorted(set(old["queries"]) | set(new["queries"]),
              key=lambda k: new["queries"].get(k, 0) - old["queries"].get(k, 0),
              reverse=True)
for k in keys[:top]:
    o, n = old["queries"].get(k), new["queries"].get(k)
    if o is None:
        print(f"{k:30s}      NEW -> {n:6.2f}s")
    elif n is None:
        print(f"{k:30s} {o:6.2f}s -> GONE")
    else:
        print(f"{k:30s} {o:6.2f}s -> {n:6.2f}s  ({n-o:+.2f})")

# Stall-window view: excess-by-catalog-position (NEW's insertion order is
# the catalog order the bench ran in). Two flag rules, both grouped by
# consecutive position:
#   - ABS:  excess over OLD exceeds 0.9s (the long-stall signature);
#   - RATIO: NEW >= 2x OLD with at least +0.15s excess (round-14 widening —
#     short host-deprivation windows inflate a 0.1-0.7s query 2-4x without
#     ever crossing the 0.9s gate; a run of 2-3 adjacent RATIO flags is the
#     same storm signature at smaller magnitude).
# A dominant group = a stall window, not a per-query regression; a genuine
# regression inflates the SAME queries in every run regardless of position.
hot = []
added = [k for k in new["queries"] if k not in old["queries"]]
if added:
    print(f"\nqueries only in NEW (excluded from window view): {', '.join(added)}")
for i, k in enumerate(new["queries"]):
    if k not in old["queries"]:
        continue  # catalog growth, not a stall
    o, n = old["queries"][k], new["queries"][k]
    d = n - o
    if d > 0.9:
        hot.append((i, k, n, d, "ABS"))
    elif o > 0 and n >= 2 * o and d >= 0.15:
        hot.append((i, k, n, d, "RATIO"))
if hot:
    print("\ncatalog-position excess windows (>0.9s abs OR >=2x with +0.15s):")
    groups, cur = [], [hot[0]]
    for h in hot[1:]:
        if h[0] - cur[-1][0] <= 2:
            cur.append(h)
        else:
            groups.append(cur); cur = [h]
    groups.append(cur)
    for g in groups:
        tot = sum(x[3] for x in g)
        tag = " [short >=2x cluster — storm signature]" \
            if len(g) >= 2 and all(x[4] == "RATIO" for x in g) else ""
        print(f"  positions {g[0][0]}-{g[-1][0]}: +{tot:.1f}s over {len(g)} queries{tag}")
        for i, k, v, d, rule in g:
            ratio = v / max(1e-9, v - d)
            print(f"    {i:3d} {k:30s} {v:7.2f}s ({d:+.2f}, {ratio:.1f}x, {rule})")
    spread = sum(x[3] for x in hot)
    print(f"  window excess total: +{spread:.1f}s "
          f"(of {new['value'] - old['value']:+.1f}s total delta)")

# Self-corrected capture (round 15): Bench re-runs each storm-flagged
# window once after the sweep and emits value_remeasured (flagged queries'
# durations replaced by the post-sweep sample). Surface it so a reader of
# the diff sees the corrected total next to the raw one.
if "value_remeasured" in new and new.get("storm_windows"):
    vr = new["value_remeasured"]
    if abs(vr - new["value"]) > 0.05:
        print(f"\nNEW self-corrected total (storm windows remeasured "
              f"post-sweep): {vr:.1f}s (raw {new['value']:.1f}s, "
              f"{new['value'] - vr:+.1f}s storm excess confirmed by remeasure)")
        for w in new["storm_windows"]:
            rq = w.get("remeasured_queries", {})
            both = ", ".join(
                f"{q}: {new['queries'][q]:.2f}s->{rq[q]:.2f}s"
                for q in w.get("queries", []) if q in rq and rq[q] >= 0)
            print(f"  window pos {w['from_pos']}-{w['to_pos']}: {both}")
    else:
        print(f"\nNEW storm windows remeasured within 0.05s of raw total "
              f"— remeasure also sampled the storm or excess was real; "
              f"adjudicate against anchored medians")

#!/usr/bin/env python3
"""Synthetic-storm replay for bench_compare.py (round 15).

Builds two fake Bench captures — OLD at anchored speed, NEW with one
3-query storm window carrying post-sweep remeasures — runs the real
bench_compare.py on them, and asserts the corrected total line shows
the storm excess backed out. Run: python3 tools/test_bench_compare.py
"""
import json, subprocess, sys, tempfile, os

HERE = os.path.dirname(os.path.abspath(__file__))

def capture(queries, value, extra=None):
    cap = {"metric": "total", "value": value, "unit": "sec",
           "queries": queries, "sf": "synthetic", "errors": []}
    if extra:
        cap.update(extra)
    return cap

def main():
    base = {f"q{i}": 1.0 for i in range(10)}
    old = capture(base, sum(base.values()))

    # storm: positions 3-5 inflated 5x; remeasure finds them back at ~1s
    newq = dict(base)
    for q in ("q3", "q4", "q5"):
        newq[q] = 5.0
    storm = [{"from_pos": 3, "to_pos": 5, "queries": ["q3", "q4", "q5"],
              "excess_s": 12.0,
              "remeasured_s": 3.1,
              "remeasured_queries": {"q3": 1.0, "q4": 1.05, "q5": 1.05}}]
    raw_total = sum(newq.values())                      # 22.0
    corrected = raw_total - 15.0 + 3.1                  # 10.1
    new = capture(newq, raw_total,
                  {"value_remeasured": corrected, "storm_windows": storm})

    with tempfile.TemporaryDirectory() as d:
        po, pn = os.path.join(d, "old.json"), os.path.join(d, "new.json")
        json.dump(old, open(po, "w"))
        json.dump(new, open(pn, "w"))
        out = subprocess.run(
            [sys.executable, os.path.join(HERE, "bench_compare.py"), po, pn],
            capture_output=True, text=True, check=True).stdout

        assert "self-corrected total" in out, out
        assert "10.1s" in out, out              # corrected total shown
        assert "raw 22.0s" in out, out          # raw total shown beside it
        assert "q4: 5.00s->1.05s" in out, out   # both samples per query
        # the raw diff still shows the storm window signature
        assert "positions 3-5" in out, out

        # a capture whose remeasure matched the raw total (persistent storm)
        new2 = capture(newq, raw_total,
                       {"value_remeasured": raw_total, "storm_windows": storm})
        p2 = pn + "2"
        json.dump(new2, open(p2, "w"))
        out2 = subprocess.run(
            [sys.executable, os.path.join(HERE, "bench_compare.py"), po, p2],
            capture_output=True, text=True, check=True).stdout
        assert "adjudicate against anchored medians" in out2, out2

    print("OK test_bench_compare: corrected-total view renders both samples")

if __name__ == "__main__":
    main()

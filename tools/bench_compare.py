#!/usr/bin/env python3
"""Diff two Bench JSON lines (files containing {"metric":...}): per-query
delta sorted by regression size. Usage: bench_compare.py OLD NEW [top_n]
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

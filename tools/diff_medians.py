#!/usr/bin/env python3
"""Warmed-median diff between two BENCH_QUERIES.json files: flag queries
whose median moved >1.5x either way, plus any whose warmed median exceeds
its own first run (the state-accumulation tell). Compare against the last
CLEAN round's checked-in file — an environmentally-degraded run (r7) is
not a baseline. Usage: diff_medians.py <old.json> <new.json> [threshold]"""
import json, sys

old = json.load(open(sys.argv[1]))["queries"]
new = json.load(open(sys.argv[2]))["queries"]
th = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
rows = []
for q, vn in new.items():
    mn = vn["median_sec"]
    mo = old.get(q, {}).get("median_sec")
    if mo is None or mo <= 0 or mn <= 0:
        continue
    r = mn / mo
    if r > th or r < 1 / th:
        rows.append((q, mo, mn, r))
rows.sort(key=lambda x: x[3])
print("| query | old median s | new median s | ratio |")
print("| --- | --- | --- | --- |")
for q, mo, mn, r in rows:
    print(f"| {q} | {mo:.2f} | {mn:.2f} | x{r:.2f} |")
to = sum(v["median_sec"] for v in old.values() if v["median_sec"] > 0)
tn = sum(v["median_sec"] for v in new.values() if v["median_sec"] > 0)
print(f"\ntotals: old {to:.1f} s, new {tn:.1f} s (x{tn/to:.2f}); "
      f"{len(rows)} queries moved >{th}x of {len(new)}")
# medians that exceed their own first run (the r7 state-accumulation tell)
worse = [(q, v["first_sec"], v["median_sec"]) for q, v in new.items()
         if v["median_sec"] > 0 and v["first_sec"] > 0
         and v["median_sec"] > v["first_sec"]]
print(f"{len(worse)} queries with warmed median above their own first run")
for q, f, m in sorted(worse, key=lambda x: x[2] - x[1], reverse=True)[:10]:
    print(f"  {q}: first {f:.2f} median {m:.2f}")

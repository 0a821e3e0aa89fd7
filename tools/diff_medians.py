#!/usr/bin/env python3
"""r6-vs-r8 warmed-median diff: flag queries whose median moved >1.5x.
r7 medians are excluded (VERDICT adjudicated that run as environmentally
degraded). Usage: diff_medians.py <r6.json> <r8.json> [threshold]"""
import json, sys

r6 = json.load(open(sys.argv[1]))["queries"]
r8 = json.load(open(sys.argv[2]))["queries"]
th = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
rows = []
for q, v8 in r8.items():
    m8 = v8["median_sec"]
    m6 = r6.get(q, {}).get("median_sec")
    if m6 is None or m6 <= 0 or m8 <= 0:
        continue
    r = m8 / m6
    if r > th or r < 1 / th:
        rows.append((q, m6, m8, r))
rows.sort(key=lambda x: x[3])
print("| query | r6 median s | r8 median s | ratio |")
print("| --- | --- | --- | --- |")
for q, m6, m8, r in rows:
    print(f"| {q} | {m6:.2f} | {m8:.2f} | x{r:.2f} |")
t6 = sum(v["median_sec"] for v in r6.values() if v["median_sec"] > 0)
t8 = sum(v["median_sec"] for v in r8.values() if v["median_sec"] > 0)
print(f"\ntotals: r6 {t6:.1f} s, r8 {t8:.1f} s (x{t8/t6:.2f}); "
      f"{len(rows)} queries moved >{th}x of {len(r8)}")
# medians that exceed their own first run (the r7 state-accumulation tell)
worse = [(q, v["first_sec"], v["median_sec"]) for q, v in r8.items()
         if v["median_sec"] > 0 and v["first_sec"] > 0
         and v["median_sec"] > v["first_sec"]]
print(f"{len(worse)} queries with warmed median above their own first run")
for q, f, m in sorted(worse, key=lambda x: x[2] - x[1], reverse=True)[:10]:
    print(f"  {q}: first {f:.2f} median {m:.2f}")

#!/usr/bin/env python3
"""Warmed-median diff between two BENCH_QUERIES.json files: flag queries
whose median moved >1.5x either way, plus any whose warmed median exceeds
its own first run (the state-accumulation tell). Compare against the last
CLEAN round's checked-in file — an environmentally-degraded run (r7) is
not a baseline. Usage: diff_medians.py <old.json> <new.json> [threshold]"""
import json, sys

newdoc = json.load(open(sys.argv[2]))
old = json.load(open(sys.argv[1]))["queries"]
new = newdoc["queries"]
th = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

# sentinel-stretch annotation (r10): map each query (run order = sorted
# names) to the pair of sentinel probes bracketing it; if either probe
# ran >1.3x the sentinel median, tag the mover "env?" — it sits in an
# in-run drift stretch and needs an isolated retiming before belief.
env_tag = {}
series = newdoc.get("sentinel_series") or []
if len(series) > 2:
    med = sorted(e["sec"] for e in series)[len(series) // 2]
    names = sorted(new)
    marks = [e["after"] for e in series]       # "start", query names, "end"
    secs = [e["sec"] for e in series]
    for i, q in enumerate(names):
        seg = i // 25 if i // 25 + 1 < len(series) else len(series) - 2
        hot = max(secs[seg], secs[seg + 1]) > 1.3 * med
        env_tag[q] = " env?" if hot else ""

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
    tag = env_tag.get(q, "") if r > 1 else ""
    print(f"| {q}{tag} | {mo:.2f} | {mn:.2f} | x{r:.2f} |")
n_env = sum(1 for q, mo, mn, r in rows if r > th and env_tag.get(q))
if env_tag:
    print(f"\n'env?' = the mover ran inside a sentinel-inflated stretch "
          f"(probe >1.3x sentinel median): {n_env} of the slower movers")
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

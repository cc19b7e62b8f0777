"""Compare the r6 final bench runs against the driver's round-start
minimums (BENCH_r05.json queries_min). Usage: python scripts/compare_bench_r6.py"""

import glob
import json

r5 = json.load(open("BENCH_r05.json"))["parsed"]["queries_min"]
runs = [json.load(open(p)) for p in sorted(glob.glob("BENCH/bench_r6_final_*.json"))]
best = {}
for r in runs:
    for k, v in r["queries"].items():
        best[k] = min(best.get(k, 1e9), v)
total_best = min(r["value"] for r in runs)
rows = []
for k in r5:
    b = best.get(k)
    rows.append((k, r5[k], b, round(b / r5[k], 2) if b else None))
rows.sort(key=lambda t: -t[1])
print(f"{'query':28s} {'r5min':>7s} {'r6best':>7s} ratio")
for k, a, b, ratio in rows:
    print(f"{k:28s} {a:7.3f} {b:7.3f} {ratio:.2f}")
print("r5 total(min run):", json.load(open("BENCH_r05.json"))["parsed"]["value_min"])
print("r6 total best-of-runs:", total_best)
print("r6 sum of per-query bests:", round(sum(best.values()), 3))
print("kg best docs/s:", max(r["docs_per_sec"] for r in runs))

#!/usr/bin/env python3
"""Scale-slope table: full-battery sf1 (10x sf0.1) run vs the sf0.1
baselines. Emits a markdown tier table + the superlinear flag list for
PLANS.md. Usage: tools/sf1_slope.py /tmp/bench_sf1_r12.json [ratio_flag]

Interpretation at fixed local[32] parallelism: a perfectly linear
operator reads ~10x; scan-bound cheap queries read <10x (fixed overhead
amortizes); anything well past 10x is superlinear in data and gets
flagged. Graph queries on the copy-disjoint sf1 replication should stay
near-linear (10 disjoint copies of the sf0.1 graph; same diameter)."""
import json, re, sys

bench_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_sf1_r12.json"
FLAG = float(sys.argv[2]) if len(sys.argv) > 2 else 14.0  # 10x data + 40% headroom

sf1 = json.load(open(bench_path))["queries"]
base = {}
for line in open("BASELINE.md"):
    m = re.match(r"\|\s*(q[\w\d]+)\s*\|\s*([\d.]+)\s*\|", line)
    if m:
        base[m.group(1)] = float(m.group(2))

rows = []
for q, t in sf1.items():
    if q in base and base[q] > 0:
        rows.append((q, base[q], t, t / base[q]))
rows.sort(key=lambda r: -r[3])

tiers = [
    ("superlinear flag (>%.0fx)" % FLAG, lambda r: r > FLAG),
    ("near-linear (7-14x)", lambda r: 7 <= r <= FLAG),
    ("sublinear 3-7x (shuffle/agg-bound, overhead amortizing)", lambda r: 3 <= r < 7),
    ("overhead-bound <3x (fixed cost dominates at this SF)", lambda r: r < 3),
]
total_sf1 = sum(t for _, _, t, _ in rows)
total_base = sum(b for _, b, _, _ in rows)
print(f"battery: {len(rows)} queries, sf0.1 baseline total {total_base:.1f} s, "
      f"sf1 total {total_sf1:.1f} s, aggregate slope {total_sf1/total_base:.2f}x at 10x data\n")
for name, pred in tiers:
    sel = [r for r in rows if pred(r[3])]
    print(f"### {name} — {len(sel)} queries")
    if name.startswith("superlinear") or len(sel) <= 25:
        print("| query | sf0.1 base (s) | sf1 (s) | slope |")
        print("| --- | --- | --- | --- |")
        for q, b, t, r in sel:
            print(f"| {q} | {b:.3f} | {t:.3f} | {r:.1f}x |")
    else:
        worst = sel[:8]
        print("worst 8: " + ", ".join(f"{q} {r:.1f}x" for q, b, t, r in worst))
    print()
missing = sorted(set(sf1) - set(base))
if missing:
    print("no baseline:", ", ".join(missing))

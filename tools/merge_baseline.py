#!/usr/bin/env python3
"""Merge N full-bench dumps (graft.Bench BENCH_FULL.json lines) into the
BASELINE.md methodology's entry set: per-query BEST (min) of the per-run
medians — per-run medians bound JIT/GC noise, the cross-run min removes
ambient host contention. Prints a markdown table sorted slowest-first,
plus a summary line."""
import json
import sys


def main(paths):
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append(json.load(f))
    failed = {}
    for r in runs:
        failed.update(r.get("failed", {}))
    if failed:
        print("FAILED QUERIES (excluded):", file=sys.stderr)
        for k, v in sorted(failed.items()):
            print(f"  {k}: {v}", file=sys.stderr)
    names = sorted(set().union(*[r["queries"].keys() for r in runs]))
    best = {}
    for n in names:
        vals = [r["queries"][n] for r in runs if n in r["queries"]
                and r["queries"][n] < 1e8]
        if vals:
            best[n] = min(vals)
    total = sum(best.values())
    print(f"<!-- merged from {len(runs)} runs; {len(best)} queries; "
          f"total of minima {total:.1f} s -->")
    print("| query | median (s) |")
    print("| --- | --- |")
    for n, v in sorted(best.items(), key=lambda kv: -kv[1]):
        print(f"| {n} | {v:.3f} |")


if __name__ == "__main__":
    main(sys.argv[1:])

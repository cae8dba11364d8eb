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
    names = sorted(set().union(*[r["queries"].keys() for r in runs]))
    best, fail_counts = {}, {}
    for n in names:
        vals = [r["queries"][n] for r in runs if n in r["queries"]
                and r["queries"][n] < 1e8]
        fails = sum(1 for r in runs if n in r.get("failed", {}))
        if fails:
            fail_counts[n] = fails
        if vals:
            best[n] = min(vals)
    # only all-runs failures are excluded from the table; partial failures
    # keep their successful-run minimum and are reported as flaky
    for n, k in sorted(fail_counts.items()):
        if n in best:
            print(f"FLAKY {n}: failed {k}/{len(runs)} runs; "
                  f"min of successes used", file=sys.stderr)
        else:
            print(f"EXCLUDED {n}: failed all {len(runs)} runs", file=sys.stderr)
    total = sum(best.values())
    print(f"<!-- merged from {len(runs)} runs; {len(best)} queries; "
          f"total of minima {total:.1f} s -->")
    print("| query | min of medians (s) |")
    print("| --- | --- |")
    for n, v in sorted(best.items(), key=lambda kv: -kv[1]):
        print(f"| {n} | {v:.3f} |")


if __name__ == "__main__":
    main(sys.argv[1:])

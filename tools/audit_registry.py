#!/usr/bin/env python3
"""Registry/artifact consistency audit.

Every registered query must appear in ALL of:
  - BENCH_FULL.json   (the committed full battery)
  - BASELINE.md       (an sf0.1 anchor row `| q_name | sec |`)
  - SCALE_r{N}.json   (an sf1 slope row)
A query missing an anchor is silently skipped by BOTH the bench gate
and the scale gate (this hid q_fail_route for half of round 13), so
the audit fails loudly on any asymmetric set difference.

Usage: python3 tools/audit_registry.py [SCALE_rNN.json]
Exit 1 on any inconsistency.
"""
import json
import os
import re
import sys
import glob

# repo root = parent of this script's directory (tools/..), not a
# hardcoded path — the audit must run from any checkout location
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
scale_path = sys.argv[1] if len(sys.argv) > 1 else sorted(
    glob.glob(f"{repo}/SCALE_r*.json"))[-1]

bench = set(json.load(open(f"{repo}/BENCH_FULL.json"))["queries"])
scale = set(json.load(open(scale_path))["queries"])
anchors = set(re.findall(r"^\| (q[\w]*) \| [\d.]+ \|$",
                         open(f"{repo}/BASELINE.md").read(), re.M))

# streaming surfaces ride the bench JSON but are not registry queries
bench = {q for q in bench if q.startswith("q")}

bad = False
for name, a, b in [("BENCH_FULL vs anchors", bench, anchors),
                   ("BENCH_FULL vs SCALE", bench, scale)]:
    only_a, only_b = sorted(a - b), sorted(b - a)
    if only_a or only_b:
        bad = True
        print(f"MISMATCH {name}: only-left={only_a} only-right={only_b}")
    else:
        print(f"OK {name}: {len(a)} queries aligned")

sys.exit(1 if bad else 0)

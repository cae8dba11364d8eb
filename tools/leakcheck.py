#!/usr/bin/env python3
"""Local leak scan over the repo's source tree -- the builder-side
mirror of the driver's seven-category LEAKCHECK, with the provenance
fields the round-14 advice asked for (an ISO timestamp and the scanned
file count), so a re-run is distinguishable from a round-field edit.

Categories mirror the driver artifact's keys. Patterns are generic
hygiene checks: anything that looks like a non-public import namespace,
a non-public URL, a cloud bucket URI, a chat link, an API-key-shaped
literal, or an internal-env-shaped variable. Zero hits expected; any
hit prints file:line and fails the exit code.

Usage: python3 tools/leakcheck.py [out.json]
"""
import datetime
import json
import os
import re
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
out_path = sys.argv[1] if len(sys.argv) > 1 else None

# public namespaces the codebase legitimately imports; lowercase
# single-segment imports (spark.implicits._, s.implicits._) are local
# vals in scope, not packages
PUBLIC_IMPORT = re.compile(
    r"^\s*import\s+(?:static\s+)?(scala|java|javax|org\.apache|org\.scalatest"
    r"|org\.scalacheck|org\.slf4j|org\.xml|graft|[a-z][A-Za-z0-9]*\."
    r"|[A-Z])")  # leading-uppercase = same-package relative import
IMPORT = re.compile(r"^\s*import\s+[A-Za-z_]")
CATEGORIES = {
    # real-TLD URLs outside the public allowlist (specs use obviously
    # fake hosts — http://h/p, http://url/x, h.org — which don't match)
    "internal-url": re.compile(
        r"https?://(?![\w.-]*example\.|localhost|127\.0\.0\.1|0\.0\.0\.0"
        r"|github\.com|raw\.githubusercontent)"
        r"[\w.-]*\.(com|net|io|ai|dev|cloud|corp|internal|co)\b"),
    "internal-bucket": re.compile(r"\b(s3a?|gs|abfss?|wasbs?)://[\w.-]+"),
    "slack-link": re.compile(r"slack\.com|app\.slack|\bgo/[a-z][\w-]{2,}"),
    "api-key": re.compile(
        r"\b(AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|xox[baprs]-[\w-]{10,}"
        r"|ghp_[A-Za-z0-9]{36}|AIza[0-9A-Za-z_-]{35})\b"),
    "axon-env": re.compile(r"\b[A-Z]{2,}_(INTERNAL|SECRET|PROD)_[A-Z_]+\b"),
}

SCAN_EXT = {".scala", ".py", ".md", ".sbt", ".json", ".sh"}
SKIP_DIRS = {"target", ".git", "spark-warehouse", ".claude", ".bsp"}
SKIP_FILES = re.compile(r"^LEAKCHECK.*\.json$")

hits = {k: [] for k in CATEGORIES}
hits["internal-import"] = []
# Dead category retired in round 16 (its pattern family no longer exists
# in any scanned file class), kept as an always-empty key so the local
# artifact stays key-compatible with the driver's LEAKCHECK.json, which
# still emits it (round-16 verdict item 7: identical category sets).
hits["internal-pkg2"] = []
n_files = 0
for root, dirs, files in os.walk(repo):
    dirs[:] = [d for d in dirs if d not in SKIP_DIRS]
    for f in files:
        if os.path.splitext(f)[1] not in SCAN_EXT or SKIP_FILES.match(f):
            continue
        p = os.path.join(root, f)
        rel = os.path.relpath(p, repo)
        n_files += 1
        try:
            text = open(p, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        for i, line in enumerate(text.splitlines(), 1):
            if rel.endswith(".scala") and IMPORT.match(line) \
                    and not PUBLIC_IMPORT.match(line):
                hits["internal-import"].append(f"{rel}:{i}: {line.strip()[:120]}")
            for cat, pat in CATEGORIES.items():
                if pat.search(line):
                    hits[cat].append(f"{rel}:{i}: {line.strip()[:120]}")

n_hits = sum(len(v) for v in hits.values())
artifact = {
    "scanned_at": datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds"),
    "scanned_files": n_files,
    "n_hits": n_hits,
    "hits": hits,
}
body = json.dumps(artifact, indent=2)
if out_path:
    with open(out_path, "w") as fh:
        fh.write(body + "\n")
print(body if n_hits else
      f"clean: 0 hits across {n_files} files at {artifact['scanned_at']}")
sys.exit(1 if n_hits else 0)

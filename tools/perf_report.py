#!/usr/bin/env python3
"""Regenerate the measured-numbers section of PERF.md from bench_out.json.

Claims in PERF.md drifted from measurement twice (r3, r4 verdicts), so
the headline block is now machine-written: run the bench, then this
script, and the section between the BEGIN/END markers is replaced with
numbers read straight from the bench output. Everything outside the
markers is hand-maintained design prose.

Usage: python3 tools/perf_report.py [bench_out.json] [PERF.md]
"""
import json
import sys

BENCH = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
PERF = sys.argv[2] if len(sys.argv) > 2 else "PERF.md"
BEGIN = "<!-- BEGIN GENERATED from bench_out.json (tools/perf_report.py) -->"
END = "<!-- END GENERATED -->"

b = json.load(open(BENCH))
qs = sorted(b["queries"].items(), key=lambda kv: -kv[1])

lines = [BEGIN, ""]
lines.append(
    f"Bench (local[32], `{b['sf']}`, `graft.Bench`, median of "
    f"{b.get('reps', 1)} reps per query): **{b['n_queries']} queries, "
    f"{b['value']:.1f} s total, {b['n_errors']} errors**.")
lines.append("")
lines.append("Slowest 12 (median seconds):")
lines.append("")
lines.append("| Query | s | Query | s |")
lines.append("|---|---|---|---|")
top = qs[:12]
for i in range(0, len(top), 2):
    l = top[i]
    r = top[i + 1] if i + 1 < len(top) else ("", "")
    rs = f"{r[1]:.2f}" if r[0] else ""
    lines.append(f"| {l[0]} | {l[1]:.2f} | {r[0]} | {rs} |")
lines.append("")
lines.append(END)

text = open(PERF).read()
i, j = text.find(BEGIN), text.find(END)
if i < 0 or j < 0:
    sys.exit(f"markers not found in {PERF}; add {BEGIN} / {END} first")
open(PERF, "w").write(text[:i] + "\n".join(lines) + text[j + len(END):])
print(f"updated {PERF}: {b['n_queries']} queries, {b['value']:.1f}s")

#!/usr/bin/env python3
"""Compare a BENCH_LATEST.json run against BASELINE.md §4 budgets.

Usage: python3 tools/budget_check.py [BENCH_LATEST.json]

Prints queries missing a budget row, queries over budget, and the
markdown rows to append for new queries (budget = max(1.0, 2 x median),
the BASELINE.md §4 derivation).
"""
import json
import re
import sys

bench_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LATEST.json"
with open(bench_path) as f:
    bench = json.load(f)
queries = bench["queries"]
mins = bench.get("queries_min", {})

with open("BASELINE.md") as f:
    base = f.read()
budget = {}
for m in re.finditer(r"^\| ([a-z0-9_]+) \| ([\d.]+) \| ([\d.]+) \| ([\d.]+) \|",
                     base, re.M):
    budget[m.group(1)] = float(m.group(4))

missing = sorted(set(queries) - set(budget))
over = {q: (queries[q], budget[q]) for q in queries
        if q in budget and queries[q] > budget[q]}

print(f"bench queries: {len(queries)}  budget rows: {len(budget)}")
print(f"errors: {bench.get('errors', [])}")
if missing:
    print("\nmissing budget rows (markdown to insert):")
    for q in missing:
        med = queries[q]
        mn = mins.get(q, med)
        b = max(1.0, 2 * med)
        print(f"| {q} | {med:.2f} | {mn:.2f} | {b:.1f} |")
if over:
    print("\nOVER BUDGET:")
    for q, (t, b) in sorted(over.items(), key=lambda kv: -kv[1][0] and 0):
        print(f"  {q}: {t:.2f}s vs budget {b:.1f}s ({t/b:.2f}x)")
else:
    print("\nzero queries over budget")

#!/usr/bin/env python3
"""Cross-round / cross-scale bench comparison tables.

Usage:
  python3 tools/bench_delta.py A.json B.json [--arm warm|cold] [--top N]

Prints a markdown table of per-query seconds and the B/A ratio, sorted
by ratio descending (worst first), plus totals. Queries present in only
one file are listed separately (new/removed). The --arm flag picks
which arm to read from EACH file: `warm` = the min-of-two `queries`
map (comparable to every pre-r14 record), `cold` = the r14+
`queries_cold` map (falls back to `queries` with a loud note if a file
predates the cold arm — e.g. r13 records).

This is the round ritual's adjudication step: diff sf1-vs-sf1 across
rounds (superlinear creep shows here first) and sf1-vs-sf0.1 within a
round (the 10x scaling ratio), cold-vs-cold from r14 on.
"""
import json
import sys

args = [a for a in sys.argv[1:] if not a.startswith("--")]
arm = "warm"
top = 0
for a in sys.argv[1:]:
    if a.startswith("--arm"):
        arm = a.split("=", 1)[1] if "=" in a else "cold"
    if a.startswith("--top"):
        top = int(a.split("=", 1)[1])
fa, fb = args[0], args[1]


def load(path):
    with open(path) as f:
        txt = f.read()
    # bench files are one JSON object; driver BENCH_r*.json may wrap it
    start = txt.find('{"metric"')
    d = json.loads(txt[start:] if start >= 0 else txt)
    key = "queries_cold" if arm == "cold" else "queries"
    if key not in d:
        print(f"NOTE: {path} has no '{key}' arm (pre-r14 record?); "
              f"falling back to 'queries' (warm min)")
        key = "queries"
    qs = {k: v for k, v in d[key].items() if v >= 0}
    return qs


qa, qb = load(fa), load(fb)
shared = sorted(set(qa) & set(qb))
rows = [(q, qa[q], qb[q], (qb[q] / qa[q]) if qa[q] > 0 else float("inf"))
        for q in shared]
rows.sort(key=lambda r: -r[3])
if top:
    rows = rows[:top]
print(f"| query | {fa.split('/')[-1]} | {fb.split('/')[-1]} | ratio |")
print("|---|---|---|---|")
for q, a, b, r in rows:
    print(f"| {q} | {a:.2f} | {b:.2f} | {r:.1f}x |")
ta = sum(qa[q] for q in shared)
tb = sum(qb[q] for q in shared)
print(f"| **total (shared {len(shared)})** | **{ta:.1f}** | **{tb:.1f}** "
      f"| **{tb / ta:.2f}x** |")
only_a = sorted(set(qa) - set(qb))
only_b = sorted(set(qb) - set(qa))
if only_a:
    print(f"\nonly in {fa}: {', '.join(only_a)}")
if only_b:
    print(f"\nonly in {fb}: "
          + ", ".join(f"{q} ({qb[q]:.2f}s)" for q in only_b))

#!/usr/bin/env python3
"""Compare a bench artifact's per-query walls against a reference
artifact at a different scale factor — the sf1.0 rehearsal's
super-linearity screen (r10 verdict #5).

Usage: compare_walls.py <candidate BENCH_full.json> <reference BENCH_full.json> [ratio_limit]

Flags queries whose wall ratio exceeds ratio_limit (default 10 = the
data-scale ratio sf1.0/sf0.1) with an absolute floor of 1s over the
reference (sub-second queries are fixed-cost dominated and legitimately
scale sub-linearly; a 0.1 s -> 1.2 s move is noise, not a cliff).
Queries present in only one artifact (removed, crashed-before-run, or
newly added) are flagged MISSING — a vanished query must not silently
pass the screen.
"""
import json, sys

cand = json.load(open(sys.argv[1]))
ref = json.load(open(sys.argv[2]))
limit = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

cq = {**cand["queries"], **cand.get("headline", {})}
rq = {**ref["queries"], **ref.get("headline", {})}
rows = []
for k in sorted(set(cq) | set(rq)):
    c, r = cq.get(k), rq.get(k)
    if c is None or r is None:
        rows.append((float("inf"), k, c, r, "MISSING"))
        continue
    ratio = c / r if r > 0 else float("inf")
    flag = "SUPRALINEAR" if (ratio > limit and c - r > 1.0) else ""
    rows.append((ratio, k, c, r, flag))


def fmt(v):
    return f"{v:8.3f}" if v is not None else "    null"


rows.sort(key=lambda x: x[0], reverse=True)
print(f"{'ratio':>8}  {'cand_s':>8}  {'ref_s':>8}  query")
for ratio, k, c, r, flag in rows[:25]:
    print(f"{ratio:8.2f}  {fmt(c)}  {fmt(r)}  {k} {flag}")
bad = [x for x in rows if x[4]]
tc = sum(v for v in cq.values() if v is not None)
tr = sum(v for v in rq.values() if v is not None)
print(f"\ntotals: candidate {tc:.1f}s vs reference {tr:.1f}s "
      f"(x{tc/tr:.2f} at x{limit:.0f} data)")
print(f"flagged: {len(bad)}")
for _, k, c, r, f in bad:
    print(f"  {k}: {fmt(r).strip()}s -> {fmt(c).strip()}s  {f}")
sys.exit(1 if bad else 0)

#!/usr/bin/env python
"""Per-query bench deltas between two rounds (VERDICT r1 "Next round" #3).

Usage:
    python tools/bench_compare.py PREV.json CURR.json [--threshold 2.0]

Accepts either the raw one-line ``bench.py`` output or the driver's
``BENCH_r{N}.json`` wrapper (which nests the bench line under "parsed").
Prints a markdown table sorted by ratio (curr/prev) descending and exits
non-zero if any query regressed beyond the threshold — the same bar the
judge applies (>2x its anchor needs a plan diff in the ledger).
"""

from __future__ import annotations

import argparse
import json
import sys


def load_bench(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    if "parsed" in d and isinstance(d["parsed"], dict):
        return d["parsed"]
    # driver wrapper with the bench line buried in captured output
    tail = d.get("tail", "")
    for line in tail.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    raise SystemExit(f"{path}: no bench payload found")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("prev")
    ap.add_argument("curr")
    ap.add_argument("--threshold", type=float, default=2.0)
    args = ap.parse_args()

    prev, curr = load_bench(args.prev), load_bench(args.curr)
    pq, cq = prev["queries"], curr["queries"]
    names = sorted(set(pq) | set(cq))

    rows = []
    for n in names:
        p, c = pq.get(n), cq.get(n)
        ratio = (c / p) if (p and c and p > 0) else None
        rows.append((n, p, c, ratio))
    rows.sort(key=lambda r: -(r[3] or 0))

    print(f"| query | prev s | curr s | ratio |")
    print(f"|---|---|---|---|")
    regressed = []
    for n, p, c, ratio in rows:
        rs = f"{ratio:.2f}x" if ratio is not None else "new/gone"
        flag = ""
        if ratio is not None and ratio > args.threshold:
            flag = " ⚠"
            regressed.append(n)
        ps = f"{p:.2f}" if p is not None else "—"
        cs = f"{c:.2f}" if c is not None else "—"
        print(f"| {n} | {ps} | {cs} | {rs}{flag} |")
    tp = prev.get("value")
    tc = curr.get("value")
    if tp and tc:
        print(f"\ntotal: {tp:.1f}s -> {tc:.1f}s ({tc / tp:.2f}x)")
    if regressed:
        print(f"\nREGRESSED >{args.threshold}x: {', '.join(regressed)}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

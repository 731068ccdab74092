#!/usr/bin/env python3
"""Per-family scaling exponents from bench/history.jsonl.

Usage: python3 scripts/exponents.py <sf_small_suffix> <sf_big_suffix> [decades]

Picks the LATEST history entry whose "sf" path ends with each suffix,
joins per-query times, and prints per-family and per-query exponents
log10(t_big/t_small)/decades (1.0 = linear in data, ~0 = floor-bound).
Only queries present in both runs are compared.
"""
import json
import math
import sys


def latest(suffix):
    hit = None
    for line in open("bench/history.jsonl"):
        d = json.loads(line)
        if d.get("sf", "").endswith(suffix):
            hit = d
    if hit is None:
        sys.exit(f"no history entry for sf suffix {suffix}")
    return hit


def main():
    small_sfx, big_sfx = sys.argv[1], sys.argv[2]
    decades = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    small, big = latest(small_sfx), latest(big_sfx)
    qs, qb = small["queries"], big["queries"]
    common = sorted(set(qs) & set(qb))
    print(f"# {len(common)} common queries; small={small['sf']} big={big['sf']}")
    fams = {}
    for q in common:
        f = q.split("_")[0].rstrip("0123456789")
        fams.setdefault(f, [0.0, 0.0])
        fams[f][0] += qs[q]
        fams[f][1] += qb[q]
    ts = sum(qs[q] for q in common)
    tb = sum(qb[q] for q in common)
    print(f"total: {ts:.1f} s -> {tb:.1f} s  exp {math.log10(tb / ts) / decades:.2f}")
    print("\n## families (small_s, big_s, exponent)")
    for f, (a, b) in sorted(fams.items(), key=lambda kv: -kv[1][1]):
        print(f"{f}\t{a:.2f}\t{b:.2f}\t{math.log10(b / a) / decades:.2f}")
    print("\n## slowest 25 at big SF (small_s, big_s, exponent)")
    for q in sorted(common, key=lambda q: -qb[q])[:25]:
        print(f"{q}\t{qs[q]:.2f}\t{qb[q]:.2f}\t{math.log10(qb[q] / qs[q]) / decades:.2f}")


if __name__ == "__main__":
    main()

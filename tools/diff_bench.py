#!/usr/bin/env python3
"""Dev-only bench regression diff.

Compares per-query timings between two bench records (BENCHDETAIL.json, or
any BENCH_r*.json whose `parsed`/raw line carries a "queries" map) and
prints queries whose delta exceeds the shared-host noise band.

Usage: python3 tools/diff_bench.py <old.json> <new.json> [threshold=0.25]
"""
import json
import sys


def load_queries(path):
    with open(path) as f:
        raw = f.read().strip()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        # driver BENCH files may wrap or truncate; try the last {...} line
        line = [l for l in raw.splitlines() if l.strip().startswith("{")][-1]
        d = json.loads(line)
    if isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    return d.get("queries", {}), d.get("value")


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    old_q, old_total = load_queries(old_path)
    new_q, new_total = load_queries(new_path)
    common = sorted(set(old_q) & set(new_q))
    print(f"total: {old_total} -> {new_total} s; "
          f"{len(common)} common queries, {len(set(new_q) - set(old_q))} new, "
          f"{len(set(old_q) - set(new_q))} removed")
    flagged = []
    for q in common:
        a, b = old_q[q], new_q[q]
        if a <= 0 or b <= 0:
            flagged.append((q, a, b, "FAILED" if b < 0 else "was-failed"))
            continue
        rel = (b - a) / a
        if abs(rel) > thresh and abs(b - a) > 0.2:
            flagged.append((q, a, b, f"{rel:+.0%}"))
    if not flagged:
        print(f"no per-query delta beyond ±{thresh:.0%} (and >0.2 s)")
    for q, a, b, tag in sorted(flagged, key=lambda r: -abs(r[2] - r[1])):
        print(f"  {q}: {a:.3f} -> {b:.3f} s  {tag}")


if __name__ == "__main__":
    main()

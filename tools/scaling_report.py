#!/usr/bin/env python3
"""Join two full-registry Bench JSONs (sf0.1 and /tmp/sf1) into the
BENCH_SCALING.md ratio table. Driver-side tooling like check.py.

Usage: python3 tools/scaling_report.py /tmp/bench_all_sf01.json /tmp/bench_all_sf1.json
Prints a markdown table sorted by ratio desc, flagging entries > 3x.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.loads(f.read())
    return d["queries"]


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    rows = []
    for k, t01 in a.items():
        t1 = b.get(k)
        if t1 is None or t01 <= 0 or t1 <= 0:
            continue
        rows.append((k, t01, t1, t1 / t01))
    rows.sort(key=lambda r: -r[3])
    print("| entry | sf0.1 | sf1 (10x) | ratio |")
    print("|---|---|---|---|")
    for k, t01, t1, r in rows:
        flag = " **FLAG**" if r > 3.0 else ""
        print(f"| {k} | {t01:.2f} | {t1:.2f} | {r:.1f}x{flag} |")
    over = [k for k, _, _, r in rows if r > 3.0]
    print(f"\nentries: {len(rows)}; over 3x: {len(over)} -> {over}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Merge the sf10 selfcheck logs (serial prefix + parallel splits +
serial classifier batch) into one per-query tally table, newest
result per query winning. Usage:
    python3 scripts/sf10_tally.py LOG [LOG...] > tally.md
"""
import re
import sys


def main():
    results = {}
    for logf in sys.argv[1:]:
        try:
            lines = open(logf).read().splitlines()
        except FileNotFoundError:
            continue
        for line in lines:
            m = re.match(r"(PASS|FAIL|ROWS)\s+(\S+): (.*)", line)
            if m:
                status, name, detail = m.groups()
                results[name] = (status, detail.strip())
    n_pass = sum(1 for s, _ in results.values() if s == "PASS")
    n_fail = sum(1 for s, _ in results.values() if s == "FAIL")
    n_rows = sum(1 for s, _ in results.values() if s == "ROWS")
    print(f"| query | status | detail |")
    print(f"| --- | --- | --- |")
    for name in sorted(results):
        status, detail = results[name]
        mark = {"PASS": "✅", "FAIL": "❌", "ROWS": "rows-only"}[status]
        print(f"| {name} | {mark} | {detail[:110]} |")
    print()
    print(f"**{n_pass} pass, {n_fail} fail, {n_rows} rows-only "
          f"({len(results)} total)**")


if __name__ == "__main__":
    main()

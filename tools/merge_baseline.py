"""Merge a fresh .bench_latest.json into BASELINE.md's canonical
per-query minima table: keep the min of (existing, new) per query, add
rows for queries not yet in the table (dated today), and report any
query whose new time exceeds 2x its recorded minimum (the bench gate).

Usage: python tools/merge_baseline.py [--write]
"""

from __future__ import annotations

import datetime
import json
import re
import sys

BASELINE = "BASELINE.md"
BENCH = ".bench_latest.json"
ROW = re.compile(r"^\| (\S+) \| 0\.1 \| ([0-9.]+) \| (\d{4}-\d{2}-\d{2}) \|$")


def main() -> int:
    write = "--write" in sys.argv
    today = datetime.date.today().isoformat()
    bench = json.load(open(BENCH))
    times = bench["queries"] if "queries" in bench else bench
    lines = open(BASELINE).read().splitlines(keepends=False)
    table: dict[str, tuple[float, str]] = {}
    first_row = last_row = None
    for i, ln in enumerate(lines):
        m = ROW.match(ln)
        if m:
            table[m.group(1)] = (float(m.group(2)), m.group(3))
            if first_row is None:
                first_row = i
            last_row = i
    assert first_row is not None, "no minima table found"
    # The splice below replaces lines[first_row..last_row] wholesale —
    # refuse to run if anything non-row sits inside that span (a
    # header or second table would be silently deleted otherwise).
    for i in range(first_row, last_row + 1):
        assert ROW.match(lines[i]), (
            f"non-table line inside the minima span at {i + 1}: "
            f"{lines[i]!r} — refusing to rewrite"
        )
    breaches, improved, added = [], 0, 0
    for q, t in sorted(times.items()):
        if not isinstance(t, (int, float)):
            continue
        if q in table:
            old, d = table[q]
            if t > 2 * old:
                breaches.append((q, t, old))
            if t < old:
                table[q] = (round(t, 3), d)
                improved += 1
        else:
            table[q] = (round(t, 3), today)
            added += 1
    stale = [q for q in table if q not in times]
    new_rows = [
        f"| {q} | 0.1 | {v:.3f} | {d} |" for q, (v, d) in sorted(table.items())
    ]
    out = lines[:first_row] + new_rows + lines[last_row + 1 :]
    print(
        f"{len(table)} rows ({added} added, {improved} improved), "
        f"{len(breaches)} breaches, {len(stale)} stale"
    )
    for q, t, old in breaches:
        print(f"  BREACH {q}: {t:.2f}s vs min {old:.2f}s = {t/old:.2f}x")
    for q in stale:
        print(f"  STALE (not in bench): {q}")
    if write:
        open(BASELINE, "w").write("\n".join(out) + "\n")
        print("BASELINE.md updated")
    return 1 if breaches else 0


if __name__ == "__main__":
    sys.exit(main())

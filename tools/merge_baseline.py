"""Merge a fresh .bench_latest.json into BASELINE.md's canonical
per-query minima table: keep the min of (existing, new) per query, add
rows for queries not yet in the table (dated today), and report any
query whose new time exceeds 2x its recorded minimum (the bench gate).

Usage: python tools/merge_baseline.py [--write]
"""

from __future__ import annotations

import datetime
import json
import os
import re
import sys

BASELINE = "BASELINE.md"
BENCH = ".bench_latest.json"
# sf is captured, not pinned — a future row at another scale factor
# must neither be dropped from the table nor trip the span assertion
# (round-5 advice).
ROW = re.compile(
    r"^\| (\S+) \| ([0-9.]+) \| ([0-9.]+) \| (\d{4}-\d{2}-\d{2}) \|$"
)


def main() -> int:
    write = "--write" in sys.argv
    today = datetime.date.today().isoformat()
    bench = json.load(open(BENCH))
    times = bench["queries"] if "queries" in bench else bench
    bench_sf = str(bench.get("sf", "0.1")) if isinstance(bench, dict) else "0.1"
    lines = open(BASELINE).read().splitlines(keepends=False)
    table: dict[tuple[str, str], tuple[float, str]] = {}
    first_row = last_row = None
    for i, ln in enumerate(lines):
        m = ROW.match(ln)
        if m:
            table[(m.group(1), m.group(2))] = (float(m.group(3)), m.group(4))
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
    # Arrow-floor policy (BASELINE.md "Arrow-path gate policy"): a
    # Python-worker-bound query cannot measure below one Arrow
    # round-trip no matter the data size, so its 2x gate reference is
    # max(recorded minimum, ARROW_FLOOR_S).
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import ARROW_FLOOR_S, ARROW_PATH_QUERIES  # noqa: E402

    breaches, improved, added = [], 0, 0
    for q, t in sorted(times.items()):
        if not isinstance(t, (int, float)):
            continue
        key = (q, bench_sf)
        if key in table:
            old, _ = table[key]
            gate_ref = max(old, ARROW_FLOOR_S) if q in ARROW_PATH_QUERIES else old
            if t > 2 * gate_ref:
                breaches.append((q, t, gate_ref))
            if t < old:
                # the date tracks the MEASUREMENT that set the minimum
                # (round-5 advice) — an improved row is a new record
                table[key] = (round(t, 3), today)
                improved += 1
        else:
            table[key] = (round(t, 3), today)
            added += 1
    stale = [q for (q, sf) in table if sf == bench_sf and q not in times]
    new_rows = [
        f"| {q} | {sf} | {v:.3f} | {d} |"
        for (q, sf), (v, d) in sorted(table.items())
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

"""Enumerate unpartitioned logical Window nodes per registered query.

A ``Window`` with an empty PARTITION BY moves its whole input through
one task (Spark's "No Partition Defined" warning). That is fine over a
provably bounded spine (25 nations, ~80 months, fixed bucket counts,
bucket summaries from operators/ranking.py) and fatal over a frame
that grows with a dimension. This scanner feeds the sanction list in
``tests/test_plans.py::test_unpartitioned_windows_sanctioned``.

Usage: python tools/scan_unpartitioned_windows.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdf_mapreduce_joins_spark import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def count_unpartitioned_windows(df) -> int:
    """Walk the optimized logical plan counting Window nodes whose
    partitionSpec is empty (py4j tree walk; logical plan so the count
    is AQE-independent)."""
    n = 0
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
        ):
            n += 1
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))
    return n


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("scan-windows")
    rows = []
    for name, fn in entrymod.queries().items():
        try:
            rows.append((name, count_unpartitioned_windows(fn(spark, sf_dir))))
        except Exception as exc:  # pragma: no cover - diagnostic tool
            rows.append((name, f"ERR {type(exc).__name__}: {exc}"))
    for name, n in rows:
        if n:
            print(f"{name}\t{n}")
    total = sum(n for _, n in rows if isinstance(n, int))
    print(f"# total unpartitioned windows: {total}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

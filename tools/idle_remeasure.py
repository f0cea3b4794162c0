"""Idle tight-loop re-measure for the BASELINE.md supersede sweep
(VERDICT r7 #1b): min-of-N wall-clock per query at one scale factor,
measured back-to-back in a single warm session — the reproducibility
probe for minima rows the driver's loaded bench run flagged >2x.

Usage:
    python tools/idle_remeasure.py [--reps N] [--sf-dir DIR] query ...

Prints one JSON line {"sf_dir": ..., "reps": N, "times": {name: min}}.
Unlike bench.py (suite-interleaved reps), the tight loop reaches each
query's codegen/JIT steady state, so the printed min is the number an
idle host can actually reproduce — the honest gate reference.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdf_mapreduce_joins_spark import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    reps, sf_dir = 8, "/root/testdata/sf0.1"
    while args and args[0].startswith("--"):
        flag = args.pop(0)
        if flag == "--reps":
            reps = int(args.pop(0))
        elif flag == "--sf-dir":
            sf_dir = args.pop(0)
        else:
            print(f"unknown flag {flag}", file=sys.stderr)
            return 2
    if not args:
        print(__doc__, file=sys.stderr)
        return 2
    qs = entrymod.queries()
    unknown = [n for n in args if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    spark = get_spark("idle-remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm
    times: dict[str, float] = {}
    for name in args:
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            t = round(time.perf_counter() - t0, 3)
            best = t if best is None else min(best, t)
            # Free persist/localCheckpoint blocks between reps (same
            # rationale as spot_bench.py): otherwise heavy queries
            # measure storage-eviction pressure, not the plan.
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        times[name] = best
        print(f"{name}: {best}s", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "times": times}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

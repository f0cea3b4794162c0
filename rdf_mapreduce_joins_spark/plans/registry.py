"""Query registry: name → (Spark builder, DuckDB oracle SQL).

Each declared query from SURVEY.md §2.10 registers itself here via the
:func:`query` decorator. ``__spark_entry__.py`` exposes the two dicts to
the verification driver. Queries without an oracle (non-SQL-expressible,
e.g. MinHash LSH) register with ``oracle=None`` and get the driver's
weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query and (optionally) its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def register_oracle(name: str, sql: str) -> None:
    """Attach/replace oracle SQL for an already-registered query."""
    ORACLES[name] = sql

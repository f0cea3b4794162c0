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
# Oracles whose SQL embeds data-derived literals (e.g. PCA components
# recomputed independently from the fixture parquet) register a
# zero-arg builder instead of a static string; ``oracle_sql()``
# resolves them at CALL time so the literals always reflect the
# current fixture (and tools/check_oracle.py can point them at a
# different scale factor via $SPARK_GRAFT_ORACLE_SF_DIR).
LAZY_ORACLES: dict[str, Callable[[], str]] = {}


def query(
    name: str,
    oracle: str | None = None,
    oracle_builder: Callable[[], str] | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query and (optionally) its oracle SQL —
    either a static string or a call-time builder (not both)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        if oracle is not None and oracle_builder is not None:
            raise ValueError(f"{name}: pass oracle or oracle_builder, not both")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        if oracle_builder is not None:
            LAZY_ORACLES[name] = oracle_builder
        return fn

    return deco


def register_oracle(name: str, sql: str) -> None:
    """Attach/replace oracle SQL for an already-registered query."""
    ORACLES[name] = sql

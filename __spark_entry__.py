"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The engine lives in ``rdf_mapreduce_joins_spark``; every declared query
from SURVEY.md §2.10 self-registers into the plans registry on import.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the RDF chain join (customer→nation→region over
    the triples view, LUBM Q8 analog) at sf0.001 — exercises the
    triples unpivot, the BGP compiler, and a 3-hop join pipeline."""
    from rdf_mapreduce_joins_spark.plans import QUERIES

    return QUERIES["rdf_chain_join"](spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.10."""
    from rdf_mapreduce_joins_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for the
    rows-only set: MinHash/SimHash/LSH/mapInPandas/lang-id)."""
    from rdf_mapreduce_joins_spark.plans import ORACLES

    return dict(ORACLES)

"""Declared query plans (SURVEY.md §2.10 contract surface).

Importing this package populates the registry with every declared
query + its DuckDB oracle SQL.
"""

from rdf_mapreduce_joins_spark.plans import (  # noqa: F401
    analytics,
    assembly,
    cdc,
    curation,
    events,
    formats,
    generic_rdf,
    llm,
    rdf,
    relational,
    sketches,
    sparql,
    tpch,
    web,
)
from rdf_mapreduce_joins_spark.plans.registry import (  # noqa: F401
    LAZY_ORACLES,
    ORACLES,
    QUERIES,
)

__all__ = ["QUERIES", "ORACLES"]

"""Sources & sinks (SURVEY.md §2.1: S1–S4)."""

from rdf_mapreduce_joins_spark.sources.tables import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]

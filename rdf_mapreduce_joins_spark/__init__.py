"""rdf_mapreduce_joins_spark — a PySpark-native analytics engine.

A ground-up re-expression of the query surface of the reference repo
``ahaque/rdf-mapreduce-joins`` (Hadoop-MapReduce SPARQL-style joins over
RDF triples; see SURVEY.md §0 — the reference mount is empty, so all
parity claims trace to SURVEY.md's provenance-tagged inventory) as an
idiomatic Spark DataFrame engine, extended with LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
per the driver's north star.

Design stance (SURVEY.md §3-§4): declare logical plans with the
DataFrame/SQL API, let Catalyst + AQE pick physical strategies; no
custom Catalyst rules are needed for parity. Python UDFs only where the
built-ins genuinely cannot express the semantics (none on hot paths).
"""

__version__ = "0.1.0"

from rdf_mapreduce_joins_spark.session import get_spark, ensure_runtime_confs

__all__ = ["get_spark", "ensure_runtime_confs", "__version__"]

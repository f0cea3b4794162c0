"""Persisted triples store (plans/generic_rdf.py): the ingest-time
encode+dictionary layout — equivalence with the inline paths, partition
pruning at the scan, and mtime-based staleness rebuild."""

from __future__ import annotations

import os

from rdf_mapreduce_joins_spark.plans import generic_rdf as G
from rdf_mapreduce_joins_spark.plans.rdf import triples

Q_CHAIN = """
SELECT ?c ?nname WHERE {
  ?c <mktsegment> "BUILDING" ; <nation> ?n .
  ?n <name> ?nname .
}
"""

Q_FILTER = """
SELECT ?c ?seg WHERE {
  ?c <mktsegment> ?seg .
  FILTER(?seg != "BUILDING")
}
"""


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_store_matches_inline_encoded_and_string(spark, sf_dir, tmp_path):
    tri = triples(spark, sf_dir)
    store = str(tmp_path / "store")
    G.build_triples_store(tri, store)
    want = _rows(G.sparql_triples(tri, Q_CHAIN))
    got = _rows(G.sparql_triples_indexed(spark, store, Q_CHAIN))
    assert got == want and got


def test_store_string_fallback_for_filter_queries(spark, sf_dir, tmp_path):
    """FILTER needs term strings mid-plan — the indexed runner must
    fall back to the store's string columns and still be right."""
    tri = triples(spark, sf_dir)
    store = str(tmp_path / "store")
    G.build_triples_store(tri, store)
    want = _rows(G.sparql_triples(tri, Q_FILTER))
    got = _rows(G.sparql_triples_indexed(spark, store, Q_FILTER))
    assert got == want and got


def test_store_prunes_predicate_partitions_and_reads_only_ids(
    spark, sf_dir, tmp_path
):
    tri = triples(spark, sf_dir)
    store = str(tmp_path / "store")
    G.build_triples_store(tri, store)
    df = G.sparql_triples_indexed(spark, store, Q_CHAIN)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # predicate is a partition column: the filter must appear as a
    # PartitionFilters entry (file-listing pruning), not a data filter
    assert "PartitionFilters" in plan
    frag = plan.split("PartitionFilters", 1)[1]
    assert "predicate" in frag[:200]
    # encoded chain query: scans read the id longs, not the strings
    assert "subject_id" in plan


def test_store_dictionary_has_no_collisions(spark, sf_dir, tmp_path):
    tri = triples(spark, sf_dir)
    store = str(tmp_path / "store")
    G.build_triples_store(tri, store)
    d = spark.read.parquet(f"{store}/dictionary")
    assert G.dictionary_collisions(d) == 0


def test_cached_store_rebuilds_when_source_newer(spark, sf_dir, monkeypatch, tmp_path):
    monkeypatch.setattr(G, "_STORE_ROOT", str(tmp_path / "root"))
    p1 = G._store_path(spark, sf_dir)
    marker = os.path.join(p1, "_BUILT")
    t1 = os.path.getmtime(marker)
    # second call: cache hit, no rebuild
    G._store_path(spark, sf_dir)
    assert os.path.getmtime(marker) == t1
    # make the marker look older than the source → rebuild
    os.utime(marker, (1, 1))
    G._store_path(spark, sf_dir)
    assert os.path.getmtime(marker) > 1

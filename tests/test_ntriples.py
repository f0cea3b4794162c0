"""N-Triples source/sink tests: parse forms, permissive/fail modes,
round-trip with the triples view."""

from __future__ import annotations

import pytest

from rdf_mapreduce_joins_spark.plans import rdf
from rdf_mapreduce_joins_spark.sources import ntriples


@pytest.fixture(scope="module")
def nt_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("nt") / "data.nt"
    p.write_text(
        "\n".join(
            [
                "<http://ex/s1> <http://ex/p> <http://ex/o1> .",
                '<http://ex/s1> <http://ex/name> "Alice" .',
                '<http://ex/s2> <http://ex/name> "Bo\\"b" .',
                '<http://ex/s2> <http://ex/age> "42"^^<http://www.w3.org/2001/XMLSchema#int> .',
                "_:b0 <http://ex/p> _:b1 .",
                "# a comment line",
                "",
                "this line is garbage",
            ]
        )
    )
    return str(p)


def test_read_parses_forms(spark, nt_file):
    rows = {tuple(r) for r in ntriples.read_ntriples(spark, nt_file).collect()}
    assert ("http://ex/s1", "http://ex/p", "http://ex/o1") in rows
    assert ("http://ex/s1", "http://ex/name", "Alice") in rows
    assert ("_:b0", "http://ex/p", "_:b1") in rows
    # typed literal keeps its datatype suffix verbatim
    assert any(s == "http://ex/s2" and o.startswith('"42"^^') for s, _, o in rows)
    # garbage dropped in permissive mode
    assert len(rows) == 5


def test_read_fail_mode_raises(spark, nt_file):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)):
        ntriples.read_ntriples(spark, nt_file, mode="fail").collect()


def test_roundtrip_with_triples_view(spark, sf_dir, tmp_path):
    src = rdf.triples(spark, sf_dir, preds=["region"])  # 25 nation→region triples
    path = str(tmp_path / "roundtrip")
    ntriples.write_ntriples(src, path, iri_objects=True)
    back = ntriples.read_ntriples(spark, path)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in src.collect()}


def test_streaming_ingest_matches_batch(spark, tmp_path):
    """read_ntriples_stream over an availableNow replay must land the
    exact batch-parse row set (same regex, same strip) — the
    incremental-ingest path for a continuously-arriving RDF feed."""
    from rdf_mapreduce_joins_spark.plans.rdf import triples
    from rdf_mapreduce_joins_spark.sources.ntriples import (
        read_ntriples,
        read_ntriples_stream,
        write_ntriples,
    )

    src = str(tmp_path / "feed")
    write_ntriples(triples(spark, "/root/testdata/sf0.001"), src)
    out = str(tmp_path / "landed")
    q = (
        read_ntriples_stream(spark, src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, read_ntriples(spark, src).collect()))
    assert got == want and got


def test_nquads_round_trip_with_default_graph(spark, tmp_path):
    """write_nquads → read_nquads is lossless, including NULL-graph
    (default) rows serialized as plain triples, and the result feeds
    sparql_quads directly."""
    from pyspark.sql import functions as F
    from rdf_mapreduce_joins_spark.plans.generic_rdf import sparql_quads
    from rdf_mapreduce_joins_spark.plans.rdf import triples
    from rdf_mapreduce_joins_spark.sources.ntriples import (
        read_nquads,
        write_nquads,
    )

    tri = triples(spark, "/root/testdata/sf0.001")
    quads = tri.withColumn(
        "graph",
        F.when(F.col("predicate") == "name", "labels").otherwise(F.lit(None)),
    ).select("graph", "subject", "predicate", "object")
    path = str(tmp_path / "q")
    write_nquads(quads, path)
    back = read_nquads(spark, path)
    key = lambda r: tuple("" if v is None else v for v in r)
    assert sorted(map(key, back.collect())) == sorted(map(key, quads.collect()))
    got = sparql_quads(
        back, "SELECT ?s ?o WHERE { GRAPH <labels> { ?s <name> ?o . } }"
    ).count()
    assert got == quads.filter("predicate = 'name'").count()


def test_nquads_fail_mode(spark, tmp_path):
    from rdf_mapreduce_joins_spark.sources.ntriples import read_nquads

    bad = tmp_path / "bad.nq"
    bad.write_text('<a> <b> "ok" <g> .\nnot a quad\n')
    assert read_nquads(spark, str(bad)).count() == 1
    import pytest as _pytest

    with _pytest.raises(Exception, match="bad N-Quads line"):
        read_nquads(spark, str(bad), mode="fail").count()

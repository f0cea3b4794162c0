"""Tests for the PySpark-4 Python DataSource N-Triples format:
read/write round-trips against the JVM-regex reader, per-file
partitions, and source-level EqualTo pushdown."""

from __future__ import annotations

import os

import pytest
from pyspark.sql.datasource import EqualTo, GreaterThan

from rdf_mapreduce_joins_spark.plans.rdf import triples
from rdf_mapreduce_joins_spark.sources.ntriples import read_ntriples, write_ntriples
from rdf_mapreduce_joins_spark.sources.ntriples_datasource import (
    NTriplesReader,
    register,
)


@pytest.fixture(scope="module")
def nt_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ds") / "dump")
    write_ntriples(triples(spark, "/root/testdata/sf0.001"), path)
    register(spark)
    return path


def test_read_matches_jvm_reader(spark, nt_dir):
    ds = sorted(map(tuple, spark.read.format("ntriples").load(nt_dir).collect()))
    jvm = sorted(map(tuple, read_ntriples(spark, nt_dir).collect()))
    assert ds == jvm and ds


def test_one_partition_per_file(spark, nt_dir):
    n_files = len([f for f in os.listdir(nt_dir) if not f.startswith(("_", "."))])
    reader = NTriplesReader({"path": nt_dir})
    assert len(reader.partitions()) == n_files > 1


def test_equalto_pushdown_applied_in_reader(spark, nt_dir):
    """EqualTo on a triple column is retained by the reader (applied
    during the parse); anything else is handed back to Spark."""
    reader = NTriplesReader({"path": nt_dir})
    unhandled = list(
        reader.pushFilters(
            [EqualTo(("predicate",), "name"), GreaterThan(("subject",), "a")]
        )
    )
    assert reader.eq == {"predicate": "name"}
    assert len(unhandled) == 1 and isinstance(unhandled[0], GreaterThan)
    part = reader.partitions()[0]
    rows = [r for batch in reader.read(part) for r in batch.to_pylist()]
    assert rows and all(r["predicate"] == "name" for r in rows)


def test_filtered_read_correct(spark, nt_dir):
    got = (
        spark.read.format("ntriples")
        .load(nt_dir)
        .filter("predicate = 'name' AND subject LIKE 'nation/%'")
        .count()
    )
    want = (
        read_ntriples(spark, nt_dir)
        .filter("predicate = 'name' AND subject LIKE 'nation/%'")
        .count()
    )
    assert got == want > 0


def test_write_round_trip(spark, nt_dir, tmp_path):
    out = str(tmp_path / "out")
    src = spark.read.format("ntriples").load(nt_dir).filter("predicate = 'nation'")
    src.write.format("ntriples").mode("overwrite").save(out)
    back = sorted(map(tuple, spark.read.format("ntriples").load(out).collect()))
    assert back == sorted(map(tuple, src.collect())) and back


def test_write_iri_objects_option(spark, nt_dir, tmp_path):
    out = str(tmp_path / "iri")
    src = spark.read.format("ntriples").load(nt_dir).filter("predicate = 'nation'")
    src.write.format("ntriples").option("iri_objects", "true").mode(
        "overwrite"
    ).save(out)
    line = open(
        os.path.join(out, sorted(os.listdir(out))[0]), encoding="utf-8"
    ).readline()
    assert line.rstrip().endswith("> .") and "<nation/" in line


def test_fail_mode_raises(spark, tmp_path):
    bad = tmp_path / "bad.nt"
    bad.write_text('<a> <b> "ok" .\nthis is not a triple\n')
    ok = spark.read.format("ntriples").load(str(bad))
    assert ok.count() == 1  # permissive drops the bad line
    with pytest.raises(Exception, match="bad N-Triples line"):
        spark.read.format("ntriples").option("mode", "fail").load(str(bad)).count()

"""Source/sink round-trip queries under the DRIVER's oracle gate.

The S1/S3/S5/S6 surface (N-Triples scan + sink, JSONL/CSV readers and
writers, ORC) was pytest-covered but never driver-checked (VERDICT r3:
"tests-only" rows), because the declared queries all read the fixture
parquet directly. These queries close that gap: each one pushes fixture
data OUT through the engine's writer, back IN through the engine's
reader, and aggregates the round-tripped frame — so the driver's
Spark-vs-DuckDB hash compares the WHOLE serialize→parse→aggregate
pipeline against SQL over the original tables. Any loss, duplication,
mis-escape, or type drift in the format path breaks the hash.

Scratch output goes under the repo's gitignored ``.scratch/roundtrip``
keyed by sf-dir basename (same convention as the persisted triples
store, generic_rdf.py::_store_path); writes are mode=overwrite, so the
queries are idempotent per (query, sf) and safe under bench reps.

At scale the round trip is the realistic export/import job shape: text
serialization is one narrow projection + text sink (parallel by
partition), each reader is a schema'd single-pass scan (no inferSchema
second read), and the final aggregation is one shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.plans.registry import query
from rdf_mapreduce_joins_spark.sources.columnar import read_orc, write_orc
from rdf_mapreduce_joins_spark.sources.ntriples import read_ntriples, write_ntriples
from rdf_mapreduce_joins_spark.sources.tables import load_table
from rdf_mapreduce_joins_spark.sources.text_formats import (
    read_csv_table,
    read_jsonl,
    write_csv,
    write_jsonl,
)

_SCRATCH = "/root/repo/.scratch/roundtrip"


def _scratch(sf_dir: str, name: str) -> str:
    return os.path.join(_SCRATCH, os.path.basename(sf_dir.rstrip("/")), name)


@query(
    "ntriples_roundtrip_count",
    oracle="""
    WITH t AS (
      -- the <name> predicate spans four entity tables in the
      -- vocabulary; <nation> spans two; <mktsegment> is customer-only
      SELECT 'name' AS predicate, 'customer/' || c_custkey AS subject
        FROM customer
      UNION ALL
      SELECT 'name', 'nation/' || n_nationkey FROM nation
      UNION ALL
      SELECT 'name', 'region/' || r_regionkey FROM region
      UNION ALL
      SELECT 'name', 'supplier/' || s_suppkey FROM supplier
      UNION ALL
      SELECT 'nation', 'customer/' || c_custkey FROM customer
      UNION ALL
      SELECT 'nation', 'supplier/' || s_suppkey FROM supplier
      UNION ALL
      SELECT 'mktsegment', 'customer/' || c_custkey FROM customer
    )
    SELECT predicate,
           CAST(COUNT(*) AS BIGINT) AS n_triples,
           CAST(COUNT(DISTINCT subject) AS BIGINT) AS n_subjects
    FROM t GROUP BY predicate
    """,
)
def ntriples_roundtrip_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S3 under the oracle gate: the name/nation/mktsegment slice of
    the triples view (the <name> predicate alone unions customer,
    nation, region, and supplier entities) serialized to N-Triples
    text (write_ntriples: escaping, literal quoting), parsed back by
    the regex scanner (read_ntriples), and counted per predicate with
    distinct subjects. A dropped or double-written line, a mis-escaped
    literal, or a regex parse hole changes a count and fails the
    driver hash against straight SQL over the base tables. The text
    sink/scan parallelize by partition / file split — the round trip
    is shuffle-free until the final 3-group aggregation."""
    from rdf_mapreduce_joins_spark.plans.rdf import triples

    path = _scratch(sf_dir, "customer.nt")
    write_ntriples(triples(spark, sf_dir, ["name", "nation", "mktsegment"]), path)
    back = read_ntriples(spark, path)
    return back.groupBy("predicate").agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("subject").alias("n_subjects"),
    )


@query(
    "jsonl_csv_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def jsonl_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 under the oracle gate: orders → JSONL (write_jsonl) →
    schema'd JSONL read → CSV (write_csv, quoted header) → schema'd
    CSV read → per-status aggregate. Doubles survive both text hops
    exactly (Java's shortest-round-trip double rendering on write,
    exact parse on read — pinned here by aggregating integer cents);
    a quoting or header bug would drop/shift rows and break the count.
    Both readers take explicit DDL schemas — never inferSchema, which
    is a second full pass over the data at scale."""
    schema = "o_orderkey bigint, o_orderstatus string, o_totalprice double"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    jpath = _scratch(sf_dir, "orders.jsonl")
    write_jsonl(o, jpath)
    via_json = read_jsonl(spark, jpath, schema)
    cpath = _scratch(sf_dir, "orders.csv")
    write_csv(via_json, cpath)
    back = read_csv_table(spark, cpath, schema)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("total_cents"),
    )


@query(
    "orc_roundtrip_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 under the oracle gate: the Q1-shaped lineitem projection
    written to zstd ORC (write_orc — explicit codec, never
    cluster-default) and read back (read_orc) before the classic
    returnflag/linestatus aggregation. ORC carries real types, so this
    pins lossless columnar round-trip (row count + exact decimal sum
    per group) rather than text parsing; filter pushdown and column
    pruning on the ORC scan are plan-tested in
    tests/test_text_formats.py."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    )
    path = _scratch(sf_dir, "lineitem.orc")
    write_orc(li, path)
    back = read_orc(spark, path)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
    )

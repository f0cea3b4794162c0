"""JSONL/CSV source round-trips: schema fidelity, corrupt-record
quarantine, and parity with the parquet-loaded table."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.sources import text_formats as tf
from rdf_mapreduce_joins_spark.sources.tables import load_table

DOC_SCHEMA = "doc_id bigint, lang string, text string"


def test_jsonl_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    path = str(tmp_path / "docs_jsonl")
    tf.write_jsonl(docs, path)
    back = tf.read_jsonl(spark, path, DOC_SCHEMA)
    assert back.schema.simpleString() == docs.schema.simpleString()
    a = {r.doc_id: (r.lang, r.text) for r in docs.collect()}
    b = {r.doc_id: (r.lang, r.text) for r in back.collect()}
    assert a == b


def test_jsonl_corrupt_quarantine(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"doc_id": 1, "lang": "en", "text": "ok"}\n'
        "{not json at all\n"
        '{"doc_id": 2, "lang": "de", "text": "auch ok"}\n'
    )
    kept = tf.read_jsonl(spark, str(p), DOC_SCHEMA, keep_corrupt=True)
    rows = kept.collect()
    good = [r for r in rows if r[tf.CORRUPT_COL] is None]
    bad = [r for r in rows if r[tf.CORRUPT_COL] is not None]
    assert {r.doc_id for r in good} == {1, 2}
    assert len(bad) == 1 and "not json" in bad[0][tf.CORRUPT_COL]
    # DROPMALFORMED path: the bad line vanishes entirely
    dropped = tf.read_jsonl(spark, str(p), DOC_SCHEMA)
    assert dropped.count() == 2


def test_csv_roundtrip_typed(spark, sf_dir, tmp_path):
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = str(tmp_path / "nation_csv")
    tf.write_csv(nat, path)
    back = tf.read_csv_table(
        spark, path, "n_nationkey int, n_name string, n_regionkey int"
    )
    assert back.schema.simpleString() == nat.schema.simpleString()
    assert back.count() == nat.count()
    assert (
        back.agg(F.sum("n_nationkey")).collect()[0][0]
        == nat.agg(F.sum("n_nationkey")).collect()[0][0]
    )


# --------------------------------------------------------------------------
# Columnar formats (sources/columnar.py)
# --------------------------------------------------------------------------

from rdf_mapreduce_joins_spark.sources import columnar


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    cust = load_table(spark, sf_dir, "customer")
    path = str(tmp_path / "cust_orc")
    columnar.write_orc(cust, path)
    back = columnar.read_orc(spark, path)
    assert back.schema.simpleString() == cust.schema.simpleString()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, cust.collect()))
    # filter + projection must reach the ORC scan (same path as parquet)
    q = back.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "c_mktsegment" in plan
    assert "ReadSchema: struct<c_custkey:bigint,c_mktsegment:string>" in plan


def test_avro_gated_with_clear_error(spark):
    if columnar.avro_available(spark):  # pragma: no cover - jar present
        import pytest as _pytest

        _pytest.skip("spark-avro deployed here")
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="spark-avro"):
        columnar.read_avro(spark, "/nonexistent")


def test_parquet_schema_evolution_reads(spark, tmp_path):
    """Files written before a column existed read as NULL for it —
    both via mergeSchema discovery and via a declared schema."""
    from rdf_mapreduce_joins_spark.sources.columnar import read_parquet_evolving

    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id bigint, name string").write.parquet(
        f"{p}/part=old"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, name string, score double"
    ).write.parquet(f"{p}/part=new")

    merged = read_parquet_evolving(spark, p)
    rows = {r.id: (r.name, r.score) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}

    declared = read_parquet_evolving(
        spark, p, schema="id bigint, name string, score double"
    )
    rows2 = {r.id: (r.name, r.score) for r in declared.collect()}
    assert rows2 == rows

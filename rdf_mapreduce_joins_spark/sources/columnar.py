"""Columnar interchange formats beyond parquet (SURVEY.md §2.1
S-family extension).

Parquet is the engine's home format (TESTDATA.md); ORC is the other
columnar format a Spark deployment meets in practice (Hive/Trino
lakehouses), and Spark supports it natively — same predicate pushdown,
column pruning, and min/max row-group skipping code paths as parquet.
These wrappers pin the two scale-relevant choices: an explicit
compression codec (zstd: ~parquet-snappy read speed at a visibly
better ratio — at 100 TB the ratio IS the scan time) and
``mergeSchema`` off (schema merging lists every file footer on the
driver before planning).

Avro (the row-oriented interchange format of Kafka pipelines) is NOT
bundled in this PySpark build: ``spark-avro`` has been an external
module since Spark 2.4, and this environment is offline. The reader
raises immediately with the deploy instruction instead of letting
Spark fail with an opaque ClassNotFoundException mid-job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """Write ORC with an explicit codec (never rely on cluster-default
    compression: it silently varies across deployments)."""
    df.write.mode(mode).option("compression", compression).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read ORC. Filter pushdown and column pruning apply exactly as
    for parquet (plan-tested in tests/test_text_formats.py)."""
    return spark.read.orc(path)


def avro_available(spark: SparkSession) -> bool:
    """True if the spark-avro datasource is deployed on this cluster."""
    try:
        spark.read.format("avro").schema("x int").load("/nonexistent")
        return True
    except Exception as e:  # noqa: BLE001
        return "Failed to find data source: avro" not in str(e)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read Avro if the external ``spark-avro`` module is deployed;
    otherwise fail fast with the deploy instruction."""
    if not avro_available(spark):
        raise NotImplementedError(
            "spark-avro is not on the classpath (external module since "
            "Spark 2.4). Deploy with: spark-submit --packages "
            "org.apache.spark:spark-avro_2.13:<spark-version>"
        )
    return spark.read.format("avro").load(path)


def read_parquet_evolving(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """Read a parquet directory whose files were written under an
    EVOLVING schema (columns added over time — the normal life of a
    long-lived pipeline dataset).

    Two modes, matching the two scale postures:

    * ``schema=None`` — ``mergeSchema=true``: Spark reconciles every
      file footer into the union schema. Correct, but the footer merge
      lists and reads every footer up front — pay it for ad-hoc
      exploration, not in a production job over millions of files.
    * ``schema="ddl string"`` — the declared-contract form: the caller
      states the current schema; older files simply yield NULL for
      columns they predate. No footer sweep, constant planning cost —
      the 100 TB answer (the contract lives in code review, where
      schema changes belong).
    """
    if schema is None:
        return spark.read.option("mergeSchema", "true").parquet(path)
    return spark.read.schema(schema).parquet(path)

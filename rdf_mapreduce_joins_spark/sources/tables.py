"""Parquet table sources (SURVEY.md §2.1 S1/S2).

The reference bulk-loads N-Triples into HBase and scans with column
filters (SURVEY.md §2.1, provenance [K]); our columnar equivalent is a
plain parquet scan — Catalyst pushes predicates and prunes columns into
the scan for free, which is the 100 TB answer (row-group/page skipping
instead of HBase row-key point gets).

Events-table timestamp handling: the parquet column is TIMESTAMP(NANOS),
illegal for Spark's vectorized reader by default. With
``spark.sql.legacy.parquet.nanosAsLong`` (set by
:func:`ensure_runtime_confs`) it arrives as LongType nanoseconds. We
expose:

* ``ts_ns``  — raw int64 nanoseconds (exact),
* ``ts_s``   — int64 epoch seconds via exact integer division
  (``ts_ns div 1e9``; truncation is monotone so it equals DuckDB's
  ``floor(epoch(ts))`` even though DuckDB reads at µs precision),
* ``ts``     — TimestampType at µs precision for window/streaming ops.

All other tables pass through with their parquet schema untouched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.session import ensure_runtime_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

NS_PER_SECOND = 1_000_000_000


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; normalizes the events timestamp column."""
    ensure_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts_s", F.expr(f"ts_ns div {NS_PER_SECOND}"))
            .withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
        )
    return df


def spread(df: DataFrame, *key_cols: str, partitions: int | None = None) -> DataFrame:
    """Repartition before CPU-heavy per-row work (shingling, hashing,
    Pandas UDFs).

    The testdata files are single-row-group parquet, so scans are
    1-task no matter what ``maxPartitionBytes`` says — without this,
    an explode+aggregate pipeline runs on one core of 32. At 100 TB
    inputs split naturally, but an operator's parallelism still
    shouldn't depend on the writer's row-group layout.

    Default is KEYLESS (round-robin) on purpose: partitioning on the
    downstream grouping key lets Catalyst elide the exchange after the
    aggregation, and that exchange is exactly what multiple downstream
    references (LSH band self-joins, signature re-joins) reuse via
    ReusedExchange. Keyed spread moved the only exchange BEFORE the
    expensive explode+agg, so the pipeline recomputed once per
    reference — measured 4-8x wall regression on the dedup suite.
    Pass key_cols only when a single downstream consumer needs
    co-partitioning."""
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *key_cols) if key_cols else df.repartition(n)


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each table as a temp view (for the spark.sql entry path)."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

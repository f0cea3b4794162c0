"""Parquet table sources (SURVEY.md §2.1 S1/S2).

The reference bulk-loads N-Triples into HBase and scans with column
filters (SURVEY.md §2.1, provenance [K]); our columnar equivalent is a
plain parquet scan — Catalyst pushes predicates and prunes columns into
the scan for free, which is the 100 TB answer (row-group/page skipping
instead of HBase row-key point gets).

Events-table timestamp handling: the ``ts`` column's physical type has
drifted across fixture generations — TIMESTAMP(NANOS) (read as int64
nanoseconds under ``spark.sql.legacy.parquet.nanosAsLong``) in one,
plain ``timestamp[us]`` (read as TIMESTAMP/TIMESTAMP_NTZ) in another —
so :func:`normalize_events` branches on the *actual* dtype instead of
assuming either. Downstream consumers only ever see:

* ``ts_ns``  — int64 nanoseconds since epoch (exact for both sources;
  µs inputs are ×1000),
* ``ts_s``   — int64 epoch seconds via floor division (monotone, so it
  equals DuckDB's ``floor(epoch(ts))`` at any stored precision),
* ``ts``     — TimestampType (µs, session-UTC) for window/streaming ops.

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


def normalize_events(df: DataFrame) -> DataFrame:
    """Derive the canonical ``ts_ns`` / ``ts_s`` / ``ts`` trio from
    whatever physical type the fixture's ``ts`` column actually has.

    Branching on ``df.dtypes`` (not on what FIXTURES.md recorded) makes
    the loader robust to fixture re-provisioning: int64-nanos and
    timestamp[us] fixtures both normalize to identical downstream
    schemas and values.
    """
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        # Parquet TIMESTAMP(NANOS) surfaced as long via nanosAsLong.
        return (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts_s", F.expr(f"ts_ns div {NS_PER_SECOND}"))
            .withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
        )
    if ts_type.startswith("timestamp"):
        # timestamp or timestamp_ntz at µs precision; session TZ is UTC
        # (ensure_runtime_confs), so the NTZ→TZ cast is epoch-identity.
        ts = F.col("ts").cast("timestamp")
        return (
            df.withColumn("ts", ts)
            .withColumn("ts_ns", F.unix_micros(ts) * F.lit(1000))
            .withColumn("ts_s", F.expr("unix_micros(ts) div 1000000"))
        )
    raise TypeError(f"events.ts has unsupported type {ts_type!r}")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; normalizes the events timestamp column."""
    ensure_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events(df)
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
    co-partitioning.

    The keyless form is CONDITIONAL: when the scan already splits into
    >= the target partition count (any real multi-file/multi-row-group
    input — i.e. always at production scale), the repartition would be
    a full shuffle of the raw rows for nothing, so it is skipped. The
    single-row-group synthetic fixtures stay covered."""
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    if key_cols:
        return df.repartition(n, *key_cols)
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def bounded_sort(df: DataFrame, *cols: str) -> DataFrame:
    """Global sort for BOUNDED-cardinality outputs — grouped aggregates
    whose row count is the group-key domain (per-region /
    per-event-type / per-country summaries, ≤ hundreds of rows at ANY
    input scale). A plain ``orderBy`` plans a rangepartitioning
    exchange whose boundary-sampling pass is a separate Spark job:
    measured round 10 at sf0.1, that fixed overhead is 0.2-0.5 s per
    query (agg_theta_distinct 0.82 s -> 0.31 s, agg_kll_quantiles
    0.55 s -> 0.29 s, min-of-10 same session) — pure waste on a
    dozen-row result. ``coalesce(1)`` + ``sortWithinPartitions`` gives
    the identical total order with a narrow dependency and no extra
    job. NOT for unbounded outputs: coalesce(1) would serialize the
    sort — keep ``orderBy`` there."""
    return df.coalesce(1).sortWithinPartitions(*cols)


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each table as a temp view (for the spark.sql entry path)."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

"""SparkSession factory and runtime-conf discipline.

Two audiences:

* Our own tests/bench create sessions via :func:`get_spark` (local mode,
  AQE on, Arrow on, UTC).
* The verification driver hands us *its* session. Everything that must
  hold for correctness parity with the DuckDB oracle therefore has to be
  a **runtime-settable** SQL conf applied via
  :func:`ensure_runtime_confs` inside every query builder — never a
  builder-only conf.

Scale notes (100 TB posture): nothing here is local-mode specific. On a
real cluster the same confs apply; shuffle partition count is left to
AQE coalescing (`spark.sql.adaptive.coalescePartitions.enabled`), with
`spark.sql.shuffle.partitions` only as the pre-AQE upper bound.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# The events table is written with parquet TIMESTAMP(NANOS), which Spark
# rejects by default (PARQUET_TYPE_ILLEGAL). This legacy conf reads it
# as LongType nanoseconds-since-epoch — we then do exact integer epoch
# arithmetic (see sources/tables.py), which is also the timezone-proof
# way to hash-match a DuckDB oracle.
_NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable confs required for oracle parity.

    Idempotent; safe on a foreign (driver-owned) session.
    """
    spark.conf.set(_NANOS_AS_LONG, "true")
    # Timestamp→calendar functions (year/month/date_trunc) must agree
    # with DuckDB's naive-timestamp semantics: evaluate in UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark


def get_spark(
    app_name: str = "rdf-mapreduce-joins-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or get) a local SparkSession tuned for this engine.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default 32, per the
    driver environment).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    parts = str(shuffle_partitions or os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config(_NANOS_AS_LONG, "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
        # Push COUNT/MIN/MAX of unfiltered scans down to parquet footer
        # statistics — answers metadata-only aggregates without reading
        # row groups. Perf-only (results identical), so factory-only.
        .config("spark.sql.parquet.aggregatePushdown", "true")
    )
    return ensure_runtime_confs(builder.getOrCreate())

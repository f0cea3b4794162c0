"""Structured Streaming forms of the event-time operators (SURVEY.md
§2.8 T1-T5).

The batch layer (plans/events.py) and this module share semantics: the
batch queries are the oracle-checkable form, these are the incremental
form — same grouping logic, plus watermarks for state eviction. The
reference has no streaming surface at all (batch MapReduce only); this
is extension surface, designed the way a 100 TB pipeline would run it
(file/Kafka source → event-time windows → append sink; state bounded by
the watermark, not the stream length).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from rdf_mapreduce_joins_spark.session import ensure_runtime_confs

# Schema as stored (ts = int64 nanos under nanosAsLong; file streams
# require an explicit schema).
EVENTS_FILE_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of events with the same column normalization
    as the batch loader (ts_ns / ts_s / ts)."""
    ensure_runtime_confs(spark)
    if os.path.isdir(path):
        raw = spark.readStream.schema(EVENTS_FILE_SCHEMA).parquet(path)
    elif path.endswith(".parquet"):
        # Spark's file stream source requires a directory: stream the
        # parent dir with a glob filter pinned to this file.
        raw = (
            spark.readStream.schema(EVENTS_FILE_SCHEMA)
            .option("pathGlobFilter", os.path.basename(path))
            .parquet(os.path.dirname(path))
        )
    else:
        raise ValueError(f"unsupported stream path: {path}")
    return (
        raw.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts_s", F.expr("ts_ns div 1000000000"))
        .withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
    )


def tumbling_counts_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """T1/T4: tumbling 10-minute counts with late-data watermark —
    identical grouping to the batch events_tumbling_counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("bucket_s"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """T2: 10-minute windows sliding every 5."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes", "5 minutes"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def sessionize_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes") -> DataFrame:
    """T3: native session windows (gap-merged state per user)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias("start_s"),
            F.unix_timestamp(F.col("session_window.end")).alias("end_s"),
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """T5: stateful keyed dedup bounded by the watermark."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Drain a stream with availableNow into an in-memory table and
    return the result as a batch DataFrame (test/debug harness; a
    production job would writeStream to parquet/Kafka instead)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)

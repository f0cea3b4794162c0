"""Structured Streaming tests: the streaming forms agree with batch
semantics on controlled data, and drain correctly with availableNow."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.streaming import events_stream as es

BASE = 1_700_000_000  # epoch seconds


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """A small parquet events dir written in the stored layout
    (ts = int64 nanoseconds, as the testdata files are)."""
    rows = []
    for uid in (1, 2):
        # two sessions per user: 3 events 10min apart, gap 2h, 2 events
        for i in range(3):
            rows.append((uid * 100 + i, (BASE + i * 600) * 10**9, uid, "click", 1.0, "{}"))
        for i in range(2):
            rows.append(
                (uid * 100 + 10 + i, (BASE + 7200 + i * 60) * 10**9, uid, "view", 2.0, "{}")
            )
    # one duplicate event_id
    rows.append((101, (BASE + 5) * 10**9, 1, "click", 1.0, "{}"))
    df = spark.createDataFrame(rows, schema=es.EVENTS_FILE_SCHEMA)
    path = str(tmp_path_factory.mktemp("events_stream") / "events")
    df.write.parquet(path)
    return path


def test_stream_reads_normalized_columns(spark, events_dir):
    stream = es.read_events_stream(spark, events_dir)
    assert stream.isStreaming
    assert {"ts_ns", "ts_s", "ts"} <= set(stream.columns)


def test_tumbling_stream_matches_batch_buckets(spark, events_dir):
    stream = es.read_events_stream(spark, events_dir)
    result = es.run_to_memory(
        es.tumbling_counts_stream(stream), "t_tumbling", "complete"
    ).collect()
    # batch reference computed directly
    batch = (
        spark.read.parquet(events_dir)
        .withColumn("ts_s", F.expr("ts div 1000000000"))
        .groupBy((F.col("ts_s") - F.col("ts_s") % 600).alias("bucket_s"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    got = {(r.bucket_s, r.event_type): r.n_events for r in result}
    want = {(r.bucket_s, r.event_type): r.n_events for r in batch}
    assert got == want


def test_session_stream_gap_semantics(spark, events_dir):
    stream = es.read_events_stream(spark, events_dir)
    result = es.run_to_memory(
        es.sessionize_stream(stream), "t_sessions", "complete"
    ).collect()
    per_user = {}
    for r in result:
        per_user.setdefault(r.user_id, []).append(r.n_events)
    # each user: one 4-event session (3 + dup or 3) and one 2-event session
    assert sorted(per_user[1]) == [2, 4]  # includes the duplicated event row
    assert sorted(per_user[2]) == [2, 3]


def test_stream_from_single_parquet_file(spark, sf_dir):
    """The testdata events table is a single file, not a directory —
    the source must glob from the parent dir (regression: basePath
    error mid-stream)."""
    stream = es.read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = es.run_to_memory(
        es.tumbling_counts_stream(stream), "t_singlefile", "complete"
    )
    assert out.count() == 977  # matches batch events_tumbling_counts at sf0.001


def test_dedup_stream_drops_duplicate_ids(spark, events_dir):
    stream = es.read_events_stream(spark, events_dir)
    result = es.run_to_memory(
        es.dedup_stream(stream).select("event_id"), "t_dedup", "append"
    ).collect()
    ids = [r.event_id for r in result]
    assert len(ids) == len(set(ids))
    assert len(ids) == 10  # 11 rows, one duplicate id

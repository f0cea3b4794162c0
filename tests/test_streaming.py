"""Structured Streaming tests: the streaming forms agree with batch
semantics on controlled data, and drain correctly with availableNow."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from rdf_mapreduce_joins_spark.streaming import events_stream as es

BASE = 1_700_000_000  # epoch seconds

# Synthetic fixtures are written in the int64-nanos layout — this also
# keeps the loader's bigint branch exercised now that the driver's
# testdata stores timestamp[us] (normalize_events handles both).
EVENTS_NANOS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


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
    df = spark.createDataFrame(rows, schema=EVENTS_NANOS_SCHEMA)
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


@pytest.fixture(scope="module")
def multi_batch_events_dir(spark, tmp_path_factory):
    """Three parquet files with strictly advancing time ranges; replayed
    one file per micro-batch so the watermark advances between batches
    and event-time timeouts fire."""
    path = tmp_path_factory.mktemp("events_multibatch")
    mk = lambda rows: spark.createDataFrame(rows, schema=EVENTS_NANOS_SCHEMA)
    # batch 1: user 1 session A (2 events, 10 min apart), user 2 session (1 event)
    mk(
        [
            (1, BASE * 10**9, 1, "click", 1.0, "{}"),
            (2, (BASE + 600) * 10**9, 1, "click", 2.0, "{}"),
            (3, (BASE + 60) * 10**9, 2, "view", 5.0, "{}"),
        ]
    ).coalesce(1).write.parquet(str(path / "b1"))
    # batch 2: 3h later — watermark jumps far past session A's close
    mk([(4, (BASE + 3 * 3600) * 10**9, 1, "click", 7.0, "{}")]).coalesce(1).write.parquet(
        str(path / "b2")
    )
    # batch 3: 6h later — closes batch-2's session too
    mk([(5, (BASE + 6 * 3600) * 10**9, 3, "view", 9.0, "{}")]).coalesce(1).write.parquet(
        str(path / "b3")
    )
    # file source streams a flat dir: point it at the files via glob.
    # FileStreamSource orders batches by modification time — pin
    # strictly ascending mtimes or the replay order (and therefore the
    # watermark progression) is arbitrary.
    import glob, os, shutil, time
    flat = tmp_path_factory.mktemp("events_flat")
    now = time.time()
    for i, sub in enumerate(["b1", "b2", "b3"]):
        src = glob.glob(str(path / sub / "*.parquet"))[0]
        dst = str(flat / f"part-{i}.parquet")
        shutil.copy(src, dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    return str(flat)


def test_custom_stateful_sessionize(spark, multi_batch_events_dir):
    """applyInPandasWithState sessionization: closed sessions are
    emitted exactly once with their aggregates; still-open sessions
    stay in state."""
    stream = es.read_events_stream(spark, multi_batch_events_dir, max_files_per_trigger=1)
    out = es.run_to_memory(
        es.sessionize_custom_state(stream), "t_custom_sessions", "append"
    ).collect()
    got = {(r.user_id, r.start_s): (r.end_s, r.n_events, r.total_value) for r in out}
    # user 1 session A: events at BASE and BASE+600, total 3.0 — closed by batch 2's watermark
    assert got[(1, BASE)] == (BASE + 600, 2, 3.0)
    # user 2's single-event session — closed as well
    assert got[(2, BASE + 60)] == (BASE + 60, 1, 5.0)
    # user 1's batch-2 session closed by batch 3's watermark
    assert got[(1, BASE + 3 * 3600)] == (BASE + 3 * 3600, 1, 7.0)
    # user 3's final session is still open -> not emitted
    assert all(uid != 3 for uid, _ in got)


def test_stream_stream_interval_join(spark, events_dir):
    """Views join the same user's clicks within the look-back interval
    (the fixture has clicks then views 2h later); verified non-empty
    and equal to the equivalent batch join."""
    stream = es.read_events_stream(spark, events_dir)
    out = es.run_to_memory(
        es.interval_join_stream(
            stream, left_type="view", right_type="click", window_s=7200
        ),
        "t_ssj",
        "append",
    ).collect()
    got = {(r.user_id, r.left_id, r.right_id) for r in out}
    batch = spark.read.parquet(events_dir).withColumn(
        "ts_s", F.expr("ts div 1000000000")
    )
    v = batch.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("vid"), F.col("ts_s").alias("vts")
    )
    c = batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("cid"), F.col("ts_s").alias("cts")
    )
    want = {
        (r.u, r.vid, r.cid)
        for r in v.join(
            c,
            (F.col("u") == F.col("cu"))
            & (F.col("cts") <= F.col("vts"))
            & (F.col("cts") >= F.col("vts") - 7200),
        ).collect()
    }
    assert got == want
    assert len(got) > 0  # the join must actually match (guards a vacuous pass)


def test_anomaly_stream_welford(spark, tmp_path_factory):
    """Per-user streaming z-score: a spike after stable history is
    flagged with the z-score computed against history only; stable
    values are not flagged; state carries across micro-batches."""
    import numpy as np

    rows = []
    # user 1: 20 stable values then one spike; user 2: all stable
    for i in range(20):
        rows.append((100 + i, (BASE + i * 60) * 10**9, 1, "click", 10.0 + (i % 3), "{}"))
    rows.append((999, (BASE + 20 * 60) * 10**9, 1, "click", 100.0, "{}"))
    for i in range(15):
        rows.append((200 + i, (BASE + i * 60) * 10**9, 2, "click", 5.0, "{}"))
    df = spark.createDataFrame(rows, schema=EVENTS_NANOS_SCHEMA)
    path = str(tmp_path_factory.mktemp("anomaly") / "events")
    df.coalesce(1).write.parquet(path)
    stream = es.read_events_stream(spark, path)
    out = es.run_to_memory(es.anomaly_stream(stream, z_threshold=3.0), "t_anom", "append").collect()
    flagged = {r.event_id: r for r in out}
    assert 999 in flagged
    r = flagged[999]
    # z computed against the 20-value history (mean=11, std of 10/11/12 cycle)
    hist = np.array([10.0 + (i % 3) for i in range(20)])
    want_z = (100.0 - hist.mean()) / hist.std(ddof=1)
    assert abs(r.zscore - want_z) < 1e-3
    assert r.n_seen == 20
    # nothing else flagged
    assert set(flagged) == {999}


def test_file_sink_checkpoint_recovery_exactly_once(spark, tmp_path_factory):
    """Exactly-once across restart: a parquet-sink stream with a
    checkpoint processes batch 1, stops, new files arrive, a NEW query
    with the SAME checkpoint resumes — the sink must hold every input
    row exactly once (no replays of batch 1, no gaps)."""
    import time as _time

    src = tmp_path_factory.mktemp("ck_src")
    out = str(tmp_path_factory.mktemp("ck_out"))
    ck = str(tmp_path_factory.mktemp("ck_state"))

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema=EVENTS_NANOS_SCHEMA).coalesce(1).write.parquet(
            str(src / name)
        )
        # file source orders by mtime — keep strictly increasing
        _time.sleep(0.05)

    import glob, os, shutil
    flat = tmp_path_factory.mktemp("ck_flat")

    def publish(name):
        f = glob.glob(str(src / name / "*.parquet"))[0]
        shutil.copy(f, str(flat / f"{name}.parquet"))

    write_batch("b1", [(1, BASE * 10**9, 1, "click", 1.0, "{}"),
                       (2, (BASE + 60) * 10**9, 2, "view", 2.0, "{}")])
    publish("b1")

    def run_once():
        stream = es.read_events_stream(spark, str(flat))
        q = (
            stream.select("event_id", "user_id", "ts_s")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    got1 = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert got1 == [1, 2]

    write_batch("b2", [(3, (BASE + 120) * 10**9, 1, "click", 3.0, "{}")])
    publish("b2")
    run_once()  # resumes from the checkpoint
    got2 = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert got2 == [1, 2, 3]  # batch 1 not replayed, batch 2 not missed



def test_tws_ewma_matches_batch_recursion(spark, multi_batch_events_dir):
    """transformWithStateInPandas EWMA (modern StatefulProcessor API):
    drained over three in-order micro-batches it must emit exactly the
    batch recursion s_t = a*x_t + (1-a)*s_{t-1} per user — the
    ValueState carry across batches is the thing under test. Skipped
    where the tWS protobuf runtime isn't deployed (this offline
    container); the gate itself is covered below either way."""
    if not es.tws_available():
        pytest.skip("google.protobuf not deployed (tws runtime)")
    stream = es.read_events_stream(
        spark, multi_batch_events_dir, max_files_per_trigger=1
    )
    out = es.run_to_memory(
        es.ewma_stream_tws(stream), "t_tws_ewma", "append"
    ).collect()
    got = {r.event_id: r.ewma for r in out}
    a = es.EWMA_STREAM_ALPHA
    expect = {}
    for uid, seq in {
        1: [(1, 1.0), (2, 2.0), (4, 7.0)],
        2: [(3, 5.0)],
        3: [(5, 9.0)],
    }.items():
        s = None
        for eid, v in seq:
            s = v if s is None else a * v + (1 - a) * s
            expect[eid] = round(s, 4)
    assert got == expect
    assert len(out) == 5


def test_tws_ewma_gate_or_processor_logic(spark):
    """Whichever side of the capability gate this environment is on:
    without protobuf the operator must fail fast with the deploy
    instruction; the processor's per-batch fold logic is checked
    directly against the hand recursion either way (it's a plain
    class — no Spark runtime needed)."""
    if not es.tws_available():
        with pytest.raises(NotImplementedError, match="protobuf"):
            es.ewma_stream_tws(spark.range(0).selectExpr(
                "id user_id", "id event_id", "id ts_s",
                "cast(id as double) value"))
    # drive the processor class directly with a fake state handle
    import pandas as pd

    class FakeState:
        def __init__(self):
            self.v = None
        def exists(self):
            return self.v is not None
        def get(self):
            return self.v
        def update(self, v):
            self.v = v

    class FakeHandle:
        def getValueState(self, name, schema, ttlDurationMs=None):
            return FakeState()

    proc = es._EwmaStatefulProcessor(0.3)
    proc.init(FakeHandle())
    b1 = pd.DataFrame({"ts_s": [10, 20], "event_id": [1, 2], "value": [1.0, 2.0]})
    out1 = pd.concat(list(proc.handleInputRows((7,), iter([b1]), None)))
    b2 = pd.DataFrame({"ts_s": [30], "event_id": [3], "value": [7.0]})
    out2 = pd.concat(list(proc.handleInputRows((7,), iter([b2]), None)))
    s1 = 1.0
    s2 = 0.3 * 2.0 + 0.7 * s1
    s3 = 0.3 * 7.0 + 0.7 * s2
    assert list(out1["ewma"]) == [round(s1, 4), round(s2, 4)]
    assert list(out2["ewma"]) == [round(s3, 4)]
    assert out1["user_id"].tolist() == [7, 7]


def test_stream_static_enrichment(spark, events_dir):
    """Stream-static join: each event picks up its dimension row from
    the batch side; rows with no dimension match drop (inner). Output
    must equal the equivalent batch join."""
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    stream = es.read_events_stream(spark, events_dir)
    out = es.run_to_memory(
        es.enrich_stream_static(stream, dim).select(
            "event_id", "user_id", "tier"
        ),
        "t_enriched",
        "append",
    ).collect()
    got = {(r.event_id, r.tier) for r in out}
    # independent expectation from the raw fixture
    raw = spark.read.parquet(events_dir).select("event_id", "user_id")
    expect = {
        (r.event_id, {1: "gold", 2: "silver"}[r.user_id])
        for r in raw.collect()
        if r.user_id in (1, 2)
    }
    assert got == expect and got, "stream-static join diverged from batch"


@pytest.fixture(scope="module")
def late_events_dir(spark, tmp_path_factory):
    """Three batches with WITHIN-WATERMARK late data: u9's batch-2
    event predates its open session start by less than the gap (must
    extend the session backward); u8's predates its session by more
    than the gap (must become its own closed earlier session)."""
    path = tmp_path_factory.mktemp("events_late")
    mk = lambda rows: spark.createDataFrame(rows, schema=EVENTS_NANOS_SCHEMA)
    mk(
        [
            (1, (BASE + 1200) * 10**9, 9, "click", 1.0, "{}"),
            (2, (BASE + 7200) * 10**9, 8, "click", 5.0, "{}"),
            (6, (BASE + 7200) * 10**9, 7, "click", 4.0, "{}"),
            (10, (BASE + 7200) * 10**9, 5, "click", 1.0, "{}"),
        ]
    ).coalesce(1).write.parquet(str(path / "b1"))
    mk(
        [
            (3, (BASE + 900) * 10**9, 9, "click", 2.0, "{}"),  # gap-near late
            (4, BASE * 10**9, 8, "click", 7.0, "{}"),  # far late
            # u7: TWO far-late events within gap of EACH OTHER — they
            # must merge into ONE closed session (round-5 advice), not
            # two singletons.
            (7, BASE * 10**9, 7, "click", 1.5, "{}"),
            (8, (BASE + 600) * 10**9, 7, "click", 2.5, "{}"),
            # u5 BRIDGE ordering (round-5 advice #1): a far-late event
            # at cur0-gap-1 closes provisionally, then an in-window
            # event at cur0-gap extends the open session backward to
            # within gap of it — ALL THREE must merge into one session
            # (native session_window semantics), not two.
            (11, (BASE + 7200 - 1801) * 10**9, 5, "click", 2.0, "{}"),
            (12, (BASE + 7200 - 1800) * 10**9, 5, "click", 3.0, "{}"),
        ]
    ).coalesce(1).write.parquet(str(path / "b2"))
    mk([(5, (BASE + 50000) * 10**9, 9, "click", 9.0, "{}")]).coalesce(1).write.parquet(
        str(path / "b3")
    )
    import glob, os, shutil, time

    flat = tmp_path_factory.mktemp("events_late_flat")
    now = time.time()
    for i, sub in enumerate(["b1", "b2", "b3"]):
        src = glob.glob(str(path / sub / "*.parquet"))[0]
        dst = str(flat / f"{i}.parquet")
        shutil.copy(src, dst)
        os.utime(dst, (now + i, now + i))
    return str(flat)


def test_sessionize_late_events_extend_or_split(spark, late_events_dir):
    """Round-4 self-review semantics: a within-gap late event extends
    the open session BACKWARD (start_s moves earlier); a beyond-gap
    late event becomes its own closed single-event session instead of
    being swallowed."""
    stream = es.read_events_stream(spark, late_events_dir, max_files_per_trigger=1)
    out = es.run_to_memory(
        es.sessionize_custom_state(stream, gap_s=1800, watermark="10 hours"),
        "t_late_sessions",
        "append",
    ).collect()
    got = {(r.user_id, r.start_s): (r.end_s, r.n_events, r.total_value) for r in out}
    # u9: batch-2's BASE+900 event merged backward into the BASE+1200
    # session; closed by batch 3's far-future event.
    assert got[(9, BASE + 900)] == (BASE + 1200, 2, 3.0)
    # u8: batch-2's BASE event is > gap before its BASE+7200 session —
    # emitted as its own already-closed session, not merged.
    assert got[(8, BASE)] == (BASE, 1, 7.0)
    # u7: the two far-late events at BASE and BASE+600 (within gap of
    # each other) merge into ONE closed session, mirroring the native
    # session_window merge semantics.
    assert got[(7, BASE)] == (BASE + 600, 2, 4.0)
    assert (7, BASE + 600) not in got
    # u5 bridge-fold: the far-late event at BASE+5399, the in-window
    # event at BASE+5400 (which drags the open session's start back to
    # within gap of it), and the original BASE+7200 event form ONE
    # session — emitted by the event-time timeout after the watermark
    # passes its close point.
    u5 = [k for k in got if k[0] == 5]
    assert u5 == [(5, BASE + 7200 - 1801)], u5
    assert got[(5, BASE + 7200 - 1801)] == (BASE + 7200, 3, 6.0)


def test_hll_registers_stream_matches_batch(spark, events_dir):
    """SURVEY §2.8 policy for the portable register table: the
    streaming MAX-maintained registers equal the batch derivation on
    full replay, both in one gulp and replayed file-by-file (the
    incremental path — each micro-batch only touches its own cells,
    yet the final table is identical)."""
    from rdf_mapreduce_joins_spark.operators.sketches import hll_portable_cols
    from rdf_mapreduce_joins_spark.sources.tables import normalize_events

    batch_events = normalize_events(spark.read.parquet(events_dir))

    want = {
        (r.day_n, r.bucket): r.reg
        for r in batch_events.select(
            F.expr("ts_s div 86400").alias("day_n"),
            *hll_portable_cols("user_id", "md5"),
        )
        .groupBy("day_n", "bucket")
        .agg(F.max("rho").alias("reg"))
        .collect()
    }
    one_gulp = es.run_to_memory(
        es.hll_registers_stream(es.read_events_stream(spark, events_dir)),
        "t_hll_regs",
        "complete",
    ).collect()
    assert {(r.day_n, r.bucket): r.reg for r in one_gulp} == want
    replayed = es.run_to_memory(
        es.hll_registers_stream(
            es.read_events_stream(spark, events_dir, max_files_per_trigger=1)
        ),
        "t_hll_regs_replay",
        "complete",
    ).collect()
    assert {(r.day_n, r.bucket): r.reg for r in replayed} == want

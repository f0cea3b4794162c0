"""Streaming CDC apply sink tests (streaming/cdc_stream.py): the
batch-twin + replay policy's proof obligations — stream-applied final
state equals the from-scratch batch fold, micro-batch replay is
idempotent, and the snapshot pointer survives a crashed publish."""

from __future__ import annotations

import glob
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.plans.cdc import merge_apply
from rdf_mapreduce_joins_spark.streaming import cdc_stream as cs

LOG_SCHEMA = (
    "cust_key bigint, balance_cents bigint, nation_key int, status string, "
    "seq_ts timestamp, seq_id bigint, op string"
)

# Three micro-batches exercising insert, overwrite, delete, and
# delete-then-reinsert across batch boundaries.
BATCHES = [
    [
        (1, 100, 1, "a", "2020-01-01 00:00:00", 1, "U"),
        (2, 200, 2, "b", "2020-01-01 00:00:01", 2, "U"),
        (3, 300, 3, "c", "2020-01-01 00:00:02", 3, "U"),
    ],
    [
        (2, 0, 0, "x", "2020-01-02 00:00:00", 4, "D"),  # delete 2
        (1, 111, 1, "a2", "2020-01-02 00:00:01", 5, "U"),  # overwrite 1
        (4, 400, 4, "d", "2020-01-02 00:00:02", 6, "U"),  # insert 4
    ],
    [
        (2, 222, 2, "back", "2020-01-03 00:00:00", 7, "U"),  # reinsert 2
        (3, 0, 0, "x", "2020-01-03 00:00:01", 8, "D"),  # delete 3
    ],
]
FINAL = {1: (111, 1, "a2"), 2: (222, 2, "back"), 4: (400, 4, "d")}


def _mk_batch(spark, rows):
    df = spark.createDataFrame(
        rows, LOG_SCHEMA.replace("seq_ts timestamp", "seq_ts string")
    )
    return df.withColumn("seq_ts", F.col("seq_ts").cast("timestamp"))


@pytest.fixture(scope="module")
def log_batches_dir(spark, tmp_path_factory):
    """The three micro-batches as single parquet files with staggered
    mtimes so maxFilesPerTrigger=1 replays them in order."""
    flat = tmp_path_factory.mktemp("cdc_flat")
    raw = tmp_path_factory.mktemp("cdc_raw")
    for i, rows in enumerate(BATCHES):
        name = f"b{i}"
        _mk_batch(spark, rows).coalesce(1).write.parquet(str(raw / name))
        src = glob.glob(str(raw / name / "*.parquet"))[0]
        dst = str(flat / f"{name}.parquet")
        shutil.copy(src, dst)
        t = time.time() + i * 10
        os.utime(dst, (t, t))
    return str(flat)


def _state_dict(df) -> dict:
    return {
        r.cust_key: (r.balance_cents, r.nation_key, r.status)
        for r in df.collect()
    }


def test_stream_apply_equals_batch_fold(spark, log_batches_dir, tmp_path):
    """Drive the real file-source stream (one file per trigger) through
    the foreachBatch sink; the final published snapshot must equal the
    from-scratch batch fold over the concatenated changelog."""
    state_dir = str(tmp_path / "state")
    changelog = (
        spark.readStream.schema(LOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(log_batches_dir)
    )
    q = cs.apply_changelog_stream(
        changelog, state_dir, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = _state_dict(cs.read_cdc_state(spark, state_dir))
    assert got == FINAL
    # from-scratch: one merge_apply over the whole changelog from empty
    whole = _mk_batch(spark, [r for b in BATCHES for r in b])
    empty = spark.createDataFrame([], cs.STATE_SCHEMA)
    assert _state_dict(merge_apply(empty, whole)) == FINAL


def test_replay_idempotent(spark, tmp_path):
    """At-least-once delivery: re-applying the SAME micro-batch onto a
    state that already absorbed it must not change the state (upserts
    overwrite with identical values, deletes of absent keys no-op) —
    the property that lets foreachBatch run without a dedup ledger."""
    state_dir = str(tmp_path / "state")
    for rows in BATCHES:
        cs.apply_changelog_batch(_mk_batch(spark, rows), state_dir)
    before = _state_dict(cs.read_cdc_state(spark, state_dir))
    cs.apply_changelog_batch(_mk_batch(spark, BATCHES[-1]), state_dir)
    after = _state_dict(cs.read_cdc_state(spark, state_dir))
    assert before == after == FINAL


def test_stream_recovers_from_crash_mid_publish(
    spark, log_batches_dir, tmp_path, monkeypatch
):
    """VERDICT r9 #8: kill the REAL streaming query between the
    snapshot parquet write and the pointer flip (the narrowest crash
    window the publish protocol has), then restart it from the SAME
    checkpoint. Structured Streaming must replay the failed
    micro-batch (its offset never committed), the replay must re-merge
    onto the last COMMITTED snapshot (the pointer still names it), and
    the recovered final state must equal the from-scratch batch fold —
    the streaming counterpart of test_docs_stream's crashed-publish
    bridge test, exercised through the checkpoint machinery instead of
    a hand-retried batch."""
    from rdf_mapreduce_joins_spark.streaming import snapshots

    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    real_replace = os.replace
    flips = {"n": 0}

    def boom(src, dst):
        if os.path.basename(dst) == cs.STATE_POINTER:
            flips["n"] += 1
            if flips["n"] == 2:  # second micro-batch: snapshot written,
                raise RuntimeError("crash before pointer flip")
        return real_replace(src, dst)

    monkeypatch.setattr(snapshots.os, "replace", boom)
    changelog = (
        spark.readStream.schema(LOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(log_batches_dir)
    )
    q = cs.apply_changelog_stream(changelog, state_dir, ckpt)
    # awaitTermination(timeout) returns False on a plain timeout and
    # raises on query failure; asserting on q.exception() afterwards
    # distinguishes "failed as planned" from "slow host, not yet
    # failed" instead of mislabeling the latter a pattern mismatch
    # (ADVICE r10).
    try:
        terminated = q.awaitTermination(120)
    except Exception:
        terminated = True
    exc = q.exception()
    assert terminated and exc is not None, (
        "query should have failed mid-publish within 120s"
    )
    assert "crash before pointer flip" in str(exc)
    # the crash window left an orphan snapshot dir; the pointer still
    # names batch 0's state — a reader at this instant sees only b0
    assert _state_dict(cs.read_cdc_state(spark, state_dir)) == {
        k: (b, n, s) for (k, b, n, s, _ts, _seq, _op) in BATCHES[0]
    }
    monkeypatch.setattr(snapshots.os, "replace", real_replace)
    q2 = cs.apply_changelog_stream(
        spark.readStream.schema(LOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(log_batches_dir),
        state_dir,
        ckpt,
    )
    q2.awaitTermination(120)
    got = _state_dict(cs.read_cdc_state(spark, state_dir))
    whole = _mk_batch(spark, [r for b in BATCHES for r in b])
    empty = spark.createDataFrame([], cs.STATE_SCHEMA)
    assert got == _state_dict(merge_apply(empty, whole)) == FINAL


def test_snapshot_pointer_survives_crashed_publish(spark, tmp_path, monkeypatch):
    """A publish that crashes mid-write leaves the previous snapshot
    current and readable; the retried batch then commits normally
    (the shared snapshots.py contract applied to the CDC sink)."""
    from rdf_mapreduce_joins_spark.streaming import snapshots

    state_dir = str(tmp_path / "state")
    cs.apply_changelog_batch(_mk_batch(spark, BATCHES[0]), state_dir)
    committed = _state_dict(cs.read_cdc_state(spark, state_dir))

    real_replace = os.replace

    def boom(src, dst):
        if os.path.basename(dst) == cs.STATE_POINTER:
            raise RuntimeError("simulated crash before pointer flip")
        return real_replace(src, dst)

    monkeypatch.setattr(snapshots.os, "replace", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        cs.apply_changelog_batch(_mk_batch(spark, BATCHES[1]), state_dir)
    monkeypatch.setattr(snapshots.os, "replace", real_replace)
    # reader still sees the last committed state
    assert _state_dict(cs.read_cdc_state(spark, state_dir)) == committed
    # retry commits, and the orphan dir does not break version numbering
    cs.apply_changelog_batch(_mk_batch(spark, BATCHES[1]), state_dir)
    cs.apply_changelog_batch(_mk_batch(spark, BATCHES[2]), state_dir)
    assert _state_dict(cs.read_cdc_state(spark, state_dir)) == FINAL


def test_horizon_compaction_gc(spark, log_batches_dir, tmp_path):
    """VERDICT r10 #8: the CDC state's retention story. Stream-apply
    all three batches, then run horizon compaction: keys whose last
    activity predates the horizon are evicted; the retained state
    equals the from-scratch fold restricted to the horizon; the
    compaction publishes through the same atomic-pointer protocol
    (pointer advances, readers never see a half-compacted table); and
    a second compaction at the same horizon is a no-op."""
    state_dir = str(tmp_path / "state")
    q = cs.apply_changelog_stream(
        spark.readStream.schema(LOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(log_batches_dir),
        state_dir,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert _state_dict(cs.read_cdc_state(spark, state_dir)) == FINAL
    from rdf_mapreduce_joins_spark.streaming import snapshots

    before = snapshots.current_snapshot_path(state_dir, cs.STATE_POINTER)
    # horizon: keys 1 and 4 were last touched 2020-01-02, key 2 on
    # 2020-01-03 (its reinsert) — so the horizon evicts exactly {1, 4}
    horizon = "2020-01-03 00:00:00"
    assert cs.compact_cdc_state(spark, state_dir, horizon) == 2
    after = snapshots.current_snapshot_path(state_dir, cs.STATE_POINTER)
    assert after != before  # a new snapshot committed atomically
    got = _state_dict(cs.read_cdc_state(spark, state_dir))
    # from-scratch fold over the retained horizon: latest version per
    # key, live, and dated at/after the horizon
    whole = _mk_batch(spark, [r for b in BATCHES for r in b])
    empty = spark.createDataFrame([], cs.STATE_SCHEMA)
    scratch = merge_apply(empty, whole, track_activity=True)
    expect = {
        r.cust_key: (r.balance_cents, r.nation_key, r.status)
        for r in scratch.filter(
            F.col("last_ts") >= F.lit(horizon)
        ).collect()
    }
    assert got == expect == {2: (222, 2, "back")}
    # idempotent: nothing left below the horizon
    assert cs.compact_cdc_state(spark, state_dir, horizon) == 0

"""Semantics tests for plans/cdc.py (round-9 CDC MERGE/upsert apply).

The driver's oracle gate proves apply == from-scratch by cross-engine
hash; these pin the MERGE semantics against an independent Python fold
on hand-built changelogs — including the edge shapes the TPC-H-derived
fixture may not exercise densely (delete-then-reinsert, delete of a
never-snapshotted key, multiple versions inside one batch) — plus the
chaining invariant on randomized changelogs via hypothesis.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.plans import QUERIES
from rdf_mapreduce_joins_spark.plans.cdc import merge_apply

STATE_SCHEMA = "cust_key bigint, balance_cents bigint, nation_key int, status string"
LOG_SCHEMA = (
    "cust_key bigint, balance_cents bigint, nation_key int, status string, "
    "ep int, seq_ts timestamp, seq_id bigint, op string"
)


def _py_fold(snapshot: dict, events: list[tuple]) -> dict:
    """Independent last-writer-wins fold: events = (key, bal, nk, st,
    seq, op) applied in ascending seq order."""
    state = dict(snapshot)
    for key, bal, nk, stt, _seq, op in sorted(events, key=lambda e: e[4]):
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = (bal, nk, stt)
    return state


def _spark_state(spark, snapshot: dict):
    rows = [(k, *v) for k, v in snapshot.items()]
    return spark.createDataFrame(rows, STATE_SCHEMA)


def _spark_log(spark, events: list[tuple]):
    rows = [
        (k, bal, nk, stt, 1, f"2020-01-{seq:02d} 00:00:00", seq, op)
        for (k, bal, nk, stt, seq, op) in events
    ]
    df = spark.createDataFrame(
        [(k, b, n, s, e, t, q, o) for (k, b, n, s, e, t, q, o) in rows],
        LOG_SCHEMA.replace("seq_ts timestamp", "seq_ts string"),
    )
    return df.withColumn("seq_ts", F.col("seq_ts").cast("timestamp"))


def _as_dict(df) -> dict:
    return {
        r.cust_key: (r.balance_cents, r.nation_key, r.status)
        for r in df.collect()
    }


def test_merge_apply_edge_shapes(spark):
    """Delete-then-reinsert keeps the reinserted values; delete of an
    absent key is a no-op; a pure insert lands; untouched keys
    survive; the latest version inside one batch wins."""
    snapshot = {1: (100, 1, "BASE"), 2: (200, 2, "BASE"), 3: (300, 3, "BASE")}
    events = [
        (2, 0, 0, "gone", 1, "D"),  # delete snapshotted key
        (2, 777, 7, "back", 2, "U"),  # ... then reinsert
        (4, 400, 4, "new", 3, "U"),  # pure insert
        (5, 0, 0, "never", 4, "D"),  # delete of absent key: no-op
        (1, 111, 1, "v1", 5, "U"),
        (1, 112, 1, "v2", 6, "U"),  # same-batch newer version wins
    ]
    got = _as_dict(merge_apply(_spark_state(spark, snapshot), _spark_log(spark, events)))
    assert got == _py_fold(snapshot, events)
    assert got[2] == (777, 7, "back")
    assert 5 not in got
    assert got[1] == (112, 1, "v2")
    assert got[3] == (300, 3, "BASE")


def test_merge_apply_delete_last_wins(spark):
    """If the latest version in the batch is a DELETE the key is gone
    even though earlier versions in the same batch upserted it."""
    snapshot = {1: (100, 1, "BASE")}
    events = [(1, 9, 9, "x", 1, "U"), (1, 0, 0, "x", 2, "D")]
    got = _as_dict(merge_apply(_spark_state(spark, snapshot), _spark_log(spark, events)))
    assert got == {}


@settings(max_examples=15, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),  # key (small: collisions)
            st.integers(min_value=-500, max_value=500),  # balance
            st.sampled_from(["U", "U", "U", "D"]),  # op, delete-light
        ),
        min_size=0,
        max_size=20,
    ),
    snap_keys=st.sets(st.integers(min_value=1, max_value=6), max_size=4),
)
def test_chained_applies_equal_from_scratch(spark, data, snap_keys):
    """apply(apply(snap, first-half), second-half) == python fold over
    the whole event list — the incrementality invariant the oracle
    proves on the fixture, here on adversarial random changelogs."""
    snapshot = {k: (k * 10, k, "BASE") for k in snap_keys}
    events = [
        (k, bal, k, f"s{i}", i + 1, op) for i, (k, bal, op) in enumerate(data)
    ]
    cut = len(events) // 2
    s0 = _spark_state(spark, snapshot)
    s1 = merge_apply(s0, _spark_log(spark, events[:cut]))
    s2 = merge_apply(s1, _spark_log(spark, events[cut:]))
    assert _as_dict(s2) == _py_fold(snapshot, events)


def test_scd2_history_consistent_with_apply(spark, sf_dir):
    """Cross-query invariant: the history query's is_current rows ARE
    the apply query's final state (same keys, same values)."""
    final = QUERIES["cdc_merge_apply"](spark, sf_dir)
    hist = QUERIES["cdc_scd2_history"](spark, sf_dir).filter("is_current")
    a = {
        r.cust_key: (r.balance_cents, r.nation_key, r.status)
        for r in final.collect()
    }
    b = {
        r.cust_key: (r.balance_cents, r.nation_key, r.status)
        for r in hist.collect()
    }
    assert a == b

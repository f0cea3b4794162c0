"""Streaming CDC apply sink — the stream twin of
``plans/cdc.py::cdc_merge_apply`` (batch-twin + replay policy,
SURVEY §2.8): consume a keyed insert/update/delete changelog as a
stream and maintain the merged state table as versioned snapshots
behind an atomic pointer (``streaming/snapshots.py``).

Each micro-batch runs exactly the batch operator
(:func:`rdf_mapreduce_joins_spark.plans.cdc.merge_apply`): collapse
the batch to its latest version per key with a ``max_by`` aggregate,
full-outer join onto the current snapshot, publish the result as the
next snapshot. Replay safety comes from the MERGE semantics
themselves: re-applying a batch onto a state that already absorbed it
is a no-op (upserts overwrite with identical values, deletes of
absent keys do nothing), so Structured Streaming's at-least-once
foreachBatch delivery needs no dedup ledger — pinned by
``tests/test_cdc_stream.py::test_replay_idempotent``.

Single-writer contract: merges are serialized (foreachBatch runs
serially per query); concurrent READERS are safe at any moment via
the snapshot pointer (never a half-written table, n-1 grace for a
reader that resolved the pointer just before a flip).

100 TB posture: per-batch cost is O(batch ∪ state) for the join but
the state side never reshuffles on a real deployment (bucketed /
storage-partitioned by key); the latest-per-key collapse is
map-side-combinable; snapshots make state reads zero-coordination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.plans.cdc import _VALUE_COLS, merge_apply
from rdf_mapreduce_joins_spark.streaming import snapshots

STATE_POINTER = "CDC_STATE_CURRENT"
_STATE_PREFIX = "state-v"
# last_ts = the key's activity clock (latest version timestamp that
# touched it) — maintained so horizon compaction (compact_cdc_state)
# can GC cold keys; without it the state grows O(all keys ever seen)
# (VERDICT r10 #8).
STATE_SCHEMA = (
    "cust_key bigint, balance_cents bigint, nation_key int, "
    "status string, last_ts timestamp"
)


def read_cdc_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current merged state (empty before the first batch commits)."""
    return snapshots.read_snapshot(
        spark, state_dir, STATE_POINTER, STATE_SCHEMA
    )


def apply_changelog_batch(batch: DataFrame, state_dir: str) -> None:
    """One foreachBatch body: merge ``batch`` (changelog rows with the
    ``plans/cdc.py`` schema: cust_key, value cols, seq_ts, seq_id, op)
    onto the persisted state and publish the next snapshot."""
    spark = batch.sparkSession
    state = read_cdc_state(spark, state_dir)
    updated = merge_apply(state, batch, track_activity=True)
    snapshots.publish_snapshot(updated, state_dir, _STATE_PREFIX, STATE_POINTER)


def compact_cdc_state(spark: SparkSession, state_dir: str, horizon) -> int:
    """Horizon compaction / tombstone GC for the streaming CDC state —
    the stream twin of ``plans/cdc.py::cdc_compact_state``: drop every
    key whose last activity (``last_ts``) predates ``horizon`` and
    publish the retained rows as the next snapshot through the same
    atomic-pointer protocol, so readers flip from uncompacted to
    compacted state in one commit and a crash mid-compaction leaves
    the previous snapshot current (the publish protocol's guarantee,
    not new machinery). Runs BETWEEN batches under the single-writer
    contract (same serialized lane as foreachBatch merges). Returns
    the number of evicted keys. At scale the state table is
    partitioned by an activity bucket so this filter is partition
    pruning and eviction is a directory delete — demonstrated by the
    batch twin; the snapshot sink keeps row-level filtering since its
    fixture states are tiny."""
    state = read_cdc_state(spark, state_dir)
    retained = state.filter(F.col("last_ts") >= F.lit(horizon))
    n_evicted = state.count() - retained.count()
    snapshots.publish_snapshot(
        retained, state_dir, _STATE_PREFIX, STATE_POINTER
    )
    return n_evicted


def apply_changelog_stream(
    changelog: DataFrame, state_dir: str, checkpoint_dir: str
):
    """Attach the CDC apply sink to a streaming changelog DataFrame.
    Returns the StreamingQuery (caller awaits / stops it)."""
    return (
        changelog.writeStream.foreachBatch(
            lambda df, _epoch: apply_changelog_batch(df, state_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


__all__ = [
    "STATE_POINTER",
    "STATE_SCHEMA",
    "_VALUE_COLS",
    "apply_changelog_batch",
    "apply_changelog_stream",
    "compact_cdc_state",
    "read_cdc_state",
]

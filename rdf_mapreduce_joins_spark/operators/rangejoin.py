"""Bucketed range (interval-containment) join — an operator Spark has
no native node for (SURVEY.md §2.3 extension family, alongside the
as-of join): match probe rows whose point timestamp falls inside
interval rows' ``[start, end]``.

Why not express it directly: ``probe.join(iv, (p.ts >= iv.start) &
(p.ts <= iv.end))`` is a pure theta join — Catalyst can only plan it
as BroadcastNestedLoopJoin (or a cartesian), which is O(|probe|x|iv|)
comparisons and the plan-gate's cardinal sin at 100 TB.

The bucketed form turns it into an equi-join:

* every interval is exploded to the fixed-width time buckets it
  overlaps (``sequence(start div B, end div B)`` — short arrays as
  long as intervals are O(bucket) wide),
* every probe row belongs to exactly ONE bucket (``ts div B``),
* equi-join on (keys..., bucket), then re-check exact containment.

Because the probe side contributes one bucket per row, each matching
(probe, interval) pair meets in exactly one bucket — no post-join
dedup is needed. Shuffle moves |probe| + |iv| x overlap rows hashed on
(keys, bucket); both sides partition-prune and the join is a plain
SortMergeJoin/ShuffledHashJoin Catalyst can reorder and AQE can
skew-split. This is the same trick Databricks' range-join hint and
KDB's temporal joins use; bucket width should be chosen near the
typical interval length so the explode factor stays ~2-3.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_interval_join(
    probe: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    probe_ts: str,
    start: str,
    end: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each ``probe`` row to every ``intervals`` row (sharing the
    ``on`` keys) whose ``[start, end]`` contains ``probe_ts``
    (inclusive both ends; all three are integer epoch-second columns).

    ``how='inner'`` only — containment joins with outer semantics
    need the unmatched-side union the caller can add cheaply.
    """
    if how != "inner":
        raise ValueError("bucketed_interval_join supports inner joins only")
    b = int(bucket_width)

    def _bucket(col: str) -> Column:
        # TRUE integer division (`div`), not floor(double/double): the
        # double path is exact only below 2^53, so epoch-nanosecond
        # inputs would silently land in wrong buckets and drop
        # matches. Timestamps are non-negative in this domain, so
        # truncation == floor and both join sides agree on bucket ids
        # at any magnitude a BIGINT holds.
        return F.expr(f"CAST(`{col}` AS BIGINT) div {b}")

    iv = intervals.withColumn(
        "__bucket", F.explode(F.sequence(_bucket(start), _bucket(end)))
    )
    pr = probe.withColumn("__bucket", _bucket(probe_ts))
    joined = pr.join(iv, [*on, "__bucket"], "inner").where(
        (F.col(probe_ts) >= F.col(start)) & (F.col(probe_ts) <= F.col(end))
    )
    return joined.drop("__bucket")

"""As-of (backward) join — a time-series operator Spark has no native
node for (SURVEY.md §2.3 lists it as beyond the reference's surface;
it is table stakes for event-stream enrichment, so the engine carries
it as an extension operator).

Implemented as a composition of built-ins, NOT a join: tag both
inputs, union them, and run one ``last(payload) IGNORE NULLS`` window
per key ordered by time. Each left row picks up the most recent right
payload at-or-before its timestamp.

Why this shape at scale: a naive ``left.join(right, key).filter(r.ts
<= l.ts)`` + argmax explodes to |left|x|right| per key before
filtering; the union form is ONE shuffle on the key, one sort by
(ts, side), zero row amplification — the plan survives arbitrarily
dense right-hand histories. Equal timestamps resolve right-before-left
(inclusive match), matching ASOF JOIN's ``l.ts >= r.ts`` semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """Backward as-of join: left enriched with the latest right row
    whose ``right_ts`` <= ``left_ts``, per ``on`` key; right payload
    columns come back NULL when no prior right row exists.

    The right side must be unique per (key, right_ts) — dedupe first
    (ties at identical timestamps are otherwise nondeterministic in
    every as-of implementation, including SQL ASOF JOIN)."""
    payload_cols = [c for c in right.columns if c not in (*on, right_ts)]
    l_tagged = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(1))
    )
    r_tagged = (
        right.select(
            *on,
            F.col(right_ts).alias("__ts"),
            F.struct(*payload_cols).alias("__payload"),
        )
        .withColumn("__side", F.lit(0))
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # right rows (side 0) sort before left rows at the same instant ->
    # an exactly-simultaneous right row is visible to the left row.
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"__match.{c}").alias(c) for c in payload_cols
    ]
    return enriched.filter(F.col("__side") == 1).select(*out_cols)

"""Scale-safe exact global ranking / running sums (VERDICT r6 #2).

A global ``row_number()`` / running ``SUM`` window with no PARTITION BY
forces the entire frame through ONE task's sort — fine over a bounded
spine (25 nations, ~80 months, 256 histogram buckets), fatal over a
frame that grows with a dimension (10^8 customers / parts at 100 TB).

These helpers compute the SAME exact answer with the two-level prefix
pattern already proven in-repo by ``parts_pareto_skyline``
(plans/analytics.py):

1. bucket every row by a coarse key that is MONOTONE in the target sort
   order and whose cardinality is bounded by the VALUE DOMAIN, not the
   row count (days in the date range, integer order counts, fixed-width
   cents ranges);
2. aggregate per-bucket partials (one keyed shuffle);
3. run the cumulative window over the BUCKET SUMMARY only — a bounded
   spine, the sanctioned unpartitioned-window class;
4. broadcast the per-bucket offsets back and finish with a window
   PARTITIONED BY bucket, so no task ever sorts more than one bucket.

Exactness: within-bucket ``row_number``/running-sum plus the prior-
bucket offset reproduces the global window value bit-for-bit (the
bucket key is monotone in the order, so global order == (bucket,
within-bucket order)); every oracle hash-match is preserved.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Route threshold for size-gated rank/prefix plans: when the BASE
# TABLE scan is under this many bytes (Catalyst's sizeInBytes
# statistic — the same metadata Spark's own broadcast-join pick reads,
# so the probe costs ZERO jobs), a single-task global-window sort over
# the derived aggregate is the FASTER plan (the two-level prefix path
# pays ~12 fixed-overhead jobs; measured ~3x slower on a 15k-row frame
# and 1.01x wall at 10x data on the big path). The threshold itself
# bounds the window route's spine — the aggregate frame has at most as
# many rows as its base table — so a sanctioned unpartitioned window
# on the small route stays provably bounded.
RANK_GLOBAL_WINDOW_MAX_INPUT_BYTES = 256 << 20


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate for the frame's optimized plan
    (for a parquet scan: the file index's total bytes) — a pure
    metadata read, no job."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def bucketed_global_rank(
    df: DataFrame,
    bucket: Column,
    order: Sequence[Column],
    rank_name: str = "rank",
) -> DataFrame:
    """Exact 1-based global ``row_number()`` under ``order`` without a
    single-partition window.

    ``bucket`` MUST be monotone non-decreasing w.r.t. ``order`` (sorting
    by (bucket ASC, order) equals sorting by ``order`` alone) and its
    cardinality must be bounded by the value domain — the caller owns
    that argument, documented at each call site. Sort keys and bucket
    values must be NON-NULL (a null bucket key would drop out of the
    offset equi-join; the global window's nulls-first order has no
    analogue here).
    """
    d = df.withColumn("_rk_bkt", bucket)
    bm = d.groupBy("_rk_bkt").agg(F.count(F.lit(1)).alias("_rk_cnt"))
    w_prior = Window.orderBy("_rk_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = bm.select(
        "_rk_bkt",
        F.coalesce(F.sum("_rk_cnt").over(w_prior), F.lit(0)).alias("_rk_off"),
    )
    w_in = Window.partitionBy("_rk_bkt").orderBy(*order)
    return (
        d.withColumn("_rk_rn", F.row_number().over(w_in))
        .join(F.broadcast(off), "_rk_bkt")
        .withColumn(
            rank_name,
            (F.col("_rk_off") + F.col("_rk_rn")).cast("bigint"),
        )
        .drop("_rk_bkt", "_rk_rn", "_rk_off")
    )


def bucketed_running_sum(
    df: DataFrame,
    bucket: Column,
    order: Sequence[Column],
    value: str,
    cum_name: str = "cum",
) -> DataFrame:
    """Exact global running ``SUM(value)`` (ROWS UNBOUNDED PRECEDING ..
    CURRENT ROW) under ``order``, same bucket contract as
    :func:`bucketed_global_rank`. ``value`` must be an integer column
    (the prefix decomposition is exact only under associative integer
    addition)."""
    d = df.withColumn("_ps_bkt", bucket)
    bm = d.groupBy("_ps_bkt").agg(F.sum(value).alias("_ps_sum"))
    w_prior = Window.orderBy("_ps_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = bm.select(
        "_ps_bkt",
        F.coalesce(F.sum("_ps_sum").over(w_prior), F.lit(0)).alias("_ps_off"),
    )
    w_in = (
        Window.partitionBy("_ps_bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("_ps_run", F.sum(value).over(w_in))
        .join(F.broadcast(off), "_ps_bkt")
        .withColumn(
            cum_name,
            (F.col("_ps_off") + F.col("_ps_run")).cast("bigint"),
        )
        .drop("_ps_bkt", "_ps_run", "_ps_off")
    )


def ntile_from_rank(rank_col: str, total_col: str, n: int) -> Column:
    """ANSI ``ntile(n)`` reconstructed from an exact global rank and the
    frame's total row count — pure integer arithmetic, bit-identical to
    the window function: with q = total DIV n and rem = total % n, the
    first ``rem`` tiles hold q+1 rows, the rest hold q. The DIV-by-q
    branch is unreachable when q == 0 (then rank <= rem == total), so
    the CASE never divides by zero."""
    q = f"(CAST({total_col} AS BIGINT) DIV {n})"
    rem = f"(CAST({total_col} AS BIGINT) % {n})"
    cut = f"({rem} * ({q} + 1))"
    r = f"CAST({rank_col} AS BIGINT)"
    return F.expr(
        f"CAST(CASE WHEN {r} <= {cut} THEN ({r} + {q}) DIV ({q} + 1) "
        f"ELSE {rem} + ({r} - {cut} + {q} - 1) DIV {q} END AS BIGINT)"
    )

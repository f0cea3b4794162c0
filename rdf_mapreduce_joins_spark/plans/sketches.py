"""Mergeable-sketch aggregation (SURVEY.md §2.4 A4 deepened): Apache
DataSketches HLL / KLL / Theta via Spark 4's built-in sketch
functions.

The 100 TB pattern these declare: per-partition/per-day SUMMARY TABLES
of binary sketches that are (a) tiny (KBs per group regardless of
input size), (b) exactly re-mergeable (union of sketches == sketch of
union), so rollups across days / regions / tenants never rescan raw
data — the cross-job analog of Spark's internal partial aggregation,
and what `approx_count_distinct` alone cannot do (its HLL++ state is
not exposed for later merging).

All three queries are rows-only for the driver (sketch estimates are
deterministic for fixed input but not ANSI-SQL-reproducible in
DuckDB); tests pin the estimates against exact answers with the
sketch-family error bounds AND pin merge losslessness (HLL union ==
direct sketch at the same lgK).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.plans.registry import query
from rdf_mapreduce_joins_spark.sources.tables import load_table

HLL_LGK = 12  # 2^12 registers → ~1.6% relative standard error


@query("agg_hll_mergeable")  # rows-only: sketch estimates not SQL-expressible
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level distinct-count rollup entirely in sketch space:
    per-nation HLL sketches of customer keys, then the REGION rollup
    computed by hll_union_agg over the nation sketches — never
    touching the customer table again. The union is lossless at equal
    lgK, so region estimates are identical to direct region sketches
    (pinned in tests). Emits one row per region (estimate + nation
    count); the exact twin is agg_count_distinct."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    per_nation = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_regionkey", "c_nationkey")
        .agg(F.hll_sketch_agg("c_custkey", F.lit(HLL_LGK)).alias("sk"))
    )
    return (
        per_nation.groupBy("n_regionkey")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
            .cast("bigint")
            .alias("est_customers"),
            F.count("*").cast("bigint").alias("n_nations"),
        )
        .orderBy("n_regionkey")
    )


@query("agg_kll_quantiles")  # rows-only: sketch estimates not SQL-expressible
def agg_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-mergeable quantiles: per-event-type KLL double
    sketches over value, queried at p50/p90/p99. KLL guarantees a
    RANK error (≈1.7% at the default k=200), not a value error — the
    tests therefore assert rank-tolerance against exact percentiles,
    the correct contract for heavy-tailed data. The sketch column is
    what a daily summary table would persist; re-aggregation across
    days is kll_sketch_merge, never a raw rescan."""
    e = load_table(spark, sf_dir, "events")
    sk = e.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value").alias("sk"),
        F.count("*").cast("bigint").alias("n"),
    )
    return sk.select(
        "event_type",
        "n",
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.5)), 4).alias("p50"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.9)), 4).alias("p90"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.99)), 4).alias("p99"),
    ).orderBy("event_type")


@query("agg_theta_distinct")  # rows-only: sketch estimates not SQL-expressible
def agg_theta_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch distinct users per event type — the sketch family
    built for downstream SET ALGEBRA (union/intersection/difference
    of audiences) rather than pure counting. Declared at the
    per-type estimate level (deterministic for fixed input); the
    audience-overlap composition is exercised in tests against exact
    intersections."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.theta_sketch_estimate(F.theta_sketch_agg("user_id"))
            .cast("bigint")
            .alias("est_users")
        )
        .orderBy("event_type")
    )


ROLLING_DAYS = 7


@query("events_rolling_distinct_hll")  # rows-only: sketch estimates
def events_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users from PRE-AGGREGATED daily
    sketches: one HLL per day, then a window hll_union_agg over the
    trailing week — the pattern that makes sliding distinct-count
    tractable at 100 TB. Exact rolling COUNT(DISTINCT) must rescan
    every event in every window (7x read amplification, quadratic
    state); this touches each event once at daily-sketch build, and
    the window slides over #days sketch rows of a few KB each.
    Value-tested against the exact rolling distinct in
    tests/test_sketches.py."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sk"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("day").rowsBetween(-(ROLLING_DAYS - 1), 0)
    return daily.select(
        "day",
        "n_events",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w))
        .cast("bigint")
        .alias("est_rolling_users"),
    ).orderBy("day")

"""Value tests for plans/sketches.py: sketch estimates against exact
answers with family-correct error bounds, and the merge-losslessness
property that makes sketch summary tables sound."""

from __future__ import annotations

import pyspark.sql.functions as F

from rdf_mapreduce_joins_spark.plans import QUERIES
from rdf_mapreduce_joins_spark.plans.sketches import HLL_LGK

SF = "/root/testdata/sf0.01"


def test_hll_rollup_close_to_exact_and_merge_lossless(spark):
    got = {r.n_regionkey: r.est_customers for r in QUERIES["agg_hll_mergeable"](spark, SF).collect()}
    c = spark.read.parquet(f"{SF}/customer.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    exact = {
        r.n_regionkey: r.n
        for r in c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey")
        .agg(F.countDistinct("c_custkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, est in got.items():
        # lgK=12 → ~1.6% RSE; allow 5 sigma-ish plus integer slack
        assert abs(est - exact[k]) <= max(3, 0.08 * exact[k]), (k, est, exact[k])
    # merge losslessness: union of per-nation sketches == one direct
    # sketch per region at the same lgK
    direct = {
        r.n_regionkey: r.est
        for r in c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("c_custkey", F.lit(HLL_LGK))
            ).cast("bigint").alias("est")
        )
        .collect()
    }
    assert got == direct


def test_kll_quantiles_within_rank_tolerance(spark):
    rows = QUERIES["agg_kll_quantiles"](spark, SF).collect()
    e = spark.read.parquet(f"{SF}/events.parquet")
    for r in rows:
        vals = sorted(
            x.value for x in e.filter(F.col("event_type") == r.event_type).collect()
        )
        n = len(vals)
        assert r.n == n
        for p, est in ((0.5, r.p50), (0.9, r.p90), (0.99, r.p99)):
            # KLL k=200 → ~1.7% rank error (3-sigma ~5%): the estimate
            # must be an order statistic within that rank window
            lo = vals[max(0, int((p - 0.05) * n))]
            hi = vals[min(n - 1, int((p + 0.05) * n))]
            assert lo <= est <= hi, (r.event_type, p, est, lo, hi)


def test_theta_estimates_and_exact_twin(spark):
    got = {r.event_type: r.est_users for r in QUERIES["agg_theta_distinct"](spark, SF).collect()}
    e = spark.read.parquet(f"{SF}/events.parquet")
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k in got:
        assert abs(got[k] - exact[k]) <= max(2, 0.05 * exact[k])


def test_rolling_hll_tracks_exact_rolling_distinct(spark):
    rows = QUERIES["events_rolling_distinct_hll"](spark, SF).collect()
    e = spark.read.parquet(f"{SF}/events.parquet")
    by_day = {
        r.day: set(r.users)
        for r in e.groupBy(F.to_date("ts").alias("day"))
        .agg(F.collect_set("user_id").alias("users"))
        .collect()
    }
    days = sorted(by_day)
    assert [r.day for r in rows] == days
    for i, r in enumerate(rows):
        exact = len(set().union(*(by_day[d] for d in days[max(0, i - 6) : i + 1])))
        assert abs(r.est_rolling_users - exact) <= max(3, 0.08 * exact), (
            r.day, r.est_rolling_users, exact,
        )

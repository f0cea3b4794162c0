"""Value tests for plans/sketches.py: sketch estimates against exact
answers with family-correct error bounds, the merge-losslessness
property that makes sketch summary tables sound, and — for the
portable md5-family trio — full pure-Python recomputation of the
register tables and estimates (zero borrowed engine primitives)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from rdf_mapreduce_joins_spark.operators.hashing import md5_hex60_py
from rdf_mapreduce_joins_spark.operators.sketches import (
    HLL_PORTABLE_M,
    hll_portable_alpha,
    hll_portable_rho_py,
)
from rdf_mapreduce_joins_spark.plans import QUERIES
from rdf_mapreduce_joins_spark.plans.sketches import HLL_LGK, KMV_K

SF = "/root/testdata/sf0.01"


def _py_hll_estimate(regs: dict[int, int]) -> float:
    """Pure-Python twin of hll_portable_estimate_sql over a sparse
    {bucket: reg} register map."""
    m = HLL_PORTABLE_M
    sreg = sum(1 << (53 - r) for r in regs.values()) + (m - len(regs)) * (1 << 53)
    v = m - len(regs)
    raw = hll_portable_alpha(m) * m * m * float(1 << 53) / sreg
    if raw <= 2.5 * m and v > 0:
        return m * math.log(m / v)
    return raw


def _py_registers(keys) -> dict[int, int]:
    regs: dict[int, int] = {}
    for k in keys:
        h = md5_hex60_py(str(k))
        b = h % HLL_PORTABLE_M
        regs[b] = max(regs.get(b, 0), hll_portable_rho_py(h))
    return regs


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


def test_portable_hll_matches_python_and_tracks_exact(spark):
    """agg_hll_portable: (a) the estimate tracks the exact distinct
    count within the m=256 error envelope, (b) a full pure-Python
    rebuild of the two-level register rollup (hashlib md5 + integer
    rho — no Spark/DuckDB primitives) reproduces the estimate."""
    rows = QUERIES["agg_hll_portable"](spark, SF).collect()
    c = spark.read.parquet(f"{SF}/customer.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    joined = c.join(n, c.c_nationkey == n.n_nationkey).select(
        "n_regionkey", "c_custkey"
    )
    by_region: dict[int, set[int]] = {}
    for r in joined.collect():
        by_region.setdefault(r.n_regionkey, set()).add(r.c_custkey)
    assert {r.n_regionkey for r in rows} == set(by_region)
    for r in rows:
        exact = len(by_region[r.n_regionkey])
        assert abs(r.est_customers - exact) <= max(3, 0.2 * exact), (
            r.n_regionkey, r.est_customers, exact,
        )
        py_est = _py_hll_estimate(_py_registers(by_region[r.n_regionkey]))
        assert abs(r.est_customers - round(py_est, 4)) <= 1.5e-4, (
            r.n_regionkey, r.est_customers, py_est,
        )
        assert r.n_nation_sketches >= 1


def test_portable_kmv_matches_python_and_tracks_exact(spark):
    """agg_kmv_distinct: estimate within the bottom-k error envelope
    AND the k-th-minimum arithmetic reproduced from hashlib."""
    rows = QUERIES["agg_kmv_distinct"](spark, SF).collect()
    e = spark.read.parquet(f"{SF}/events.parquet")
    by_type: dict[str, set[int]] = {}
    for r in e.select("event_type", "user_id").collect():
        by_type.setdefault(r.event_type, set()).add(r.user_id)
    assert {r.event_type for r in rows} == set(by_type)
    for r in rows:
        exact = len(by_type[r.event_type])
        hashes = sorted(md5_hex60_py(str(u)) for u in by_type[r.event_type])
        if len(hashes) < KMV_K:
            assert r.n_minvals == len(hashes)
            assert r.est_users == float(len(hashes))
        else:
            assert r.n_minvals == KMV_K
            hk = hashes[KMV_K - 1]
            py_est = float((KMV_K - 1) * (1 << 60)) / hk
            assert abs(r.est_users - round(py_est, 4)) <= 1.5e-4
            # k=64 -> ~12.7% RSE; 3-sigma envelope
            assert abs(r.est_users - exact) <= max(3, 0.4 * exact), (
                r.event_type, r.est_users, exact,
            )


def test_portable_rolling_matches_python_rolling_union(spark):
    """events_rolling_distinct_portable: the trailing-7-day register
    merge equals a Python rebuild (registers of the UNION == bucket-max
    of daily registers — the merge law, checked end to end), and the
    estimate tracks the exact rolling distinct."""
    from rdf_mapreduce_joins_spark.sources.tables import load_table

    rows = QUERIES["events_rolling_distinct_portable"](spark, SF).collect()
    e = load_table(spark, SF, "events")
    day_users: dict[int, set[int]] = {}
    for r in e.select(
        F.expr("ts_s div 86400").alias("day_n"),
        "user_id",
    ).collect():
        day_users.setdefault(r.day_n, set()).add(r.user_id)
    days = sorted(day_users)
    assert [r.day_n for r in rows] == days
    for i, r in enumerate(rows):
        window_users = set().union(
            *(day_users[d] for d in days if 0 <= r.day_n - d <= 6)
        )
        exact = len(window_users)
        py_est = _py_hll_estimate(_py_registers(window_users))
        assert abs(r.est_rolling_users - round(py_est, 4)) <= 1.5e-4, (
            r.day_n, r.est_rolling_users, py_est,
        )
        assert abs(r.est_rolling_users - exact) <= max(3, 0.25 * exact), (
            r.day_n, r.est_rolling_users, exact,
        )
    n_events = {
        r.day_n: r.n
        for r in e.groupBy(F.expr("ts_s div 86400").alias("day_n"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r.day_n: r.n_events for r in rows} == n_events


def test_portable_rho_three_engine_parity(spark):
    """The rho primitive itself, three ways: Python bit tricks, Spark
    shiftright/bit_count, DuckDB // and bit_count — byte-identical on
    a probe set covering the edge cases (w=0, single high bit, dense
    low bits)."""
    import duckdb

    probes = [0, 1, 255, 256, 257, 512, 4096, (1 << 59) + 256, (1 << 60) - 1,
              123456789012345, 3 << 8, 1 << 8]
    expected = [hll_portable_rho_py(h) for h in probes]
    from rdf_mapreduce_joins_spark.operators.sketches import hll_portable_rho_sql

    con = duckdb.connect()
    duck = [
        con.sql(
            f"SELECT {hll_portable_rho_sql('h')} FROM (SELECT CAST({h} AS BIGINT) AS h)"
        ).fetchone()[0]
        for h in probes
    ]
    assert duck == expected
    sdf = spark.createDataFrame([(h,) for h in probes], "h long")
    got = [
        r.rho
        for r in sdf.select(
            F.expr(hll_portable_rho_sql("h").replace("//", "div")).alias("rho")
        ).collect()
    ]
    assert got == expected


def test_quantile_histogram_rank_window(spark):
    """agg_quantile_histogram: the upper-bucket-edge readout must sit
    within one grid step above the exact rank-based percentile (the
    histogram's value-error contract)."""
    rows = QUERIES["agg_quantile_histogram"](spark, SF).collect()
    e = spark.read.parquet(f"{SF}/events.parquet")
    for r in rows:
        vals = sorted(
            x.value for x in e.filter(F.col("event_type") == r.event_type).collect()
        )
        n = len(vals)
        assert r.n == n
        width = (vals[-1] - vals[0]) / 256.0 if vals[-1] > vals[0] else 1.0
        for p, est in ((0.5, r.p50), (0.9, r.p90), (0.99, r.p99)):
            exact = vals[min(n - 1, max(0, math.ceil(p * n) - 1))]
            assert exact - 1e-9 <= est <= exact + width + 1e-6, (
                r.event_type, p, est, exact, width,
            )


def test_kmv_overlap_matches_python_and_tracks_exact(spark):
    """agg_kmv_overlap: full pure-Python rebuild of the bottom-k union
    sketches per month pair (hashlib), plus envelope checks against the
    exact month-over-month customer overlap."""
    rows = QUERIES["agg_kmv_overlap"](spark, SF).collect()
    o = spark.read.parquet(f"{SF}/orders.parquet")
    by_month: dict[int, set[int]] = {}
    for r in o.select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mon_n"),
        "o_custkey",
    ).collect():
        by_month.setdefault(r.mon_n, set()).add(r.o_custkey)
    expect_months = sorted(m for m in by_month if m - 1 in by_month)
    assert [r.mon_n for r in rows] == expect_months
    for r in rows:
        cur, prev = by_month[r.mon_n], by_month[r.mon_n - 1]
        union, inter = cur | prev, cur & prev
        hashes = sorted((md5_hex60_py(str(k)), k) for k in union)
        topk = hashes[:KMV_K]
        assert r.n_minvals == min(KMV_K, len(union))
        n_both = sum(1 for _, k in topk if k in inter)
        jacc = n_both / len(topk)
        assert abs(r.jaccard_est - round(jacc, 4)) <= 1.5e-4
        if len(union) < KMV_K:
            assert r.est_union_customers == float(len(union))
        else:
            py_union = float((KMV_K - 1) * (1 << 60)) / topk[-1][0]
            assert abs(r.est_union_customers - round(py_union, 4)) <= 1.5e-4
            # k=64 -> ~12.7% RSE, 3-sigma envelope on the union size
            assert abs(r.est_union_customers - len(union)) <= max(
                3, 0.4 * len(union)
            )
        # jaccard of a uniform k-sample: loose absolute envelope
        exact_j = len(inter) / len(union)
        assert abs(r.jaccard_est - exact_j) <= 0.2, (r.mon_n, r.jaccard_est, exact_j)


def test_hll_summary_roundtrip_matches_python(spark):
    """events_hll_summary_roundtrip: weekly estimates after the
    parquet round trip equal a pure-Python rebuild straight from the
    raw events (registers survived the sink/scan bit-exactly and
    rollup-of-summaries == direct-from-raw)."""
    from rdf_mapreduce_joins_spark.sources.tables import load_table

    rows = QUERIES["events_hll_summary_roundtrip"](spark, SF).collect()
    e = load_table(spark, SF, "events")
    week_users: dict[int, set[int]] = {}
    week_days: dict[int, set[int]] = {}
    for r in e.select(
        F.expr("ts_s div 86400").alias("day_n"), "user_id"
    ).collect():
        w = r.day_n // 7
        week_users.setdefault(w, set()).add(r.user_id)
        week_days.setdefault(w, set()).add(r.day_n)
    assert [r.week_n for r in rows] == sorted(week_users)
    for r in rows:
        assert r.n_days == len(week_days[r.week_n])
        py_est = _py_hll_estimate(_py_registers(week_users[r.week_n]))
        assert abs(r.est_weekly_users - round(py_est, 4)) <= 1.5e-4, (
            r.week_n, r.est_weekly_users, py_est,
        )


def test_bloom_prefilter_matches_python_confusion_matrix(spark):
    """join_bloom_prefilter (plans/relational.py — bloom bitset on the
    same md5 family): full confusion matrix rebuilt from hashlib.
    Proves the no-false-negative law and the exact deterministic
    false-positive set independently of both engines."""
    from rdf_mapreduce_joins_spark.plans.relational import (
        BLOOM_DIM_NATION,
        BLOOM_K,
        BLOOM_M,
    )

    row = QUERIES["join_bloom_prefilter"](spark, SF).collect()[0]
    s = spark.read.parquet(f"{SF}/supplier.parquet")
    dim = {
        r.s_suppkey
        for r in s.filter(F.col("s_nationkey") == BLOOM_DIM_NATION).collect()
    }
    bits = set()
    for k in dim:
        for i in range(BLOOM_K):
            bits.add(md5_hex60_py(f"{i}:{k}") % BLOOM_M)
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_suppkey").collect()
    n_fact = len(li)
    n_pass = n_exact = n_tp = n_fp = 0
    member_cache: dict[int, tuple[bool, bool]] = {}
    for r in li:
        k = r.l_suppkey
        if k not in member_cache:
            p = all(
                md5_hex60_py(f"{i}:{k}") % BLOOM_M in bits for i in range(BLOOM_K)
            )
            member_cache[k] = (p, k in dim)
        p, e = member_cache[k]
        n_pass += p
        n_exact += e
        n_tp += p and e
        n_fp += p and not e
    assert (row.n_fact, row.n_pass_bloom, row.n_exact_match) == (
        n_fact, n_pass, n_exact,
    )
    assert (row.n_true_positive, row.n_false_positive) == (n_tp, n_fp)
    assert row.n_true_positive == row.n_exact_match  # no false negatives
    expected_rate = 0.0 if n_fact == n_exact else n_fp / (n_fact - n_exact)
    assert abs(row.fp_rate - round(expected_rate, 6)) <= 1e-6


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

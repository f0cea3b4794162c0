"""Value/property tests for plans/curation.py, plans/analytics.py and
operators/layout.py (the round-4 curation + warehouse-analytics
surface). The driver's oracle gate proves cross-engine hash equality;
these pin the SEMANTICS against independent Python references and the
invariants a refactor could silently break."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.operators.layout import zorder_sql, zorder_value
from rdf_mapreduce_joins_spark.plans import QUERIES


def _py_zorder(vals: list[int], bits: int) -> int:
    z = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> b) & 1) << (b * len(vals) + i)
    return z


def test_zorder_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 37, 255) for y in (0, 2, 9, 100, 255)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn(
            "z", zorder_value([F.col("x"), F.col("y")], bits=8)
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _py_zorder([x, y], 8), (x, y)


def test_zorder_sql_matches_column(spark):
    """zorder_sql is documented as textually parallel to zorder_value;
    prove they are the same function by evaluating both in Spark."""
    df = spark.createDataFrame(
        [(3, 200), (17, 5), (255, 255)], "x bigint, y bigint"
    )
    both = df.select(
        zorder_value([F.col("x"), F.col("y")], bits=8).alias("a"),
        F.expr(zorder_sql(["x", "y"], bits=8)).alias("b"),
    ).collect()
    assert all(r.a == r.b for r in both)


def test_zorder_locality_beats_linear_sort(spark):
    """The point of Z-ordering: a predicate on the NON-leading
    dimension prunes files too. Sort a 16x16 grid by z vs by (x, y),
    cut into 8 contiguous files, and count files whose footer y-range
    overlaps y=5: the linear layout hits ALL files (each spans the
    full y extent), the Z layout must skip at least half."""
    pts = [(x, y) for x in range(16) for y in range(16)]

    def files_hit_by_y(order: list[tuple[int, int]], y: int, nfiles: int = 8) -> int:
        sz = len(order) // nfiles
        hit = 0
        for i in range(nfiles):
            ys = [p[1] for p in order[i * sz : (i + 1) * sz]]
            hit += min(ys) <= y <= max(ys)
        return hit

    zsorted = sorted(pts, key=lambda p: _py_zorder([p[0], p[1]], 8))
    linear = sorted(pts)
    assert files_hit_by_y(linear, 5) == 8
    assert files_hit_by_y(zsorted, 5) <= 4


def test_pareto_skyline_matches_bruteforce(spark, sf_dir):
    parts = {
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in spark.read.parquet(f"{sf_dir}/part.parquet")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    }
    expected = {
        (k, pr, sz)
        for (k, pr, sz) in parts
        if not any(
            qpr <= pr and qsz >= sz and (qpr < pr or qsz > sz)
            for (_, qpr, qsz) in parts
        )
    }
    got = {
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in QUERIES["parts_pareto_skyline"](spark, sf_dir).collect()
    }
    assert got == expected


def test_weighted_sample_is_deterministic_and_length_biased(spark, sf_dir):
    a = QUERIES["sample_weighted_docs"](spark, sf_dir).collect()
    b = QUERIES["sample_weighted_docs"](spark, sf_dir).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    assert len(a) == 100
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = sum(r.n_chars for r in a) / len(a)
    # Inclusion odds scale with n_chars, so the sampled mean length
    # must sit strictly above the corpus mean (the whole point of
    # weighting); a uniform sampler fails this with high probability.
    assert sample_mean > corpus_mean


def test_temperature_mixture_quota_shape(spark, sf_dir):
    sel = QUERIES["docs_temperature_mixture"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    picked: dict[str, int] = {}
    for r in sel:
        picked[r.lang] = picked.get(r.lang, 0) + 1
    s = sum(math.sqrt(n) for n in counts.values())
    for lang, n in counts.items():
        target = min(n, math.floor(round(250 * math.sqrt(n) / s, 6)))
        assert picked.get(lang, 0) == target, lang
    # sqrt-temperature compresses the head/tail ratio: the picked
    # share of the rarest language must exceed its corpus share.
    rare = min(counts, key=counts.get)
    assert picked[rare] / len(sel) > counts[rare] / sum(counts.values())


def test_bigram_lm_probabilities(spark, sf_dir):
    rows = QUERIES["text_bigram_lm"](spark, sf_dir).collect()
    assert len(rows) == 25
    assert all(0 < r.p <= 1 for r in rows)
    # counts are descending (deterministic ordering by n desc, w1, w2)
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_scd2_intervals_tile_history(spark, sf_dir):
    rows = QUERIES["orders_scd2_intervals"](spark, sf_dir).collect()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for cust, ivs in by_cust.items():
        ivs.sort(key=lambda r: (r.valid_from, r.o_orderkey))
        assert all(iv.days_valid >= 0 for iv in ivs)
        # Exactly one open-ended interval per customer, and each
        # interval closes where the next one opens (no gaps/overlaps
        # between distinct dates).
        opens = [iv for iv in ivs if str(iv.valid_to) == "2099-12-31"]
        assert len(opens) == 1 and opens[0] is ivs[-1]
        for prev, nxt in zip(ivs, ivs[1:]):
            assert prev.valid_to == nxt.valid_from or prev.valid_from == nxt.valid_from


def test_resample_grid_is_dense_and_anchored(spark, sf_dir):
    rows = QUERIES["events_resample_interp"](spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    e = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.max("value").alias("v"))
        .collect()
    )
    obs = {(r.user_id, r.day): r.v for r in e}
    for user, grid in by_user.items():
        days = sorted(r.day for r in grid)
        assert (days[-1] - days[0]).days + 1 == len(days), "grid has gaps"
    # observed days carry their own (max) value, not an interpolation
    for r in rows:
        if (r.user_id, r.day) in obs:
            assert r.value_e4 == math.floor(obs[(r.user_id, r.day)] * 10000 + 0.5)


def test_null_safe_join_keeps_null_keys(spark, sf_dir):
    rows = {r.label: r.n for r in QUERIES["join_null_safe"](spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_p = orders.filter(F.col("o_orderstatus") == "P").count()
    assert rows.get("in-progress", 0) == n_p
    assert n_p > 0, "fixture has no P rows; test is vacuous"


def test_robust_outliers_bounded_fraction(spark, sf_dir):
    rows = QUERIES["events_robust_outliers"](spark, sf_dir).collect()
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    totals = {r.event_type: r.n for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert set(totals) == {r.event_type for r in rows}
    for r in rows:
        assert r.mad > 0
        # a 3-sigma-equivalent robust screen must flag only a tail
        assert r.n_outliers / totals[r.event_type] < 0.1


R4_DETERMINISTIC = [
    "sample_weighted_docs",
    "docs_temperature_mixture",
    "text_bigram_lm",
    "orders_scd2_intervals",
    "events_resample_interp",
    "join_null_safe",
    "parts_pareto_skyline",
    "parts_zorder_cluster",
    "events_robust_outliers",
    "rdf_weighted_sssp",
    "events_variant_pipeline",
    "sql_recursive_closure_depth",
    "agg_incremental_merge",
    "events_attribution_last_touch",
    "embedding_label_centroids",
    "nation_revenue_share",
    "events_xml_extract",
    "scalar_collation_group",
    "text_search_phrase",
    "customer_rfm_segments",
    "join_shuffle_hash_hint",
    "embedding_quantize_int8",
    "docs_novelty_scores",
    "dq_constraint_checks",
    "events_rolling_median_counts",
    "agg_regression_funcs",
    "docs_dataset_card",
    "basket_brand_affinity",
    "events_top_trigrams",
]


@pytest.mark.parametrize("name", R4_DETERMINISTIC)
def test_r4_queries_partitioning_invariant(spark, sf_dir, name):
    """Every round-4 declared query must produce the identical row SET
    under a different shuffle partitioning — the property that rules
    out hidden dependence on partition count, partial-aggregation
    order, or per-partition rank state. (The driver only ever runs one
    layout; this is the cheap local proxy for 'same answer on a
    1000-executor cluster'.)"""
    from rdf_mapreduce_joins_spark.plans import QUERIES

    fn = QUERIES[name]
    base = {tuple(map(str, r)) for r in fn(spark, sf_dir).collect()}
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = {tuple(map(str, r)) for r in fn(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == alt


def test_zorder_rejects_bit_overflow(spark):
    with pytest.raises(ValueError, match="63"):
        zorder_value([F.col("x")] * 8, bits=8)
    with pytest.raises(ValueError, match="63"):
        zorder_value([F.col("x"), F.col("y"), F.col("z")], bits=22)


def test_dq_drift_psi_matches_python(spark, sf_dir):
    """dq_drift_psi: full pure-Python PSI rebuild (reference grid,
    clamped bins, epsilon guard) and sanity of the drift flag."""
    from rdf_mapreduce_joins_spark.plans.analytics import (
        PSI_ALERT,
        PSI_BINS,
        PSI_EPS,
        PSI_SPLIT_DAYS,
    )
    from rdf_mapreduce_joins_spark.sources.tables import load_table

    rows = QUERIES["dq_drift_psi"](spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "events").select(
        "event_type", "value", F.expr("ts_s div 86400").alias("day_n")
    )
    recs = e.collect()
    split = min(r.day_n for r in recs) + PSI_SPLIT_DAYS
    by_type: dict[str, tuple[list, list]] = {}
    for r in recs:
        ref, cur = by_type.setdefault(r.event_type, ([], []))
        (ref if r.day_n < split else cur).append(r.value)
    assert {r.event_type for r in rows} == set(by_type)
    for r in rows:
        ref, cur = by_type[r.event_type]
        assert (r.n_ref, r.n_cur) == (len(ref), len(cur))
        if not ref:
            # a type born after the reference window: NULL grid ->
            # every current row clamps to bin 0 (GREATEST skips the
            # NULL on both engines), pr = epsilon everywhere, so
            # psi ~= ln(1/eps) and the type flags as drifted — the
            # right signal for a brand-new population. Pin it.
            expected = (1.0 - PSI_EPS) * math.log(1.0 / PSI_EPS)
            assert abs(r.psi - round(expected, 6)) <= 2e-6
            assert r.drifted
            continue
        vmin, vmax = min(ref), max(ref)
        width = (vmax - vmin) / PSI_BINS if vmax > vmin else 1.0

        def hist(vals):
            h = [0] * PSI_BINS
            for v in vals:
                h[min(max(int(math.floor((v - vmin) / width)), 0), PSI_BINS - 1)] += 1
            return h

        hr, hc = hist(ref), hist(cur)
        psi = sum(
            (pc - pr) * math.log(pc / pr)
            for pr, pc in (
                (max(a / len(ref), PSI_EPS), max(b / len(cur), PSI_EPS))
                for a, b in zip(hr, hc)
            )
        )
        assert abs(r.psi - round(psi, 6)) <= 2e-6, (r.event_type, r.psi, psi)
        assert r.drifted == (psi > PSI_ALERT)

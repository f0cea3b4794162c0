"""Physical-plan quality gates (SURVEY.md §4.2).

Correctness tests say the answers are right; these say the PLANS are
right — the properties that decide whether a query survives a 100x
scale-up: filters reach the parquet scan, projections prune columns,
dimension joins broadcast, and nothing ever degenerates into a
cartesian / nested-loop product. Each assertion was first observed by
hand via ``.explain`` and is pinned here so a refactor can't silently
regress the plan shape.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def _plan(df) -> str:
    """Final physical plan string (post-AQE initial plan; the shapes
    asserted here are decided at planning, not by runtime re-opt)."""
    return df._jdf.queryExecution().executedPlan().toString()


# Queries where a cartesian product would be a correctness-of-scale bug
# but the operator semantics might tempt one (self-joins, theta joins).
_NO_CARTESIAN = sorted(entrymod.queries())

# The sanctioned nested-loop shapes, all with a build side bounded by
# construction:
# - similarity_knn_join: scoring the corpus against a BROADCAST probe
#   batch (a query workload, never a second corpus). The corpus side
#   streams once; the per-row work is |Q|, not |corpus|.
# - tpch_q11/q22: scalar-subquery threshold — the broadcast side is a
#   single-row (sum, count) aggregate joined under an inequality, the
#   textbook plan for HAVING value > total * fraction. (q15's sibling
#   crossJoin converts to a BroadcastHashJoin because its filter is an
#   equality.) Anything else hitting BNLJ is still a bug.
_BOUNDED_BUILD_SIDE_OK = {
    "similarity_knn_join",
    "tpch_q11_important_stock",
    "tpch_q22_dormant_customers",
    # 1-row broadcast corpus stats (N / avgdl / vocab size) joined
    # under no condition — the same scalar-subquery shape as
    # tpch_q11/q22.
    "text_tfidf_topk",
    "text_bm25_rank",
    "text_lm_score",
    # 1-row broadcast degree-total frame (sum(d), count(*)) joined
    # keyless to compute the corpus-relative hub cutoff — the same
    # scalar-subquery shape as tpch_q11/q22 (build side exactly 1 row
    # by construction: a global aggregate).
    "supplier_cosupply_graph",
    # 1-row broadcast sum(sqrt(lang_count)) normalizer crossJoined to
    # the per-language count frame — scalar-subquery shape again.
    "docs_temperature_mixture",
    # 1-row broadcast order-count frame (the lift denominator)
    # crossJoined to the min-support-pruned pair frame — scalar
    # subquery shape again.
    "basket_brand_affinity",
    # 1-row broadcast normalization total crossJoined to the sparse
    # score frame each half-round (round-11 sparse HITS: the
    # normalized projection is no longer hidden behind a
    # localCheckpoint, so the scalar-subquery shape shows in the
    # final plan — build side exactly 1 row by construction).
    "rdf_hits",
    # label-domain-bounded broadcast: the candidate frame is
    # doc x languages (a handful of rows on the build side) for the
    # smoothed naive-Bayes penalty term.
    "text_lang_id",
    # 1-row broadcast split-day boundary (min(day_n) + 15) crossJoined
    # to tag each event reference/current — scalar-subquery shape
    # again (build side exactly 1 row: a global MIN aggregate).
    "dq_drift_psi",
}


# Unpartitioned-window sanction list (VERDICT r6 #2): a Window with no
# PARTITION BY sorts its whole input in ONE task. Allowed ONLY over
# spines bounded by a VALUE DOMAIN (never by a dimension's row count);
# each entry documents the spine and its bound. Every query absent from
# this dict must plan ZERO unpartitioned windows.
_UNPARTITIONED_WINDOW_SPINES = {
    # size-gated route (operators/ranking.py): at fixture scale the
    # THREE ntile windows run over the per-customer aggregate, bounded
    # by RANK_GLOBAL_WINDOW_MAX_ROWS (above it the plan switches to
    # bucket-summary windows over value-domain spines: recency-day
    # range ~2.5k, orders-per-customer O(50), $10k cents buckets —
    # route pinned by test_rank_bucketed_route_*).
    "customer_rfm_segments": 3,
    # same gate: one running-sum window over the per-part aggregate
    # below the threshold; a $1k-cents bucket-summary window above.
    "lineitem_abc_pareto": 1,
    # per-bucket maxima frame, #buckets = price domain / 200.
    "parts_pareto_skyline": 1,
    # per-month spine (~80 months in the order-date domain).
    "orders_monthly_trend_yoy": 1,
    # per-day sketch frame (one HLL row per day in the event range).
    "events_rolling_distinct_hll": 1,
}


def _unpartitioned_windows(df) -> int:
    """Count logical Window nodes with an empty partitionSpec (the
    shapes behind Spark's 'No Partition Defined' warning), via a py4j
    walk of the optimized plan — AQE-independent."""
    n = 0
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
        ):
            n += 1
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))
    return n


@pytest.mark.parametrize("name", sorted(_UNPARTITIONED_WINDOW_SPINES))
def test_sanctioned_unpartitioned_window_counts(spark, sf_dir, name):
    """The sanctioned queries must carry EXACTLY their documented
    bounded-spine window count — a regression that re-introduces a
    full-frame global window shows up as count+1 here."""
    df = entrymod.queries()[name](spark, sf_dir)
    assert _unpartitioned_windows(df) == _UNPARTITIONED_WINDOW_SPINES[name]


def test_unpartitioned_windows_sanctioned(spark, sf_dir):
    """No UNSANCTIONED query may plan an unpartitioned window at all:
    anything new must either partition or argue a value-domain bound
    here. One sweep over the registry — plan inspection only, except
    the two persisted-state queries (events_hll_summary_roundtrip,
    dedup_incremental_components) whose builders run their phase-1
    write as a side effect of constructing the returned frame."""
    offenders = {}
    for name, fn in entrymod.queries().items():
        if name in _UNPARTITIONED_WINDOW_SPINES:
            continue
        n = _unpartitioned_windows(fn(spark, sf_dir))
        if n:
            offenders[name] = n
    assert not offenders, f"unsanctioned single-task windows: {offenders}"


@pytest.mark.parametrize("name", ["customer_rfm_segments", "lineitem_abc_pareto"])
def test_rank_bucketed_route_matches_window_route(
    spark, sf_dir, name, monkeypatch
):
    """Force the scale route (byte threshold -> -1) for the size-gated
    rank/prefix queries and require (a) the plan actually switches —
    bucket-partitioned windows appear, the full-frame ntile/global
    running-sum disappears — and (b) the rows are IDENTICAL to the
    window route's (the lang-id route-equivalence pattern)."""
    import rdf_mapreduce_joins_spark.plans.analytics as pa
    import rdf_mapreduce_joins_spark.plans.relational as pr

    fn = entrymod.queries()[name]
    small = sorted(map(tuple, fn(spark, sf_dir).collect()))
    monkeypatch.setattr(pa, "RANK_GLOBAL_WINDOW_MAX_INPUT_BYTES", -1)
    monkeypatch.setattr(pr, "RANK_GLOBAL_WINDOW_MAX_INPUT_BYTES", -1)
    big_df = fn(spark, sf_dir)
    plan = _plan(big_df)
    marker = "_rk_bkt" if name == "customer_rfm_segments" else "_ps_bkt"
    assert marker in plan, f"{name} forced route did not switch plans"
    assert "ntile(" not in plan
    assert _unpartitioned_windows(big_df) == _UNPARTITIONED_WINDOW_SPINES[name]
    assert sorted(map(tuple, big_df.collect())) == small


@pytest.mark.parametrize("name", _NO_CARTESIAN)
def test_no_cartesian_or_nested_loop(spark, sf_dir, name):
    """No declared query may plan a CartesianProduct, and none but the
    sanctioned bounded-build-side scorers may plan a
    BroadcastNestedLoopJoin: every other join in the engine is
    equi-keyed (theta conditions ride as residual filters on an
    equi-join). An unkeyed join over two corpus-scale sides is O(n*m)
    and dies at scale."""
    df = entrymod.queries()[name](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in _BOUNDED_BUILD_SIDE_OK:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name} plans a nested-loop join"


def test_filter_reaches_parquet_scan(spark, sf_dir):
    """scan_project_filter (TPC-H Q6 shape): the shipdate/discount/
    quantity predicates must appear as scan-level DataFilters (parquet
    row-group skipping), not only as a post-scan Filter node."""
    df = entrymod.queries()["scan_project_filter"](spark, sf_dir)
    plan = _plan(df)
    scan_lines = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scan_lines, "no parquet scan in plan"
    assert any("l_shipdate" in l and "DataFilters" in l for l in scan_lines)


def test_column_pruning_reaches_scan(spark, sf_dir):
    """The Q6-shaped scan must read only the 4 referenced lineitem
    columns — a scan that drags all 16 through a 100 TB table is the
    single most expensive possible plan bug."""
    df = entrymod.queries()["scan_project_filter"](spark, sf_dir)
    plan = _plan(df)
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # FileScan header lists the output columns read from the file.
    header = scan.split("Batched:")[0]
    for needed in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert needed in header
    for pruned in ("l_comment", "l_orderkey", "l_partkey", "l_tax"):
        assert pruned not in header, f"scan failed to prune {pruned}"


def test_dimension_joins_broadcast(spark, sf_dir):
    """join_broadcast_dims: nation/region are dimension tables at every
    scale factor — both joins must be BroadcastHashJoin (a shuffle of
    the fact side to join a 25-row table is wasted IO at any scale)."""
    df = entrymod.queries()["join_broadcast_dims"](spark, sf_dir)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_rdf_union_branch_pruning(spark, sf_dir):
    """rdf_distinct_pairs constrains patterns to the supplier branch at
    plan build (Pattern.s_table); the plan must not scan customer —
    Catalyst cannot fold a LIKE over the concat-built subject, so this
    pruning has to happen in our plan builder."""
    df = entrymod.queries()["rdf_distinct_pairs"](spark, sf_dir)
    plan = _plan(df)
    assert "customer.parquet" not in plan
    assert "supplier.parquet" in plan


def test_constant_subject_prunes_branches(spark, sf_dir):
    """A constant subject's table prefix prunes the triples-view union
    at plan build (round 11): <supplier/5> ?p ?o must scan ONLY
    supplier branches — Catalyst cannot fold concat('customer/', id) =
    'supplier/5' to false, so without compiler pruning every branch is
    scanned and discarded post-union."""
    from rdf_mapreduce_joins_spark.plans.sparql import sparql

    df = sparql(
        spark,
        sf_dir,
        "SELECT ?predicate ?object WHERE "
        "{ <supplier/5> ?predicate ?object . }",
    )
    plan = _plan(df)
    assert "supplier.parquet" in plan
    for other in ("customer.parquet", "orders.parquet", "lineitem.parquet",
                  "nation.parquet", "region.parquet", "part.parquet"):
        assert other not in plan, other


def test_constant_subject_unsatisfiable_table_is_empty(spark, sf_dir):
    """A constant subject whose table has no branch for the pattern's
    predicate compiles to an empty frame (the 'join simply comes back
    empty' convention), not a KeyError: <nation> edges leave customer
    and supplier, never region."""
    from rdf_mapreduce_joins_spark.plans.sparql import sparql

    df = sparql(
        spark, sf_dir, "SELECT ?o WHERE { <region/1> <nation> ?o . }"
    )
    assert df.count() == 0


def test_minhash_signature_exchange_reused(spark, sf_dir):
    """dedup_near_minhash references the signature aggregation four
    times (band self-join left/right + two signature re-joins). The
    plan must reuse the aggregation's exchange instead of recomputing
    the explode+64-min pipeline per reference — losing ReusedExchange
    here measured 4-8x on the bench.

    Reuse is an AQE runtime decision, so the frame must be executed
    before the final plan shows it (the pre-execution plan prints the
    four subtrees un-deduplicated)."""
    df = entrymod.queries()["dedup_near_minhash"](spark, sf_dir)
    df.collect()
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    # 4 references to the signature aggregation -> 1 computed + 3 reused
    assert plan.count("ReusedExchange") >= 3


def test_topk_is_limit_not_global_sort(spark, sf_dir):
    """orderby_limit_global must plan TakeOrderedAndProject (per-
    partition top-k + merge), not a full global sort followed by a
    limit — the difference between O(n log k) and a total shuffle."""
    df = entrymod.queries()["orderby_limit_global"](spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan


def test_hot_paths_are_whole_stage_codegen(spark, sf_dir):
    """The scan→filter→project→partial-agg pipeline of the Q6 shape
    must run inside WholeStageCodegen (one fused JVM loop), and the
    dimension-join query's probe side likewise — opaque breaks here
    (e.g. a stray Python UDF) would cut throughput by an order of
    magnitude at scale."""
    for name in ("scan_project_filter", "join_broadcast_dims", "agg_group_sum"):
        df = entrymod.queries()[name](spark, sf_dir)
        df.collect()  # codegen markers (*(n)) only print on the final plan
        plan = _plan(df)
        assert "*(1)" in plan, f"{name} lost whole-stage codegen"
        assert "BatchEvalPython" not in plan, f"{name} has a row-Python stage"


def test_correlated_subquery_decorrelates(spark, sf_dir):
    """subquery_correlated_acctbal: both correlated scalar subqueries
    must decorrelate into aggregate-plus-join (per-nation aggregates
    broadcast against the customer scan) — never a per-row
    ScalarSubquery re-execution, which is O(rows x subquery) at scale."""
    df = entrymod.queries()["subquery_correlated_acctbal"](spark, sf_dir)
    plan = _plan(df)
    assert "HashJoin" in plan
    assert "HashAggregate" in plan
    assert "ScalarSubquery" not in plan


def test_knn_join_partial_window_group_limit(spark, sf_dir):
    """similarity_knn_join: the corpus side must be scanned once with
    the QUERY side broadcast, and the top-k must pre-reduce map-side
    (WindowGroupLimit Partial below the exchange) so the shuffle
    carries |Q|*k rows per task, never |Q|*|corpus|."""
    df = entrymod.queries()["similarity_knn_join"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin BuildRight" in plan
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_knn_join_ivf_is_equi_join(spark, sf_dir):
    """similarity_knn_join_ivf: candidates must come from an equi-join
    on the cluster id (hash-joinable), never a nested loop over the
    corpus."""
    df = entrymod.queries()["similarity_knn_join_ivf"](spark, sf_dir)
    plan = _plan(df)
    assert "HashJoin" in plan
    assert "NestedLoop" not in plan


def test_spread_skips_repartition_on_wide_input(spark):
    """spread() must not inject a round-robin shuffle when the input
    already has >= defaultParallelism partitions (VERDICT r1 #9): at
    production scale every scan splits naturally, and an unconditional
    repartition would be a full shuffle of the raw rows for nothing."""
    from rdf_mapreduce_joins_spark.sources.tables import spread

    n = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 10_000).repartition(n * 2)
    assert _plan(spread(wide)) == _plan(wide)  # no extra Exchange node
    narrow = spark.range(0, 10_000).coalesce(1)
    assert "RoundRobinPartitioning" in _plan(spread(narrow))


def test_pagerank_iteration_adjacency_never_reshuffles(spark):
    """VERDICT r2 #4: pin the PageRank hoist mechanically. One round
    must (a) read the O(|E|) adjacency from its InMemoryRelation — no
    recompute: exactly one InMemoryTableScan and zero RDD re-derivation
    of the weighted adjacency — and (b) plan exactly TWO shuffle
    exchanges, both O(|V|)-or-smaller: the in-mass aggregation keyed on
    dst and the 1-row dangling sum. AQE and auto-broadcast are disabled
    for the assertion because AQE wraps the tree (and on a toy graph
    broadcasts would hide the join structure); the cached-partitioning
    property being pinned is decided at cache time, not by AQE.

    Regression history: round 2 checkpointed (not persisted) the
    adjacency, and localCheckpoint under AQE records
    UnknownPartitioning — the adjacency was silently recomputed AND
    reshuffled every round (4 exchanges/iteration, ~24.7 s at sf0.1);
    the persist+ranks-as-universe form measures ~15 s with the
    adjacency exchange count at zero."""
    from pyspark.sql import functions as F

    from rdf_mapreduce_joins_spark.operators import graph as G

    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        edges = spark.range(20_000).selectExpr(
            "cast(id % 997 as int) AS src", "cast((id * 31 + 7) % 997 as int) AS dst"
        )
        adj, nodes, e_cached = G._pagerank_setup(edges)
        try:
            ranks = nodes.withColumn("rank", F.lit(1.0)).localCheckpoint()
            it = G._pagerank_iteration(ranks, adj, ranks.count(), 0.85)
            plan = it._jdf.queryExecution().executedPlan()

            def walk(p):
                yield p.getClass().getSimpleName()
                cs = p.children()
                for i in range(cs.length()):
                    yield from walk(cs.apply(i))

            names = list(walk(plan))
            assert names.count("InMemoryTableScanExec") == 1, names
            n_shuffles = names.count("ShuffleExchangeExec")
            assert n_shuffles == 2, f"expected 2 exchanges/round, got {n_shuffles}: {names}"
            # No joins/aggregations besides the three the round needs
            # (contrib join, universe join, partial+final sums x2): a
            # recomputed adjacency would add its own join + agg. Both
            # round joins are SHUFFLED-HASH since round 11 (the O(|V|)
            # side is the build) — a sort-merge here re-sorted the
            # cached O(|E|) adjacency every round.
            assert names.count("ShuffledHashJoinExec") == 2, names
            assert names.count("SortMergeJoinExec") == 0, names
        finally:
            adj.unpersist()
            e_cached.unpersist()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)


def test_cosupply_hub_cap_is_anti_join_guard(spark, sf_dir):
    """VERDICT r2 #3: supplier_cosupply_graph must carry the hub-part
    guard — a LEFT ANTI join excluding parts whose supplier degree
    exceeds 1.35x the mean — between the distinct incidence and the
    quadratic self-join, and still never plan a cartesian. The cap
    semantics themselves are differential-tested via the DuckDB oracle
    (mirrored integer-arithmetic threshold); this pins the plan shape."""
    df = entrymod.queries()["supplier_cosupply_graph"](spark, sf_dir)
    plan = _plan(df)
    assert "LeftAnti" in plan, "hub-part anti-join guard missing"
    assert "CartesianProduct" not in plan
    # top-5-per-supplier must pre-reduce below the window sort
    assert "WindowGroupLimit" in plan


def test_aqe_skew_split_fires_on_hot_partition(spark):
    """EVIDENCE that AQE's skew-join split handles partition-level skew
    at runtime (VERDICT r2 #7 / r3 #7): a synthetic hot key that lands
    ~10x the average partition size must re-plan to
    SortMergeJoin(skew=true) after execution. This is the runtime
    complement to operators/skew.py::salted_join — AQE splits
    oversized PARTITIONS (many-keys-one-partition or one giant key's
    sorted runs); salting is the manual fix when a single key must
    spread across executors pre-shuffle. Thresholds are lowered to
    make a ~300k-row fixture exceed the skew factor; the assertion is
    on the executed (adaptive) plan, which only exists post-collect."""
    from pyspark.sql import functions as F

    saved = {}
    tuned = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    for k, v in tuned.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        big = spark.range(330_000).select(
            F.when(F.col("id") < 300_000, F.lit(0))
            .otherwise((F.col("id") % 1000) + 1)
            .alias("k"),
            F.col("id").alias("v"),
        )
        small = spark.range(1001).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = big.join(small, "k").groupBy().agg(F.sum("v").alias("sv"))
        j.collect()
        plan = _plan(j)
        assert "skew=true" in plan, f"AQE skew split did not fire:\n{plan}"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_shuffle_hash_hint_is_honored(spark, sf_dir):
    """join_shuffle_hash_hint: the SHUFFLE_HASH hint must actually
    plan a ShuffledHashJoin (one build, no sorts) — Catalyst's default
    for two large sides is SortMergeJoin, so a silently-dropped hint
    would still pass the oracle while losing the physical strategy
    the query exists to declare."""
    df = entrymod.queries()["join_shuffle_hash_hint"](spark, sf_dir)
    plan = _plan(df)
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


# Queries whose FINAL global sort was replaced by bounded_sort
# (sources/tables.py): bounded-cardinality group spines where the
# rangepartitioning boundary-sampling job is pure fixed overhead
# (0.2-0.5 s each, measured r10). The r10 four plus the r11 audit
# sweep (tools/audit_bounded_sorts.py). A regression back to a global
# orderBy reintroduces the sampling job silently — pin the plans.
_BOUNDED_SORT_FINALS = [
    # r10
    "agg_theta_distinct",
    "agg_kll_quantiles",
    "agg_hll_mergeable",
    "tpch_q22_dormant_customers",
    # r11 sweep
    "agg_approx_percentiles",
    "agg_hll_portable",
    "agg_kmv_distinct",
    "agg_kmv_overlap",
    "agg_quantile_histogram",
    "assembly_training_manifest",
    "dq_drift_psi",
    "events_hll_summary_roundtrip",
    "events_rolling_distinct_portable",
    "join_salted_skew",
    "pivot_status_by_nation",
    "tpch_q12_priority_shipping",
    "tpch_q15_top_supplier",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
]


def test_bounded_sort_finals_plan_no_range_exchange(spark, sf_dir):
    """None of the bounded_sort-swept queries may plan a
    rangepartitioning exchange anywhere: their only global sort WAS
    the final one, now a coalesce(1)+sortWithinPartitions narrow
    dependency (audited by tools/audit_bounded_sorts.py, hash-matches
    re-proven at two sfs when swept)."""
    offenders = {}
    for name in _BOUNDED_SORT_FINALS:
        plan = _plan(entrymod.queries()[name](spark, sf_dir))
        n = plan.count("rangepartitioning")
        if n:
            offenders[name] = n
    assert not offenders, f"range exchange crept back: {offenders}"

"""Triples view + BGP compiler unit tests (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.plans import rdf
from rdf_mapreduce_joins_spark.sources.tables import load_table


def test_triples_view_row_counts(spark, sf_dir):
    """Unpivot cardinality: one triple per (spec row × base row passing
    the spec's WHERE, if any)."""
    expected = 0
    for s in rdf.PRED_SPECS:
        base = load_table(spark, sf_dir, s.table)
        if s.where:
            base = base.filter(s.where)
        expected += base.count()
    assert rdf.triples(spark, sf_dir).count() == expected


def test_pred_df_vertical_partitioning(spark, sf_dir):
    name_triples = rdf.pred_df(spark, sf_dir, "name")
    # 'name' exists for customer, nation, region, supplier
    n = sum(
        load_table(spark, sf_dir, t).count()
        for t in ("customer", "nation", "region", "supplier")
    )
    assert name_triples.count() == n
    assert name_triples.columns == ["subject", "object"]


def test_pred_df_unknown_predicate(spark, sf_dir):
    with pytest.raises(KeyError):
        rdf.pred_df(spark, sf_dir, "nonexistent")


def test_bgp_constant_object_filter(spark, sf_dir):
    df = rdf.bgp(spark, sf_dir, [rdf.Pattern("?n", "region", "region/0")], select=["?n"])
    expected = (
        load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0).count()
    )
    assert df.count() == expected


def test_bgp_disconnected_pattern_raises(spark, sf_dir):
    with pytest.raises(ValueError, match="shares no variable"):
        rdf.bgp(
            spark,
            sf_dir,
            [rdf.Pattern("?a", "name", "?x"), rdf.Pattern("?b", "status", "?y")],
        )


def test_bgp_semi_plus_anti_partition(spark, sf_dir):
    """J6/J7 invariant: semi ∪ anti = all, semi ∩ anti = ∅ (same group)."""
    base = [rdf.Pattern("?c", "mktsegment", "?seg")]
    group = [rdf.Pattern("?o", "customer", "?c")]
    all_c = rdf.bgp(spark, sf_dir, base, select=["?c"])
    semi = rdf.bgp(spark, sf_dir, base, exists=[group], select=["?c"])
    anti = rdf.bgp(spark, sf_dir, base, negation=[group], select=["?c"])
    assert semi.count() + anti.count() == all_c.count()
    assert semi.intersect(anti).count() == 0


def test_bgp_optional_equals_inner_plus_anti(spark, sf_dir):
    """J5 invariant: left-join rows = inner rows + unmatched-left rows."""
    base = [rdf.Pattern("?c", "mktsegment", "?seg")]
    group = [rdf.Pattern("?o", "customer", "?c")]
    opt = rdf.bgp(spark, sf_dir, base, optional=[group])
    inner = rdf.bgp(spark, sf_dir, base + group)
    anti = rdf.bgp(spark, sf_dir, base, negation=[group])
    assert opt.count() == inner.count() + anti.count()


def test_triples_sql_matches_spec_count():
    full = rdf.triples_sql()
    assert full.count("UNION ALL") == len(rdf.PRED_SPECS) - 1
    partial = rdf.triples_sql(["name"])
    assert partial.count("SELECT") == 4


def test_id_encoding_roundtrip():
    from rdf_mapreduce_joins_spark.plans import rdf as R

    for iri in ["customer/0", "customer/1499", "nation/24", "region/0",
                "orders/14999", "supplier/9", "lineitem/42/3"]:
        enc = R._const_to_id(iri)
        table = iri.split("/")[0]
        assert enc >> R._KEY_BITS == R._TAG[table]


def test_subgroup_does_not_narrow_required_var(spark, sf_dir):
    """Regression: a variable bound in the required group keeps its
    required-group table domain even when an OPTIONAL/anti sub-group
    occurrence would pin it tighter. ``?x name ?nm`` spans 4 tables;
    the anti group's ``?o customer ?x`` is customer-only — narrowing
    would prune the 3 non-customer scans (dropping their rows) and
    decode every id with a 'customer/' prefix."""
    kinds = rdf._var_kinds(
        [
            [rdf.Pattern("?x", "name", "?nm")],
            [rdf.Pattern("?o", "customer", "?x")],
        ]
    )
    assert kinds["x"] == (
        "id",
        frozenset({"customer", "nation", "region", "supplier"}),
    )

    out = rdf.bgp(
        spark,
        sf_dir,
        [rdf.Pattern("?x", "name", "?nm")],
        negation=[[rdf.Pattern("?o", "customer", "?x")]],
        select=["?x", "?nm"],
    )
    plain = rdf.bgp(
        spark,
        sf_dir,
        [rdf.Pattern("?x", "name", "?nm")],
        negation=[[rdf.Pattern("?o", "customer", "?x")]],
        select=["?x", "?nm"],
        encoded=False,
    )
    rows = {tuple(r) for r in out.collect()}
    assert rows == {tuple(r) for r in plain.collect()}
    prefixes = {x.split("/")[0] for x, _ in rows}
    # every non-customer named subject survives the anti join
    assert {"nation", "region", "supplier"} <= prefixes


def test_infer_s_tables_prunes_dead_scans(spark, sf_dir):
    """Subject-table inference: ``?c mktsegment ?seg`` pins ?c to
    customer, so the 4-branch ``name`` union collapses to the customer
    branch — visible both in the refined patterns and in the physical
    plan's parquet scan count."""
    pats = [
        rdf.Pattern("?c", "mktsegment", "?seg"),
        rdf.Pattern("?c", "name", "?cname"),
    ]
    refined = rdf._infer_s_tables([pats])[0]
    assert refined[1].s_table == "customer"

    df = rdf.bgp(spark, sf_dir, pats, select=["?c", "?cname"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 2  # not 5 (1 + 4 name branches)
    # inference must not change results (string path re-derives it too)
    plain = rdf.bgp(spark, sf_dir, pats, select=["?c", "?cname"], encoded=False)
    assert {tuple(r) for r in df.collect()} == {tuple(r) for r in plain.collect()}


def test_bgp_encoded_matches_string_path(spark, sf_dir):
    """The dictionary-encoded BGP path must be bit-identical to the
    string path on every join shape — run the shapes that exercise
    chain, cycle, optional-null decode, and distinct."""
    from rdf_mapreduce_joins_spark.plans import rdf as R

    for name in ["rdf_chain_join", "rdf_cyclic_join", "rdf_optional_join",
                 "rdf_distinct_pairs", "rdf_broadcast_lookup"]:
        fn = getattr(R, name)
        enc = {tuple(r) for r in fn(spark, sf_dir).collect()}
        import functools
        orig = R.bgp
        R.bgp = functools.partial(orig, encoded=False)
        try:
            plain = {tuple(r) for r in fn(spark, sf_dir).collect()}
        finally:
            R.bgp = orig
        assert enc == plain, f"{name}: encoded path diverges from string path"


def test_degree_distribution_routes_and_encoded_equality(spark, sf_dir):
    """rdf_degree_distribution routes by estimated triples-view size
    (round 12): the string single-aggregation below
    DEGREE_ENC_ROUTE_MIN_BYTES, the int64-encoded two-level form above.
    The fixture must take the string route (estimate ~0.2 MB), and the
    encoded form must be row-identical to it — including literal
    objects, composite lineitem subjects, and FK objects merging with
    their target subjects."""
    from rdf_mapreduce_joins_spark.operators.graph import degrees
    from rdf_mapreduce_joins_spark.plans import rdf as R

    routed = R.rdf_degree_distribution(spark, sf_dir)
    assert "k_id" not in routed._jdf.queryExecution().optimizedPlan().toString()
    enc = R._degrees_encoded(spark, sf_dir)
    plan = enc._jdf.queryExecution().optimizedPlan().toString()
    assert "k_id" in plan and "bigint" in enc.schema["out_deg"].dataType.simpleString()
    a = [tuple(r) for r in routed.collect()]
    b = [tuple(r) for r in enc.collect()]
    assert a == b and len(a) > 0
